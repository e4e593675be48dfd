"""Test harness configuration.

Force the CPU backend with 8 virtual devices BEFORE any jax import so
multi-chip sharding paths are testable without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize imports jax at interpreter startup (before
# this conftest) with JAX_PLATFORMS=axon already captured; the env override
# above is then too late, so force the platform through the config API —
# backends have not initialized yet at collection time.
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass

import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

REFERENCE = Path("/root/reference")

import pytest


@pytest.fixture(scope="session")
def reference_scripts():
    """Path to the reference implementation's scripts dir (differential tests)."""
    p = REFERENCE / "scripts"
    if not p.is_dir():
        pytest.skip("reference implementation not available")
    return p
