"""Self-building import shim for the native GFA loader extension.

Unlike the ctypes engines, ``gfaload`` is a real CPython extension (it
builds Python dicts/sets/objects directly), compiled on first use with g++
against the interpreter's headers and loaded from its file path.
"""

from __future__ import annotations

import importlib.util
import subprocess
import sysconfig
from pathlib import Path

_SRC = Path(__file__).parent / "gfaload.cpp"
_SO = Path(__file__).parent / "gfaload_ext.so"

_mod = None
_failed = False


def build_extension(force: bool = False) -> Path:
    if force or not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        inc = sysconfig.get_paths()["include"]
        cmd = [
            "g++",
            "-O3",
            "-march=native",
            "-std=c++17",
            "-pthread",  # the parallel scan spawns std::thread
            "-shared",
            "-fPIC",
            f"-I{inc}",
            str(_SRC),
            "-o",
            str(_SO),
        ]
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO


def get_module():
    """The compiled extension module, or None if unavailable."""
    global _mod, _failed
    if _mod is not None or _failed:
        return _mod
    try:
        build_extension()
        spec = importlib.util.spec_from_file_location("gfaload_ext", _SO)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _mod = mod
    except Exception:
        _failed = True
        _mod = None
    return _mod
