"""CLI usage-text completeness: every registered subcommand is listed.

VERDICT r3 cosmetic item — the usage text had drifted ~8 subcommands
behind the registry; this pins them together.
"""

from pantas_tpu.cli import _COMMANDS, _USAGE


def test_usage_lists_every_subcommand():
    missing = [name for name in _COMMANDS if f"\n    {name} " not in _USAGE
               and f"\n    {name}\n" not in _USAGE]
    assert not missing, f"subcommands missing from _USAGE: {missing}"


def test_usage_lists_no_stale_subcommands():
    import re

    listed = {
        m.group(1)
        for m in re.finditer(r"\n    ([a-z][a-z0-9-]*) ", _USAGE)
    }
    stale = listed - set(_COMMANDS) - {"version"}
    assert not stale, f"usage lists unregistered subcommands: {stale}"
