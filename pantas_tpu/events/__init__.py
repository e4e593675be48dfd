"""Event calling engine (the reference's `call` stage).

:mod:`pantas_tpu.events.caller` enumerates alternative-splicing events
(annotated ES/A3/A5/IR and novel ES/A3/A5/IR/CE) over an augmented spliced
pangenome, reproducing the reference caller's exact row semantics
(``scripts/call.py``), including its lexicographic node-id comparisons and
loop-variable lifetimes, so outputs are row-set identical.
"""

from pantas_tpu.events.caller import CallOptions, SplicingGraph, call_events  # noqa: F401
