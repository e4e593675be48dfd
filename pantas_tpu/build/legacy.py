"""Legacy pre-annotate.cpp build utilities (standalone tools).

Byte-identical reimplementations of the reference's legacy pure-Python
build path helpers (none are wired into the reference CLI or workflows;
kept for component parity):

* ``prune_gfa`` — `scripts/prune_gfa.py` (86 LoC): keep nodes inside the
  [min-w, max+w] id interval of any ``tprefix``/``_alt``-prefixed path.
* ``reintroduce_paths`` — `scripts/reintroduce_paths.py` (37 LoC): restore
  P lines from the unpruned GFA into a pruned one, with a validate-first
  double pass "to print empty GFA in case of failure".
"""

from __future__ import annotations

import sys
from typing import List, Set, Tuple


def prune_gfa(gfa_path: str, out=None, w: int = 0, tprefix: str = "ENST", log=None) -> None:
    """Keep the transcript-interval subgraph; split other paths at gaps.

    Quirks preserved from ``prune_gfa.py``:

    * split sub-paths are named ``{pname}_{i}`` (1-based, underscore — the
      sibling ``reduce.py`` tool uses ``.{i}`` 0-based; both verbatim);
    * a path's FINAL kept segment is dropped — no flush after the node
      loop (``prune_gfa.py:45-53``);
    * lines that are not H/S/L/P vanish (no else branch, ``:25-60``);
    * ``_alt``-prefixed paths pass through verbatim, like transcript paths
      (hardcoded, ``:38-41``).
    """
    out = sys.stdout if out is None else out
    log = sys.stderr if log is None else log
    keep: Set[int] = set()
    nnodes = 0
    for line in open(gfa_path):
        if line.startswith("S"):
            nnodes += 1
        elif line.startswith("P"):
            _, pname, nodes, _ = line.split("\t")
            if not pname.startswith(tprefix):
                continue
            ids = [int(n[:-1]) for n in nodes.split(",")]
            keep |= set(range(min(ids) - w, max(ids) + w + 1))
    print(f"Pruning {len(keep)}/{nnodes} nodes..", file=log)

    wr = out.write
    for line in open(gfa_path):
        if line.startswith("H"):
            wr(line)
        elif line.startswith("S"):
            if int(line.split("\t")[1]) in keep:
                wr(line)
        elif line.startswith("L"):
            t = line.split("\t")
            if int(t[1]) in keep and int(t[3]) in keep:
                wr(line)
        elif line.startswith("P"):
            _, pname, nodes, _ = line.strip("\n").split("\t")
            if pname.startswith(tprefix) or pname.startswith("_alt"):
                wr(line)
            else:
                paths: List[List[int]] = []
                cur: List[int] = []
                for node in (int(n[:-1]) for n in nodes.split(",")):
                    if node in keep:
                        cur.append(node)
                    elif cur:
                        paths.append(cur)
                        cur = []
                # QUIRK: trailing `cur` intentionally not flushed
                for i, path in enumerate(paths, 1):
                    steps = ",".join(f"{x}+" for x in path)
                    wr(f"P\t{pname}_{i}\t{steps}\t*\n")


def reintroduce_paths(gfa_path: str, pruned_gfa_path: str, out=None) -> None:
    """Restore the original P lines into a pruned GFA.

    Double pass as in ``reintroduce_paths.py:8-33``: every consecutive node
    pair of every original path is asserted to exist as an edge in the
    pruned graph BEFORE anything is printed, so a failure emits an empty
    GFA rather than an incomplete one. Reverse-strand paths (last step
    ``-``) are validated in reversed order.
    """
    out = sys.stdout if out is None else out
    edges: Set[Tuple[int, int]] = set()
    for line in open(pruned_gfa_path):
        if line.startswith("L"):
            _, n1, _, n2, _, _ = line.split("\t")
            edges.add((int(n1), int(n2)))

    for line in open(gfa_path):
        if line.startswith("P"):
            nodes = line.split("\t")[2].split(",")
            strand = nodes[-1][-1]
            ids = [int(x[:-1]) for x in nodes]
            if strand == "-":
                ids.reverse()
            for n1, n2 in zip(ids[:-1], ids[1:]):
                assert (n1, n2) in edges

    wr = out.write
    for line in open(pruned_gfa_path):
        wr(line)
    for line in open(gfa_path):
        if line.startswith("P"):
            wr(line)
