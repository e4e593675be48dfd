"""EX/JN annotation via per-haplotype edge-set difference.

Replaces the reference's native annotator (``build/annotate.cpp``): for each
haplotype-aware transcript copy, walk its path against the edge set of the
haplotype it was projected from; an edge absent from the haplotype is a
splice junction and increments the exon counter (``annotate.cpp:160-191``).

Here the membership test is vectorized: haplotype edges are packed into a
sorted uint64 array (``(src << 32) | dst``, as ``annotate.cpp:14,131``) and
each transcript's packed edge array is probed with one ``np.searchsorted``.
Exon numbers are then ``1 + cumsum(junction_mask)``.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Sequence, TextIO, Tuple

import numpy as np

from pantas_tpu.build.transcripts import Pantranscriptome, REF_HAP


def pack_edges(path: Sequence[int]) -> np.ndarray:
    arr = np.asarray(path, dtype=np.uint64)
    if arr.size < 2:
        return np.zeros(0, dtype=np.uint64)
    return (arr[:-1] << np.uint64(32)) | arr[1:]


def _member(sorted_edges: np.ndarray, probes: np.ndarray) -> np.ndarray:
    if probes.size == 0:
        return np.zeros(0, dtype=bool)
    idx = np.searchsorted(sorted_edges, probes)
    idx = np.minimum(idx, max(len(sorted_edges) - 1, 0))
    if sorted_edges.size == 0:
        return np.zeros(probes.shape, dtype=bool)
    return sorted_edges[idx] == probes


class Annotation:
    """Accumulated EX (per node) and JN (per edge) tag label lists."""

    def __init__(self) -> None:
        self.ex: Dict[int, List[str]] = {}
        self.jn: Dict[Tuple[int, int], List[str]] = {}

    def add_exon(self, nid: int, label: str) -> None:
        self.ex.setdefault(nid, []).append(label)

    def add_junction(self, edge: Tuple[int, int], label: str) -> None:
        self.jn.setdefault(edge, []).append(label)


def annotate(ptx: Pantranscriptome, log=sys.stderr) -> Annotation:
    ann = Annotation()

    # group copies by source haplotype; reference group first, then sorted
    groups: Dict[str, List[int]] = {}
    for ci, copy in enumerate(ptx.copies):
        groups.setdefault(copy.source_hap, []).append(ci)
    ordered = sorted(groups, key=lambda h: (h != REF_HAP, h))

    for hap in ordered:
        hap_edges = np.sort(pack_edges(ptx.hap_path(hap)))
        for ci in groups[hap]:
            copy = ptx.copies[ci]
            path = copy.path
            if not path:
                continue
            probes = pack_edges(path)
            on_hap = _member(hap_edges, probes)
            junction = ~on_hap
            # exon number of node k (k>=1) = 1 + junctions among first k edges
            exon_no = np.concatenate(([1], 1 + np.cumsum(junction)))
            ann.add_exon(path[0], f"{copy.name}.1")
            for k in range(len(path) - 1):
                en = int(exon_no[k + 1])
                if junction[k]:
                    ann.add_junction(
                        (path[k], path[k + 1]), f"{copy.name}.{en - 1}.{en}"
                    )
                ann.add_exon(path[k + 1], f"{copy.name}.{en}")
    return ann


def write_annotated_gfa(
    ptx: Pantranscriptome,
    ann: Annotation,
    out: TextIO,
    hp: int = 0,
    keep_nodes=None,
) -> None:
    """Emit the annotated GFA: H, S (ascending id), L (sorted), P lines.

    ``hp=1`` (aggressive mode) drops haplotype-aware transcript paths from
    the P section, keeping only reference-projected transcripts — matching
    the reference build's ``--add-ref-paths``-only mode
    (``build/build.smk:10-12,153``). Tags are unaffected.
    ``keep_nodes``: optional node-id set filter (reduce mode).
    """
    g = ptx.graph
    print("H\tVN:Z:1.1", file=out)

    def kept(nid: int) -> bool:
        return keep_nodes is None or nid in keep_nodes

    for nid in range(1, g.n_nodes() + 1):
        if not kept(nid):
            continue
        labels = ann.ex.get(nid)
        if labels:
            print(f"S\t{nid}\t{g.seq(nid)}\tEX:Z:{','.join(labels)}", file=out)
        else:
            print(f"S\t{nid}\t{g.seq(nid)}", file=out)

    for a, b in sorted(g.edges):
        if not (kept(a) and kept(b)):
            continue
        labels = ann.jn.get((a, b))
        if labels:
            print(f"L\t{a}\t+\t{b}\t+\t*\tJN:Z:{','.join(labels)}", file=out)
        else:
            print(f"L\t{a}\t+\t{b}\t+\t*", file=out)

    # reference path (possibly split into kept sub-paths), then transcripts
    if keep_nodes is None:
        _print_path(out, g.chrom, g.ref_path)
    else:
        sub: List[int] = []
        i = 0
        for nid in g.ref_path:
            if kept(nid):
                sub.append(nid)
            elif sub:
                _print_path(out, f"{g.chrom}.{i}", sub)
                i += 1
                sub = []
        if sub:
            _print_path(out, f"{g.chrom}.{i}", sub)

    for copy in ptx.copies:
        if hp == 1 and copy.source_hap != REF_HAP:
            continue
        if not copy.path:
            continue
        if keep_nodes is not None and not all(kept(n) for n in copy.path):
            continue
        _print_path(out, copy.name, copy.path)


def _print_path(out: TextIO, name: str, path: Sequence[int]) -> None:
    print(f"P\t{name}\t{','.join(str(n) + '+' for n in path)}\t*", file=out)
