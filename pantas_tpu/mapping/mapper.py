"""Path-guided seed-and-extend read mapper producing GAF.

Strategy: RNA reads come from transcripts (possibly with retained introns),
so the annotated pangenome's embedded paths — reference-projected
transcripts (``*_R1``) plus the reference chromosome path — are the
alignment targets. Each path's sequence is k-mer indexed; reads vote for a
(path, diagonal), the best diagonal is verified by Hamming comparison
(haplotype SNPs and sequencing errors appear as substitutions), and the
alignment is projected back to the node walk with a cs-CIGAR.

Output GAF is consumable by the augment stage (and by the reference
augmenter): oriented path, path-interval coordinates, mapq, ``cs:Z:`` and
``dv:f:`` tags, matching the conventions of ``vg mpmap -F GAF``.
"""

from __future__ import annotations

import sys
from bisect import bisect_right
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

from pantas_tpu.io.fasta import revcomp
from pantas_tpu.io.gfa import Gfa


@dataclass
class PathRecord:
    name: str
    nodes: List[str]
    offsets: List[int]  # cumulative start offset of each node
    seq: str


class PathIndex:
    """k-mer index over selected embedded paths of a GFA."""

    def __init__(self, gfa: Gfa, k: int = 21, max_hits: int = 64, ref_transcripts_only: bool = True):
        self.k = k
        self.paths: List[PathRecord] = []
        self.kmers: Dict[str, List[Tuple[int, int]]] = {}
        self._overflow: set = set()

        for p in gfa.paths:
            if ref_transcripts_only and not (
                p.name.split("_")[-1].startswith("R") or "_" not in p.name
            ):
                continue
            nodes = [sid for sid, _ in p.steps]
            seqs = [gfa.segment(sid).seq for sid in nodes]
            offsets = []
            total = 0
            for s in seqs:
                offsets.append(total)
                total += len(s)
            rec = PathRecord(p.name, nodes, offsets, "".join(seqs))
            self.paths.append(rec)

        for pi, rec in enumerate(self.paths):
            seq = rec.seq
            for i in range(0, len(seq) - k + 1):
                km = seq[i : i + k]
                if km in self._overflow:
                    continue
                hits = self.kmers.setdefault(km, [])
                if len(hits) >= max_hits:
                    self._overflow.add(km)
                    del self.kmers[km]
                    continue
                hits.append((pi, i))

    def seed(self, read: str) -> Dict[Tuple[int, int], int]:
        """Vote for (path, diagonal) across a few read offsets."""
        k = self.k
        L = len(read)
        votes: Dict[Tuple[int, int], int] = {}
        offs = sorted({0, L // 4, L // 2, (3 * L) // 4, L - k})
        for q in offs:
            if q < 0 or q + k > L:
                continue
            for pi, pos in self.kmers.get(read[q : q + k], ()):
                key = (pi, pos - q)
                votes[key] = votes.get(key, 0) + 1
        return votes


@dataclass
class Alignment:
    path_idx: int
    pstart: int  # on forward path
    pend: int
    reverse: bool
    mismatches: int
    clipped_head: int  # read bases clipped (off path ends)
    clipped_tail: int
    ops: List[Tuple[str, object]]  # (':', n) or ('*', 'xy')


def _hamming_extend(read: str, pseq: str, diag: int) -> Optional[Alignment]:
    """Compare read to path at a diagonal, clipping at path ends."""
    L = len(read)
    qstart = max(0, -diag)
    pstart = diag + qstart
    usable = min(L - qstart, len(pseq) - pstart)
    if usable <= 0:
        return None
    ops: List[Tuple[str, object]] = []
    mism = 0
    run = 0
    for i in range(usable):
        if read[qstart + i] == pseq[pstart + i]:
            run += 1
        else:
            if run:
                ops.append((":", run))
                run = 0
            mism += 1
            ops.append(("*", pseq[pstart + i].lower() + read[qstart + i].lower()))
    if run:
        ops.append((":", run))
    return Alignment(
        path_idx=-1,
        pstart=pstart,
        pend=pstart + usable,
        reverse=False,
        mismatches=mism,
        clipped_head=qstart,
        clipped_tail=L - qstart - usable,
        ops=ops,
    )


def align_read(
    index: PathIndex, read: str, max_mismatch_frac: float = 0.08
) -> Optional[Alignment]:
    """Best alignment of the read (either strand) or None."""
    best: Optional[Alignment] = None
    for reverse, seq in ((False, read), (True, revcomp(read))):
        votes = index.seed(seq)
        if not votes:
            continue
        # try the top few diagonals
        top = sorted(votes.items(), key=lambda kv: -kv[1])[:4]
        for (pi, diag), _ in top:
            aln = _hamming_extend(seq, index.paths[pi].seq, diag)
            if aln is None:
                continue
            aln.path_idx = pi
            aln.reverse = reverse
            span = aln.pend - aln.pstart
            if span < len(read) // 2:
                continue
            if aln.mismatches > max_mismatch_frac * span:
                continue
            if (
                best is None
                or (aln.mismatches + aln.clipped_head + aln.clipped_tail)
                < (best.mismatches + best.clipped_head + best.clipped_tail)
            ):
                best = aln
    return best


def _cs_string(ops: List[Tuple[str, object]]) -> str:
    parts = []
    for op, v in ops:
        if op == ":":
            parts.append(f":{v}")
        else:
            parts.append(f"*{v}")
    return "".join(parts)


def alignment_to_gaf(
    index: PathIndex, name: str, read: str, aln: Alignment
) -> str:
    rec = index.paths[aln.path_idx]
    plen = len(rec.seq)
    # nodes covering [pstart, pend) on the forward path
    i0 = bisect_right(rec.offsets, aln.pstart) - 1
    i1 = bisect_right(rec.offsets, aln.pend - 1) - 1
    nodes = rec.nodes[i0 : i1 + 1]
    walk_start = aln.pstart - rec.offsets[i0]
    walk_end_off = rec.offsets[i1 + 1] if i1 + 1 < len(rec.offsets) else plen
    walk_len = walk_end_off - rec.offsets[i0]

    if not aln.reverse:
        path_str = ">" + ">".join(nodes)
        pstart = walk_start
        pend = pstart + (aln.pend - aln.pstart)
        cs = _cs_string(aln.ops)
    else:
        # oriented path lists nodes reversed; coordinates flip within the walk
        path_str = "<" + "<".join(reversed(nodes))
        pend_on_walk = walk_start + (aln.pend - aln.pstart)
        pstart = walk_len - pend_on_walk
        pend = walk_len - walk_start
        # ops along the oriented walk: reversed, bases complemented
        cs_ops = []
        for op, v in reversed(aln.ops):
            if op == ":":
                cs_ops.append((op, v))
            else:
                cs_ops.append((op, revcomp(v[0]) + revcomp(v[1])))
        cs = _cs_string(cs_ops)

    L = len(read)
    span = aln.pend - aln.pstart
    matches = span - aln.mismatches
    dv = round(1.0 - (matches / span), 6) if span else 1.0
    qstart = aln.clipped_head
    qend = L - aln.clipped_tail
    return "\t".join(
        map(
            str,
            [
                name,
                L,
                qstart,
                qend,
                "+",
                path_str,
                walk_len,
                pstart,
                pend - 1,
                matches,
                span,
                60,
                "AS:i:" + str(matches),
                f"dv:f:{dv}",
                f"cs:Z:{cs}",
            ],
        )
    )


def iter_fastq(path: str) -> Iterator[Tuple[str, str]]:
    with open(path) as fh:
        while True:
            h = fh.readline()
            if not h:
                return
            seq = fh.readline().strip()
            fh.readline()
            fh.readline()
            yield h[1:].strip().split()[0], seq


def map_reads(
    gfa_path: str,
    fq1: str,
    fq2: Optional[str] = None,
    k: int = 21,
    out=sys.stdout,
    log=sys.stderr,
) -> Tuple[int, int]:
    """Map reads; returns (mapped, total)."""
    print("[map] loading graph & indexing paths..", file=log)
    gfa = Gfa.load(gfa_path)
    index = PathIndex(gfa, k=k)
    print(
        f"[map] indexed {len(index.paths)} paths, {len(index.kmers)} kmers",
        file=log,
    )
    mapped = total = 0
    streams = [iter_fastq(fq1)]
    if fq2:
        streams.append(iter_fastq(fq2))
    for stream in streams:
        for name, seq in stream:
            total += 1
            aln = align_read(index, seq)
            if aln is None:
                print(
                    "\t".join(
                        map(str, [name, len(seq), 0, 0, "+", "*", 0, 0, 0, 0, 0, 0])
                    ),
                    file=out,
                )
                continue
            mapped += 1
            print(alignment_to_gaf(index, name, seq, aln), file=out)
    print(f"[map] mapped {mapped}/{total} reads", file=log)
    return mapped, total
