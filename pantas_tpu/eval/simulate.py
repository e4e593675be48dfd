"""Alternative-splicing read simulator with ground truth.

Native replacement for the reference's ASimulatoR-based simulation
(``exps/1-dm-sim/workflow/rules/simulation.smk``): pick multi-exon
transcripts, derive event isoforms —

* ``es``  — skip an internal exon,
* ``ir``  — retain an intron,
* ``a3``  — alternative acceptor (exon start shifted into the intron),
* ``a5``  — alternative donor (exon end shifted into the intron),

— then sample paired-end reads from base isoforms (condition 1) and event
isoforms (condition 2), with read names carrying provenance in the
example-fixture style (``read{i}/{gene}_{kind};mate1:{s}-{e};...``,
see ``example/reads_1.fq``). Truth rows record the event's defining
linear regions for the comparator.
"""

from __future__ import annotations

import random
import sys
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from pantas_tpu.io.fasta import read_fasta, revcomp
from pantas_tpu.io.gtf import Transcript, parse_transcript_models

TRUTH_HEADER = "etype,gene,transcript,chrom,strand,region1,region2,region3"


@dataclass
class SimEvent:
    etype: str  # ES / IR / A3 / A5
    gene: str
    tid: str
    chrom: str
    strand: str
    regions: List[str]  # defining linear regions "chrom:s-e"
    base_seq: str = ""
    event_seq: str = ""

    def truth_row(self) -> str:
        regs = (self.regions + [".", ".", "."])[:3]
        return ",".join(
            [self.etype, self.gene, self.tid, self.chrom, self.strand] + regs
        )


def spliced_seq(ref: str, exons: Sequence[Tuple[int, int]]) -> str:
    return "".join(ref[s - 1 : e] for s, e in exons)


def _intron(chrom: str, left: Tuple[int, int], right: Tuple[int, int]) -> str:
    return f"{chrom}:{left[1] + 1}-{right[0] - 1}"


def make_event(
    ref: str, tr: Transcript, etype: str, shift: int = 12
) -> Optional[SimEvent]:
    """Derive one event isoform from a transcript, or None if not applicable."""
    ex = tr.exons
    chrom = tr.chrom
    if etype == "ES" and len(ex) >= 3:
        k = len(ex) // 2
        new_exons = ex[:k] + ex[k + 1 :]
        regions = [
            _intron(chrom, ex[k - 1], ex[k + 1]),  # skip junction
            _intron(chrom, ex[k - 1], ex[k]),  # inclusion 1
            _intron(chrom, ex[k], ex[k + 1]),  # inclusion 2
        ]
    elif etype == "IR" and len(ex) >= 2:
        k = len(ex) // 2 - 1
        merged = (ex[k][0], ex[k + 1][1])
        new_exons = ex[:k] + [merged] + ex[k + 2 :]
        regions = [_intron(chrom, ex[k], ex[k + 1])]  # retained intron
    elif etype == "A3" and len(ex) >= 2:
        # alternative acceptor: shift the start of an internal exon
        k = len(ex) // 2
        s, e = ex[k]
        gap = s - ex[k - 1][1] - 1
        if gap <= shift + 2 or e - s <= shift + 2:
            return None
        new_start = s - shift if tr.strand == "+" else s + shift
        if new_start <= ex[k - 1][1] + 1 or new_start >= e:
            return None
        new_exons = ex[:k] + [(new_start, e)] + ex[k + 1 :]
        regions = [
            f"{chrom}:{ex[k - 1][1] + 1}-{new_start - 1}",  # novel intron
            _intron(chrom, ex[k - 1], ex[k]),  # canonic intron
        ]
    elif etype == "A5" and len(ex) >= 2:
        # alternative donor: shift the end of an internal exon
        k = len(ex) // 2 - 1
        s, e = ex[k]
        gap = ex[k + 1][0] - e - 1
        if gap <= shift + 2 or e - s <= shift + 2:
            return None
        new_end = e + shift if tr.strand == "+" else e - shift
        if new_end >= ex[k + 1][0] - 1 or new_end <= s:
            return None
        new_exons = ex[:k] + [(s, new_end)] + ex[k + 1 :]
        regions = [
            f"{chrom}:{new_end + 1}-{ex[k + 1][0] - 1}",  # novel intron
            _intron(chrom, ex[k], ex[k + 1]),  # canonic intron
        ]
    else:
        return None

    base = spliced_seq(ref, ex)
    event = spliced_seq(ref, new_exons)
    if min(len(base), len(event)) < 400 or len(base) > 3000:
        return None
    return SimEvent(
        etype=etype,
        gene=tr.gene,
        tid=tr.tid,
        chrom=chrom,
        strand=tr.strand,
        regions=regions,
        base_seq=base,
        event_seq=event,
    )


def _mutate(seq: str, rng: random.Random, error_rate: float) -> str:
    if error_rate <= 0:
        return seq
    out = list(seq)
    for i in range(len(out)):
        if rng.random() < error_rate:
            out[i] = rng.choice("ACGT".replace(out[i].upper(), "") or "ACGT")
    return "".join(out)


def _sample_pairs(
    name_prefix: str,
    template: str,
    n_pairs: int,
    rng: random.Random,
    read_len: int,
    frag_len: int,
    error_rate: float,
    fq1: List[str],
    fq2: List[str],
    counter: List[int],
) -> None:
    L = len(template)
    frag = min(frag_len, L)
    for _ in range(n_pairs):
        start = rng.randrange(0, L - frag + 1)
        fragment = template[start : start + frag]
        m1 = fragment[:read_len]
        m2 = revcomp(fragment[-read_len:])
        i = counter[0]
        counter[0] += 1
        name = (
            f"read{i}/{name_prefix};"
            f"mate1:{start}-{start + read_len - 1};"
            f"mate2:{start + frag - read_len}-{start + frag - 1}"
        )
        fq1.append(f"@{name}\n{_mutate(m1, rng, error_rate)}\n+\n{'I' * len(m1)}")
        fq2.append(f"@{name}\n{_mutate(m2, rng, error_rate)}\n+\n{'I' * len(m2)}")


def simulate(
    fa_path: str,
    gtf_path: str,
    out_prefix: str,
    n_events: int = 8,
    reads_per_isoform: int = 60,
    read_len: int = 150,
    frag_len: int = 300,
    error_rate: float = 0.001,
    seed: int = 7,
    etypes: Sequence[str] = ("ES", "IR", "A3", "A5"),
    log=sys.stderr,
) -> List[SimEvent]:
    """Write {prefix}_c{1,2}_{1,2}.fq + {prefix}_truth.csv; return events.

    Condition 1 reads come from base isoforms only; condition 2 reads are a
    50/50 mix of base + event isoform (ΔPSI signal ≈ 0.5).
    """
    ref_by_chrom = read_fasta(fa_path)
    models = parse_transcript_models(gtf_path)

    # deterministic transcript ordering, one event per gene, round-robin types
    events: List[SimEvent] = []
    used_genes = set()
    rng = random.Random(seed)
    tids = sorted(models)
    ti = 0
    for tid in tids:
        if len(events) >= n_events:
            break
        tr = models[tid]
        if tr.gene in used_genes or tr.chrom not in ref_by_chrom:
            continue
        etype = etypes[ti % len(etypes)]
        ev = make_event(ref_by_chrom[tr.chrom], tr, etype)
        if ev is None:
            continue
        ti += 1
        used_genes.add(tr.gene)
        events.append(ev)

    fqs = {("c1", 1): [], ("c1", 2): [], ("c2", 1): [], ("c2", 2): []}
    counter = [0]
    # reads_per_isoform is interpreted as target DEPTH: pair counts scale
    # with template length so junction coverage is length-independent
    def n_pairs(template: str, depth: float) -> int:
        return max(8, int(depth * len(template) / (2 * read_len)))

    for ev in events:
        prefix = f"{ev.gene}_{ev.etype.lower()}"
        _sample_pairs(
            f"{prefix}_base", ev.base_seq, n_pairs(ev.base_seq, reads_per_isoform),
            rng, read_len, frag_len, error_rate,
            fqs[("c1", 1)], fqs[("c1", 2)], counter,
        )
        _sample_pairs(
            f"{prefix}_base", ev.base_seq,
            n_pairs(ev.base_seq, reads_per_isoform / 2),
            rng, read_len, frag_len, error_rate,
            fqs[("c2", 1)], fqs[("c2", 2)], counter,
        )
        _sample_pairs(
            f"{prefix}_event", ev.event_seq,
            n_pairs(ev.event_seq, reads_per_isoform / 2),
            rng, read_len, frag_len, error_rate,
            fqs[("c2", 1)], fqs[("c2", 2)], counter,
        )

    paths = {}
    for (cond, mate), recs in fqs.items():
        p = f"{out_prefix}_{cond}_{mate}.fq"
        with open(p, "w") as fh:
            fh.write("\n".join(recs) + ("\n" if recs else ""))
        paths[(cond, mate)] = p
    truth_path = f"{out_prefix}_truth.csv"
    with open(truth_path, "w") as fh:
        fh.write(TRUTH_HEADER + "\n")
        for ev in events:
            fh.write(ev.truth_row() + "\n")
    print(
        f"[simulate] {len(events)} events, {counter[0]} read pairs -> {out_prefix}_*",
        file=log,
    )
    return events
