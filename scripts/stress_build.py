#!/usr/bin/env python3
"""Synthetic-scale build stress test: bigger-than-example inputs, no vg data
needed. Generates a random chromosome + SNP VCF + multi-exon GTF, runs the
full build, and reports stage timing — a guard against superlinear blowups.

Usage: python scripts/stress_build.py [mbp] [n_variants] [n_genes] [n_samples]
"""

import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

MBP = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
N_VAR = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
N_GENES = int(sys.argv[3]) if len(sys.argv) > 3 else 400
N_SAMPLES = int(sys.argv[4]) if len(sys.argv) > 4 else 20


def main():
    import tempfile

    rng = random.Random(11)
    L = int(MBP * 1e6)
    wd = Path(tempfile.mkdtemp(prefix="stress_"))
    print(f"[stress] generating {MBP} Mbp, {N_VAR} variants, {N_GENES} genes, "
          f"{N_SAMPLES} samples -> {wd}", file=sys.stderr)

    seq = "".join(rng.choice("ACGT") for _ in range(L))
    (wd / "g.fa").write_text(">chrS\n" + "\n".join(
        seq[i : i + 80] for i in range(0, L, 80)
    ) + "\n")

    # genes: 5 exons of 200bp separated by 300bp introns, spaced evenly
    gtf = []
    span = L // (N_GENES + 1)
    for gi in range(N_GENES):
        gstart = span * (gi + 1)
        exons = [(gstart + k * 500 + 1, gstart + k * 500 + 200) for k in range(5)]
        for t in (1, 2):
            tid = f"T{gi}_{t}"
            ex = exons if t == 1 else exons[:2] + exons[3:]  # isoform 2 skips exon 3
            gtf.append("\t".join(
                ["chrS", "s", "transcript", str(ex[0][0]), str(ex[-1][1]), ".", "+",
                 ".", f'gene_id "G{gi}"; transcript_id "{tid}";']))
            for s, e in ex:
                gtf.append("\t".join(
                    ["chrS", "s", "exon", str(s), str(e), ".", "+", ".",
                     f'gene_id "G{gi}"; transcript_id "{tid}";']))
    (wd / "g.gtf").write_text("\n".join(gtf) + "\n")

    positions = sorted(rng.sample(range(1, L + 1), N_VAR))
    rows = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"s{i}" for i in range(N_SAMPLES))]
    for vi, pos in enumerate(positions):
        ref = seq[pos - 1]
        alt = rng.choice([b for b in "ACGT" if b != ref])
        gts = "\t".join(
            f"{rng.random() < 0.15 and 1 or 0}|{rng.random() < 0.15 and 1 or 0}"
            for _ in range(N_SAMPLES)
        )
        rows.append(f"chrS\t{pos}\tv{vi}\t{ref}\t{alt}\t.\t.\t.\tGT\t{gts}")
    (wd / "g.vcf").write_text("\n".join(rows) + "\n")

    from pantas_tpu.build.pipeline import build_pangenome

    t0 = time.time()
    out = build_pangenome(str(wd / "g.fa"), str(wd / "g.gtf"), str(wd / "g.vcf"),
                          str(wd / "out"), threads=1)
    dt = time.time() - t0
    n_s = sum(1 for line in open(out) if line[0] == "S")
    n_p = sum(1 for line in open(out) if line[0] == "P")
    print(f"[stress] build: {dt:.1f}s — {n_s} nodes, {n_p} paths "
          f"({MBP / dt:.2f} Mbp/s)", file=sys.stderr)
    print(f'{{"mbp": {MBP}, "build_s": {dt:.1f}, "nodes": {n_s}, "paths": {n_p}}}')


if __name__ == "__main__":
    main()
