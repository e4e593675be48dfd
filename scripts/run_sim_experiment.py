#!/usr/bin/env python3
"""Simulation experiment with the held-out-sample VCF protocol.

The native equivalent of the reference's ``exps/1-dm-sim`` workflow
(``rules/pantas.smk:1-10`` + ``Snakefile:83-108``):

1. build the held-out sample's SNP consensus genome (its haplotype is what
   reads will be simulated from — the graph must NOT contain it);
2. simulate two conditions of AS-event reads on the consensus
   (ES/IR/A3/A5/CE, ΔPSI ≈ 0.5 signal) + both truth channels;
3. run the full pipeline via the experiment driver with the sample's
   genotypes EXCLUDED from the graph build;
4. score P/R/F1 against the truth at coverage cuts {1,3,5,10,20}.

Usage: python scripts/run_sim_experiment.py [workdir] [sample] [n_events]
Writes the accuracy table to stdout (markdown) and scores under workdir.
"""

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

EXAMPLE = Path("/root/reference/example")

WD = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / ".bench" / "simexp"
SAMPLE = sys.argv[2] if len(sys.argv) > 2 else "DGRP-021"
N_EVENTS = int(sys.argv[3]) if len(sys.argv) > 3 else 16
DEPTH = int(sys.argv[4]) if len(sys.argv) > 4 else 30


def main():
    WD.mkdir(parents=True, exist_ok=True)

    # 1. held-out sample consensus (SNPs, hap 1)
    from pantas_tpu.io.fasta import read_fasta
    from pantas_tpu.io.vcf import consensus_snps

    cons_fa = WD / "consensus.fa"
    if not cons_fa.exists():
        ref = read_fasta(str(EXAMPLE / "4.fa"))
        cons = consensus_snps(ref, str(EXAMPLE / "4.vcf.gz"), SAMPLE, hap=1)
        with open(cons_fa, "w") as fh:
            for chrom, seq in cons.items():
                fh.write(f">{chrom}\n")
                for i in range(0, len(seq), 80):
                    fh.write(seq[i : i + 80] + "\n")
        print(f"[simexp] consensus of {SAMPLE} hap1 -> {cons_fa}", file=sys.stderr)

    # 2. simulate on the consensus
    from pantas_tpu.eval.simulate import simulate

    prefix = WD / "sim"
    if not (WD / "sim_truth.csv").exists():
        simulate(
            str(cons_fa), str(EXAMPLE / "4.gtf"), str(prefix),
            n_events=N_EVENTS, reads_per_isoform=DEPTH,
            etypes=("ES", "IR", "A3", "A5", "CE"),
        )

    # 3+4. experiment driver with the sample excluded from the build
    cfg = {
        "fa": str(EXAMPLE / "4.fa"),
        "gtf": str(EXAMPLE / "4.gtf"),
        "vcf": str(EXAMPLE / "4.vcf.gz"),
        "workdir": str(WD / "run"),
        "build": {"hp": 0, "exclude_sample": SAMPLE},
        "conditions": {
            "c1": [[f"{prefix}_c1_1.fq", f"{prefix}_c1_2.fq"]],
            "c2": [[f"{prefix}_c2_1.fq", f"{prefix}_c2_2.fq"]],
        },
        "call": {"w": 3, "novel": True, "minintronsize": 20},
        "quant": {"all": True},
        "remap": {"min_intron_size": 20},
        "eval": {
            "truth": f"{prefix}_truth.csv",
            "min_dpsi": 0.05,
            "relax": 5,
            "cuts": [1, 3, 5, 10, 20],
        },
        "threads": 2,
    }
    cfg_path = WD / "exp.json"
    cfg_path.write_text(json.dumps(cfg, indent=2))

    from pantas_tpu.experiment import run_experiment

    result = run_experiment(str(cfg_path))

    # markdown accuracy table
    rows = [l.strip("\n").split(",") for l in open(result["scores_by_cut_csv"])][1:]
    print(f"\n### Sim accuracy (held-out sample {SAMPLE}, {N_EVENTS} events)\n")
    print("| cut | etype | TP | FP | FN | precision | recall | F1 |")
    print("|---|---|---|---|---|---|---|---|")
    for cut, etype, tp, fp, fn, p, r, f1 in rows:
        if etype in ("ES", "CE", "IR", "A3", "A5", "ALL"):
            print(f"| {cut} | {etype} | {tp} | {fp} | {fn} | {p} | {r} | {f1} |")

    score_novel_sites(WD, prefix)


def score_novel_sites(wd, prefix, tol=3):
    """Intra-node splice-site recovery (the ``novel-sites`` extension).

    Truth = every novel-junction endpoint the simulated A3/A5/CE events
    create at positions with NO node boundary in the graph: the shifted
    A3/A5 site, and all four endpoints of a cassette exon's two novel
    junctions. The compat pipeline (ours and the reference design alike)
    has structural recall 0 on these — see docs/SIM_ACCURACY.md.
    """
    import csv

    from pantas_tpu.events.sites import detect_novel_sites

    truth = []
    for row in csv.DictReader(open(f"{prefix}_truth.csv")):
        et = row["etype"]
        if et in ("A3", "A5"):
            c1s, c1e = map(int, row["region1"].split(":")[1].split("-"))
            c2s, c2e = map(int, row["region2"].split(":")[1].split("-"))
            if c1s != c2s:
                truth.append((et, "end", min(c1s, c2s) - 1))
            if c1e != c2e:
                truth.append((et, "start", max(c1e, c2e) + 1))
        elif et == "CE":
            i_s, i_e = map(int, row["region1"].split(":")[1].split("-"))
            s, e = map(int, row["region2"].split(":")[1].split("-"))
            truth += [(et, "end", i_s - 1), (et, "start", s),
                      (et, "end", e), (et, "start", i_e + 1)]
    if not truth:
        return

    gfa = wd / "run" / "pantranscriptome-annotated.gfa"
    det = []
    for gaf in sorted((wd / "run").glob("c*_r*.gaf")):
        for r in detect_novel_sites(str(gaf), str(gfa), w=3):
            f = r.split(",")
            if f[1].isdigit():
                det.append((f[2], int(f[1])))

    hits = sum(
        any(s == side and abs(p - pos) <= tol for s, p in det)
        for _, side, pos in truth
    )
    tp = sum(
        any(side == s and abs(pos - p) <= tol for _, side, pos in truth)
        for s, p in det
    )
    print(f"\n### Intra-node novel splice sites (novel-sites, w=3, tol ±{tol})\n")
    print(f"truth sites {len(truth)} | detected {len(det)} | "
          f"site recall {hits}/{len(truth)} = {hits / len(truth):.2f} | "
          f"precision {tp}/{len(det) or 1} = {tp / (len(det) or 1):.2f} "
          f"(compat pipeline + reference design: structural recall 0)")

    # event-level: classify sites into A3/A5 by gene strand and score
    # against the shifted-site truth per (etype, gene)
    from pantas_tpu.events.sites import classify_sites

    etruth = {}
    for row in csv.DictReader(open(f"{prefix}_truth.csv")):
        et = row["etype"]
        if et not in ("A3", "A5"):
            continue
        c1s, c1e = map(int, row["region1"].split(":")[1].split("-"))
        c2s, c2e = map(int, row["region2"].split(":")[1].split("-"))
        pos = (min(c1s, c2s) - 1) if c1s != c2s else (max(c1e, c2e) + 1)
        etruth[(et, row["gene"])] = pos

    import json as _json

    events = []
    cfg_path = wd / "exp.json"
    gtf = _json.loads(cfg_path.read_text())["gtf"] if cfg_path.exists() else None
    if gtf:
        for gaf in sorted((wd / "run").glob("c*_r*.gaf")):
            rows = detect_novel_sites(str(gaf), str(gfa), w=3)
            events += [e.split(",") for e in classify_sites(rows, gtf)]
        ehits = sum(
            any(e[0] == et and e[3] == gene and abs(int(e[5]) - pos) <= tol
                for e in events)
            for (et, gene), pos in etruth.items()
        )
        print(f"event-level A3/A5 (novel-sites --events): recall "
              f"{ehits}/{len(etruth)} = {ehits / (len(etruth) or 1):.2f}")


if __name__ == "__main__":
    main()
