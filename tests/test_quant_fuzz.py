"""Seeded randomized quant differential: random per-replicate event CSVs
(every etype, annotated/novel, '?'/'|' transcript forms, zero coverages,
replicate dropouts and one-sided conditions) through the reference
quantify.py vs ours, byte-identical in all three flag modes."""

import os
import random
import subprocess
import sys
from pathlib import Path

import pytest

from fixtures_quant import HEADER

REPO = Path(__file__).resolve().parent.parent

TPOOL = [
    "TA_R1.1.2", "TB_R1.1.2", "TC_R1.1.2",
    "TE_R1.2.3", "TX_R1.1.2", "TY_R1.1.2",
]


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def _rand_event(rng: random.Random):
    """An event identity: everything but the coverages."""
    etype = rng.choice(["ES", "CE", "IR", "A3", "A5"])
    anno = rng.choice(["annotated", "novel"])
    chrom, gene, strand = rng.choice([("chr1", "G1", "+"), ("chr2", "G2", "-")])

    def t():
        if anno == "novel" and rng.random() < 0.5:
            return "?"
        return "|".join(rng.sample(TPOOL, rng.randint(1, 2)))

    def nodes(n):
        a = rng.randint(1, 9)
        out = [a]
        for _ in range(n - 1):
            a += rng.randint(1, 3)
            out.append(a)
        return ">".join(str(v) for v in out)

    three = etype in ("ES", "CE")
    return {
        "etype": etype,
        "anno": anno,
        "chrom": chrom,
        "gene": gene,
        "strand": strand,
        "t": [t(), t(), t() if three else "."],
        "n": [nodes(2), nodes(rng.randint(1, 4)), nodes(2) if three else "."],
        "three": three,
    }


def _row(ev, rng: random.Random) -> str:
    covs = [str(rng.randint(0, 9)) for _ in range(3)]
    if not ev["three"]:
        covs[2] = "."
    cells = [ev["etype"], ev["anno"], ev["chrom"], ev["gene"], ev["strand"],
             *ev["t"]]
    for n, c in zip(ev["n"], covs):
        cells += [n, c]
    return ",".join(cells)


def _write_replicates(tmp_path, seed: int):
    rng = random.Random(seed)
    events = [_rand_event(rng) for _ in range(12)]
    paths = {}
    for cond in ("c1", "c2"):
        paths[cond] = []
        for rep in (1, 2):
            rows = [HEADER]
            for ev in events:
                if rng.random() < 0.2:  # replicate/condition dropout
                    continue
                rows.append(_row(ev, rng))
            p = tmp_path / f"{cond}_r{rep}.csv"
            p.write_text("\n".join(rows) + "\n")
            paths[cond].append(str(p))
    return paths["c1"], paths["c2"]


def test_remap_fuzz_matches_reference(tmp_path, reference_scripts):
    # chain: fuzzed replicates -> reference quant -> both remaps
    from fixtures_quant import REMAP_GTF

    gtf = tmp_path / "genes.gtf"
    gtf.write_text(REMAP_GTF)
    for seed in range(4):
        c1, c2 = _write_replicates(tmp_path, seed)
        quant_csv = tmp_path / f"quant{seed}.csv"
        quant_csv.write_text(_run(
            [sys.executable, str(reference_scripts / "quantify.py"),
             "--c1", *c1, "--c2", *c2]
        ))
        theirs = _run(
            [sys.executable, str(reference_scripts / "remap.py"),
             str(quant_csv), str(gtf)]
        )
        ours = _run(
            [sys.executable, "-m", "pantas_tpu", "remap",
             str(quant_csv), str(gtf)]
        )
        assert ours == theirs, f"seed {seed}"


@pytest.mark.parametrize(
    "ref_mode,our_mode",
    [([], ["-a"]), (["--both"], []), (["-w", "3"], ["-a", "-w", "3"])],
    ids=["all", "both", "w3"],
)
def test_quant_fuzz_matches_reference(tmp_path, reference_scripts, ref_mode, our_mode):
    for seed in range(4):
        c1, c2 = _write_replicates(tmp_path, seed * 7 + len(ref_mode))
        theirs = _run(
            [sys.executable, str(reference_scripts / "quantify.py"),
             *ref_mode, "--c1", *c1, "--c2", *c2]
        )
        ours = _run(
            [sys.executable, "-m", "pantas_tpu", "quant",
             *our_mode, "--c1", *c1, "--c2", *c2]
        )
        assert ours == theirs, f"seed {seed}"
