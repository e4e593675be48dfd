"""3-homo RT-PCR scorer differential: byte-identical stdout vs the
reference ``exps/3-homo-real/workflow/scripts/compare.py``.

The reference script imports plotting deps (venn is stubbed via
tests/stubs) and prints raw Python sets, so both processes run under the
same PYTHONHASHSEED with MPLBACKEND=Agg; the figure it saves is ignored —
the scored stdout is the contract.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from conftest import REFERENCE, REPO_ROOT

REF_SCRIPT = REFERENCE / "exps/3-homo-real/workflow/scripts/compare.py"
STUBS = Path(__file__).parent / "stubs"

TRUTH = """POS\tchr1\t1001\t1100\tG1\t0.4
POS\tchr1\t2001\t2100\tG2\t-0.3
POS\tchr2\t3001\t3100\tG3\t0.15
POS\tchr2\t5001\t5100\tG5\t0.02
NEG\tchr1\t4001\t4100\tG4
NEG\tchr2\t6001\t6100\tG6
"""

# pantas quant-remap rows (20 cols): ES events keyed by skipped exon
# (end(i1)+1, start(i2)-1): chr1:1001-1100, chr1:2001-2100, chr1:4001-4100
PANTAS = "\n".join(
    [
        "etype,annotation_type,haplotype_type,chrom,gene,strand,junction1_name,"
        "junction2_name,junction3_name,junction1_nodes,junction2_nodes,"
        "junction3_nodes,junction1_positions,junction2_positions,"
        "junction3_positions,W1,W2,psi_c1,psi_c2,dpsi",
        "ES,annotated,reference,chr1,G1,+,T1.1.2,T1.2.3,T1.1.3,1>2,2>3,1>3,"
        "chr1:900-1000,chr1:1101-1200,chr1:900-1200,10,10,0.8,0.45,-0.35",
        "ES,annotated,reference,chr1,G2,+,T2.1.2,T2.2.3,T2.1.3,4>5,5>6,4>6,"
        "chr1:1900-2000,chr1:2101-2200,chr1:1900-2200,9,9,0.4,0.72,0.32",
        "ES,novel,reference,chr1,G4,+,T4.1.2,T4.2.3,T4.1.3,7>8,8>9,7>9,"
        "chr1:3900-4000,chr1:4101-4200,chr1:3900-4200,5,5,0.5,0.4,-0.1",
        "IR,annotated,reference,chr1,G1,+,T1.1,.,.,2,.,.,"
        "chr1:1001-1100,?,.,3,3,0.2,0.2,0.0",
    ]
) + "\n"

# rMATS SE.MATS.JC.txt (23 tab cols); exon 0-based start -> key s+1-e
def _rmats_row(idx, chrom, s0, e, pv, dincl):
    return "\t".join(
        [str(idx), '"G"', '"G"', chrom, "+", str(s0), str(e), "1", "2", "3",
         "4", str(idx), "10", "2", "11", "3", "100", "100", str(pv), str(pv),
         "0.8", "0.5", str(dincl)]
    )


RMATS = "\n".join(
    ["ID\tGeneID\tgeneSymbol\tchr\tstrand\texonStart_0base\texonEnd\t..."]
    + [
        _rmats_row(1, "chr1", 1000, 1100, 0.01, -0.38),
        _rmats_row(2, "chr1", 2000, 2100, 0.02, 0.3),
        _rmats_row(5, "chr2", 3000, 3100, 0.2, -0.2),
        _rmats_row(3, "chr1", 4000, 4100, 0.02, -0.15),
        _rmats_row(4, "chr2", 6000, 6100, 0.5, -0.01),
    ]
) + "\n"

# whippet .diff (11 tab cols), CE rows keyed by region
WHIPPET = "\n".join(
    [
        "Gene\tNode\tCoord\tStrand\tType\tPsi_A\tPsi_B\tDeltaPsi\t"
        "Probability\tComplexity\tEntropy",
        "G1\t2\tchr1:1001-1100\t+\tCE\t0.8\t0.44\t-0.36\t0.95\tK1\t0.1",
        "G2\t3\tchr1:2001-2100\t+\tCE\t0.4\t0.69\t0.29\t0.97\tK1\t0.2",
        "G3\t4\tchr2:3001-3100\t+\tCE\t0.6\t0.43\t-0.17\t0.5\tK1\t0.3",
        "G6\t5\tchr2:6001-6100\t+\tCE\t0.5\t0.48\t-0.02\t0.99\tK1\t0.1",
        "G1\t6\tchr1:1001-1100\t+\tAA\t0.5\t0.4\t-0.1\t0.9\tK1\t0.1",
    ]
) + "\n"

# SUPPA2 .dpsi: id \t dpsi \t pvalue, id = gene;SE:chrom:a-b:c-d:strand
SUPPA = "\n".join(
    [
        "dpsi\tpval",
        "G1;SE:chr1:950-1001:1100-1150:+\t0.41\t0.01",
        "G2;SE:1:1950-2001:2100-2150:+\t-0.28\t0.04",
        "G4;SE:chr1:3950-4001:4100-4150:+\t0.2\t0.01",
        "G5;SE:chr2:4950-5001:5100-5150:+\t0.01\t0.9",
    ]
) + "\n"


@pytest.fixture()
def inputs(tmp_path):
    paths = {}
    for name, text in [
        ("truth.tsv", TRUTH), ("pantas.csv", PANTAS), ("rmats.txt", RMATS),
        ("whippet.diff", WHIPPET), ("suppa.dpsi", SUPPA),
    ]:
        (tmp_path / name).write_text(text)
        paths[name.split(".")[0]] = str(tmp_path / name)
    return paths


def _run(cmd, cwd, extra_env=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO_ROOT}:{STUBS}"
    env["PYTHONHASHSEED"] = "0"
    env["MPLBACKEND"] = "Agg"
    if extra_env:
        env.update(extra_env)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return proc.stdout


@pytest.mark.parametrize(
    "flags",
    [[], ["--strict"], ["-d", "0.05"], ["--common"]],
    ids=["default", "strict", "delta", "common"],
)
def test_stdout_differential(tmp_path, inputs, flags):
    if not REF_SCRIPT.exists():
        pytest.skip("reference script unavailable")
    args = [inputs["truth"], inputs["pantas"], inputs["rmats"],
            inputs["whippet"], inputs["suppa"], *flags]
    ours = _run(
        [sys.executable, "-m", "pantas_tpu", "compare-rtpcr", *args], cwd=tmp_path
    )
    theirs = _run([sys.executable, str(REF_SCRIPT), *args], cwd=tmp_path)
    assert ours == theirs


def test_scoring_semantics(inputs):
    from pantas_tpu.eval.rtpcr import RtpcrOptions, run_compare
    import io

    res = run_compare(
        inputs["truth"], inputs["pantas"], inputs["rmats"],
        inputs["whippet"], inputs["suppa"],
        RtpcrOptions(strict=True), out=io.StringIO(),
    )
    # pantas TPs: G1 and G2 exons pass delta; the G4 row is a negative hit
    assert res["tp_sets"]["pantas"] == {"chr1:1001-1100", "chr1:2001-2100"}
    assert res["neg_sets"]["pantas"] == {"chr1:4001-4100"}
    # rMATS: chr2 row fails the strict p-value gate; whippet chr2 fails prob
    assert res["tp_sets"]["rMATS"] == {"chr1:1001-1100", "chr1:2001-2100"}
    assert res["tp_sets"]["whippet"] == {"chr1:1001-1100", "chr1:2001-2100"}
    # SUPPA2's G5 row fails both delta and p-value; G2 uses bare-number chrom
    assert res["tp_sets"]["SUPPA2"] == {"chr1:1001-1100", "chr1:2001-2100"}
