"""Multi-tool comparator: stdout byte-identical to the reference's
cmp_pantas.py (exps/1-dm-sim) on the same truth/pantas/rMATS/Whippet/SUPPA2
inputs."""

import subprocess
import sys

from conftest import REFERENCE, run_cli

CMP_REF = REFERENCE / "exps" / "1-dm-sim" / "scripts" / "cmp_pantas.py"


def _pantas_row(etype, gene, j1, j2, j3, psi1, psi2, dpsi, htype="reference"):
    return ",".join(
        [etype, "annotated", htype, "c", gene, "+", "n1", "n2", "n3",
         "x", "x", "x", j1, j2, j3, "5", "5", str(psi1), str(psi2), str(dpsi)]
    )


def _fixture(tmp_path):
    truth = tmp_path / "truth.csv"
    truth.write_text(
        "\n".join(
            [
                # ES matched by pantas + SUPPA2
                "ES,c,G1,+,c:100-200,c:300-400,c:100-400,10/10/10,10/10/10,0.9,0.2",
                # A3 matched by rMATS only
                "A3,c,G1,+,c:500-600,c:500-650,.,10/10/10,10/10/10,0.9,0.1",
                # IR matched by Whippet only
                "IR,c,G1,+,c:700-800,c:650-850,.,10/10/10,10/10/10,0.9,0.1",
                # A5 unmatched -> FN everywhere
                "A5,c,G2,+,c:900-980,c:900-999,.,10/10/10,10/10/10,0.8,0.1",
                # below the -c coverage cut -> ignored
                "ES,c,G3,+,c:10-20,c:30-40,c:10-40,1/1/1,1/1/1,0.9,0.1",
                # below min dpsi -> dropped at parse
                "A3,c,G3,+,c:50-60,c:50-70,.,10/10/10,10/10/10,0.5,0.49",
            ]
        )
        + "\n"
    )
    pantas = tmp_path / "pantas.csv"
    pantas.write_text(
        "etype,annotation_type,haplotype_type,chrom,gene,strand,junction1_name,"
        "junction2_name,junction3_name,junction1_nodes,junction2_nodes,"
        "junction3_nodes,junction1_positions,junction2_positions,"
        "junction3_positions,W1,W2,psi_c1,psi_c2,dpsi\n"
        + "\n".join(
            [
                _pantas_row("ES", "G1", "c:101-199", "c:301-399", "c:101-399",
                            0.8, 0.1, 0.7),
                # haplotype rows are skipped (cmp_pantas.py:56-57)
                _pantas_row("ES", "G9", "c:1-2", "c:3-4", "c:1-4",
                            0.8, 0.1, 0.7, htype="haplotype"),
                # FP: no truth event here
                _pantas_row("A3", "G1", "c:520-610", "c:520-640", ".",
                            0.7, 0.1, 0.6),
            ]
        )
        + "\n"
    )
    rmats = tmp_path / "rmats.csv"
    rmats.write_text(
        # rMATS roles are mirrored: j1 = event, j2 = canonic
        "A3,anno,c,G1,+,c:501-649,c:501-599,.,0,0,0.9,0.1,0.8\n"
    )
    whippet = tmp_path / "whippet.diff"
    whippet.write_text(
        "Gene\tNode\tCoord\tStrand\tType\tPsiA\tPsiB\tDeltaPsi\tx\ty\tz\n"
        "G1\tx\tc:701-799\t+\tRI\t0.9\t0.1\t0.8\t.\t.\t.\n"
        # unknown event kind -> skipped
        "G1\tx\tc:1-9\t+\tTS\t0.9\t0.1\t0.8\t.\t.\t.\n"
    )
    suppa = tmp_path / "suppa.csv"
    suppa.write_text(
        "ES,anno,c,G1,+,c:101-399,c:101-199,c:301-399,0,0,0.9,0.1,0.8\n"
        # FP for SUPPA2
        "IR,anno,c,G2,+,c:1-50,c:1-99,.,0,0,0.9,0.1,0.8\n"
    )
    return truth, pantas, rmats, whippet, suppa


def test_cmp_differential(tmp_path):
    truth, pantas, rmats, whippet, suppa = _fixture(tmp_path)
    common = [
        "-t", str(truth), "-p", str(pantas), "-r", str(rmats),
        "-w", str(whippet), "-s", str(suppa),
        "-c", "5", "-d", "0.05", "--print",
    ]
    ref = subprocess.run(
        [sys.executable, str(CMP_REF), *common],
        cwd=CMP_REF.parent, capture_output=True, text=True,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    ours = run_cli([sys.executable, "-m", "pantas_tpu", "cmp", *common])
    assert ours.stdout == ref.stdout
    assert "pantas" in ref.stdout and "SUPPA2" in ref.stdout
    # sanity: the expected TP/FN/FP shape survived
    rows = [l.split(",") for l in ref.stdout.splitlines() if l.startswith(("0,", "5,"))]
    table = {(r[1], r[2]): (int(r[5]), int(r[6]), int(r[7])) for r in rows}
    assert table[("pantas", "ES")] == (1, 0, 0)
    assert table[("pantas", "A3")] == (0, 1, 1)
    assert table[("rMATS", "A3")] == (1, 0, 0)
    assert table[("Whippet", "IR")] == (1, 0, 0)
    assert table[("SUPPA2", "ES")] == (1, 0, 0)
    assert table[("SUPPA2", "IR")] == (0, 1, 1)


def test_cmp_differential_novel_and_tabs(tmp_path):
    truth, pantas, rmats, whippet, suppa = _fixture(tmp_path)
    # novel equality is exact-coordinate; ES compares canonic pairs
    common = ["-t", str(truth), "-p", str(pantas), "-c", "0", "-d", "0.0",
              "--events", "ES", "A3", "--novel", "--tabs"]
    ref = subprocess.run(
        [sys.executable, str(CMP_REF), *common],
        cwd=CMP_REF.parent, capture_output=True, text=True,
    )
    assert ref.returncode == 0, ref.stderr[-2000:]
    ours = run_cli([sys.executable, "-m", "pantas_tpu", "cmp", *common])
    assert ours.stdout == ref.stdout
