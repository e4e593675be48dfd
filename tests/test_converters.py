"""rMATS/SUPPA2 converters: byte-identical to the reference's
build_rmats.py / build_suppa.py on the same inputs (both are importable —
their __main__ blocks are snakemake-bound but main() is plain)."""

import importlib.util

from conftest import REFERENCE

SCRIPTS = REFERENCE / "exps" / "2-dm-real" / "workflow" / "scripts"

HEADER = (
    "ID\tGeneID\tgeneSymbol\tchr\tstrand\texonStart_0base\texonEnd\t"
    "upstreamES\tupstreamEE\tdownstreamES\tdownstreamEE\tID\tIJC_SAMPLE_1\t"
    "SJC_SAMPLE_1\tIJC_SAMPLE_2\tSJC_SAMPLE_2\tIncFormLen\tSkipFormLen\t"
    "PValue\tFDR\tIncLevel1\tIncLevel2\tIncLevelDifference\n"
)


def _ref_mod(name):
    spec = importlib.util.spec_from_file_location(f"ref_{name}", SCRIPTS / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full(idx, gene, chrom, strand, e, u, d, pv, inc1, inc2, delta):
    stats = f"{idx}\t10,12\t3,4\t8,9\t5,6\t100\t50\t{pv}\t0.1\t{inc1}\t{inc2}\t{delta}"
    return (
        f"{idx}\t\"{gene}\"\t{gene}\t{chrom}\t{strand}\t{e[0]}\t{e[1]}\t"
        f"{u[0]}\t{u[1]}\t{d[0]}\t{d[1]}\t{stats}\n"
    )


def _short(idx, gene, chrom, strand, e, u, d):
    return (
        f"{idx}\t\"{gene}\"\t{gene}\t{chrom}\t{strand}\t{e[0]}\t{e[1]}\t"
        f"{u[0]}\t{u[1]}\t{d[0]}\t{d[1]}\n"
    )


def _rmats_dir(tmp_path):
    d = tmp_path / "rmats"
    d.mkdir()
    # SE: kept row, p-filtered row, NA inclusion row, and a short row that
    # leaks the previous row's statistics (reference quirk)
    (d / "SE.MATS.JC.txt").write_text(
        HEADER
        + _full(1, "g1", "chr2L", "+", (100, 200), (50, 80), (300, 400),
                0.01, "0.8,0.9", "0.2,0.3", "0.6")
        + _full(2, "g2", "chr2L", "+", (500, 600), (450, 480), (700, 800),
                0.9, "0.8", "0.2", "0.6")
        + _full(3, "g3", "chr2L", "-", (900, 950), (850, 880), (1000, 1100),
                0.02, "NA,0.5", "NA", "0.1")
        + _short(4, "g4", "chr2L", "+", (1200, 1300), (1150, 1180), (1400, 1500))
    )
    # A3SS/A5SS: one row per strand (different field counts per strand)
    (d / "A3SS.MATS.JC.txt").write_text(
        HEADER
        + _full(1, "g1", "chr2L", "+", (100, 300), (100, 250), (20, 60),
                0.01, "0.7", "0.1", "0.6")
        + _full(2, "g2", "chr2L", "-", (100, 300), (150, 300), (400, 500),
                0.01, "0.7", "0.1", "0.6")
    )
    (d / "A5SS.MATS.JC.txt").write_text(
        HEADER
        + _full(1, "g1", "chr2L", "+", (100, 300), (100, 250), (400, 500),
                0.01, "0.7", "0.1", "0.6")
        + _full(2, "g2", "chr2L", "-", (100, 300), (150, 300), (20, 60),
                0.01, "0.7", "0.1", "0.6")
    )
    # RI: retained exon spans both flanks (assert ex_s==fex_s, ex_e==sex_e)
    (d / "RI.MATS.JC.txt").write_text(
        HEADER
        + _full(1, "g1", "chr2L", "+", (100, 500), (100, 200), (300, 500),
                0.01, "0.9", "0.3", "0.6")
    )
    return d


def test_rmats_differential(tmp_path):
    d = _rmats_dir(tmp_path)
    ref_out = tmp_path / "ref.csv"
    our_out = tmp_path / "ours.csv"
    _ref_mod("build_rmats").main(str(d), 0.05, str(ref_out))
    from pantas_tpu.eval.converters import rmats_to_csv

    rmats_to_csv(str(d), str(our_out), pvalue=0.05)
    ref = ref_out.read_bytes()
    assert ref.count(b"\n") == 8  # 3 SE (incl. leak row) + 1 IR + 2 A3 + 2 A5
    assert our_out.read_bytes() == ref


def test_suppa_differential(tmp_path):
    dpsi = tmp_path / "cmp.dpsi"
    dpsi.write_text(
        "name\tdPSI\tpval\n"
        "g1;SE:2L:100-200:300-400:+\t0.5\t0.01\n"
        "g1;SE:2L:100-200:300-400:+\t0.5\t0.9\n"  # p-filtered
        "g2;A5:2L:100-200:100-300:+\t-0.4\t0.02\n"
        "g2;A3:2L:100-200:100-300:-\t-0.4\t0.02\n"
        "g3;A3:2L:100-200:100-300:+\t0.3\t0.03\n"
        "g3;A5:2L:100-200:100-300:-\t0.3\t0.03\n"
        "g4;RI:2L:100:200-300:400:+\t0.2\t0.04\n"
        "g5;RI:2L:100:200-300:400:-\tnan\tnan\n"  # nan pv is kept (quirk)
    )
    ref_out = tmp_path / "ref.csv"
    our_out = tmp_path / "ours.csv"
    _ref_mod("build_suppa").main(str(dpsi), 0.05, str(ref_out))
    from pantas_tpu.eval.converters import suppa_to_csv

    suppa_to_csv(str(dpsi), str(our_out), pvalue=0.05)
    ref = ref_out.read_bytes()
    assert ref.count(b"\n") == 7
    assert our_out.read_bytes() == ref
