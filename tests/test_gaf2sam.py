"""GAF->SAM projection: byte-identical to the reference's manual tool
(exps/3-homo-real/workflow/scripts/gaf2sam.py) in positions-file mode, plus
the from-graph mode that derives node positions from chromosome paths."""

import sys

from conftest import REFERENCE, run_cli

GAF2SAM_REF = REFERENCE / "exps" / "3-homo-real" / "workflow" / "scripts" / "gaf2sam.py"


def _fixture(tmp_path):
    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "H\tVN:Z:1.1\n"
        "S\t1\tAAAA\n"
        "S\t2\tCC\n"
        "S\t3\tGGG\n"
        "S\t4\tTTTTT\n"
        "S\t5\tACACA\n"
        "S\t6\tGGGGGGG\n"
        "S\t9\tTT\n"
        "L\t1\t+\t2\t+\t*\n"
        "P\tpathA\t1+,2+,3+,4+\t*\n"
        "P\tpathB\t5+,4+\t*\n"
        "P\ttx_R1\t1+,3+\t*\n"
    )
    pos = tmp_path / "pos.tsv"
    pos.write_text("pathA\t100,104,110,113\npathB\t.,200\n")

    def g(rname, walk, strand="+", mapq=60):
        return f"{rname}\t10\t0\t10\t{strand}\t{walk}\t10\t0\t10\t10\t10\t{mapq}\tcs:Z::10"

    gaf = tmp_path / "a.gaf"
    gaf.write_text(
        "\n".join(
            [
                g("r_fwd", ">1>2>3"),            # 6M4N3M on pathA
                g("r_rev", "<3<2<1", strand="-"),  # same walk reversed, flag 16
                g("r_unplaced", "*"),             # dropped before counting
                g("r_unknown_first", ">9>1"),     # first node off-path: skipped
                g("r_dot_first", ">5>4"),         # first node position ".": skipped
                g("r_dot_mid", ">4>5"),           # mid-walk "." inherits end-anchor
                g("r_neg_gap", ">3>2"),           # non-positive gap drops the M run
                g("r_absent_mid", ">1>6"),        # node on no path -> rpos -1 branch
            ]
        )
        + "\n"
    )
    return gfa, pos, gaf


def test_positions_file_differential(tmp_path):
    gfa, pos, gaf = _fixture(tmp_path)
    run_cli(
        [sys.executable, str(GAF2SAM_REF), str(gaf), str(gfa), str(pos)],
        out_path=tmp_path / "ref.sam",
    )
    run_cli(
        [
            sys.executable, "-m", "pantas_tpu", "gaf2sam",
            str(gaf), str(gfa), str(pos), "--sq", "hg38",
        ],
        out_path=tmp_path / "ours.sam",
    )
    ref = (tmp_path / "ref.sam").read_bytes()
    assert ref.count(b"\n") > 21  # header + at least one record
    assert (tmp_path / "ours.sam").read_bytes() == ref


def test_from_graph_mode(tmp_path):
    from pantas_tpu.eval.gaf2sam import gaf_to_sam

    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "H\tVN:Z:1.1\n"
        "S\t1\tAAAA\n"
        "S\t2\tCC\n"
        "S\t3\tGGG\n"
        "S\t4\tTTTTT\n"
        "P\t7\t1+,2+,3+,4+\t*\n"
        "P\tFBtr1_R1\t1+,3+\t*\n"
        "P\tFBtr1_H1\t1+,2+,3+\t*\n"
    )
    gaf = tmp_path / "a.gaf"
    gaf.write_text("r1\t7\t0\t7\t+\t>1>3\t7\t0\t7\t7\t7\t60\tcs:Z::7\n")
    out = tmp_path / "out.sam"
    with open(out, "w") as fh:
        skipped, skipped_n, total = gaf_to_sam(str(gaf), str(gfa), out=fh)
    assert (skipped, skipped_n, total) == (0, 0, 1)
    lines = out.read_text().splitlines()
    # @SQ derived from the chromosome path only (transcript paths excluded)
    assert lines[1] == "@SQ\tSN:7\tLN:14"
    assert len(lines) == 3
    fields = lines[2].split("\t")
    assert fields[:6] == ["r1", "0", "7", "1", "60", "4M2N3M"]
