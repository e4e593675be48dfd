"""Build modes: multi-chromosome scatter/combine, aggressive prune, reduce."""

import io

from pantas_tpu.build.pipeline import build_pangenome
from pantas_tpu.io.gfa import Gfa

CHR_A = "ACGTACGTAGGCCTTAGCATGCATGCATCCGGAATTCCGGTTAACCGGATCGATCGATCGAAAAAAAAAA"
CHR_B = "TTTTGGGGCCCCAAAATTTTGGGGCCCCAAAACCGGAATTGGCCTTAACCGGAATTGGCCTTAA"


def _write_inputs(tmp_path):
    fa = tmp_path / "genome.fa"
    fa.write_text(f">cA\n{CHR_A}\n>cB\n{CHR_B}\n")
    gtf_rows = []
    for chrom, gene, tid, spans in [
        ("cA", "GA", "TA1", [(5, 16), (29, 40), (49, 60)]),
        ("cA", "GA", "TA2", [(5, 16), (49, 60)]),
        ("cB", "GB", "TB1", [(3, 12), (21, 32), (41, 52)]),
    ]:
        gtf_rows.append(
            "\t".join([chrom, "s", "transcript", str(spans[0][0]), str(spans[-1][1]),
                       ".", "+", ".", f'gene_id "{gene}"; transcript_id "{tid}";'])
        )
        for s, e in spans:
            gtf_rows.append(
                "\t".join([chrom, "s", "exon", str(s), str(e), ".", "+", ".",
                           f'gene_id "{gene}"; transcript_id "{tid}";'])
            )
    gtf = tmp_path / "genes.gtf"
    gtf.write_text("\n".join(gtf_rows) + "\n")
    vcf = tmp_path / "vars.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        f"cA\t7\tva\t{CHR_A[6]}\tT\t.\t.\t.\tGT\t1|0\n"
        f"cB\t25\tvb\t{CHR_B[24]}\tA\t.\t.\t.\tGT\t0|1\n"
    )
    return str(fa), str(gtf), str(vcf)


def test_multichrom_build_combines_with_id_shift(tmp_path):
    fa, gtf, vcf = _write_inputs(tmp_path)
    out = build_pangenome(fa, gtf, vcf, str(tmp_path / "out"), threads=2, log=io.StringIO())
    g = Gfa.load(out)
    # both chromosome reference paths present, ids globally unique + sorted
    names = {p.name for p in g.paths}
    assert {"cA", "cB"} <= names
    assert {"TA1_R1", "TA2_R1", "TB1_R1"} <= names
    ids = [int(s.sid) for s in g.segments]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert all(int(l.from_id) < int(l.to_id) for l in g.links)
    # cB's nodes are shifted above cA's
    ca_nodes = {int(sid) for sid, _ in next(p for p in g.paths if p.name == "cA").steps}
    cb_nodes = {int(sid) for sid, _ in next(p for p in g.paths if p.name == "cB").steps}
    assert max(ca_nodes) < min(cb_nodes)
    # every transcript path walks existing links
    for p in g.paths:
        sids = [sid for sid, _ in p.steps]
        for a, b in zip(sids, sids[1:]):
            assert g.has_link(a, b), (p.name, a, b)


def test_aggressive_mode_drops_haplotype_paths(tmp_path):
    fa, gtf, vcf = _write_inputs(tmp_path)
    out = build_pangenome(fa, gtf, vcf, str(tmp_path / "hp1"), hp=1, threads=1, log=io.StringIO())
    g = Gfa.load(out)
    names = {p.name for p in g.paths}
    assert not any("_H" in n for n in names)
    # haplotype-aware annotations remain on the graph itself
    text = open(out).read()
    assert "_H1." in text  # EX/JN tags still carry haplotype copies


def test_reduce_mode_keeps_transcript_intervals(tmp_path):
    fa, gtf, vcf = _write_inputs(tmp_path)
    full = build_pangenome(fa, gtf, vcf, str(tmp_path / "hp0"), hp=0, threads=1, log=io.StringIO())
    reduced = build_pangenome(fa, gtf, vcf, str(tmp_path / "hp2"), hp=2, threads=1, log=io.StringIO())
    gf = Gfa.load(full)
    gr = Gfa.load(reduced)
    assert len(gr.segments) <= len(gf.segments)
    names = {p.name for p in gr.paths}
    assert "TA1_R1" in names and "TB1_R1" in names
    # reference path is split into kept sub-paths named {chrom}.N
    assert any(n.startswith("cA.") for n in names) or "cA" in names
    # all transcript path nodes kept
    for p in gr.paths:
        for sid, _ in p.steps:
            assert gr.segment(sid) is not None


def test_w_lines_build_and_augment_passthrough(tmp_path):
    """`build --w-lines`: haplotype walks become GFA 1.1 W lines; the graph
    stays fully functional downstream, and the reference augmenter treats
    the W lines exactly like ours (byte-identical pass-through)."""
    import subprocess
    import sys
    from pathlib import Path

    fa, gtf, vcf = _write_inputs(tmp_path)
    out = build_pangenome(
        fa, gtf, vcf, str(tmp_path / "wl"), threads=1, w_lines=True, log=io.StringIO()
    )
    text = open(out).read()
    lines = text.splitlines()
    w_rows = [l.split("\t") for l in lines if l.startswith("W\t")]
    p_names = [l.split("\t")[1] for l in lines if l.startswith("P\t")]
    assert w_rows, "haplotype walks must be W lines"
    assert not any("_H" in n for n in p_names), "no haplotype P lines left"
    assert any("_R1" in n for n in p_names), "reference transcripts stay P"
    seg_ids = {l.split("\t")[1] for l in lines if l.startswith("S\t")}
    for row in w_rows:
        assert row[1] == "s1" and row[2] in ("1", "2")
        steps = [s for s in row[6].replace(">", " ").split() if s]
        assert steps and all(s in seg_ids for s in steps)

    # byte-identical augment on the W-line graph (W lines pass through both)
    segs = {l.split("\t")[1]: l.split("\t")[2] for l in lines if l.startswith("S\t")}
    a, b = next(
        (l.split("\t")[1], l.split("\t")[3]) for l in lines if l.startswith("L\t")
    )
    la, lb = len(segs[a]), len(segs[b])
    gaf = tmp_path / "mini.gaf"
    plen = la + lb
    gaf.write_text(
        f"r1\t{plen}\t0\t{plen}\t+\t>{a}>{b}\t{plen}\t0\t{plen - 1}\t{plen}\t{plen}\t60\t"
        f"dv:f:0.0\tcs:Z::{plen}\n"
    )
    env_repo = str(Path(__file__).resolve().parent.parent)
    import os

    env = dict(os.environ, PYTHONPATH=env_repo)
    ours = subprocess.run(
        [sys.executable, "-m", "pantas_tpu", "augment", str(gaf), out],
        capture_output=True, env=env,
    )
    ref = subprocess.run(
        [sys.executable, "/root/reference/scripts/alignments_augmentation_from_gaf.py",
         str(gaf), out],
        capture_output=True, env=env,
    )
    assert ours.returncode == 0 and ref.returncode == 0, (
        ours.stderr[-500:], ref.stderr[-500:]
    )
    assert ours.stdout == ref.stdout
    assert b"W\ts1\t" in ours.stdout
