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
