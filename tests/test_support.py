"""Exon-skipping support counting + novel classification (check_coverage /
check_novel equivalents) on hand-built GTF + SAM fixtures."""

import io


def _gtf(tmp_path):
    def row(chrom, feat, s, e, gid, tid):
        attrs = f'gene_id "{gid}"; transcript_id "{tid}";'
        return f"{chrom}\thb\t{feat}\t{s}\t{e}\t.\t+\t.\t{attrs}"

    lines = []
    # gene G1: tx1 has the triple, tx2 skips the middle exon (annotated skip)
    lines.append(row("c", "gene", 100, 600, "G1", "G1"))
    lines.append(row("c", "transcript", 100, 600, "G1", "tx1"))
    for s, e in [(100, 200), (300, 400), (500, 600)]:
        lines.append(row("c", "exon", s, e, "G1", "tx1"))
    lines.append(row("c", "transcript", 100, 600, "G1", "tx2"))
    for s, e in [(100, 200), (500, 600)]:
        lines.append(row("c", "exon", s, e, "G1", "tx2"))
    # gene G2: only tx3, nothing skips its middle exon (novel skip)
    lines.append(row("c", "gene", 1000, 1500, "G2", "G2"))
    lines.append(row("c", "transcript", 1000, 1500, "G2", "tx3"))
    for s, e in [(1000, 1100), (1200, 1300), (1400, 1500)]:
        lines.append(row("c", "exon", s, e, "G2", "tx3"))
    p = tmp_path / "g.gtf"
    p.write_text("".join(l + "\n" for l in lines))
    return p


def test_flanking_triples_and_support(tmp_path):
    from pantas_tpu.eval.support import (
        check_skipping_support,
        count_junction_support,
        flanking_triples,
    )

    gtf = _gtf(tmp_path)
    triples = flanking_triples(str(gtf), {"c:300-400"})
    assert triples == {"c:300-400": {("c", 200, 300, 400, 500)}}

    sam = tmp_path / "a.sam"
    sam.write_text(
        "@HD\tVN:1.5\n"
        # upstream-intron junction read (99N), overlaps [200,500]
        "r1\t0\tc\t150\t60\t51M99N50M\t*\t0\t0\t*\t*\n"
        # skipping junction read (299N)
        "r2\t0\tc\t150\t60\t51M299N100M\t*\t0\t0\t*\t*\n"
        # wrong chromosome
        "r3\t0\tX\t150\t60\t51M99N50M\t*\t0\t0\t*\t*\n"
        # right lengths but starts past the window
        "r4\t0\tc\t600\t60\t10M99N10M\t*\t0\t0\t*\t*\n"
        # unspliced read inside window
        "r5\t0\tc\t250\t60\t100M\t*\t0\t0\t*\t*\n"
    )
    counts = count_junction_support(str(sam), "c", 200, 500, {99, 299})
    assert counts == {99: 1, 299: 1}

    events = tmp_path / "ev.txt"
    events.write_text("c:300-400\n")
    buf = io.StringIO()
    n = check_skipping_support(str(events), str(gtf), [str(sam)], out=buf)
    assert n == 1
    assert buf.getvalue() == f"c:300-400 {sam} 1 1\n"


def test_classify_novel(tmp_path):
    from pantas_tpu.eval.support import classify_novel_skips

    gtf = _gtf(tmp_path)
    got = classify_novel_skips({"c:300-400", "c:1200-1300"}, str(gtf))
    # G1's skip is annotated by tx2's (200,500) intron; G2's is novel
    assert got == {"c:300-400": False, "c:1200-1300": True}
