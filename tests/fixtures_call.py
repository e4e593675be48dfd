"""Augmented-GFA + GTF fixtures for event-caller differential tests.

Fixture "splice": a plus-strand gene G1 with four haplotype-aware
transcripts over three exons (TA: 1-2-3, TB skips exon 2, TC retains
intron 1, TE ends in a short exon 3b), plus novel links that trigger the
novel ES / exonic SS / intronic SS / novel-IR code paths.

Fixture "cassette": a minus-strand gene G2 whose annotated junction spans an
intron containing a novel cassette exon (novel CE) and whose flanking plain
edges trigger the novel IR-2 greedy walk.
"""

# --- fixture "splice": nodes 1,2 = exon1; 3 = intron1; 4,5 = exon2;
# 6 = intron2; 7,8 = exon3 (8 alone is TE's exon 3b) ------------------------

SPLICE_GFA = "".join(
    line + "\n"
    for line in [
        "H\tVN:Z:1.1",
        "S\t1\tACGTA\tEX:Z:TA_R1.1,TB_R1.1,TC_R1.1,TE_R1.1\tNC:i:10",
        "S\t2\tGGC\tEX:Z:TA_R1.1,TB_R1.1,TC_R1.1,TE_R1.1\tNC:i:12",
        "S\t3\tTTAA\tEX:Z:TC_R1.1\tNC:i:4",
        "S\t4\tCCG\tEX:Z:TA_R1.2,TC_R1.1,TE_R1.2\tNC:i:8",
        "S\t5\tATAT\tEX:Z:TA_R1.2,TC_R1.1,TE_R1.2\tNC:i:9",
        "S\t6\tGGGG\tNC:i:2",
        "S\t7\tCAT\tEX:Z:TA_R1.3,TB_R1.2,TC_R1.2\tNC:i:7",
        "S\t8\tTGA\tEX:Z:TA_R1.3,TB_R1.2,TC_R1.2,TE_R1.3\tNC:i:6",
        "L\t1\t+\t2\t+\t*\tRC:i:9",
        "L\t2\t+\t3\t+\t*\tRC:i:3",
        "L\t3\t+\t4\t+\t*\tRC:i:3",
        "L\t4\t+\t5\t+\t*\tRC:i:8",
        "L\t5\t+\t6\t+\t*\tRC:i:2",
        "L\t6\t+\t7\t+\t*\tRC:i:2",
        "L\t7\t+\t8\t+\t*\tRC:i:6",
        "L\t2\t+\t4\t+\t*\tJN:Z:TA_R1.1.2,TE_R1.1.2\tRC:i:7",
        "L\t5\t+\t7\t+\t*\tJN:Z:TA_R1.2.3,TC_R1.1.2\tRC:i:6",
        "L\t2\t+\t7\t+\t*\tJN:Z:TB_R1.1.2\tRC:i:5",
        "L\t5\t+\t8\t+\t*\tJN:Z:TE_R1.2.3\tRC:i:4",
        # novel links (as the augmenter would append them)
        "L\t2\t+\t8\t+\t*\tRC:i:3\tID:Z:N",
        "L\t2\t+\t6\t+\t*\tRC:i:2\tID:Z:N",
        "L\t1\t+\t4\t+\t*\tRC:i:2\tID:Z:N",
        "P\tTA_R1\t1+,2+,4+,5+,7+,8+\t*",
        "P\tTB_R1\t1+,2+,7+,8+\t*",
        "P\tTC_R1\t1+,2+,3+,4+,5+,7+,8+\t*",
        "P\tTE_R1\t1+,2+,4+,5+,8+\t*",
    ]
)

SPLICE_GTF = "".join(
    line + "\n"
    for line in [
        '\t'.join(["chr1", "src", "gene", "100", "400", ".", "+", ".", 'gene_id "G1";']),
        '\t'.join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        '\t'.join(["chr1", "src", "exon", "100", "107", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        '\t'.join(["chr1", "src", "exon", "112", "118", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        '\t'.join(["chr1", "src", "exon", "123", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        '\t'.join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TB";']),
        '\t'.join(["chr1", "src", "exon", "100", "107", ".", "+", ".", 'gene_id "G1"; transcript_id "TB";']),
        '\t'.join(["chr1", "src", "exon", "123", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TB";']),
        '\t'.join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TC";']),
        '\t'.join(["chr1", "src", "exon", "100", "118", ".", "+", ".", 'gene_id "G1"; transcript_id "TC";']),
        '\t'.join(["chr1", "src", "exon", "123", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TC";']),
        '\t'.join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        '\t'.join(["chr1", "src", "exon", "100", "107", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        '\t'.join(["chr1", "src", "exon", "112", "118", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        '\t'.join(["chr1", "src", "exon", "126", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
    ]
)

# --- fixture "cassette": node 1 = exon1, nodes 2-4 = intron (3 is the novel
# cassette exon), node 5 = exon2; minus-strand gene G2 ----------------------

CASSETTE_GFA = "".join(
    line + "\n"
    for line in [
        "H\tVN:Z:1.1",
        "S\t1\tAACCGGT\tEX:Z:TX_R1.1\tNC:i:9",
        "S\t2\tCGT\tNC:i:2",
        "S\t3\tAAAA\tNC:i:5",
        "S\t4\tGG\tNC:i:2",
        "S\t5\tTTTCA\tEX:Z:TX_R1.2\tNC:i:8",
        "L\t1\t+\t2\t+\t*\tRC:i:2",
        "L\t2\t+\t3\t+\t*\tRC:i:2",
        "L\t3\t+\t4\t+\t*\tRC:i:2",
        "L\t4\t+\t5\t+\t*\tRC:i:2",
        "L\t1\t+\t5\t+\t*\tJN:Z:TX_R1.1.2\tRC:i:7",
        "L\t1\t+\t3\t+\t*\tRC:i:4\tID:Z:N",
        "L\t3\t+\t5\t+\t*\tRC:i:4\tID:Z:N",
        "P\tTX_R1\t1+,5+\t*",
    ]
)

CASSETTE_GTF = "".join(
    line + "\n"
    for line in [
        '\t'.join(["chr2", "src", "gene", "500", "800", ".", "-", ".", 'gene_id "G2";']),
        '\t'.join(["chr2", "src", "transcript", "500", "800", ".", "-", ".", 'gene_id "G2"; transcript_id "TX";']),
        '\t'.join(["chr2", "src", "exon", "500", "506", ".", "-", ".", 'gene_id "G2"; transcript_id "TX";']),
        '\t'.join(["chr2", "src", "exon", "700", "704", ".", "-", ".", 'gene_id "G2"; transcript_id "TX";']),
    ]
)


def write_call_fixtures(tmpdir):
    """Write both fixtures; returns dict name -> (gfa_path, gtf_path)."""
    out = {}
    for name, gfa, gtf in [
        ("splice", SPLICE_GFA, SPLICE_GTF),
        ("cassette", CASSETTE_GFA, CASSETTE_GTF),
    ]:
        gp = tmpdir / f"{name}.gfa"
        tp = tmpdir / f"{name}.gtf"
        gp.write_text(gfa)
        tp.write_text(gtf)
        out[name] = (str(gp), str(tp))
    return out
