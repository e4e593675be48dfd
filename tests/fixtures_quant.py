"""Handcrafted per-replicate event CSVs + GTF for quant/remap differential tests.

Covers: every event type (ES/CE/IR/A3/A5), both strands, annotated + novel,
'.' coverages, replicate merging with missing replicates, events present in
only one condition, and the novel IR variant with a '?' junction2 name.
"""

HEADER = (
    "event_type,annotated/novel,chrom,gene,strand,transcripts1,transcripts2,"
    "transcripts3,nodes1,coverage1,nodes2,coverage2,nodes3,coverage3"
)

# condition 1, replicate 1
C1R1 = [
    "ES,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.1.2,TA_R1.2.3,2>7,5,2>4,7,5>7,6",
    "A5,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.2.3|TC_R1.1.2,.,2>7,5,5>7,6,.,.",
    "A3,annotated,chr1,G1,+,TE_R1.2.3,TA_R1.2.3|TC_R1.1.2,.,5>8,4,5>7,6,.,.",
    "A5,annotated,chr2,G2,-,TX_R1.1.2,TY_R1.1.2,.,1>5,7,1>4,3,.,.",
    "A3,annotated,chr2,G2,-,TY_R1.1.2,TX_R1.1.2,.,1>4,3,1>5,7,.,.",
    "IR,annotated,chr1,G1,+,TA_R1.1.2|TE_R1.1.2,.,.,2>4,7,3,4,.,.",
    "ES,novel,chr1,G1,+,?,TA_R1.1.2,TE_R1.2.3,2>8,3,2>4,7,5>8,4",
    "CE,novel,chr2,G2,-,TX_R1.1.2,?,?,1>5,7,1>3,4,3>5,4",
    "IR,novel,chr1,G1,+,?,TC_R1.1,.,1>4,2,1>2>3>4,7,.,.",
    "IR,novel,chr2,G2,-,TX_R1.1.2,?,.,1>2>3>5,3,1>5,7,.,.",
    # only in condition 1 (one-sided)
    "A5,annotated,chr1,G1,+,TA_R1.2.3,TB_R1.1.2,.,5>7,6,2>7,5,.,.",
    # zero coverage both junctions -> psi -1 everywhere
    "A3,annotated,chr1,G1,+,TC_R1.1.2,TE_R1.2.3,.,5>7,0,5>8,0,.,.",
]

# condition 1, replicate 2: same events, different coverages; one event
# (the annotated IR) missing; one extra event only in this replicate.
C1R2 = [
    "ES,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.1.2,TA_R1.2.3,2>7,6,2>4,8,5>7,8",
    "A5,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.2.3|TC_R1.1.2,.,2>7,6,5>7,8,.,.",
    "A3,annotated,chr1,G1,+,TE_R1.2.3,TA_R1.2.3|TC_R1.1.2,.,5>8,5,5>7,8,.,.",
    "A5,annotated,chr2,G2,-,TX_R1.1.2,TY_R1.1.2,.,1>5,8,1>4,2,.,.",
    "A3,annotated,chr2,G2,-,TY_R1.1.2,TX_R1.1.2,.,1>4,2,1>5,8,.,.",
    "ES,novel,chr1,G1,+,?,TA_R1.1.2,TE_R1.2.3,2>8,2,2>4,8,5>8,5",
    "CE,novel,chr2,G2,-,TX_R1.1.2,?,?,1>5,8,1>3,5,3>5,3",
    "IR,novel,chr1,G1,+,?,TC_R1.1,.,1>4,3,1>2>3>4,8,.,.",
    "IR,novel,chr2,G2,-,TX_R1.1.2,?,.,1>2>3>5,2,1>5,8,.,.",
    "A5,annotated,chr1,G1,+,TA_R1.2.3,TB_R1.1.2,.,5>7,8,2>7,6,.,.",
    "A3,annotated,chr1,G1,+,TC_R1.1.2,TE_R1.2.3,.,5>7,0,5>8,0,.,.",
    # appears only in replicate 2 (backfill path in replicate merge)
    "IR,annotated,chr2,G2,-,TX_R1.1.2,.,.,1>5,7,2>3>4,3,.,.",
]

# condition 2 replicates: overlapping event set with different coverages;
# the one-sided c1 A5 is absent; one extra event exists only in c2.
C2R1 = [
    "ES,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.1.2,TA_R1.2.3,2>7,2,2>4,9,5>7,9",
    "A5,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.2.3|TC_R1.1.2,.,2>7,2,5>7,9,.,.",
    "A3,annotated,chr1,G1,+,TE_R1.2.3,TA_R1.2.3|TC_R1.1.2,.,5>8,1,5>7,9,.,.",
    "A5,annotated,chr2,G2,-,TX_R1.1.2,TY_R1.1.2,.,1>5,3,1>4,6,.,.",
    "A3,annotated,chr2,G2,-,TY_R1.1.2,TX_R1.1.2,.,1>4,6,1>5,3,.,.",
    "IR,annotated,chr1,G1,+,TA_R1.1.2|TE_R1.1.2,.,.,2>4,9,3,1,.,.",
    "ES,novel,chr1,G1,+,?,TA_R1.1.2,TE_R1.2.3,2>8,1,2>4,9,5>8,1",
    "CE,novel,chr2,G2,-,TX_R1.1.2,?,?,1>5,3,1>3,6,3>5,7",
    "IR,novel,chr1,G1,+,?,TC_R1.1,.,1>4,1,1>2>3>4,9,.,.",
    "IR,novel,chr2,G2,-,TX_R1.1.2,?,.,1>2>3>5,6,1>5,3,.,.",
    "A3,annotated,chr1,G1,+,TC_R1.1.2,TE_R1.2.3,.,5>7,0,5>8,0,.,.",
    # only in condition 2
    "ES,annotated,chr2,G2,-,TY_R1.1.2,TX_R1.1.2,TX_R1.1.2,1>4,6,1>2,5,4>5,5",
]

C2R2 = [
    "ES,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.1.2,TA_R1.2.3,2>7,1,2>4,9,5>7,9",
    "A5,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.2.3|TC_R1.1.2,.,2>7,1,5>7,9,.,.",
    "A5,annotated,chr2,G2,-,TX_R1.1.2,TY_R1.1.2,.,1>5,2,1>4,7,.,.",
    "A3,annotated,chr2,G2,-,TY_R1.1.2,TX_R1.1.2,.,1>4,7,1>5,2,.,.",
    "IR,annotated,chr1,G1,+,TA_R1.1.2|TE_R1.1.2,.,.,2>4,9,3,2,.,.",
    "ES,novel,chr1,G1,+,?,TA_R1.1.2,TE_R1.2.3,2>8,1,2>4,9,5>8,2",
    "CE,novel,chr2,G2,-,TX_R1.1.2,?,?,1>5,2,1>3,7,3>5,6",
    "IR,novel,chr1,G1,+,?,TC_R1.1,.,1>4,2,1>2>3>4,9,.,.",
    "IR,novel,chr2,G2,-,TX_R1.1.2,?,.,1>2>3>5,7,1>5,2,.,.",
    "ES,annotated,chr2,G2,-,TY_R1.1.2,TX_R1.1.2,TX_R1.1.2,1>4,7,1>2,4,4>5,6",
]

REMAP_GTF = "".join(
    line + "\n"
    for line in [
        "\t".join(["chr1", "src", "gene", "100", "400", ".", "+", ".", 'gene_id "G1";']),
        "\t".join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        "\t".join(["chr1", "src", "exon", "100", "107", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        "\t".join(["chr1", "src", "exon", "112", "118", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        "\t".join(["chr1", "src", "exon", "123", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TA";']),
        "\t".join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TB";']),
        "\t".join(["chr1", "src", "exon", "100", "107", ".", "+", ".", 'gene_id "G1"; transcript_id "TB";']),
        "\t".join(["chr1", "src", "exon", "123", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TB";']),
        "\t".join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TC";']),
        "\t".join(["chr1", "src", "exon", "100", "118", ".", "+", ".", 'gene_id "G1"; transcript_id "TC";']),
        "\t".join(["chr1", "src", "exon", "123", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TC";']),
        "\t".join(["chr1", "src", "transcript", "100", "400", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        "\t".join(["chr1", "src", "exon", "100", "107", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        "\t".join(["chr1", "src", "exon", "112", "118", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        "\t".join(["chr1", "src", "exon", "126", "128", ".", "+", ".", 'gene_id "G1"; transcript_id "TE";']),
        "\t".join(["chr2", "src", "gene", "500", "800", ".", "-", ".", 'gene_id "G2";']),
        "\t".join(["chr2", "src", "transcript", "500", "800", ".", "-", ".", 'gene_id "G2"; transcript_id "TX";']),
        "\t".join(["chr2", "src", "exon", "500", "506", ".", "-", ".", 'gene_id "G2"; transcript_id "TX";']),
        "\t".join(["chr2", "src", "exon", "700", "704", ".", "-", ".", 'gene_id "G2"; transcript_id "TX";']),
        "\t".join(["chr2", "src", "transcript", "500", "800", ".", "-", ".", 'gene_id "G2"; transcript_id "TY";']),
        "\t".join(["chr2", "src", "exon", "500", "520", ".", "-", ".", 'gene_id "G2"; transcript_id "TY";']),
        "\t".join(["chr2", "src", "exon", "600", "650", ".", "-", ".", 'gene_id "G2"; transcript_id "TY";']),
    ]
)


def write_quant_fixtures(tmpdir):
    """Write replicate CSVs + GTF; returns (c1 paths, c2 paths, gtf path)."""
    paths = {}
    for name, rows in [("c1r1", C1R1), ("c1r2", C1R2), ("c2r1", C2R1), ("c2r2", C2R2)]:
        p = tmpdir / f"{name}.csv"
        p.write_text(HEADER + "\n" + "\n".join(rows) + "\n")
        paths[name] = str(p)
    gtf = tmpdir / "remap.gtf"
    gtf.write_text(REMAP_GTF)
    return (
        [paths["c1r1"], paths["c1r2"]],
        [paths["c2r1"], paths["c2r2"]],
        str(gtf),
    )
