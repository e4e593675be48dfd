"""Intra-node novel splice-site detection (the ``novel-sites`` extension).

Hand-built micro graph + GAF: clip-boundary pile-ups must be located in
node-forward coordinates (both walk orientations), translated to genomic
positions via the reference path, gated on min-clip / mapq / pile-up
count, and node-boundary sites excluded by default (those are expressible
as graph edges — reference ``alignments_augmentation_from_gaf.py:426-427``
novel links — so only mid-node sites are the new signal)."""

from pathlib import Path

from conftest import run_cli

from pantas_tpu.events.sites import detect_novel_sites

GFA = """H\tVN:Z:1.0
S\t1\tAAAAAAAAAA
S\t2\tCCCCCCCCCC\tEX:Z:T1_R1.2\tNC:i:9
S\t3\tGGGGGGGGGG
L\t1\t+\t2\t+\t0M
L\t2\t+\t3\t+\t0M
P\tchrZ\t1+,2+,3+\t*
P\tT1_R1\t2+,3+\t*
"""


def _gaf(name, qlen, qstart, qend, path, plen, ps, pe, mapq=60):
    # pe is the INCLUSIVE last aligned base (this framework's GAF
    # convention — the mapper writes pend_excl - 1)
    span = pe - ps
    return (
        f"{name}\t{qlen}\t{qstart}\t{qend}\t+\t{path}\t{plen}\t{ps}\t{pe}"
        f"\t{span}\t{span}\t{mapq}\tcs:Z::{span}"
    )


def _fixture(tmp_path: Path):
    gfa = tmp_path / "g.gfa"
    gfa.write_text(GFA)
    lines = []
    # 4 reads starting mid node 2 (offset 4) with a 30 bp head clip
    for i in range(4):
        lines.append(_gaf(f"s{i}", 100, 30, 100, ">2>3", 20, 4, 19))
    # 3 reads ending mid node 2 (offset 6) with a 40 bp tail clip
    for i in range(3):
        lines.append(_gaf(f"e{i}", 100, 0, 60, ">1>2", 20, 3, 16))
    # 3 reverse-walk reads: query-head clip hangs off the genomic RIGHT
    # boundary -> side "end" at node 3, forward offset len-1-ps = 7
    for i in range(3):
        lines.append(_gaf(f"r{i}", 100, 25, 100, "<3<2", 20, 2, 19))
    # boundary pile-up (start at offset 0 of node 2): excluded by default
    for i in range(5):
        lines.append(_gaf(f"b{i}", 100, 50, 100, ">2>3", 20, 0, 19))
    # below min-clip: never counted
    for i in range(5):
        lines.append(_gaf(f"c{i}", 100, 2, 100, ">2>3", 20, 4, 19))
    # below mapq threshold: never counted
    for i in range(5):
        lines.append(_gaf(f"q{i}", 100, 30, 100, ">2>3", 20, 4, 19, mapq=3))
    gaf = tmp_path / "a.gaf"
    gaf.write_text("\n".join(lines) + "\n")
    return gaf, gfa


def test_micro_fixture_sites(tmp_path):
    gaf, gfa = _fixture(tmp_path)
    rows = detect_novel_sites(str(gaf), str(gfa), w=3)
    # node 2 starts at genomic 11, node 3 at 21 (1-based, via P chrZ)
    assert rows == [
        "chrZ,15,start,2,4,4,30,9,T1_R1.2",
        "chrZ,17,end,2,6,3,40,9,T1_R1.2",
        "chrZ,28,end,3,7,3,25,0,.",
    ]


def test_w_threshold_and_boundary_opt_in(tmp_path):
    gaf, gfa = _fixture(tmp_path)
    assert detect_novel_sites(str(gaf), str(gfa), w=4) == [
        "chrZ,15,start,2,4,4,30,9,T1_R1.2"
    ]
    with_boundary = detect_novel_sites(str(gaf), str(gfa), w=3, include_boundary=True)
    assert "chrZ,11,start,2,0,5,50,9,T1_R1.2" in with_boundary


def test_cli_subcommand(tmp_path):
    import sys

    gaf, gfa = _fixture(tmp_path)
    proc = run_cli(
        [sys.executable, "-m", "pantas_tpu", "novel-sites", str(gaf), str(gfa)]
    )
    lines = proc.stdout.strip().splitlines()
    assert lines[0] == "chrom,pos,side,node,offset,count,clip_max,nc,exons"
    assert len(lines) == 4


GTF = (
    'chrZ\tx\tgene\t1\t30\t.\t-\t.\tgene_id "G1";\n'
    'chrZ\tx\ttranscript\t1\t30\t.\t-\t.\tgene_id "G1"; transcript_id "T1";\n'
    'chrZ\tx\texon\t11\t20\t.\t-\t.\tgene_id "G1"; transcript_id "T1";\n'
)


def test_classify_sites_strand_aware(tmp_path):
    from pantas_tpu.events.sites import classify_sites, detect_novel_sites

    gaf, gfa = _fixture(tmp_path)
    gtf = tmp_path / "a.gtf"
    gtf.write_text(GTF)
    events = classify_sites(detect_novel_sites(str(gaf), str(gfa), w=3), str(gtf))
    # G1 is a '-' gene: a start site is the intron's genomic-right
    # terminus = the donor on '-' => A5; an end site => A3. Node 3 has no
    # exon labels => unoriented NS row.
    assert events == [
        "A5,novel,chrZ,G1,-,15,start,2,4,4",
        "A3,novel,chrZ,G1,-,17,end,2,6,3",
        "NS,novel,chrZ,.,.,28,end,3,7,3",
    ]


def test_transcript_paths_are_not_reference_paths(tmp_path):
    # T1_R1 (2+,3+) must NOT claim node 2's genomic coordinate
    gaf, gfa = _fixture(tmp_path)
    rows = detect_novel_sites(str(gaf), str(gfa), w=3)
    assert all(r.startswith("chrZ,") for r in rows)


def test_noncanonical_ids_fall_back_to_host(tmp_path):
    """ADVICE r2: zero-padded segment ids ('007') crashed the auto engine
    with a KeyError ('7') and silently merged with '7' in the native
    scanner; the canonicality guard must route them to the host path."""
    gaf, gfa = _fixture(tmp_path)
    gfa2 = tmp_path / "padded.gfa"
    gfa2.write_text(
        gfa.read_text().replace("\t2\t", "\t007\t").replace("2+", "007+")
        .replace("\t2\n", "\t007\n")
    )
    gaf2 = tmp_path / "padded.gaf"
    gaf2.write_text(gaf.read_text().replace(">2", ">007").replace("<2", "<007"))
    auto = detect_novel_sites(str(gaf2), str(gfa2), w=3)  # must not raise
    host = detect_novel_sites(str(gaf2), str(gfa2), w=3, engine="host")
    assert auto == host
    assert any(",007," in r for r in auto)


def test_long_node_falls_back_to_host(tmp_path):
    """ADVICE r2: the native pile key packs offsets into 19 bits; a 600 kb
    node must make clipsites_create refuse so auto == host (previously the
    native path silently returned no sites)."""
    from pantas_tpu.native import native_available

    if not native_available():
        import pytest

        pytest.skip("native engine unavailable")
    long_seq = "A" * 600_000
    gfa = tmp_path / "long.gfa"
    gfa.write_text(
        f"H\tVN:Z:1.0\nS\t1\t{long_seq}\nS\t2\tCCCCCCCCCC\nL\t1\t+\t2\t+\t0M\n"
        "P\tchrZ\t1+,2+\t*\n"
    )
    lines = [
        _gaf(f"s{i}", 700000, 30, 600000, ">1>2", 600010, 500000, 600004)
        for i in range(4)
    ]
    gaf = tmp_path / "long.gaf"
    gaf.write_text("\n".join(lines) + "\n")
    host = detect_novel_sites(str(gaf), str(gfa), w=3, engine="host")
    auto = detect_novel_sites(str(gaf), str(gfa), w=3)
    assert auto == host
    assert any(",start,1,500000," in r for r in host)  # the site IS found


def test_reverse_path_steps_skip_coordinates(tmp_path):
    """ADVICE r2: a reverse-oriented reference step ('2-') must not claim a
    forward-offset genomic mapping; sites on that node report '?' while the
    walk position still advances for downstream nodes."""
    gaf, gfa = _fixture(tmp_path)
    gfa2 = tmp_path / "rev.gfa"
    gfa2.write_text(gfa.read_text().replace("P\tchrZ\t1+,2+,3+\t*", "P\tchrZ\t1+,2-,3+\t*"))
    rows = detect_novel_sites(str(gaf), str(gfa2), w=3)
    by_node = {r.split(",")[3]: r for r in rows}
    assert by_node["2"].startswith("?,?,")  # no wrong coordinate emitted
    assert by_node["3"].startswith("chrZ,28,")  # node 3 still at 21+7


def test_subpath_coordinates_yield_to_exact_chrom(tmp_path):
    """ADVICE r2: reduce-mode '<chrom>.N' sub-paths restart positions at 1;
    when an exact chromosome path also covers the node it must win
    regardless of P-line order."""
    gaf, gfa = _fixture(tmp_path)
    gfa2 = tmp_path / "sub.gfa"
    # sub-path FIRST in the file; previously first-claimant-wins made its
    # local coordinates stick
    gfa2.write_text(
        gfa.read_text().replace(
            "P\tchrZ\t1+,2+,3+\t*", "P\tchrZ.1\t2+,3+\t*\nP\tchrZ\t1+,2+,3+\t*"
        )
    )
    assert detect_novel_sites(str(gaf), str(gfa2), w=3) == detect_novel_sites(
        str(gaf), str(gfa), w=3
    )


def test_native_scanner_matches_python(tmp_path):
    from pantas_tpu.native import native_available

    if not native_available():
        import pytest

        pytest.skip("native engine unavailable")
    gaf, gfa = _fixture(tmp_path)
    for w in (1, 3):
        host = detect_novel_sites(str(gaf), str(gfa), w=w, engine="host")
        native = detect_novel_sites(str(gaf), str(gfa), w=w, engine="native")
        assert native == host
    # with boundary sites and a different clip/mapq gate too
    host = detect_novel_sites(
        str(gaf), str(gfa), w=1, min_clip=1, mapq_thr=0, include_boundary=True,
        engine="host",
    )
    native = detect_novel_sites(
        str(gaf), str(gfa), w=1, min_clip=1, mapq_thr=0, include_boundary=True,
        engine="native",
    )
    assert native == host


def test_quantify_sites_psi_and_merging(tmp_path):
    """novel-sites --quant core: two conditions, clip evidence only in c2
    -> one typed event row with inclusion/clip PSI analogue and dpsi."""
    from pantas_tpu.events.sites import quantify_sites

    gaf1, gfa = _fixture(tmp_path)  # reuse graph; c1 = clean coverage only
    c1 = tmp_path / "c1.gaf"
    c1.write_text(
        "\n".join(_gaf(f"p{i}", 100, 0, 100, ">1>2>3", 30, 0, 29) for i in range(10))
        + "\n"
    )
    # c2: clean coverage + a 4-read clip pile at node 2 offset 4 (pos 15)
    c2 = tmp_path / "c2.gaf"
    c2.write_text(
        "\n".join(_gaf(f"q{i}", 100, 0, 100, ">1>2>3", 30, 0, 29) for i in range(6))
        + "\n"
        + "\n".join(_gaf(f"s{i}", 100, 30, 100, ">2>3", 20, 4, 19) for i in range(4))
        + "\n"
    )
    gtf = tmp_path / "a.gtf"
    gtf.write_text(GTF)
    rows = quantify_sites(
        [str(c1)], [str(c2)], str(tmp_path / "g.gfa"), str(gtf),
        w=3, canonical_tol=1,
    )
    assert len(rows) == 1, rows
    f = rows[0].split(",")
    # start site on a '-' gene: the acceptor-like terminus is the donor -> A5
    assert f[0] == "A5" and f[3] == "G1" and f[6] == "15"
    # c1: inclusion 10, clip 0 -> psi 1; c2: inclusion 10, clip 4
    assert f[7] == "10/0" and f[8] == "10/4"
    assert float(f[9]) == 1.0 and abs(float(f[10]) - 10 / 14) < 1e-9
    assert abs(float(f[11]) - (1 - 10 / 14)) < 1e-9


def test_quantify_sites_drops_annotated_shadows(tmp_path):
    """Clip piles at annotated exon boundaries are junction shadows and
    must not surface as events."""
    from pantas_tpu.events.sites import quantify_sites

    _, gfa = _fixture(tmp_path)
    c1 = tmp_path / "c1.gaf"
    c1.write_text(_gaf("p0", 100, 0, 100, ">1>2>3", 30, 0, 29) + "\n")
    # pile exactly at the exon start boundary (node 2 offset 0 = pos 11)
    c2 = tmp_path / "c2.gaf"
    c2.write_text(
        "\n".join(_gaf(f"s{i}", 100, 30, 100, ">2>3", 20, 1, 19) for i in range(5))
        + "\n"
    )
    gtf = tmp_path / "a.gtf"
    gtf.write_text(GTF)
    rows = quantify_sites(
        [str(c1)], [str(c2)], str(tmp_path / "g.gfa"), str(gtf),
        w=3, canonical_tol=1,
    )
    assert rows == [], rows


CE_GFA = """H\tVN:Z:1.0
S\t1\tAAAAAAAAAAAAAAAAAAAA\tEX:Z:T1_R1.1
S\t2\tCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCCC
S\t3\tGGGGGGGGGGGGGGGGGGGG\tEX:Z:T1_R1.2
L\t1\t+\t2\t+\t0M
L\t2\t+\t3\t+\t0M
L\t1\t+\t3\t+\t0M
P\tchrZ\t1+,2+,3+\t*
P\tT1_R1\t1+,3+\t*
"""

CE_GTF = (
    'chrZ\tsrc\ttranscript\t1\t90\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
    'chrZ\tsrc\texon\t1\t20\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
    'chrZ\tsrc\texon\t71\t90\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
)


def test_cassette_exon_candidate_pairing(tmp_path):
    """VERDICT r4 task 5: a novel cassette exon's two REACHABLE clip
    signatures sit at the flanking annotated intron's own boundaries
    (node-boundary piles the site detector drops as shadows). Paired
    long-clip piles at BOTH termini of one annotated intron + skip-
    junction traversal counts must yield a quantified CE row; shadow-
    length clips (< ce_min_clip) must not."""
    from pantas_tpu.events.sites import quantify_sites

    gfa = tmp_path / "ce.gfa"
    gfa.write_text(CE_GFA)
    gtf = tmp_path / "ce.gtf"
    gtf.write_text(CE_GTF)

    lines = []
    # inclusion reads: splice exonA -> CE, long clip at donor boundary
    for i in range(3):
        lines.append(_gaf(f"d{i}", 100, 0, 60, ">1", 20, 0, 19))  # tail clip 40
    # inclusion reads: splice CE -> exonB, long clip at acceptor boundary
    for i in range(3):
        lines.append(_gaf(f"a{i}", 100, 40, 100, ">3", 20, 0, 19))  # head clip 40
    # skip reads traversing the annotated junction A->B
    for i in range(5):
        lines.append(_gaf(f"k{i}", 40, 0, 40, ">1>3", 40, 0, 39))
    gaf1 = tmp_path / "c1.gaf"
    gaf1.write_text("\n".join(lines) + "\n")

    # condition 2: skip reads only
    gaf2 = tmp_path / "c2.gaf"
    gaf2.write_text(
        "\n".join(_gaf(f"k{i}", 40, 0, 40, ">1>3", 40, 0, 39) for i in range(5))
        + "\n"
    )

    rows = quantify_sites([str(gaf1)], [str(gaf2)], str(gfa), str(gtf))
    ce = [r.split(",") for r in rows if r.startswith("CE,")]
    assert len(ce) == 1
    r = ce[0]
    assert r[2] == "chrZ" and r[3] == "G1" and r[4] == "+"
    assert r[5] == "20" and r[6] == "71"  # donor exon end / acceptor exon start
    assert r[7] == "5/3" and r[8] == "5/0"
    assert abs(float(r[9]) - 5 / 8) < 1e-9 and float(r[10]) == 1.0
    assert abs(float(r[11]) - (5 / 8 - 1.0)) < 1e-9

    # shadow-length clips (arm the mapper refused, < ce_min_clip): no CE
    shadow = [
        _gaf(f"d{i}", 70, 0, 60, ">1", 20, 0, 19) for i in range(3)  # clip 10
    ] + [
        _gaf(f"a{i}", 70, 10, 70, ">3", 20, 0, 19) for i in range(3)  # clip 10
    ] + [_gaf(f"k{i}", 40, 0, 40, ">1>3", 40, 0, 39) for i in range(5)]
    gaf3 = tmp_path / "c3.gaf"
    gaf3.write_text("\n".join(shadow) + "\n")
    rows = quantify_sites([str(gaf3)], [str(gaf2)], str(gfa), str(gtf))
    assert not any(r.startswith("CE,") for r in rows)

    # one-sided pile (donor only): no pairing, no CE
    onesided = [
        _gaf(f"d{i}", 100, 0, 60, ">1", 20, 0, 19) for i in range(3)
    ] + [_gaf(f"k{i}", 40, 0, 40, ">1>3", 40, 0, 39) for i in range(5)]
    gaf4 = tmp_path / "c4.gaf"
    gaf4.write_text("\n".join(onesided) + "\n")
    rows = quantify_sites([str(gaf4)], [str(gaf2)], str(gfa), str(gtf))
    assert not any(r.startswith("CE,") for r in rows)


def test_zero_span_terminal_node_attributes_boundary(tmp_path):
    """Regression (r5): spliced joins can emit walks whose terminal node
    has ZERO aligned span (alignment ends exactly at a node boundary, the
    walk still lists the next node). The clip boundary must attach to the
    last COVERED node — discarding these records silenced the donor-side
    cassette-exon piles at genome scale. Both scanner engines."""
    from pantas_tpu.events.sites import detect_novel_sites

    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "H\tVN:Z:1.0\n"
        "S\t1\tAAAAAAAAAA\n"
        "S\t2\tCCCCCCCCCC\n"
        "L\t1\t+\t2\t+\t0M\n"
        "P\tchrZ\t1+,2+\t*\n"
    )
    lines = []
    for i in range(3):
        # aligned span ends at node 1's boundary (pend=10) but the walk
        # includes node 2 (zero aligned bases there); 30 bp tail clip
        lines.append(f"z{i}\t100\t0\t70\t+\t>1>2\t20\t3\t9\t7\t7\t60\tcs:Z::7")
    for i in range(3):
        # symmetric head case: alignment starts at node 2's first base,
        # walk still lists node 1 (zero aligned bases); 30 bp head clip
        lines.append(f"h{i}\t100\t30\t100\t+\t>1>2\t20\t10\t15\t6\t6\t60\tcs:Z::6")
    gaf = tmp_path / "z.gaf"
    gaf.write_text("\n".join(lines) + "\n")

    for engine in ("host", "native"):
        rows = detect_novel_sites(
            str(gaf), str(gfa), w=3, include_boundary=True, engine=engine
        )
        # end pile at node 1 offset 9 (its last base), genomic pos 10
        assert "chrZ,10,end,1,9,3,30,0,." in rows, (engine, rows)
        # start pile at node 2 offset 0, genomic pos 11
        assert "chrZ,11,start,2,0,3,30,0,." in rows, (engine, rows)
