"""Independent build-layer oracle: hand-computed golden annotated GFAs.

Round-1 differential tests fed OUR graph + OUR alignments to both
implementations, so the build layer itself was only property-tested, never
checked against an external expectation.  This suite is the independent
oracle: every expected tag/line below is derived BY HAND from the
reference's published semantics, not from running any code:

* tag vocabulary + worked examples: ``/root/reference/docs/README.md:1-41``
  (``EX:Z:[Transcript].[Exon_Number]`` on S lines,
  ``JN:Z:[Transcript].[Exon_From].[Exon_To]`` on L lines);
* exon-numbering direction: ``/root/reference/build/annotate.cpp:141-142``
  reverses every transcript path to ASCENDING node-id order before walking
  (``if (id(path[0]) > id(path[1])) reversePath(path)``), so exon numbers
  are always assigned in genomic-coordinate order, for BOTH strands;
* that convention is load-bearing downstream:
  ``/root/reference/scripts/remap.py:64-65`` sorts GTF exons by coordinate
  and indexes ``T.e1.e2`` as ``exons[e1-1]``/``exons[e2-1]`` with
  ``assert s <= e`` (``remap.py:142-146``) — junction labels MUST name the
  genomically-left exon first or remap crashes;
* junction detection: an edge of the transcript path absent from its source
  haplotype's edge set is a junction (``annotate.cpp:173-184``); edges
  present in the haplotype (including alternate-allele edges within an
  exon) are NOT junctions.

Fixtures cover: forward strand, reverse strand, het SNP haplotype copies,
multi-allelic sites, insertions, deletions, and exon-straddling variants.
"""

import io

from pantas_tpu.build.annotate import annotate, write_annotated_gfa
from pantas_tpu.build.construct import accept_variants, construct
from pantas_tpu.build.transcripts import project
from pantas_tpu.io.gtf import Transcript
from pantas_tpu.io.vcf import VcfVariant
from pantas_tpu.remap.remap import remap

#          1         2         3
# 123456789012345678901234567890
REF = "ACGTACGTAACCGGTTAACCGGATCGATCG"  # 30 bp

EXONS = [(3, 8), (15, 22)]


def _var(pos, ref, alts, gts, vid=None):
    return VcfVariant(
        chrom="c",
        pos=pos,
        vid=vid or f"v{pos}",
        ref=ref,
        alts=tuple(alts),
        genotypes=gts,
        phased=[True] * len(gts),
    )


def _build(transcripts, variants, samples, max_node_len=32):
    accepted, _ = accept_variants(variants, REF, log=io.StringIO())
    bounds = [sp for t in transcripts for sp in t.exons]
    graph = construct(
        "c", REF, accepted, bounds, max_node_len=max_node_len,
        log=io.StringIO(), prefiltered=True,
    )
    ptx = project(graph, transcripts, accepted, samples, log=io.StringIO())
    ann = annotate(ptx, log=io.StringIO())
    out = io.StringIO()
    write_annotated_gfa(ptx, ann, out)
    return graph, ptx, ann, out.getvalue()


# ---------------------------------------------------------------------------
# O1: forward-strand 2-exon transcript, no variants — full byte golden.
#
# Expected graph, derived by hand: cuts at exon boundaries {2,8,14,22} plus
# chromosome ends give nodes 1=[1,2]AC 2=[3,8]GTACGT 3=[9,14]AACCGG
# 4=[15,22]TTAACCGG 5=[23,30]ATCGATCG; the transcript path is 2,4 with the
# splice edge (2,4).  Per docs/README.md:17 (``S 5 AAA ... EX:Z:Ttest.1``)
# exon-1 nodes carry ``<name>.1``; per docs/README.md:34
# (``L 15 + 16 + 0M JN:Z:Ttest.2.3``) the splice edge carries
# ``<name>.1.2``.
# ---------------------------------------------------------------------------

GOLDEN_FORWARD = """H\tVN:Z:1.1
S\t1\tAC
S\t2\tGTACGT\tEX:Z:Ttest_R1.1
S\t3\tAACCGG
S\t4\tTTAACCGG\tEX:Z:Ttest_R1.2
S\t5\tATCGATCG
L\t1\t+\t2\t+\t*
L\t2\t+\t3\t+\t*
L\t2\t+\t4\t+\t*\tJN:Z:Ttest_R1.1.2
L\t3\t+\t4\t+\t*
L\t4\t+\t5\t+\t*
P\tc\t1+,2+,3+,4+,5+\t*
P\tTtest_R1\t2+,4+\t*
"""


def test_forward_two_exon_golden_gfa():
    t = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    _, _, _, text = _build([t], [], [])
    assert text == GOLDEN_FORWARD


# ---------------------------------------------------------------------------
# O2: reverse strand.  annotate.cpp:141-142 reverses descending-id paths, so
# the annotated GFA of a '-' transcript with the same exon coordinates is
# IDENTICAL to the forward one — exon 1 is the genomically-left exon even
# though biologically it is the transcript's last exon.
# ---------------------------------------------------------------------------


def test_reverse_strand_same_numbering():
    t = Transcript("Ttest", "G1", "c", "-", list(EXONS))
    _, _, _, text = _build([t], [], [])
    assert text == GOLDEN_FORWARD


def test_remap_reverse_strand_junction(tmp_path):
    """'-'-strand junction labels survive remap's coordinate algebra.

    remap.py:142-146 asserts ``s <= e`` after indexing the coordinate-sorted
    exon list — only coordinate-ordered exon numbering satisfies it.  For
    the 3-exon '-' transcript with exons [3,8],[15,22],[25,28] the ES row's
    regions must be the introns c:9-14 (T.1.2), c:23-24 (T.2.3) and
    c:9-24 (T.1.3).  The annotated-IR reorder puts the retained-intron
    exon span first and CLOBBERS the junction region to '?'
    (reference remap.py:181-190 quirk).
    """
    gtf = tmp_path / "t.gtf"
    lines = []
    for s, e in [(25, 28), (15, 22), (3, 8)]:  # GTF order: transcript order
        lines.append(
            f'c\tx\texon\t{s}\t{e}\t.\t-\t.\tgene_id "G1"; transcript_id "Ttest";\n'
        )
    gtf.write_text(
        'c\tx\ttranscript\t3\t28\t.\t-\t.\tgene_id "G1"; transcript_id "Ttest";\n'
        + "".join(lines)
    )
    csv = tmp_path / "q.csv"
    csv.write_text(
        "etype,annotation_type,chrom,gene,strand,junction1_name,junction2_name,"
        "junction3_name,junction1_nodes,junction2_nodes,junction3_nodes,"
        "W1,W2,psi_c1,psi_c2,dpsi\n"
        "ES,annotated,c,G1,-,Ttest_R1.1.2,Ttest_R1.2.3,Ttest_R1.1.3,"
        "2>4,4>6,2>6,10,10,0.5,0.5,0.0\n"
        "IR,annotated,c,G1,-,Ttest_R1.1.2,Ttest_R1.1,.,2>4,2,.,"
        "10,10,0.5,0.5,0.0\n"
    )
    rows = list(remap(str(csv), str(gtf)))
    assert len(rows) == 3
    es = rows[1].split(",")
    assert es[0] == "ES" and es[2] == "reference"
    assert es[12] == "c:9-14"
    assert es[13] == "c:23-24"
    assert es[14] == "c:9-24"
    ir = rows[2].split(",")
    # annotated IR reorder: retained-intron exon span first, junction lost
    assert ir[12] == "c:3-8"  # exon 1 full span (T.1)
    assert ir[13] == "?"      # reference clobber quirk


# ---------------------------------------------------------------------------
# O3: het SNP inside exon 1 — haplotype-aware transcript copy.
#
# SNP A>T at pos 5 (sample s1, GT 1|0).  Hand-derived graph: extra cuts at
# {4,5}; nodes 1=[1,2]AC 2=[3,4]GT 3=[5,5]A 4=alt"T" 5=[6,8]CGT 6=[9,14]
# 7=[15,22] 8=[23,30].  The haplotype copy Ttest_H1 walks the alt node; its
# within-exon alt edges (2,4),(4,5) ARE in haplotype s1#1's edge set, so
# they are NOT junctions (annotate.cpp:173-184) — only the splice edge
# (5,7) is, for both copies.
# ---------------------------------------------------------------------------

GOLDEN_SNP = """H\tVN:Z:1.1
S\t1\tAC
S\t2\tGT\tEX:Z:Ttest_R1.1,Ttest_H1.1
S\t3\tA\tEX:Z:Ttest_R1.1
S\t4\tT\tEX:Z:Ttest_H1.1
S\t5\tCGT\tEX:Z:Ttest_R1.1,Ttest_H1.1
S\t6\tAACCGG
S\t7\tTTAACCGG\tEX:Z:Ttest_R1.2,Ttest_H1.2
S\t8\tATCGATCG
L\t1\t+\t2\t+\t*
L\t2\t+\t3\t+\t*
L\t2\t+\t4\t+\t*
L\t3\t+\t5\t+\t*
L\t4\t+\t5\t+\t*
L\t5\t+\t6\t+\t*
L\t5\t+\t7\t+\t*\tJN:Z:Ttest_R1.1.2,Ttest_H1.1.2
L\t6\t+\t7\t+\t*
L\t7\t+\t8\t+\t*
P\tc\t1+,2+,3+,5+,6+,7+,8+\t*
P\tTtest_R1\t2+,3+,5+,7+\t*
P\tTtest_H1\t2+,4+,5+,7+\t*
"""


def test_het_snp_haplotype_copy_golden():
    t = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    v = _var(5, "A", ["T"], [(1, 0)])
    graph, ptx, _, text = _build([t], [v], ["s1"])
    assert text == GOLDEN_SNP
    (h1,) = [c for c in ptx.copies if c.name == "Ttest_H1"]
    assert h1.source_hap == "s1#1"
    assert "".join(graph.seq(n) for n in h1.path) == "GTTCGT" + "TTAACCGG"


# ---------------------------------------------------------------------------
# O4: multi-allelic SNP + insertion + deletion, two samples.
# ---------------------------------------------------------------------------


def test_multiallelic_and_indels():
    t = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    variants = [
        _var(4, "T", ["G", "C"], [(1, 0), (0, 2)]),  # multi-allelic SNP, exon 1
        _var(11, "C", ["CTT"], [(0, 1), (0, 0)]),    # insertion in the intron
        _var(16, "TA", ["T"], [(0, 0), (1, 1)]),     # deletion inside exon 2
    ]
    graph, ptx, ann, _ = _build([t], variants, ["s1", "s2"])

    names = {c.name: c for c in ptx.copies}
    # 3 distinct in-exon signatures over sites (v4,v16), by first occurrence:
    # s1#1=(1,0), s2#1=(0,1), s2#2=(2,1)
    assert set(names) == {"Ttest_R1", "Ttest_H1", "Ttest_H2", "Ttest_H3"}

    def spliced(copy):
        return "".join(graph.seq(n) for n in copy.path)

    # exon1 = GTACGT with pos-4 substitutions; exon2 = TTAACCGG w/ pos-16-17
    # deletion TA>T making TTACCGG
    assert spliced(names["Ttest_R1"]) == "GTACGT" + "TTAACCGG"
    assert spliced(names["Ttest_H1"]) == "GGACGT" + "TTAACCGG"  # s1#1: alt 1
    assert spliced(names["Ttest_H2"]) == "GTACGT" + "TTACCGG"   # s2#1: deletion
    assert spliced(names["Ttest_H3"]) == "GCACGT" + "TTACCGG"   # s2#2: alt2 + del

    # every copy has exactly one junction (the single splice edge), numbered .1.2
    jn_labels = [lab for labs in ann.jn.values() for lab in labs]
    assert sorted(jn_labels) == sorted(f"{n}.1.2" for n in names)
    # and every junction edge joins exon-1-tagged to exon-2-tagged nodes
    for (a, b), labs in ann.jn.items():
        for lab in labs:
            name = lab.rsplit(".", 2)[0]
            assert f"{name}.1" in ann.ex[a]
            assert f"{name}.2" in ann.ex[b]

    # intron-only insertion must not create a 4th signature or touch exons
    ins_nodes = {n for s in graph.sites if s.vid == "v11" for n in s.alt_nodes[1]}
    for n in ins_nodes:
        assert n not in ann.ex


# ---------------------------------------------------------------------------
# O5: variant straddling the exon boundary is substituted whole + counted.
# ---------------------------------------------------------------------------


def test_exon_straddling_deletion():
    t = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    # deletion 14-16 straddles exon-2 start (15): REF "GTT" -> "G"
    v = _var(14, "GTT", ["G"], [(1, 0)])
    graph, ptx, ann, _ = _build([t], [v], ["s1"])
    assert ptx.straddling_sites >= 1
    names = {c.name: c for c in ptx.copies}
    assert "Ttest_H1" in names
    # the hap copy substitutes the WHOLE site (intronic part included):
    # exon1 GTACGT, then alt "G" replaces ref 14-16, then rest of exon2
    assert "".join(graph.seq(n) for n in names["Ttest_H1"].path) == (
        "GTACGT" + "G" + "AACCGG"
    )
    # both copies' paths traverse only existing edges
    for c in ptx.copies:
        for a, b in zip(c.path, c.path[1:]):
            assert (a, b) in graph.edges, (c.name, a, b)


# ---------------------------------------------------------------------------
# Vocabulary conformance (docs/README.md:7,27): label grammar + coordinate
# monotonicity of exon numbering on every fixture above.
# ---------------------------------------------------------------------------


def test_tag_vocabulary_and_monotonicity():
    t1 = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    t2 = Transcript("Trev", "G1", "c", "-", [(3, 8), (11, 14), (23, 28)])
    variants = [
        _var(5, "A", ["T"], [(1, 0)]),
        _var(24, "T", ["A"], [(0, 1)]),
    ]
    graph, ptx, ann, _ = _build([t1, t2], variants, ["s1"])

    for nid, labs in ann.ex.items():
        for lab in labs:
            name, e = lab.rsplit(".", 1)
            assert int(e) >= 1
    for (a, b), labs in ann.jn.items():
        assert a < b  # ids topologically sorted => junctions go left->right
        for lab in labs:
            name, e1, e2 = lab.rsplit(".", 2)
            assert int(e2) == int(e1) + 1

    # per-copy: exon numbers along the path are non-decreasing and start at 1
    for copy in ptx.copies:
        nums = []
        for n in copy.path:
            mine = [
                int(l.rsplit(".", 1)[1])
                for l in ann.ex.get(n, [])
                if l.rsplit(".", 1)[0] == copy.name
            ]
            assert len(mine) == 1, (copy.name, n)
            nums.append(mine[0])
        assert nums[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(nums, nums[1:]))
        assert nums[-1] == len(copy.exon_breaks)


# ---------------------------------------------------------------------------
# O7: restore-compatible pruning — the annotate.cpp:258-297 analogue.
#
# The reference prunes complex regions (``vg prune --restore-paths``,
# build.smk:165-178) and annotate re-emits every path over the pruned graph
# from the GBWT when the graph arrives pathless (annotate.cpp:258-297).
# Hand-derived expectation for O3's fixture plus a second SNP A>G at pos 17
# (exon 2) that NO sample carries: the alt node exists unpruned (vg
# construct --alt-paths adds all alleles) but is unthreaded, so pruning
# drops exactly that node and its two edges while EVERY P line — reference
# chromosome, reference-projected transcript, haplotype copy — re-emits
# byte-identically.
# ---------------------------------------------------------------------------


def test_prune_drops_unthreaded_alt_and_reemits_paths():
    from pantas_tpu.build.pipeline import prune_keep_nodes

    t = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    carried = _var(5, "A", ["T"], [(1, 0)])
    uncarried = _var(17, "A", ["G"], [(0, 0)])
    graph, ptx, ann, full = _build([t], [carried, uncarried], ["s1"])

    # hand-derived node map: cuts {2,8,14,22} + {4,5} + {16,17} =>
    # 9 = the pos-17 alt node "G" (after ref node 8=[17,17]"A")
    assert graph.seq(8) == "A" and graph.seq(9) == "G"
    assert "S\t9\tG\n" in full  # unpruned graph carries the alt

    keep = prune_keep_nodes(graph, ptx)
    assert 9 not in keep  # the one unthreaded node
    assert keep == set(range(1, graph.n_nodes() + 1)) - {9}

    out = io.StringIO()
    write_annotated_gfa(ptx, ann, out, keep_nodes=keep)
    pruned = out.getvalue()
    assert "S\t9\tG\n" not in pruned
    assert "L\t7\t+\t9\t+" not in pruned and "L\t9\t+\t10\t+" not in pruned
    # every path re-emitted byte-identically over the pruned graph
    full_paths = [l for l in full.splitlines() if l[0] == "P"]
    pruned_paths = [l for l in pruned.splitlines() if l[0] == "P"]
    assert pruned_paths == full_paths == [
        "P\tc\t1+,2+,3+,5+,6+,7+,8+,10+,11+\t*",
        "P\tTtest_R1\t2+,3+,5+,7+,8+,10+\t*",
        "P\tTtest_H1\t2+,4+,5+,7+,8+,10+\t*",
    ]


# ---------------------------------------------------------------------------
# O8: W-line (GFA 1.1 walk) emission + downstream-ignore contract.
#
# Hand-derived for O3's fixture: the haplotype copy Ttest_H1 (source s1#1,
# path 2,4,5,7, lengths 2+1+3+8) becomes
#   W  s1  1  Ttest_H1  0  14  >2>4>5>7
# while reference-projected paths stay P lines. Downstream stages dispatch
# on the first byte (S/L/P) exactly like the reference scripts, so augment
# must emit identical coverage tags for both representations and call must
# produce identical rows.
# ---------------------------------------------------------------------------


def test_w_line_walks_golden_and_downstream_ignore(tmp_path):
    t = Transcript("Ttest", "G1", "c", "+", list(EXONS))
    v = _var(5, "A", ["T"], [(1, 0)])
    accepted, _ = accept_variants([v], REF, log=io.StringIO())
    bounds = list(EXONS)
    graph = construct(
        "c", REF, accepted, bounds, max_node_len=32,
        log=io.StringIO(), prefiltered=True,
    )
    ptx = project(graph, [t], accepted, ["s1"], log=io.StringIO())
    ann = annotate(ptx, log=io.StringIO())
    p_out, w_out = io.StringIO(), io.StringIO()
    write_annotated_gfa(ptx, ann, p_out)
    write_annotated_gfa(ptx, ann, w_out, w_lines=True)
    w_text = w_out.getvalue()
    assert "W\ts1\t1\tTtest_H1\t0\t14\t>2>4>5>7\n" in w_text
    assert "P\tTtest_H1" not in w_text
    assert "P\tTtest_R1\t2+,3+,5+,7+\t*\n" in w_text  # ref copy stays P

    p_gfa, w_gfa = tmp_path / "p.gfa", tmp_path / "w.gfa"
    p_gfa.write_text(p_out.getvalue())
    w_gfa.write_text(w_text)
    gaf = tmp_path / "r.gaf"
    gaf.write_text(
        "r0\t14\t0\t14\t+\t>2>4>5>7\t14\t0\t14\t14\t14\t60\tcs:Z::14\n"
        "r1\t10\t0\t10\t+\t>2>3>5>7\t14\t1\t11\t10\t10\t60\tcs:Z::10\n"
    )
    from pantas_tpu.coverage import augment_gfa

    def run(gfa_path):
        buf = io.StringIO()
        augment_gfa(str(gaf), str(gfa_path), out=buf, log=io.StringIO())
        return buf.getvalue()

    aug_p, aug_w = run(p_gfa), run(w_gfa)
    strip = lambda text: [l for l in text.splitlines() if l[:1] not in ("P", "W")]
    assert strip(aug_p) == strip(aug_w)  # identical S/L tag emission

    gtf = tmp_path / "t.gtf"
    gtf.write_text(
        'c\tx\ttranscript\t3\t22\t.\t+\t.\tgene_id "G1"; transcript_id "Ttest";\n'
        'c\tx\texon\t3\t8\t.\t+\t.\tgene_id "G1"; transcript_id "Ttest";\n'
        'c\tx\texon\t15\t22\t.\t+\t.\tgene_id "G1"; transcript_id "Ttest";\n'
    )
    ap, aw = tmp_path / "ap.gfa", tmp_path / "aw.gfa"
    ap.write_text(aug_p)
    aw.write_text(aug_w)
    from pantas_tpu.events import CallOptions, call_events

    rows_p = sorted(call_events(str(ap), str(gtf), CallOptions(rca=0)))
    rows_w = sorted(call_events(str(aw), str(gtf), CallOptions(rca=0)))
    assert rows_p == rows_w
