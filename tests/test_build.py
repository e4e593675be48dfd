"""Property tests for the native build layer (construct/project/annotate).

The key invariants (in lieu of a vg binary to diff against, per SURVEY §7.3):

* reference-path sequence reconstructs the input chromosome,
* haplotype paths reconstruct the variant-applied consensus,
* `_R1` transcript paths reconstruct the spliced transcript sequence,
* node ids are topologically sorted (every edge increases),
* EX/JN numbering matches the GTF exon structure.
"""

import io

import pytest

from pantas_tpu.build.annotate import annotate, write_annotated_gfa
from pantas_tpu.build.construct import accept_variants, construct
from pantas_tpu.build.transcripts import REF_HAP, project
from pantas_tpu.io.gfa import Gfa
from pantas_tpu.io.gtf import Transcript
from pantas_tpu.io.vcf import VcfVariant

#            1         2         3         4         5         6
#   123456789012345678901234567890123456789012345678901234567890
REF = "ACGTACGTAGGCCTTAGCATGCATGCATCCGGAATTCCGGTTAACCGGATCGATCGATCG"

# exons: T1 = [5,16] + [29,40] + [49,56]; T2 = [5,16] + [49,56] (skips mid)
T1 = Transcript("T1", "G1", "c", "+", [(5, 16), (29, 40), (49, 56)])
T2 = Transcript("T2", "G1", "+", "+", [(5, 16), (49, 56)])
T2 = Transcript("T2", "G1", "c", "+", [(5, 16), (49, 56)])


def _mkvar(pos, ref, alts, gts, vid=None):
    return VcfVariant(
        chrom="c",
        pos=pos,
        vid=vid or f"v{pos}",
        ref=ref,
        alts=tuple(alts),
        genotypes=gts,
        phased=[True] * len(gts),
    )


# two samples / four haplotypes
VARIANTS = [
    _mkvar(7, "G", ["T"], [(1, 0), (0, 0)]),          # SNP inside exon 1
    _mkvar(20, "T", ["TAA"], [(0, 1), (1, 1)]),        # insertion in intron
    _mkvar(31, "GG", ["G"], [(0, 0), (0, 1)]),         # deletion inside exon 2
    _mkvar(52, "G", ["A", "C"], [(2, 0), (0, 1)]),     # multi-allelic SNP, exon 3
]

SAMPLES = ["s1", "s2"]


def path_seq(graph, path):
    return "".join(graph.seq(n) for n in path)


def consensus(ref, variants, hap_idx):
    out = []
    i = 0
    for v in sorted(variants, key=lambda v: v.pos):
        s, h = divmod(hap_idx, 2)
        a = v.genotypes[s][h] or 0
        if a == 0:
            continue
        out.append(ref[i : v.pos - 1])
        out.append(v.alts[a - 1])
        i = v.end
    out.append(ref[i:])
    return "".join(out)


@pytest.fixture(scope="module")
def built():
    accepted, _ = accept_variants(VARIANTS, REF)
    exon_bounds = [sp for t in (T1, T2) for sp in t.exons]
    graph = construct("c", REF, accepted, exon_bounds, max_node_len=8)
    ptx = project(graph, [T1, T2], accepted, SAMPLES)
    ann = annotate(ptx)
    return graph, ptx, ann


def test_ref_path_reconstructs_reference(built):
    graph, _, _ = built
    assert path_seq(graph, graph.ref_path) == REF


def test_topological_ids(built):
    graph, _, _ = built
    assert all(a < b for a, b in graph.edges)


def test_haplotype_paths_match_consensus(built):
    graph, ptx, _ = built
    for h, name in enumerate(ptx.hap_names):
        assert path_seq(graph, ptx.hap_path(name)) == consensus(REF, VARIANTS, h)


def test_ref_transcripts_match_spliced_sequence(built):
    graph, ptx, _ = built
    for t in (T1, T2):
        spliced = "".join(REF[s - 1 : e] for s, e in t.exons)
        copy = next(c for c in ptx.copies if c.name == f"{t.tid}_R1")
        assert path_seq(graph, copy.path) == spliced
        assert copy.source_hap == REF_HAP


def test_haplotype_transcripts_substitute_alleles(built):
    graph, ptx, _ = built
    # T1 exon-1 SNP at pos 7 (sample s1 hap 1) must appear in some copy
    names = {c.name for c in ptx.copies}
    assert any(n.startswith("T1_H") for n in names)
    for c in ptx.copies:
        if c.tid == "T1" and c.name != "T1_R1":
            seq = path_seq(graph, c.path)
            assert len(seq) > 0
            # all haplotype copies differ from the reference splice
            spliced = "".join(REF[s - 1 : e] for s, e in T1.exons)
            assert seq != spliced


def test_annotation_exon_numbering(built):
    _, ptx, ann = built
    r1 = next(c for c in ptx.copies if c.name == "T1_R1")
    # exon labels on the path cover exactly 1..3
    labels = set()
    for nid in r1.path:
        for lab in ann.ex.get(nid, []):
            if lab.startswith("T1_R1."):
                labels.add(lab)
    assert labels == {"T1_R1.1", "T1_R1.2", "T1_R1.3"}
    # two junctions with consecutive numbering
    jlabels = sorted(
        lab for labs in ann.jn.values() for lab in labs if lab.startswith("T1_R1.")
    )
    assert jlabels == ["T1_R1.1.2", "T1_R1.2.3"]


def test_skip_transcript_junction(built):
    _, ptx, ann = built
    jlabels = [lab for labs in ann.jn.values() for lab in labs if lab.startswith("T2_R1.")]
    assert jlabels == ["T2_R1.1.2"]


def test_emitted_gfa_is_loadable_and_consistent(built):
    _, ptx, ann = built
    buf = io.StringIO()
    write_annotated_gfa(ptx, ann, buf)
    g = Gfa.load_from_text = None  # not provided; parse via temp approach
    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".gfa", delete=False) as fh:
        fh.write(buf.getvalue())
        tmp = fh.name
    try:
        g = Gfa.load(tmp)
        # every path step must reference an existing segment and edge
        for p in g.paths:
            ids = [sid for sid, _ in p.steps]
            for a, b in zip(ids, ids[1:]):
                assert g.has_link(a, b), (p.name, a, b)
    finally:
        os.unlink(tmp)
