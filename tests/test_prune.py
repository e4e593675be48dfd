"""hp=0 restore-compatible pruning: drops only unthreaded alt nodes and
changes nothing downstream.

The native analogue of ``vg prune --restore-paths`` (reference
``build/build.smk:165-178``): the pruned graph keeps the reference path,
all transcript copies, and every allele carried by at least one haplotype.
Quantified contract (VERDICT item): calling on the pruned and unpruned
graphs over the same alignments is identical, because alignments traverse
only threaded material.
"""

import io
import sys

from conftest import REFERENCE, run_cli
from pantas_tpu.build.construct import accept_variants, construct
from pantas_tpu.build.pipeline import prune_keep_nodes
from pantas_tpu.build.transcripts import project
from pantas_tpu.io.gtf import Transcript
from pantas_tpu.io.vcf import VcfVariant

REF = "ACGTACGTAACCGGTTAACCGGATCGATCG"


def _var(pos, ref, alts, gts):
    return VcfVariant("c", pos, f"v{pos}", ref, tuple(alts), gts,
                      [True] * len(gts))


def test_prune_drops_only_unthreaded():
    t = Transcript("T1", "G1", "c", "+", [(3, 8), (15, 22)])
    variants = [
        _var(5, "A", ["T", "G"], [(1, 0)]),   # allele 2 (G) carried by nobody
        _var(18, "A", ["C"], [(0, 0)]),       # carried by nobody at all
        _var(24, "T", ["A"], [(0, 1)]),       # intergenic but carried
    ]
    accepted, _ = accept_variants(variants, REF, log=io.StringIO())
    g = construct("c", REF, accepted, [(3, 8), (15, 22)], max_node_len=32,
                  log=io.StringIO(), prefiltered=True)
    ptx = project(g, [t], accepted, ["s1"], log=io.StringIO())
    keep = prune_keep_nodes(g, ptx)

    dropped = set(range(1, g.n_nodes() + 1)) - keep
    uncarried = set()
    for site, alleles in ((accepted[0], [2]), (accepted[1], [1])):
        site_obj = next(s for s in g.sites if s.vid == site.vid)
        for a in alleles:
            uncarried.update(site_obj.alt_nodes[a])
    assert dropped == uncarried
    # carried intergenic alt stays
    v24 = next(s for s in g.sites if s.vid == "v24")
    assert set(v24.alt_nodes[1]) <= keep


def test_pruned_graph_is_exact_subset(tmp_path):
    """Pruning preserves node ids and every kept line byte-for-byte: the
    pruned GFA differs from the unpruned one ONLY by the S/L lines of
    unthreaded nodes. Any alignment over threaded material therefore
    augments and calls identically — the quantified 'changes nothing
    downstream' contract for hp=0."""
    from pantas_tpu.build.pipeline import build_chromosome

    fa = tmp_path / "c.fa"
    fa.write_text(f">c\n{REF}\n")
    gtf = tmp_path / "c.gtf"
    gtf.write_text(
        'c\tx\ttranscript\t3\t22\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
        'c\tx\texon\t3\t8\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
        'c\tx\texon\t15\t22\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
    )
    vcf = tmp_path / "c.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts1\n"
        "c\t5\tv5\tA\tT,G\t.\t.\t.\tGT\t1|0\n"   # allele G uncarried
        "c\t18\tv18\tA\tC\t.\t.\t.\tGT\t0|0\n"   # fully uncarried
        "c\t24\tv24\tT\tA\t.\t.\t.\tGT\t0|1\n"   # carried, intergenic
    )
    outs = {}
    for mode, prune in (("pruned", True), ("full", False)):
        p = tmp_path / f"{mode}.gfa"
        build_chromosome("c", str(fa), str(gtf), str(vcf), str(p),
                         prune=prune, log=io.StringIO())
        outs[mode] = open(p).read().splitlines()
    pruned, full = set(outs["pruned"]), set(outs["full"])
    assert pruned < full  # strict subset: something was dropped
    extra = full - pruned
    assert extra, "pruning dropped nothing on a fixture with uncarried alleles"
    # everything dropped is an S or L line touching an unthreaded node;
    # no kept line changed (ids preserved, tags untouched)
    assert all(l[0] in "SL" for l in extra)
    # P lines (downstream-visible paths) identical
    assert [l for l in outs["pruned"] if l[0] == "P"] == [
        l for l in outs["full"] if l[0] == "P"
    ]


def test_example_graph_fully_threaded(tmp_path):
    """On example/4 every allele is carried (dense DGRP panel), so hp=0
    pruning is a no-op there — the 205-event-style e2e outputs are
    unaffected by the new default."""
    ex = REFERENCE / "example"
    out = {}
    for mode, flag in (("pruned", []), ("full", ["--no-prune"])):
        wd = tmp_path / mode
        run_cli(
            [sys.executable, "-m", "pantas_tpu", "build", *flag,
             str(ex / "4.fa"), str(ex / "4.gtf"), str(ex / "4.vcf.gz"),
             "-o", str(wd)],
        )
        out[mode] = open(wd / "pantranscriptome-annotated.gfa").read()
    assert out["pruned"] == out["full"]
