"""Property test: every emitted path walks existing edges, adversarially.

Randomized VCFs with CLUSTERED variants — runs of reference-adjacent sites
mixing SNPs, anchored indels, pure (empty-alt) deletions, insertions and
multi-allelic alleles — are the inputs that used to expose missing edges in
``construct._wire_alt_tails`` (adjacent chains were only wired one level
deep).  The fixed wiring computes a transitive entry closure, so any
haplotype choosing alternates at arbitrarily deep adjacent chains must walk
existing edges.  Contract mirrors ``vg construct`` connectivity (reference
``build/build.smk:62-74``): paths and edges are consistent by construction.
"""

import io
import random

from pantas_tpu.build.construct import accept_variants, construct
from pantas_tpu.build.transcripts import project, validate_paths
from pantas_tpu.io.gtf import Transcript
from pantas_tpu.io.vcf import VcfVariant

BASES = "ACGT"


def _rand_variants(rng, ref, n_samples):
    """Clustered random variants: ~half start a run of adjacent sites."""
    variants = []
    pos = 2
    while pos < len(ref) - 6:
        run = rng.choice([1, 1, 2, 3, 4])  # cluster depth
        for _ in range(run):
            if pos >= len(ref) - 6:
                break
            kind = rng.random()
            ref_here = ref[pos - 1]
            if kind < 0.35:  # SNP (possibly multi-allelic)
                alts = rng.sample([b for b in BASES if b != ref_here], rng.choice([1, 1, 2]))
                span = 1
            elif kind < 0.55:  # pure deletion (empty alt)
                span = rng.choice([1, 2])
                ref_here = ref[pos - 1 : pos - 1 + span]
                alts = [""]
            elif kind < 0.75:  # anchored deletion
                span = rng.choice([2, 3])
                ref_here = ref[pos - 1 : pos - 1 + span]
                alts = [ref_here[0]]
            else:  # insertion
                span = 1
                alts = [ref_here + "".join(rng.choice(BASES) for _ in range(rng.randint(1, 4)))]
            gts = []
            for _ in range(n_samples):
                gts.append((rng.choice([0, 0, 1]), rng.choice([0, 0, 1, len(alts)])))
            variants.append(
                VcfVariant("c", pos, f"v{pos}", ref_here, tuple(alts), gts, [True] * n_samples)
            )
            pos += span  # next site starts immediately after -> adjacent
        pos += rng.choice([0, 1, 5, 12])  # sometimes keep chaining clusters
    return variants


def _consensus(ref, variants, sample, hap):
    out, i = [], 0
    for v in sorted(variants, key=lambda v: v.pos):
        a = v.genotypes[sample][hap] or 0
        if a == 0 or a > len(v.alts):
            continue
        out.append(ref[i : v.pos - 1])
        out.append(v.alts[a - 1])
        i = v.end
    out.append(ref[i:])
    return "".join(out)


def test_clustered_variant_paths_walk_existing_edges():
    rng = random.Random(1234)
    for trial in range(8):
        ref = "".join(rng.choice(BASES) for _ in range(rng.randint(120, 260)))
        n_samples = rng.randint(1, 3)
        variants = _rand_variants(rng, ref, n_samples)
        exons = [(3, len(ref) // 2), (len(ref) // 2 + 9, len(ref) - 2)]
        tr = [
            Transcript("T1", "G1", "c", "+", list(exons)),
            Transcript("T2", "G1", "c", "-", [exons[0]]),
        ]
        accepted, _ = accept_variants(variants, ref, log=io.StringIO())
        bounds = [sp for t in tr for sp in t.exons]
        g = construct(
            "c", ref, accepted, bounds,
            max_node_len=rng.choice([4, 8, 32]),
            log=io.StringIO(), prefiltered=True,
        )
        ptx = project(g, tr, accepted, [f"s{i}" for i in range(n_samples)], log=io.StringIO())

        # the product invariant (raises on violation)
        validate_paths(ptx)

        # full haplotype paths too (not emitted, but must be walkable)
        for h, name in enumerate(ptx.hap_names):
            path = ptx.hap_path(name)
            for a, b in zip(path, path[1:]):
                assert (a, b) in g.edges, (trial, name, a, b)
            # and they spell the variant-applied consensus
            s, hap = divmod(h, 2)
            assert "".join(g.seq(n) for n in path) == _consensus(
                ref, accepted, s, hap
            ), (trial, name)


def test_validate_paths_raises_on_bad_path():
    ref = "ACGTACGTAACCGG"
    g = construct("c", ref, [], [(3, 8)], max_node_len=32, log=io.StringIO(), prefiltered=True)
    ptx = project(g, [Transcript("T1", "G1", "c", "+", [(3, 8)])], [], [], log=io.StringIO())
    validate_paths(ptx)  # sane graph passes
    ptx.copies[0].path = [1, 3] if g.n_nodes() >= 3 else [2, 1]
    try:
        validate_paths(ptx)
    except AssertionError:
        pass
    else:
        raise AssertionError("validate_paths accepted a path with a missing edge")
