"""Mapper accuracy + MAPQ calibration (VERDICT round-1 item 10).

Reads sampled from the example graph's alignment paths at 1-5% divergence
must place on their truth locus, and MAPQ must be calibrated: the
``mapq >= 20`` population (what the augment filter keeps, reference
``alignments_augmentation_from_gaf.py:143-145``) must be nearly error-free
while ambiguous placements concentrate at mapq 0.
"""

import io

from pantas_tpu.eval.mapper_accuracy import MAPQ_BINS, evaluate


def test_accuracy_and_calibration(example_graph):
    results = evaluate(
        str(example_graph), n_reads=800, seed=11, log=io.StringIO()
    )
    by_div = {r.divergence: r for r in results}

    # placement accuracy at realistic divergence (VERDICT: 1-5%)
    for div in (0.0, 0.01, 0.02):
        r = by_div[div]
        assert r.mapped / r.total >= 0.95, (div, r.mapped, r.total)
        assert r.correct_q20 / r.mapped_q20 >= 0.995, (div, r.correct_q20)
    r5 = by_div[0.05]
    assert r5.mapped / r5.total >= 0.75
    assert r5.correct_q20 / r5.mapped_q20 >= 0.99

    # calibration: the q>=20 bins carry (almost) no wrong placements;
    # ambiguity concentrates at mapq 0
    for r in results:
        high = [r.bins[b] for b in MAPQ_BINS if b[0] >= 20]
        n = sum(s.n for s in high)
        wrong = sum(s.wrong for s in high)
        assert n > 0 and wrong / n <= 0.005, (r.divergence, wrong, n)
        q0 = r.bins[(0, 0)]
        if q0.n >= 20:  # enough mass to be meaningful
            assert q0.err >= 0.2, (r.divergence, q0.err)


def test_native_and_python_mapq_identical(example_graph):
    """The two engines must emit identical MAPQ on divergent reads."""
    import random

    from pantas_tpu.mapping.mapper import (
        NativePathAligner,
        PathIndex,
        align_read,
        alignment_to_gaf,
        load_alignment_paths,
    )
    from pantas_tpu.eval.mapper_accuracy import sample_reads

    index = PathIndex(load_alignment_paths(str(example_graph)))
    native = NativePathAligner(index)
    rng = random.Random(5)
    for tr in sample_reads(index, 60, 150, 0.02, 0.001, rng):
        hit = native.align_to_gaf(tr.name, tr.seq)
        aln = align_read(index, tr.seq)
        if hit is None:
            assert aln is None
            continue
        assert aln is not None
        assert hit[0] == alignment_to_gaf(index, tr.name, tr.seq, aln)


def test_index_cache_roundtrip(example_graph, tmp_path):
    """map --index: the persisted index must produce byte-identical GAF
    (cold build+save vs warm mmap load), and staleness (changed GFA
    mtime/size) must force a rebuild."""
    import io
    import os

    from pantas_tpu.mapping.mapper import map_reads

    ex = "/root/reference/example"
    cache = str(tmp_path / "idx")

    def run():
        buf, log = io.StringIO(), io.StringIO()
        map_reads(
            str(example_graph), f"{ex}/reads_1.fq", f"{ex}/reads_2.fq",
            out=buf, log=log, index_cache=cache,
        )
        return buf.getvalue(), log.getvalue()

    cold, log1 = run()
    assert "index cached ->" in log1
    warm, log2 = run()
    assert "index cache hit" in log2
    assert warm == cold

    # stale: touch the GFA -> mtime changes -> rebuild, same bytes
    os.utime(example_graph)
    re, log3 = run()
    assert "index cache hit" not in log3
    assert re == cold
