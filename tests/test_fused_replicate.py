"""Fused replicate pipeline: GAF -> events with no augmented-GFA round trip
must call exactly what the staged augment-then-call pipeline calls."""

import io

from fixtures_micro import write_micro

from pantas_tpu.coverage.host import accumulate_gaf, emit_augmented_gfa, load_node_lengths
from pantas_tpu.events.caller import SplicingGraph


def test_from_coverage_equals_parsed_augmented(tmp_path):
    gfa, gaf = write_micro(tmp_path)
    node_len = load_node_lengths(gfa)
    with open(gaf) as fh:
        counts = accumulate_gaf(fh, node_len)

    aug = tmp_path / "aug.gfa"
    with open(aug, "w") as out:
        emit_augmented_gfa(gfa, counts, out)

    staged = SplicingGraph.from_gfa(str(aug))
    fused = SplicingGraph.from_coverage(gfa, counts)

    assert set(staged.link) == set(fused.link)
    for pair in staged.link:
        assert staged.link[pair].rc == fused.link[pair].rc, pair
        assert staged.link[pair].jn == fused.link[pair].jn, pair
        assert staged.link[pair].novel == fused.link[pair].novel, pair
    for nid in staged.seg:
        assert staged.seg[nid].nc == fused.seg[nid].nc, nid
        assert staged.seg[nid].outgoing == fused.seg[nid].outgoing, nid
        assert staged.seg[nid].incoming == fused.seg[nid].incoming, nid
    assert staged.junctions == fused.junctions
    assert staged.novel_junctions == fused.novel_junctions
