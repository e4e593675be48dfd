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


def test_from_engine_equals_from_coverage(tmp_path):
    """r5: the native-engine fused constructor (counts applied straight
    from the engine's vector, no CoverageCounts dicts) must build the
    SAME SplicingGraph as from_coverage — nc/rc values, adjacency, novel
    junction set AND their first-seen insertion order."""
    import pytest

    native = pytest.importorskip("pantas_tpu.native")
    if not native.native_available():
        pytest.skip("native build unavailable")
    from pantas_tpu.graph.compiler import compile_gfa
    from pantas_tpu.native import NativeCoverage

    gfa, gaf = write_micro(tmp_path)
    # append an UNCOVERED node + link: every nc/rc must still be an int
    # (None means "un-augmented" to the caller — at genome scale leaving
    # uncovered nodes at None silently produced ZERO events)
    with open(gfa, "a") as fh:
        fh.write("S\t99\tACGTACGT\nL\t6\t+\t99\t+\t*\n")
    tensors = compile_gfa(gfa)
    eng = NativeCoverage(tensors)
    eng.process_file(gaf)
    a = SplicingGraph.from_engine(gfa, tensors, eng)
    b = SplicingGraph.from_coverage(gfa, eng.to_counts())
    assert all(isinstance(s.nc, int) for s in a.seg.values())
    assert all(isinstance(l.rc, int) for l in a.link.values())

    assert list(a.link) == list(b.link)  # insertion order incl. novels
    for pair in a.link:
        assert a.link[pair].rc == b.link[pair].rc, pair
        assert a.link[pair].novel == b.link[pair].novel, pair
    for nid in a.seg:
        assert a.seg[nid].nc == b.seg[nid].nc, nid
        assert a.seg[nid].outgoing == b.seg[nid].outgoing, nid
        assert a.seg[nid].incoming == b.seg[nid].incoming, nid
    assert a.novel_junctions == b.novel_junctions
    assert a.nj_by_head == b.nj_by_head and a.nj_by_tail == b.nj_by_tail


def test_replicate_cli_matches_staged(tmp_path):
    """CLI-level: `replicate` (from_engine path) row-identical to staged
    augment | call on the micro fixture, same hash seed."""
    import os
    import subprocess
    import sys

    gfa, gaf = write_micro(tmp_path)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    env["PYTHONHASHSEED"] = "0"

    def run(args):
        r = subprocess.run(
            [sys.executable, "-m", "pantas_tpu"] + args,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        )
        assert r.returncode == 0, args
        return r.stdout

    aug = tmp_path / "aug.gfa"
    aug.write_bytes(run(["augment", gaf, gfa]))
    gtf = tmp_path / "t.gtf"
    gtf.write_text(
        'c\tx\ttranscript\t1\t30\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
        'c\tx\texon\t1\t10\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
        'c\tx\texon\t21\t30\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
        'c\tx\ttranscript\t1\t30\t.\t+\t.\tgene_id "G1"; transcript_id "T2";\n'
        'c\tx\texon\t1\t12\t.\t+\t.\tgene_id "G1"; transcript_id "T2";\n'
        'c\tx\texon\t21\t30\t.\t+\t.\tgene_id "G1"; transcript_id "T2";\n'
    )
    staged = run(["call", "--rca", "0", str(aug), str(gtf)])
    fused = run(["replicate", "--rca", "0", gaf, gfa, str(gtf)])
    assert sorted(staged.splitlines()) == sorted(fused.splitlines())
