"""Device coverage engine: shard-count invariance + byte-identical emission.

Coverage counts are integer adds, so 1 device and an 8-device CPU mesh must
produce bit-identical results — and both must match the host dict
accumulator byte-for-byte on the emitted GFA.
"""

import io

from fixtures_micro import write_micro

from pantas_tpu.coverage import augment_gfa
from pantas_tpu.coverage.device import augment_gfa_device
from pantas_tpu.graph.compiler import compile_gfa
from pantas_tpu.parallel.mesh import coverage_mesh


def _augment_host(gaf, gfa):
    buf, log = io.StringIO(), io.StringIO()
    augment_gfa(gaf, gfa, out=buf, log=log)
    return buf.getvalue()


def _augment_device(gaf, gfa, mesh=None, flush_every=1 << 20):
    buf, log = io.StringIO(), io.StringIO()
    augment_gfa_device(gaf, gfa, out=buf, mesh=mesh, flush_every=flush_every, log=log)
    return buf.getvalue()


def test_graph_tensor_layout(tmp_path):
    gfa, _ = write_micro(tmp_path)
    t = compile_gfa(gfa)
    assert t.n_nodes == 6
    assert t.n_edges == 7
    # histogram slots: offsets -1..len per node per side (len+2 each)
    assert t.total_slots == 6 + 2 * (int(sum(t.node_len)) + 2 * 6) + 7
    # edge lookup round-trip + novelty
    a, b = t.node_index["2"], t.node_index["3"]
    assert t.edge_lookup(a, b) >= 0
    assert t.edge_lookup(t.node_index["3"], t.node_index["5"]) == -1


def test_device_single_chip_matches_host(tmp_path):
    gfa, gaf = write_micro(tmp_path)
    assert _augment_device(gaf, gfa) == _augment_host(gaf, gfa)


def test_device_mesh_invariance(tmp_path):
    import jax

    gfa, gaf = write_micro(tmp_path)
    host = _augment_host(gaf, gfa)
    mesh = coverage_mesh(jax.devices()[:8])
    assert mesh.devices.size == 8
    assert _augment_device(gaf, gfa, mesh=mesh) == host
    # tiny flush size forces many partial psum merges — still identical
    assert _augment_device(gaf, gfa, mesh=mesh, flush_every=4) == host


def test_device_mesh2d_invariance(tmp_path):
    """2-D (data x node) mesh: counts sharded over the node axis must still
    emit byte-identically — ownership is by slot range, psum over data."""
    import jax

    from pantas_tpu.parallel.mesh import coverage_mesh_2d

    gfa, gaf = write_micro(tmp_path)
    host = _augment_host(gaf, gfa)
    mesh = coverage_mesh_2d(jax.devices()[:8], 4, 2)
    assert _augment_device(gaf, gfa, mesh=mesh) == host
    mesh = coverage_mesh_2d(jax.devices()[:8], 2, 4)
    assert _augment_device(gaf, gfa, mesh=mesh, flush_every=4) == host


def test_device_mesh_example_scale(tmp_path, example_graph):
    """Example-scale (62k-node) graph through 1-D and 2-D meshes: the real
    slot layout, real mapped alignments, byte-identical emission."""
    import sys

    import jax
    from conftest import REFERENCE, run_cli

    from pantas_tpu.parallel.mesh import coverage_mesh_2d

    ex = REFERENCE / "example"
    gaf = tmp_path / "s.gaf"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "map", str(example_graph),
         str(ex / "reads_1.fq"), str(ex / "reads_2.fq")],
        out_path=gaf,
    )
    host = _augment_host(str(gaf), str(example_graph))
    mesh1 = coverage_mesh(jax.devices()[:8])
    assert _augment_device(str(gaf), str(example_graph), mesh=mesh1) == host
    mesh2 = coverage_mesh_2d(jax.devices()[:8], 2, 4)
    assert _augment_device(str(gaf), str(example_graph), mesh=mesh2) == host
    # production native feed on the real slot layout, both mesh shapes
    assert _augment_device_native(str(gaf), str(example_graph), mesh=mesh1) == host
    assert _augment_device_native(str(gaf), str(example_graph), mesh=mesh2) == host


def _augment_device_native(gaf, gfa, mesh=None, flush_every=1 << 20):
    import io as _io

    from pantas_tpu.coverage.device import augment_gfa_device_native

    buf, log = _io.StringIO(), _io.StringIO()
    augment_gfa_device_native(
        gaf, gfa, out=buf, mesh=mesh, flush_every=flush_every, log=log
    )
    return buf.getvalue()


def test_device_native_feed_matches_host(tmp_path):
    """The production path: native C++ parse -> device scatter-add must be
    byte-identical to the host dict accumulator."""
    gfa, gaf = write_micro(tmp_path)
    host = _augment_host(gaf, gfa)
    assert _augment_device_native(gaf, gfa) == host
    # tiny batches force session carry-over between slots_next calls
    assert _augment_device_native(gaf, gfa, flush_every=4) == host


def test_device_native_feed_mesh_invariance(tmp_path):
    import jax

    from pantas_tpu.parallel.mesh import coverage_mesh_2d

    gfa, gaf = write_micro(tmp_path)
    host = _augment_host(gaf, gfa)
    mesh1 = coverage_mesh(jax.devices()[:8])
    assert _augment_device_native(gaf, gfa, mesh=mesh1) == host
    assert _augment_device_native(gaf, gfa, mesh=mesh1, flush_every=4) == host
    mesh2 = coverage_mesh_2d(jax.devices()[:8], 2, 4)
    assert _augment_device_native(gaf, gfa, mesh=mesh2) == host
    mesh2b = coverage_mesh_2d(jax.devices()[:8], 4, 2)
    assert _augment_device_native(gaf, gfa, mesh=mesh2b, flush_every=8) == host


def test_checkpoint_resume_reproduces_one_shot(tmp_path):
    """Crash-sim: process a truncated GAF with checkpointing, then resume on
    the full file — final output must equal the uninterrupted run."""
    from fixtures_micro import MICRO_GAF_LINES

    gfa, gaf = write_micro(tmp_path)
    one_shot = _augment_device(gaf, gfa, flush_every=8)

    # "crash" after the first 7 records: run on a truncated prefix
    truncated = tmp_path / "part.gaf"
    prefix = "\n".join(MICRO_GAF_LINES[:7]) + "\n"
    truncated.write_text(prefix)
    ckpt = str(tmp_path / "cov.ckpt")

    import io

    from pantas_tpu.coverage.device import augment_gfa_device

    buf, log = io.StringIO(), io.StringIO()
    augment_gfa_device(
        str(truncated), gfa, out=buf, flush_every=8,
        checkpoint_path=ckpt, log=log,
    )

    # resume against the FULL file (same byte prefix) in a fresh session
    buf2, log2 = io.StringIO(), io.StringIO()
    augment_gfa_device(
        gaf, gfa, out=buf2, flush_every=8,
        checkpoint_path=ckpt, resume=True, log=log2,
    )
    assert "Resuming from checkpoint" in log2.getvalue()
    assert buf2.getvalue() == one_shot


def test_native_checkpoint_resume_byte_identical(tmp_path):
    """Elastic recovery on the PRODUCTION native-fed device path: interrupt
    after a saved batch (test hook), resume from the checkpoint, and the
    emission must be byte-identical to the uninterrupted host run — counts
    restore exactly (pure adds) and the first-seen IL/OL + novel orders
    rebuild through the sidecar merge (absolute byte positions)."""
    import os

    from pantas_tpu.coverage.device import augment_gfa_device_native

    gfa, gaf = write_micro(tmp_path)
    big = tmp_path / "big.gaf"
    data = open(gaf).read()
    with open(big, "w") as fh:
        for _ in range(50):
            fh.write(data)
    expected = io.StringIO()
    augment_gfa(str(big), str(gfa), out=expected, log=io.StringIO())

    ck = str(tmp_path / "ck.pkl")
    r = augment_gfa_device_native(
        str(big), str(gfa), out=io.StringIO(), flush_every=64,
        checkpoint_path=ck, checkpoint_every=1, _stop_after=1,
        log=io.StringIO(),
    )
    assert r is None and os.path.exists(ck)

    buf = io.StringIO()
    augment_gfa_device_native(
        str(big), str(gfa), out=buf, flush_every=64,
        checkpoint_path=ck, resume=True, log=io.StringIO(),
    )
    assert buf.getvalue() == expected.getvalue()

    # uninterrupted run with checkpointing enabled stays identical too
    buf2 = io.StringIO()
    augment_gfa_device_native(
        str(big), str(gfa), out=buf2, flush_every=64,
        checkpoint_path=str(tmp_path / "ck2.pkl"), checkpoint_every=2,
        log=io.StringIO(),
    )
    assert buf2.getvalue() == expected.getvalue()


def _ckpt_resume_roundtrip(tmp_path, gfa, gaf, flush_every, tag):
    """Interrupt after the first checkpoint, resume, return
    (saved_state, resumed_emission, resumed_log)."""
    import os
    import pickle

    from pantas_tpu.coverage.device import augment_gfa_device_native

    ck = str(tmp_path / f"ck_{tag}.pkl")
    r = augment_gfa_device_native(
        str(gaf), str(gfa), out=io.StringIO(), flush_every=flush_every,
        checkpoint_path=ck, checkpoint_every=1, _stop_after=1,
        log=io.StringIO(),
    )
    assert r is None and os.path.exists(ck)
    with open(ck, "rb") as fh:
        state = pickle.load(fh)
    buf, log = io.StringIO(), io.StringIO()
    augment_gfa_device_native(
        str(gaf), str(gfa), out=buf, flush_every=flush_every,
        checkpoint_path=ck, resume=True, log=log,
    )
    return state, buf.getvalue(), log.getvalue()


def test_checkpoint_sparse_branch_resume(tmp_path):
    """The SPARSE counts encoding (counts_nz) must round-trip through
    save -> interrupt -> resume -> byte-identical emission. The micro
    fixture is naturally sparse (21 nz of 95 slots) — assert the branch
    actually taken so a layout change can't silently de-pin this test."""
    gfa, gaf = write_micro(tmp_path)
    big = tmp_path / "big.gaf"
    big.write_text(open(gaf).read() * 20)
    expected = io.StringIO()
    augment_gfa(str(big), str(gfa), out=expected, log=io.StringIO())

    state, got, log = _ckpt_resume_roundtrip(tmp_path, gfa, big, 64, "sparse")
    assert "counts_nz" in state and "counts" not in state
    assert got == expected.getvalue()
    # counters must report the FULL run on resume (sidecar merge sums them)
    assert "Rejected alignments: 20" in log  # 1 mapq-reject x 20 copies


def test_checkpoint_dense_branch_resume(tmp_path):
    """The DENSE counts encoding must round-trip identically. A 2-node
    graph with reads entering/leaving at every offset drives nnz*3 past
    the slot count, forcing the dense branch of _save_native_checkpoint."""
    gfa = tmp_path / "dense.gfa"
    gfa.write_text(
        "H\tVN:Z:1.1\n"
        "S\t1\tACGT\n"
        "S\t2\tACGT\n"
        "L\t1\t+\t2\t+\t*\n"
    )
    # IL/OL histogram slots key on TRANSITION offsets, so deletions that
    # end node 1 / start node 2 at varying offsets are what densify the
    # slot space (11 nz of 27 -> the dense branch)
    lines = []

    def add(name, cs, matches):
        lines.append(
            f"{name}\t{matches}\t0\t{matches}\t+\t>1>2\t8\t0\t8"
            f"\t{matches}\t8\t60\tcs:Z:{cs}\tdv:f:0.0"
        )

    add("p", ":8", 8)
    add("d1", ":3-t:4", 7)
    add("d2", ":2-gt:4", 6)
    add("d3", ":1-cgt:4", 5)
    add("e1", ":4-a:3", 7)
    add("e2", ":4-ac:2", 6)
    add("e3", ":4-acg:1", 5)
    lines.append("rv\t8\t0\t8\t+\t<2<1\t8\t0\t8\t8\t8\t60\tcs:Z::8\tdv:f:0.0")
    gaf = tmp_path / "dense.gaf"
    gaf.write_text("\n".join(lines * 8) + "\n")
    expected = io.StringIO()
    augment_gfa(str(gaf), str(gfa), out=expected, log=io.StringIO())

    state, got, _ = _ckpt_resume_roundtrip(tmp_path, gfa, gaf, 64, "dense")
    assert "counts" in state and "counts_nz" not in state
    assert got == expected.getvalue()


def test_checkpoint_drain_loops_past_flush_every(tmp_path):
    """Regression (ADVICE r4): the checkpoint residual drain must LOOP —
    one GAF record can yield more slots than flush_every, and a single
    slots_take_pending call would save an inconsistent (offset, counts)
    pair. flush_every=4 is far below the ~11 slots of the first record."""
    gfa, gaf = write_micro(tmp_path)
    big = tmp_path / "big.gaf"
    big.write_text(open(gaf).read() * 5)
    expected = io.StringIO()
    augment_gfa(str(big), str(gfa), out=expected, log=io.StringIO())

    _, got, _ = _ckpt_resume_roundtrip(tmp_path, gfa, big, 4, "tiny")
    assert got == expected.getvalue()
