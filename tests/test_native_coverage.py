"""Native C++ coverage engine vs host accumulator (byte-identical)."""

import io

import pytest

from fixtures_micro import write_micro

from pantas_tpu.coverage import augment_gfa

native = pytest.importorskip("pantas_tpu.native")


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("g++ / native build unavailable")


def test_native_matches_host_bytes(tmp_path, have_native):
    gfa, gaf = write_micro(tmp_path)
    host_buf, log = io.StringIO(), io.StringIO()
    augment_gfa(gaf, gfa, out=host_buf, log=log)

    nat_buf, log2 = io.StringIO(), io.StringIO()
    counts = native.augment_gfa_native(gaf, gfa, out=nat_buf, log=log2)
    assert nat_buf.getvalue() == host_buf.getvalue()
    assert counts.rejected == 1 and counts.skipped == 2 and counts.accepted == 12


def test_native_gfa_scan_matches_python_compile(tmp_path, have_native):
    import numpy as np

    from pantas_tpu.graph.compiler import compile_gfa

    gfa, _ = write_micro(tmp_path)
    a = compile_gfa(gfa)
    b = compile_gfa(gfa, engine="python")
    assert a.node_names == b.node_names and a.node_index == b.node_index
    for f in ("node_len", "edge_key", "edge_src", "edge_dst", "il_base", "ol_base"):
        assert np.array_equal(getattr(a, f), getattr(b, f)), f
    assert (a.rc_base, a.total_slots) == (b.rc_base, b.total_slots)

    # non-canonical ids (leading zero) must fall back to the python parser
    odd = tmp_path / "odd.gfa"
    odd.write_text("S\t01\tACGT\nS\t2\tAC\nL\t01\t+\t2\t+\t*\n")
    t = compile_gfa(str(odd))
    assert t.node_names == ["01", "2"] and t.n_edges == 1


def test_native_binned_matches_host_bytes(tmp_path, have_native, monkeypatch):
    """Binned accumulation (the large-graph cache-friendly path, auto-on
    beyond 8M count slots) must stay byte-identical — forced on via the
    test hook, single- and multi-threaded, including first-seen IL/OL
    orders (the bitset predicate replaces counts[slot]==0 there)."""
    gfa, gaf = write_micro(tmp_path)
    host_buf = io.StringIO()
    augment_gfa(gaf, gfa, out=host_buf, log=io.StringIO())

    monkeypatch.setenv("PANTAS_FORCE_BINS", "1")
    for threads in (1, 2):
        buf = io.StringIO()
        native.augment_gfa_native(
            gaf, gfa, out=buf, log=io.StringIO(), threads=threads
        )
        assert buf.getvalue() == host_buf.getvalue(), f"threads={threads}"


def test_native_parallel_emit_matches_host_bytes(tmp_path, have_native, monkeypatch):
    """The chunked multi-threaded emitter (auto-on above 8 MB of GFA) must
    be byte-identical — forced on for the micro fixture via the test hook
    (exercises the atomic edge claims + ordered buffer writes)."""
    gfa, gaf = write_micro(tmp_path)
    host_buf = io.StringIO()
    augment_gfa(gaf, gfa, out=host_buf, log=io.StringIO())

    monkeypatch.setenv("PANTAS_EMIT_FORCE_MT", "1")
    monkeypatch.setenv("PANTAS_EMIT_THREADS", "2")
    buf = io.StringIO()
    native.augment_gfa_native(gaf, gfa, out=buf, log=io.StringIO(), threads=2)
    assert buf.getvalue() == host_buf.getvalue()


def test_kidx_sort_wide_keys(have_native):
    """kidx_sort must be a correct stable argsort for the FULL key width
    kidx_pack can emit (k<=32 -> up to 64-bit keys). Regression for the
    44-bit digit plan that silently mis-sorted k>=23 seed indexes
    (ADVICE r4): verify against numpy's stable argsort at k=28 and k=32."""
    import numpy as np

    rng = np.random.default_rng(7)
    seq = "".join(rng.choice(list("ACGT"), size=5000))
    for k in (21, 28, 32):
        n = len(seq) - k + 1
        kmers = np.zeros(n, dtype=np.uint64)
        native.kidx_pack(seq, k, kmers)
        # duplicate keys exist at small k -> stability is observable
        pids = rng.integers(0, 50, size=n).astype(np.int32)
        poss = np.arange(n, dtype=np.int32)
        order = np.argsort(kmers, kind="stable")
        want = (kmers[order], pids[order], poss[order])
        native.kidx_sort(kmers, pids, poss)
        assert np.array_equal(kmers, want[0]), f"k={k} keys"
        assert np.array_equal(pids, want[1]), f"k={k} pids"
        assert np.array_equal(poss, want[2]), f"k={k} poss"


def test_non_canonical_ids_fall_back(tmp_path, have_native):
    """Code-review r5: '007'-style ids int() onto their canonical twins
    and would silently merge count slots — the native engine must refuse
    (callers fall back to the byte-exact host path)."""
    import pytest

    from pantas_tpu.graph.compiler import compile_gfa

    gfa = tmp_path / "z.gfa"
    gfa.write_text("S\t007\tACGT\nS\t7\tGG\nL\t007\t+\t7\t+\t*\n")
    tensors = compile_gfa(str(gfa), engine="python")
    with pytest.raises(ValueError):
        native.NativeCoverage(tensors)


def test_clip_scan_dv_literal_not_tag(tmp_path, have_native):
    """Code-review r5: a bare 'dv:f:' literal inside another tag must not
    stop the dv scan — the real dv tag later on the line still filters
    the record (oracle regex semantics), in BOTH scan engines."""
    from pantas_tpu.events.sites import detect_novel_sites

    gfa = tmp_path / "g.gfa"
    gfa.write_text(
        "H\tVN:Z:1.0\nS\t1\tAAAAAAAAAA\nS\t2\tCCCCCCCCCC\n"
        "L\t1\t+\t2\t+\t0M\nP\tchrZ\t1+,2+\t*\n"
    )
    lines = []
    for i in range(3):
        # mid-node start at offset 4 with 30bp head clip, but a real
        # dv:f:0.9 tag AFTER a decoy 'dv:f:' literal -> must be dropped
        lines.append(
            f"d{i}\t100\t30\t100\t+\t>1>2\t20\t4\t19\t16\t16\t60"
            f"\txx:Z:dv:f:abc\tdv:f:0.9"
        )
    gaf = tmp_path / "a.gaf"
    gaf.write_text("\n".join(lines) + "\n")
    for engine in ("host", "native"):
        assert detect_novel_sites(str(gaf), str(gfa), w=3, engine=engine) == [], engine
