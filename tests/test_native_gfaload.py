"""Native GFA loader parity: identical structures to the Python parser.

The native loader (``native/gfaload.cpp``) must reproduce the pure-Python
``SplicingGraph._from_gfa_py`` exactly — contents AND insertion/iteration
orders (downstream row content is hash-order sensitive, so the two loaders
must be indistinguishable within a process)."""

import io

import pytest

from pantas_tpu.events.caller import CallOptions, SplicingGraph, call_events
from pantas_tpu.native.gfaload import get_module

GFA = """H\tVN:Z:1.1
S\t1\tACGT\tNC:i:9
S\t2\tGG\tEX:Z:T1_R1.1,T1_H1.1\tNC:i:5
S\t3\tTTT\tNC:i:0\tEX:Z:T1_R1.2
S\t4\tC\tEX:Z:T1_H1.2\tNC:i:1
S\t5\tACGTACGT\tLN:i:8\tNC:i:7\tEX:Z:T1_R1.2,T1_H1.3
S\t6\tA\tEX:Z:\tNC:i:0
L\t1\t+\t2\t+\t*\tRC:i:3
L\t2\t+\t3\t+\t*\tJN:Z:T1_R1.1.2,T1_H1.1.2\tRC:i:4
L\t2\t+\t4\t+\t*\tRC:i:1\tID:Z:N
L\t3\t+\t5\t+\t*\tRC:i:0
L\t4\t+\t5\t+\t*\tJN:Z:T1_H1.2.3\tRC:i:2
L\t5\t+\t6\t+\t*\tRC:i:0
P\tref\t1+,2+,3+,5+,6+\t*
W\ts1\t1\tT1_H1\t0\t9\t>1>2>4>5
"""


@pytest.fixture()
def gfa_file(tmp_path):
    p = tmp_path / "g.gfa"
    p.write_text(GFA)
    return str(p)


def test_loader_available():
    assert get_module() is not None, "native gfaload extension failed to build"


def test_structures_identical(gfa_file):
    gn = SplicingGraph.from_gfa(gfa_file)
    gp = SplicingGraph._from_gfa_py(gfa_file)

    assert list(gn.seg) == list(gp.seg)
    for nid in gp.seg:
        a, b = gn.seg[nid], gp.seg[nid]
        assert a.length == b.length, nid
        assert a.nc == b.nc, nid
        assert a.ex_raw == b.ex_raw, nid
        assert a.incoming == b.incoming, nid
        assert a.outgoing == b.outgoing, nid

    assert list(gn.link) == list(gp.link)
    for pair in gp.link:
        a, b = gn.link[pair], gp.link[pair]
        assert a.rc == b.rc, pair
        assert a.jn_raw == b.jn_raw, pair
        assert bool(a.novel) == bool(b.novel), pair
        assert a.jn == b.jn, pair

    assert gn.junctions == gp.junctions
    assert gn.novel_junctions == gp.novel_junctions
    # iteration order parity (same strings, same insertion order)
    assert list(gn.junctions) == list(gp.junctions)
    assert list(gn.novel_junctions) == list(gp.novel_junctions)
    for attr in ("j_by_head", "j_by_tail", "nj_by_head", "nj_by_tail"):
        dn, dp = getattr(gn, attr), getattr(gp, attr)
        assert list(dn) == list(dp), attr
        for k in dp:
            assert list(dn[k]) == list(dp[k]), (attr, k)


def test_call_rows_identical(gfa_file, tmp_path):
    gtf = tmp_path / "t.gtf"
    gtf.write_text(
        'c\tx\ttranscript\t1\t20\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
        'c\tx\texon\t1\t20\t.\t+\t.\tgene_id "G1"; transcript_id "T1";\n'
    )
    opts = CallOptions(rca=0, novel=True, minintronsize=0)
    rows_n = list(
        call_events(gfa_file, str(gtf), opts,
                    graph=SplicingGraph.from_gfa(gfa_file), log=io.StringIO())
    )
    rows_p = list(
        call_events(gfa_file, str(gtf), opts,
                    graph=SplicingGraph._from_gfa_py(gfa_file), log=io.StringIO())
    )
    assert rows_n == rows_p  # exact order, not just multiset


def test_seg_link_types_constructible():
    """from_coverage builds LinkInfo/SegInfo in Python — the C types must
    accept the same constructor shapes if ever swapped in."""
    ext = get_module()
    s = ext.Seg(length=7)
    assert s.length == 7 and s.nc is None and s.incoming == [] and s.outgoing == []
    li = ext.Link(5, True)
    assert li.rc == 5 and li.novel is True and li.jn == []


def test_load_paths_matches_python_loader(tmp_path):
    """Native load_paths vs the pure-Python load_alignment_paths loop:
    identical records (name/nodes/offsets/seq), haplotype copies
    (_H<k> suffix) excluded by both."""
    gfa = tmp_path / "t.gfa"
    gfa.write_text(
        "H\tVN:Z:1.0\n"
        "S\t1\tACGT\n"
        "S\t2\tGG\n"
        "S\t3\tTTTAA\n"
        "L\t1\t+\t2\t+\t*\n"
        "P\tTX1_R1\t1+,2+,3+\t*\n"
        "P\tTX1_H1\t1+,3+\t*\n"       # haplotype copy: excluded
        "P\tchr_4_part\t2+,3+\t*\n"   # '_' in name but not _H<k>: kept
        "P\tTX2_H\t1+,2+\t*\n"        # _H with no digits: kept
    )
    from pantas_tpu.mapping import mapper
    from pantas_tpu.native.gfaload import get_module

    native = [
        (n, nodes, offs, seq)
        for n, nodes, offs, seq in get_module().load_paths(str(gfa))
    ]
    import pantas_tpu.native.gfaload as G

    orig = G.get_module
    G.get_module = lambda: (_ for _ in ()).throw(RuntimeError("off"))
    try:
        python = [
            (r.name, r.nodes, r.offsets, r.seq)
            for r in mapper.load_alignment_paths(str(gfa))
        ]
    finally:
        G.get_module = orig
    assert native == python
    assert [n for n, *_ in native] == ["TX1_R1", "chr_4_part", "TX2_H"]
    assert native[0][3] == "ACGTGGTTTAA" and native[0][2] == [0, 4, 6]


def test_load_paths_p_before_s_raises_like_python(tmp_path):
    """Regression (ADVICE r4): the two-pass native loader must not accept a
    P line that precedes its S lines — the single-pass Python loop raises
    KeyError there, so the native raises too and load_alignment_paths's
    fallback re-raises the same error."""
    gfa = tmp_path / "t.gfa"
    gfa.write_text(
        "P\tTX1_R1\t1+,2+\t*\n"
        "S\t1\tACGT\n"
        "S\t2\tGG\n"
    )
    with pytest.raises(KeyError):
        get_module().load_paths(str(gfa))
    from pantas_tpu.mapping import mapper

    with pytest.raises(KeyError):
        mapper.load_alignment_paths(str(gfa))


def test_load_paths_non_ascii_seq_falls_back(tmp_path):
    """Regression (ADVICE r4): segment bytes >0x7F must not reach a
    PyUnicode_New(.., 127) buffer (invalid ASCII str = interpreter UB).
    The native raises ValueError; load_alignment_paths falls back to the
    Python loop whose text decoding is well-defined."""
    gfa = tmp_path / "t.gfa"
    gfa.write_bytes(
        b"S\t1\tAC\xc3\x9cGT\n"  # UTF-8 non-ASCII base in the sequence
        b"S\t2\tGG\n"
        b"P\tTX1_R1\t1+,2+\t*\n"
    )
    with pytest.raises(ValueError):
        get_module().load_paths(str(gfa))
    from pantas_tpu.mapping import mapper

    recs = mapper.load_alignment_paths(str(gfa))
    assert [r.name for r in recs] == ["TX1_R1"]
    assert recs[0].seq == "ACÜGT" + "GG"


def test_load_l_before_s_raises_like_python(tmp_path):
    """Code-review r5: the two-pass native load() must reject an L line
    preceding its S lines (the single-pass Python loader raises KeyError
    there) — same convention as load_paths."""
    from pantas_tpu.events.caller import SplicingGraph

    gfa = tmp_path / "t.gfa"
    gfa.write_text(
        "L\t1\t+\t2\t+\t*\n"
        "S\t1\tACGT\n"
        "S\t2\tGG\n"
    )
    with pytest.raises(KeyError):
        get_module().load(str(gfa))
    with pytest.raises(KeyError):
        SplicingGraph._from_gfa_py(str(gfa))


def test_load_negative_nc_rc_parsed(tmp_path):
    """Code-review r5: NC:i:-1 / RC:i:-1 are integers, not 'absent' —
    presence is a flag, not a sign bit (Python loader parity)."""
    gfa = tmp_path / "t.gfa"
    gfa.write_text(
        "S\t1\tACGT\tNC:i:-1\n"
        "S\t2\tGG\n"
        "L\t1\t+\t2\t+\t*\tRC:i:-1\n"
    )
    seg, link, *_ = get_module().load(str(gfa))
    assert seg["1"].nc == -1
    assert seg["2"].nc is None
    assert link[("1", "2")].rc == -1
