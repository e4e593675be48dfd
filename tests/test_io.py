"""Unit tests for the io layer."""

from fixtures_micro import MICRO_GFA, write_micro

from pantas_tpu.io.gaf import parse_gaf_line, tokenize_cs
from pantas_tpu.io.gfa import Gfa


def test_tokenize_cs_basic():
    assert tokenize_cs(":10") == [(":", 10)]
    assert tokenize_cs(":3*ac:5") == [(":", 3), ("*", 1), (":", 5)]
    assert tokenize_cs("=ACGT") == [("=", 4)]
    assert tokenize_cs("-acg:2+tt") == [("-", 3), (":", 2), ("+", 2)]
    # substitution runs: one (op,1) per token
    assert tokenize_cs("*ac*gt:1") == [("*", 1), ("*", 1), (":", 1)]
    # splice op contributes len(operand), a deliberate reference quirk
    assert tokenize_cs(":5~gt100ag:5") == [(":", 5), ("~", 7), (":", 5)]
    # a bare '*' op with empty operand still emits one substitution
    assert tokenize_cs("*") == [("*", 1)]


def test_parse_gaf_line():
    rec = parse_gaf_line("r1\t9\t0\t9\t+\t>1>2>3\t14\t2\t10\t9\t9\t60\tcs:Z::9\tdv:f:0.01")
    assert rec.mapq == 60
    assert rec.cs == ":9"
    assert rec.dv == 0.01
    nodes, rev = rec.walk()
    assert nodes == ["1", "2", "3"] and not rev

    rec = parse_gaf_line("r2\t9\t0\t9\t+\t<6<4<4<2\t13\t1\t10\t9\t9\t60\tAS:i:5")
    assert rec.cs == "*" and rec.dv is None
    nodes, rev = rec.walk()
    assert nodes == ["6", "4", "2"] and rev  # consecutive duplicates collapse


def test_gfa_roundtrip(tmp_path):
    gfa_path, _ = write_micro(tmp_path)
    g = Gfa.load(gfa_path)
    assert len(g.segments) == 6
    assert len(g.links) == 7
    assert len(g.paths) == 2
    assert g.segment("1").exons() == ["T1_R1.1"]
    assert g.link("2", "3").junctions() == ["T1_R1.1.2"]
    assert g.has_link("2", "4") and not g.has_link("3", "5")

    import io as _io

    buf = _io.StringIO()
    g.dump(buf)
    assert buf.getvalue() == MICRO_GFA
