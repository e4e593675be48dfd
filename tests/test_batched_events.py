"""Device-batched ES matching must find exactly the host caller's triples."""

import sys

from conftest import REFERENCE, run_cli
from fixtures_call import write_call_fixtures

from pantas_tpu.events.batched import (
    find_annotated_es,
    find_annotated_ss,
    find_novel_es,
    host_es_triples,
    host_ss_rows,
)
from pantas_tpu.events.caller import SplicingGraph
from pantas_tpu.io.gtf import parse_transcript_maps

EXAMPLE = REFERENCE / "example"


def _compare(gfa, gtf, rca=-1):
    graph = SplicingGraph.from_gfa(gfa)
    t2g, _, _ = parse_transcript_maps(gtf)
    batched = find_annotated_es(graph, t2g, rca=rca)
    host = host_es_triples(gfa, gtf, rca=rca)
    assert batched == host
    return batched


def _compare_ss(gfa, gtf, rca=-1):
    graph = SplicingGraph.from_gfa(gfa)
    t2g, genestrand, _ = parse_transcript_maps(gtf)
    batched = find_annotated_ss(graph, t2g, genestrand, rca=rca)
    host = host_ss_rows(gfa, gtf, rca=rca)
    assert batched == host
    return batched


def test_batched_es_micro_fixtures(tmp_path):
    paths = write_call_fixtures(tmp_path)
    triples = _compare(*paths["splice"])
    assert len(triples) >= 1  # the TB skip event
    _compare(*paths["cassette"])


def test_batched_es_example_scale(tmp_path, example_graph):
    gaf = tmp_path / "s.gaf"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "map", str(example_graph),
         str(EXAMPLE / "reads_1.fq"), str(EXAMPLE / "reads_2.fq")],
        out_path=gaf,
    )
    aug = tmp_path / "aug.gfa"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "augment", str(gaf), str(example_graph)],
        out_path=aug,
    )
    triples = _compare(str(aug), str(EXAMPLE / "4.gtf"), rca=0)
    assert len(triples) > 10  # a real event set at example scale
    hits = _compare_ss(str(aug), str(EXAMPLE / "4.gtf"), rca=0)
    assert sum(hits.values()) > 10


def test_batched_ss_micro_fixtures(tmp_path):
    paths = write_call_fixtures(tmp_path)
    for name in ("splice", "cassette", "a5", "a3"):
        if name in paths:
            _compare_ss(*paths[name])


def _rows(cmd_extra, gfa, gtf, tmp_path, tag):
    out = tmp_path / f"{tag}.csv"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "call", *cmd_extra, str(gfa), str(gtf)],
        out_path=out,
        hashseed="0",
    )
    return sorted(out.read_text().splitlines())


def test_batched_novel_es_micro(tmp_path):
    """The splice fixture's novel link 2>8 spans exon 2: flanks (2,4) and
    (5,8) share transcript TE, so the device bitset pass must find exactly
    the host's novel-ES triples."""
    paths = write_call_fixtures(tmp_path)
    gfa, gtf = paths["splice"]
    graph = SplicingGraph.from_gfa(gfa)
    t2g, _, _ = parse_transcript_maps(gtf)
    triples = find_novel_es(graph, t2g, rca=0)
    assert (("2", "8"), ("2", "4"), ("5", "8")) in triples
    # host truth: novel ES rows' (J, j1, j2) node triples
    import io

    from pantas_tpu.events.caller import CallOptions, call_events

    host = set()
    for row in call_events(gfa, gtf, CallOptions(rca=0, novel=True), log=io.StringIO()):
        cols = row.split(",")
        if cols[0] == "ES" and cols[1] == "novel":
            host.add(
                (tuple(cols[8].split(">")), tuple(cols[10].split(">")),
                 tuple(cols[12].split(">")))
            )
    assert {c for c in triples} >= host  # device hits cover every emitted row
    # rows not emitted are exactly the multi-gene skips; on this single-gene
    # fixture the sets must match outright
    assert set(triples) == host


def _host_rows_inproc(gfa, gtf, opts):
    import io

    from pantas_tpu.events.caller import call_events

    return list(call_events(gfa, gtf, opts, log=io.StringIO()))


def test_batched_annotated_ir_micro(tmp_path):
    """find_annotated_ir must pick exactly the host's first firing pair —
    the emitted IR rows (nodes2 subpath starts at n1) must coincide."""
    from pantas_tpu.events.batched import find_annotated_ir
    from pantas_tpu.events.caller import CallOptions

    paths = write_call_fixtures(tmp_path)
    any_ir = False
    for name in ("splice", "cassette"):
        gfa, gtf = paths[name]
        graph = SplicingGraph.from_gfa(gfa)
        t2g, _, _ = parse_transcript_maps(gtf)
        oracle = find_annotated_ir(graph, t2g, rca=0)
        host_ir = {}
        for row in _host_rows_inproc(gfa, gtf, CallOptions(rca=0, events=["IR"])):
            cols = row.split(",")
            if cols[0] != "IR" or cols[1] != "annotated":
                continue
            sub = cols[10].split(">")
            host_ir[tuple(cols[8].split(">"))] = (sub[0], sub[-1])
        assert set(oracle) >= set(host_ir)
        for j, (n1, n2) in host_ir.items():
            assert oracle[j] == (n1, n2)
            any_ir = True
    assert any_ir  # the fixtures must actually exercise annotated IR


def test_batched_novel_families_micro(tmp_path):
    """Device oracles for novel CE and exonic SS must reproduce exactly the
    host caller's novel rows of those families on the micro fixtures."""
    import io

    from pantas_tpu.events.batched import find_novel_ce, find_novel_ss_exonic
    from pantas_tpu.events.caller import CallOptions, _call_novel

    paths = write_call_fixtures(tmp_path)
    seen_ce = seen_ss = False
    for name in ("splice", "cassette"):
        gfa, gtf = paths[name]
        graph = SplicingGraph.from_gfa(gfa)
        t2g, genestrand, genechr = parse_transcript_maps(gtf)
        opts = CallOptions(rca=0, novel=True)
        host = sorted(
            r
            for r in _call_novel(
                graph, t2g, genestrand, genechr, opts, io.StringIO()
            )
        )
        oracled = sorted(
            r
            for r in _call_novel(
                graph, t2g, genestrand, genechr, opts, io.StringIO(),
                ss_oracle=find_novel_ss_exonic(graph, t2g, opts),
                ce_oracle=find_novel_ce(graph, opts),
            )
        )
        assert oracled == host, name
        etypes = {(r.split(",")[0], r.split(",")[1]) for r in host}
        seen_ce |= ("CE", "novel") in etypes
        seen_ss |= ("A3", "novel") in etypes or ("A5", "novel") in etypes
    assert seen_ce and seen_ss  # fixtures must exercise both families


def test_device_call_engine_micro(tmp_path):
    paths = write_call_fixtures(tmp_path)
    for name in ("splice", "cassette"):
        gfa, gtf = paths[name]
        for flags in ([], ["--rca", "0"], ["--rca", "0", "--novel"],
                      ["--junction", "nonsense"]):
            host = _rows(flags, gfa, gtf, tmp_path, "host")
            dev = _rows(flags + ["--engine", "device"], gfa, gtf, tmp_path, "dev")
            assert dev == host, (name, flags)


def test_device_call_engine_example_scale(tmp_path, example_graph):
    gaf = tmp_path / "s.gaf"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "map", str(example_graph),
         str(EXAMPLE / "reads_1.fq"), str(EXAMPLE / "reads_2.fq")],
        out_path=gaf,
    )
    aug = tmp_path / "aug.gfa"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "augment", str(gaf), str(example_graph)],
        out_path=aug,
    )
    host = _rows(["--rca", "0"], aug, EXAMPLE / "4.gtf", tmp_path, "host")
    dev = _rows(["--rca", "0", "--engine", "device"], aug, EXAMPLE / "4.gtf", tmp_path, "dev")
    assert dev == host
    assert len(host) > 100
    host = _rows(["--rca", "0", "--novel"], aug, EXAMPLE / "4.gtf", tmp_path, "hostn")
    dev = _rows(
        ["--rca", "0", "--novel", "--engine", "device"],
        aug, EXAMPLE / "4.gtf", tmp_path, "devn",
    )
    assert dev == host
    assert len(host) > 400  # the novel pass roughly triples the example rows


def test_device_call_engine_mesh_invariance(tmp_path):
    # --mesh N shards each finder's candidate axis over N virtual devices
    # (replicated tables, no collectives) — rows must be identical to the
    # unsharded device engine and the host caller for any N
    paths = write_call_fixtures(tmp_path)
    for name in ("splice", "cassette"):
        gfa, gtf = paths[name]
        for flags in (["--rca", "0"], ["--rca", "0", "--novel"]):
            host = _rows(flags, gfa, gtf, tmp_path, f"{name}h")
            for n in (2, 8):
                dev = _rows(
                    flags + ["--engine", "device", "--mesh", str(n)],
                    gfa, gtf, tmp_path, f"{name}m{n}",
                )
                assert dev == host, (name, flags, n)
