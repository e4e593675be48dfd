"""Legacy GAMP augmenter must be byte-identical to the reference tool
(`scripts/alignments_augmentation.py`) on both outputs: the path-walks
file and the RC-weighted GFA on stdout — including the broken leftover-
edge branch and strip-reemit quirks."""

import json
import sys

from conftest import REFERENCE, run_cli

REF_TOOL = REFERENCE / "scripts" / "alignments_augmentation.py"


def _mapping(*nodes, reverse=False):
    return {
        "path": {
            "mapping": [
                {"position": {"node_id": str(n), "is_reverse": reverse}}
                for n in nodes
            ]
        }
    }


def _write_inputs(tmp_path):
    reads = [
        # linear forward read over two subpaths
        {
            "name": "r1",
            "sequence": "ACGT",
            "subpath": [
                {**_mapping(1, 2), "next": [1]},
                _mapping(3),
            ],
        },
        # branching DAG: one source, two sinks -> two full paths
        {
            "name": "r2",
            "sequence": "ACGT",
            "subpath": [
                {**_mapping(1), "next": [1, 2]},
                _mapping(2, 3),
                _mapping(4),
            ],
        },
        # reverse-orientation read (walk reversed, weights swapped)
        {
            "name": "r3",
            "sequence": "ACGT",
            "subpath": [
                {**_mapping(5, 4, reverse=True), "next": [1]},
                _mapping(2, reverse=True),
            ],
        },
        # unplaced read: no subpath key -> skipped
        {"name": "r4", "sequence": "ACGT"},
    ]
    js = tmp_path / "aln.json"
    js.write_text("".join(json.dumps(r) + "\n" for r in reads))

    gfa_lines = ["H\tVN:Z:1.1"]
    for i in range(1, 6):
        gfa_lines.append(f"S\t{i}\tACGT")
    # (1,2) and (2,3) covered; (3,4) uncovered; (2,4),(4,5) absent -> leftover
    for a, b in [(1, 2), (2, 3), (3, 4)]:
        gfa_lines.append(f"L\t{a}\t+\t{b}\t+\t*")
    gfa = tmp_path / "in.gfa"
    gfa.write_text("".join(l + "\n" for l in gfa_lines))
    return js, gfa


def test_gamp_differential(tmp_path):
    js, gfa = _write_inputs(tmp_path)
    run_cli(
        [sys.executable, str(REF_TOOL), str(js), str(tmp_path / "ref.path"), str(gfa)],
        out_path=tmp_path / "ref.gfa",
    )
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "gamp", str(js),
         str(tmp_path / "ours.path"), str(gfa)],
        out_path=tmp_path / "ours.gfa",
    )
    ref_gfa = (tmp_path / "ref.gfa").read_bytes()
    assert ref_gfa  # the reference tool really produced output
    assert (tmp_path / "ours.gfa").read_bytes() == ref_gfa
    assert (
        (tmp_path / "ours.path").read_bytes()
        == (tmp_path / "ref.path").read_bytes()
    )
    text = ref_gfa.decode()
    # covered edges weighted, uncovered edge weighted 0, leftovers appended
    assert "L\t1\t+\t2\t+\t*\tRC:i:" in text
    assert "L\t3\t+\t4\t+\t*\tRC:i:0" in text
    assert text.count("RC:i:") > 3
