"""Mapper indel tolerance: reads with small indels vs the indexed path must
align end-to-end with gap cs ops — identically in the Python and native
engines — and flow through the (reference) augmenter."""

import random
from pathlib import Path
import subprocess
import sys

from conftest import REPO_ROOT, run_cli

from pantas_tpu.mapping.mapper import (
    PathIndex,
    PathRecord,
    align_read,
    alignment_to_gaf,
)


def _mk_path(seed=3, n_nodes=8, node_len=25):
    rng = random.Random(seed)
    seqs = ["".join(rng.choice("ACGT") for _ in range(node_len)) for _ in range(n_nodes)]
    offsets = [i * node_len for i in range(n_nodes)]
    return PathRecord("T1_R1", [str(i + 1) for i in range(n_nodes)], offsets, "".join(seqs))


def test_python_indel_alignment():
    rec = _mk_path()
    index = PathIndex([rec])
    seq = rec.seq

    def gap_ops(a):
        return [(op, v) for p in a.pieces for op, v in p.ops if op in "+-"]

    # 4bp deletion relative to the path (placement may shift within
    # equal-scoring runs; assert the gap kind/length and full coverage)
    read_del = seq[10:80] + seq[84:150]
    aln = align_read(index, read_del)
    assert aln is not None
    assert gap_ops(aln) and gap_ops(aln)[0][0] == "-" and len(gap_ops(aln)[0][1]) == 4
    assert aln.qstart == 0 and aln.qend == len(read_del) and aln.mismatches == 0
    gaf = alignment_to_gaf(index, "rd", read_del, aln)
    assert "\t60\t" in gaf  # not a spliced join

    # 5bp insertion relative to the path
    read_ins = seq[10:90] + "ACGTA" + seq[90:150]
    aln = align_read(index, read_ins)
    assert aln is not None
    assert gap_ops(aln) and gap_ops(aln)[0][0] == "+" and len(gap_ops(aln)[0][1]) == 5
    assert aln.qend - aln.qstart == len(read_ins)

    # reverse-complement of the deletion read
    from pantas_tpu.io.fasta import revcomp

    aln = align_read(index, revcomp(read_del))
    assert aln is not None
    gaf = alignment_to_gaf(index, "rr", revcomp(read_del), aln)
    assert gaf.split("\t")[5].startswith("<")
    assert "-" in gaf.split("cs:Z:")[1]


def test_native_matches_python_on_indels(tmp_path):
    rec = _mk_path()
    # build a micro GFA + fastq and run map twice (native default vs python)
    gfa = tmp_path / "g.gfa"
    lines = []
    for i, nid in enumerate(rec.nodes):
        lines.append(f"S\t{nid}\t{rec.seq[i * 25 : (i + 1) * 25]}")
    for a, b in zip(rec.nodes, rec.nodes[1:]):
        lines.append(f"L\t{a}\t+\t{b}\t+\t*")
    lines.append("P\tT1_R1\t" + ",".join(n + "+" for n in rec.nodes) + "\t*")
    gfa.write_text("\n".join(lines) + "\n")

    seq = rec.seq
    reads = {
        "rd": seq[10:80] + seq[84:150],
        "ri": seq[10:90] + "ACGTA" + seq[90:150],
        "rp": seq[5:155],
    }
    fq = tmp_path / "r.fq"
    fq.write_text("".join(f"@{n}\n{s}\n+\n{'I' * len(s)}\n" for n, s in reads.items()))

    import io

    from pantas_tpu.mapping.mapper import map_reads

    native_out = tmp_path / "native.gaf"
    with open(native_out, "w") as out:
        map_reads(str(gfa), str(fq), out=out, log=io.StringIO(), engine="native")
    py_out = io.StringIO()
    map_reads(str(gfa), str(fq), out=py_out, log=io.StringIO(), engine="python")
    assert native_out.read_text() == py_out.getvalue()
    assert "-" in native_out.read_text()

    # the gap GAF must flow through our augmenter and the reference's
    # with byte-identical results
    ref_aug = Path("/root/reference/scripts/alignments_augmentation_from_gaf.py")
    if ref_aug.exists():
        ours = run_cli(
            [sys.executable, "-m", "pantas_tpu", "augment", str(native_out), str(gfa)]
        ).stdout
        env = dict(__import__("os").environ)
        theirs = subprocess.run(
            [sys.executable, str(ref_aug), str(native_out), str(gfa)],
            capture_output=True, text=True, env=env,
        ).stdout
        assert ours == theirs
        assert "NC:i:" in ours
