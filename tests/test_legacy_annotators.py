"""add-junctions / add-haplotypes parity: the last two legacy annotators
(reference ``scripts/add_junctions.py`` / ``add_haplotypes.py``, not wired
into any workflow) run here against their reference scripts via the
Bio/rich/pysam stubs, byte-identically — incl. the gfautils single-node
reverse-parse quirk, the reverse-path per-node complement, and the
multi-node-ref-allele dedup on substitution."""

import os
import subprocess
import sys
from pathlib import Path

from conftest import REFERENCE, REPO_ROOT, run_cli

from pantas_tpu.io.fasta import revcomp

STUBS = Path(__file__).parent / "stubs"
SCRIPTS = REFERENCE / "scripts"


def _ref(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{SCRIPTS}:{STUBS}"
    env["PYTHONHASHSEED"] = "0"
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def _seq(i, n=10):
    import random

    return "".join(random.Random(i).choice("ACGT") for _ in range(n))


def _mk_junction_inputs(tmp_path):
    seqs = {str(i): _seq(i) for i in range(1, 7)}
    lines = ["H\tVN:Z:1.1"]
    for nid, s in seqs.items():
        lines.append(f"S\t{nid}\t{s}")
    for a, b in (("1", "2"), ("2", "3"), ("5", "6")):
        lines.append(f"L\t{a}\t+\t{b}\t+\t*")
    lines.append("P\tT1_R1\t1+,2+,3+\t*")
    lines.append("P\tT2_R1\t6-,5-\t*")  # reverse path: link key flips
    lines.append("P\tT3_R1\t3+\t*")  # QUIRK: single-node path parses reverse
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(l + "\n" for l in lines))

    fa = tmp_path / "tr.fa"
    recs = [
        (f"T1 gene:G1 segs:1-10,11-30", seqs["1"] + seqs["2"] + seqs["3"]),
        (f"T2 segs:1-10,11-20", revcomp(seqs["6"]) + revcomp(seqs["5"])),
        (f"T3 segs:1-10", revcomp(seqs["3"])),
        (f"TX segs:1-10", seqs["4"]),  # missing from the GFA: skip branch
    ]
    fa.write_text("".join(f">{h}\n{s}\n" for h, s in recs))
    return gfa, fa


def test_add_junctions_differential(tmp_path):
    gfa, fa = _mk_junction_inputs(tmp_path)
    theirs = _ref([sys.executable, str(SCRIPTS / "add_junctions.py"), str(gfa), str(fa)])
    ours = run_cli(
        [sys.executable, "-m", "pantas_tpu", "add-junctions", str(gfa), str(fa)]
    ).stdout
    assert ours == theirs
    assert "JN:Z:T1.1.2" in ours and "EX:Z:" in ours
    # reverse path's junction label lands on the flipped link key (5->6)
    assert any(
        l.startswith("L\t5\t+\t6") and "JN:Z:T2.1.2" in l for l in ours.splitlines()
    )


def _mk_haplotype_inputs(tmp_path):
    lines = ["H\tVN:Z:1.1"]
    for i in range(1, 11):
        lines.append(f"S\t{i}\t{_seq(i)}")
    # ref path + two transcript paths + alt allele paths for two variants;
    # v2's REF allele spans two nodes (5,6) -> substitution dedup quirk
    lines.append("P\tchrX\t" + ",".join(f"{i}+" for i in range(1, 9)) + "\t*")
    lines.append("P\tENST1\t1+,2+,5+,6+,7+\t*")
    lines.append("P\tENST2\t2+,5+,6+\t*")
    lines.append("P\t_alt_v1_0\t2+\t*")
    lines.append("P\t_alt_v1_1\t9+\t*")
    lines.append("P\t_alt_v2_0\t5+,6+\t*")
    lines.append("P\t_alt_v2_1\t10+\t*")
    gfa = tmp_path / "g.gfa"
    gfa.write_text("".join(l + "\n" for l in lines))

    vcf = tmp_path / "p.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.2\n"
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="GT">\n'
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n"
        "chrX\t15\tv1\tA\tC\t.\tPASS\t.\tGT\t0|1\t1|1\t0|0\n"
        "chrX\t50\tv2\tAT\tG\t.\tPASS\t.\tGT\t1|0\t0|0\t.|0\n"
        "chrX\t70\tsym\tA\t<DEL>\t.\tPASS\t.\tGT\t0|0\t0|0\t0|0\n"
    )
    return gfa, vcf


def test_add_haplotypes_differential(tmp_path):
    gfa, vcf = _mk_haplotype_inputs(tmp_path)
    theirs = _ref(
        [sys.executable, str(SCRIPTS / "add_haplotypes.py"), str(gfa), str(vcf)]
    )
    ours = run_cli(
        [sys.executable, "-m", "pantas_tpu", "add-haplotypes", str(gfa), str(vcf)]
    ).stdout
    assert ours == theirs
    # _alt_ paths are dropped; substituted + merged haplotype paths appear
    assert "_alt_" not in ours
    assert "10+" in ours  # v2 alt substitution happened (with ref-span dedup)
    assert "|" in ours  # identical haplotype paths merged under joined names
