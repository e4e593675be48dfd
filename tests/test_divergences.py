"""Documented divergences: inputs where the reference crashes and we don't.

The novel-IR-2 greedy walk in the reference dead-ends when its
lexicographic ``x <= _j[1]`` filter excludes the intron nodes (e.g. node
"5" vs junction tail "12"), then crashes with ``max()`` on an empty list
(``call.py:1038-1049``). Our caller skips the candidate and keeps calling.
"""

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# junction (4,12) spans intron nodes 5,9; "5" <= "12" is False
# lexicographically, so the reference's walk has no candidates
CRASH_GFA = "".join(
    line + "\n"
    for line in [
        "H\tVN:Z:1.1",
        "S\t4\tACGTACGT\tEX:Z:TA_R1.1\tNC:i:9",
        "S\t5\tCCCCCCCCCC\tNC:i:4",
        "S\t9\tGGGGGGGGGG\tNC:i:4",
        "S\t12\tTTTTACGT\tEX:Z:TA_R1.2\tNC:i:9",
        "L\t4\t+\t5\t+\t*\tRC:i:4",
        "L\t5\t+\t9\t+\t*\tRC:i:4",
        "L\t9\t+\t12\t+\t*\tRC:i:4",
        "L\t4\t+\t12\t+\t*\tJN:Z:TA_R1.1.2\tRC:i:8",
        "P\tTA_R1\t4+,12+\t*",
    ]
)

CRASH_GTF = (
    "\t".join(["c", "s", "transcript", "10", "99", ".", "+", ".",
               'gene_id "GA"; transcript_id "TA";']) + "\n"
    + "\t".join(["c", "s", "exon", "10", "17", ".", "+", ".",
                 'gene_id "GA"; transcript_id "TA";']) + "\n"
    + "\t".join(["c", "s", "exon", "50", "57", ".", "+", ".",
                 'gene_id "GA"; transcript_id "TA";']) + "\n"
)


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["PYTHONHASHSEED"] = "0"
    return subprocess.run(cmd, capture_output=True, text=True, env=env)


def test_reference_crashes_we_complete(tmp_path, reference_scripts):
    gfa = tmp_path / "crash.gfa"
    gtf = tmp_path / "crash.gtf"
    gfa.write_text(CRASH_GFA)
    gtf.write_text(CRASH_GTF)
    args = ["--rca", "3", "--novel", "--minintronsize", "5", str(gfa), str(gtf)]

    ref = _run([sys.executable, str(reference_scripts / "call.py"), *args])
    assert ref.returncode != 0
    assert "max() iterable argument is empty" in ref.stderr

    ours = _run([sys.executable, "-m", "pantas_tpu", "call", *args])
    assert ours.returncode == 0, ours.stderr
    assert "greedy intron walk dead-ended" in ours.stderr
    # the annotated IR through the intron is still called
    rows = ours.stdout.strip().split("\n")[1:]
    assert all(r.split(",")[0] in {"ES", "A3", "A5", "IR", "CE"} for r in rows)
