"""Differential test: our augment stage vs the reference augmenter.

The reference augmenter is a pure-stdlib script, so we run it directly and
require byte-identical stdout on the same (GFA, GAF) inputs.
"""

import io
import subprocess
import sys

from fixtures_micro import write_micro

from pantas_tpu.coverage import augment_gfa


def run_reference_augment(reference_scripts, gaf, gfa):
    proc = subprocess.run(
        [sys.executable, str(reference_scripts / "alignments_augmentation_from_gaf.py"), gaf, gfa],
        capture_output=True,
        text=True,
        check=True,
    )
    return proc.stdout


def test_augment_matches_reference_bytes(tmp_path, reference_scripts):
    gfa, gaf = write_micro(tmp_path)
    expected = run_reference_augment(reference_scripts, gaf, gfa)

    buf = io.StringIO()
    log = io.StringIO()
    augment_gfa(gaf, gfa, out=buf, log=log)
    assert buf.getvalue() == expected


def test_augment_rejindex_counts(tmp_path):
    gfa, gaf = write_micro(tmp_path)
    buf = io.StringIO()
    log = io.StringIO()
    counts = augment_gfa(gaf, gfa, out=buf, log=log)
    assert counts.rejected == 1  # r6 (low mapq)
    assert counts.skipped == 2  # r7 (unplaced), r8 (divergent)
    assert counts.accepted == 12
    # novel edges appear as ID:Z:N links
    out = buf.getvalue()
    assert "L\t3\t+\t5\t+\t*\tRC:i:1\tID:Z:N" in out
    assert "L\t1\t+\t3\t+\t*\tRC:i:1\tID:Z:N" in out
