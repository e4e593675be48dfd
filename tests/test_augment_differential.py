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


def test_augment_nondense_ids_matches_reference(tmp_path, reference_scripts):
    """Sparse numeric ids (vg-prune-style gaps) through all engines."""
    gfa = tmp_path / "sparse.gfa"
    gfa.write_text(
        "S\t4\tACGTACGT\nS\t17\tAC\nS\t90\tGTTT\n"
        "L\t4\t+\t17\t+\t*\nL\t17\t+\t90\t+\t*\n"
    )
    gaf = tmp_path / "sparse.gaf"
    gaf.write_text(
        "r1\t9\t0\t9\t+\t>4>17>90\t14\t2\t10\t9\t9\t60\tcs:Z::9\tdv:f:0.0\n"
        "r2\t6\t0\t6\t+\t>4>90\t12\t3\t9\t6\t6\t60\tcs:Z::6\tdv:f:0.0\n"
    )
    expected = run_reference_augment(reference_scripts, str(gaf), str(gfa))

    buf, log = io.StringIO(), io.StringIO()
    augment_gfa(str(gaf), str(gfa), out=buf, log=log)
    assert buf.getvalue() == expected

    from pantas_tpu.native import augment_gfa_native, native_available

    if native_available():
        nbuf, nlog = io.StringIO(), io.StringIO()
        augment_gfa_native(str(gaf), str(gfa), out=nbuf, log=nlog)
        assert nbuf.getvalue() == expected
