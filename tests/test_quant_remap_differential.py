"""Differential tests: quant + remap vs the reference scripts (byte-exact).

Both stages are deterministic (row order follows input order), so outputs
must match byte-for-byte, including float formatting.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

from fixtures_quant import write_quant_fixtures

REPO = Path(__file__).resolve().parent.parent


def _run(cmd):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


QUANT_MODES = [([], ["-a"]), (["--both"], []), (["-w", "3"], ["-a", "-w", "3"])]


@pytest.mark.parametrize(
    "ref_mode,our_mode", QUANT_MODES, ids=["all", "both", "w3"]
)
def test_quant_matches_reference_bytes(tmp_path, reference_scripts, ref_mode, our_mode):
    c1, c2, _ = write_quant_fixtures(tmp_path)
    theirs = _run(
        [sys.executable, str(reference_scripts / "quantify.py"), *ref_mode, "--c1", *c1, "--c2", *c2]
    )
    ours = _run(
        [sys.executable, "-m", "pantas_tpu", "quant", *our_mode, "--c1", *c1, "--c2", *c2]
    )
    assert ours == theirs


@pytest.mark.parametrize("min_intron", [None, 2], ids=["default", "i2"])
def test_remap_matches_reference_bytes(tmp_path, reference_scripts, min_intron):
    c1, c2, gtf = write_quant_fixtures(tmp_path)
    quant_csv = tmp_path / "quant.csv"
    quant_csv.write_text(
        _run(
            [sys.executable, str(reference_scripts / "quantify.py"), "--c1", *c1, "--c2", *c2]
        )
    )
    extra = [] if min_intron is None else ["-i", str(min_intron)]
    theirs = _run(
        [sys.executable, str(reference_scripts / "remap.py"), *extra, str(quant_csv), gtf]
    )
    ours = _run(
        [sys.executable, "-m", "pantas_tpu", "remap", str(quant_csv), gtf, *extra]
    )
    assert ours == theirs
    # the default min-intron filter must actually drop the short novel ES
    if min_intron is None:
        assert "ES,novel" not in theirs
    else:
        assert "ES,novel" in theirs


def test_full_stage_chain(tmp_path, reference_scripts):
    """quant -> remap chained through OUR implementations only, diffed
    against the reference chain end-to-end."""
    c1, c2, gtf = write_quant_fixtures(tmp_path)

    ours_q = _run([sys.executable, "-m", "pantas_tpu", "quant", "-a", "--c1", *c1, "--c2", *c2])
    (tmp_path / "ours_quant.csv").write_text(ours_q)
    ours_r = _run(
        [sys.executable, "-m", "pantas_tpu", "remap", str(tmp_path / "ours_quant.csv"), gtf, "-i", "2"]
    )

    theirs_q = _run(
        [sys.executable, str(reference_scripts / "quantify.py"), "--c1", *c1, "--c2", *c2]
    )
    (tmp_path / "ref_quant.csv").write_text(theirs_q)
    theirs_r = _run(
        [sys.executable, str(reference_scripts / "remap.py"), "-i", "2", str(tmp_path / "ref_quant.csv"), gtf]
    )
    assert ours_q == theirs_q
    assert ours_r == theirs_r


def test_pool_w_recovers_consistent_weak_events(tmp_path):
    """EXTENSION (--pool-w, VERDICT r4 task 4): an event whose junctions
    sit below -w in EVERY replicate dies under the reference semantics
    (per-replicate drop), but consistent weak support pools past the
    threshold; a junction seen in only one replicate stays filtered."""
    import io

    from pantas_tpu.quant import quantify

    header = (
        "event_type,annotated/novel,chrom,gene,strand,junction1_name,"
        "junction2_name,junction3_name,junction1_nodes,junction1_coverage,"
        "junction2_nodes,junction2_coverage,junction3_nodes,junction3_coverage"
    )
    # weak but consistent: event junction coverage 2/2/1 (pooled 5),
    # canonic 2/2/2 (pooled 6) — below w=3 in every single replicate
    weak = "A5,annotated,chr1,G1,+,TB_R1.1.2,TA_R1.2.3,.,2>7,{0},5>7,{1},.,."
    # one-shot noise: appears once at coverage 1 (pooled 1)
    noise = "A3,annotated,chr1,G1,+,TE_R1.2.3,TA_R1.2.3,.,5>8,1,5>7,1,.,."

    def rep(path, rows):
        path.write_text(header + "\n" + "\n".join(rows) + "\n")
        return str(path)

    c1 = [
        rep(tmp_path / "c1r1.csv", [weak.format(2, 2), noise]),
        rep(tmp_path / "c1r2.csv", [weak.format(2, 2)]),
        rep(tmp_path / "c1r3.csv", [weak.format(1, 2)]),
    ]
    c2 = [
        rep(tmp_path / "c2r1.csv", [weak.format(0, 3)]),
        rep(tmp_path / "c2r2.csv", [weak.format(1, 2)]),
        rep(tmp_path / "c2r3.csv", [weak.format(0, 2)]),
    ]

    def rows(**kw):
        buf = io.StringIO()
        quantify(c1, c2, both=False, out=buf, **kw)
        return [l for l in buf.getvalue().splitlines()[1:] if l]

    # reference semantics at w=3: everything dies before quant
    assert rows(min_w=3) == []
    # pooled threshold: the consistent event survives, the noise row dies
    pooled = rows(pool_w=3)
    assert len(pooled) == 1 and pooled[0].startswith("A5,annotated")
    assert "A3" not in pooled[0]
    # PSI carries all replicates: c1 canonic 2,2,2 event 2,2,1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rows(min_w=3, pool_w=3)
