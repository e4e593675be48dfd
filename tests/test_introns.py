"""Intron length distribution: parser differential vs the reference's
intron_length_distribution.py; mixture fit recovers known parameters."""

import importlib.util
import math
import os
import random
from collections import Counter

from conftest import REFERENCE

REF_SCRIPT = (
    REFERENCE
    / "exps"
    / "3-homo-real"
    / "workflow"
    / "scripts"
    / "intron_length_distribution.py"
)
EXAMPLE_GTF = REFERENCE / "example" / "4.gtf"


def _ref_parse():
    os.environ.setdefault("MPLBACKEND", "Agg")
    spec = importlib.util.spec_from_file_location("ref_ild", REF_SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.parse_intron_length_distr


def test_parser_differential_example_gtf():
    from pantas_tpu.eval.introns import intron_length_distr

    ref_parse = _ref_parse()
    for unique in (False, True):
        ours = intron_length_distr(str(EXAMPLE_GTF), "transcript_id", unique)
        ref = ref_parse(str(EXAMPLE_GTF), "transcript_id", unique)
        assert ours == ref
        assert sum(ours.values()) > 100


def test_fit_recovers_two_components():
    from pantas_tpu.eval.introns import fit_log_normal_mixture

    rng = random.Random(11)
    counter = Counter()
    for _ in range(4000):
        counter[max(1, round(math.exp(rng.gauss(4.0, 0.25))))] += 1
    for _ in range(2000):
        counter[max(1, round(math.exp(rng.gauss(7.5, 0.4))))] += 1
    params, weights = fit_log_normal_mixture(counter, 2)
    mus = sorted(params[1::2])
    assert abs(mus[0] - 4.0) < 0.15
    assert abs(mus[1] - 7.5) < 0.15
    assert abs(sorted(weights)[0] - 1 / 3) < 0.05


def test_estimate_model_file(tmp_path):
    from pantas_tpu.eval.introns import estimate

    out = tmp_path / "model.txt"
    k = estimate(str(EXAMPLE_GTF), str(out), log=None)
    lines = out.read_text().splitlines()
    assert int(lines[0]) == k
    assert len(lines) == 1 + k + 2 * k
    weights = [float(x) for x in lines[1 : 1 + k]]
    assert abs(sum(weights) - 1.0) < 1e-9
