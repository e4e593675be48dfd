"""Experiment driver: config-run end-to-end + stage resumability."""

import io
import json
import shutil
import sys

from conftest import REFERENCE, run_cli

EXAMPLE = REFERENCE / "example"


def test_experiment_driver(tmp_path, example_graph):
    prefix = tmp_path / "sim"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "sim",
         str(EXAMPLE / "4.fa"), str(EXAMPLE / "4.gtf"),
         "-o", str(prefix), "-n", "4", "-r", "25"],
    )
    wd = tmp_path / "wd"
    wd.mkdir()
    # pre-place the session-built pangenome: build stage must be skipped
    shutil.copy(example_graph, wd / "pantranscriptome-annotated.gfa")

    cfg = {
        "fa": str(EXAMPLE / "4.fa"),
        "gtf": str(EXAMPLE / "4.gtf"),
        "vcf": str(EXAMPLE / "4.vcf.gz"),
        "workdir": str(wd),
        "conditions": {
            "c1": [[f"{prefix}_c1_1.fq", f"{prefix}_c1_2.fq"]],
            "c2": [[f"{prefix}_c2_1.fq", f"{prefix}_c2_2.fq"]],
        },
        "call": {"w": 3, "novel": True, "minintronsize": 20},
        "remap": {"min_intron_size": 20},
        "eval": {"truth": f"{prefix}_truth.csv", "min_dpsi": 0.1, "relax": 5,
                 "cuts": [1, 3, 5], "figures": True},
        "novel_sites": True,
        "threads": 2,
    }
    cfg_path = tmp_path / "exp.json"
    cfg_path.write_text(json.dumps(cfg))

    from pantas_tpu.experiment import run_experiment

    log = io.StringIO()
    result = run_experiment(str(cfg_path), log=log)
    assert "reusing existing pangenome" in log.getvalue()
    assert result["n_events"] >= 2
    assert result["scores"]["ALL"]["fp"] == 0
    assert result["scores"]["ES"]["recall"] == 1.0
    assert result["scores"]["IR"]["recall"] == 1.0
    assert (wd / "quant-remap.csv").exists()
    assert (wd / "scores.csv").exists()
    # eval.cuts sweep + eval.figures P/R panel
    cuts_rows = (wd / "scores_by_cut.csv").read_text().splitlines()
    assert cuts_rows[0] == "cut,etype,tp,fp,fn,precision,recall,f1"
    assert result["scores_pr_png"].endswith("scores_pr.png")
    assert (wd / "scores_pr.png").stat().st_size > 10_000
    # novel-sites extension: per-replicate classified-site CSVs
    from pantas_tpu.events.sites import EVENTS_HEADER

    for tag in ("c1_r1", "c2_r1"):
        sites = (wd / f"{tag}.sites.csv").read_text().splitlines()
        assert sites[0] == EVENTS_HEADER

    # re-run: every replicate stage must be reused
    log2 = io.StringIO()
    run_experiment(str(cfg_path), log=log2)
    assert "reusing" in log2.getvalue()
    assert "map+call" not in log2.getvalue()
