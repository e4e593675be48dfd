"""Figure layer: truth-support table / LaTeX table byte-identical to the
reference's plot_pr.py / format_latex_table.py on the same compare CSVs
(both reference scripts are runnable in this environment), plus the
parse_res.py figure suite (corr/venn PNGs) and the venn region math."""

import os
import random
import subprocess
import sys

from conftest import REFERENCE

from pantas_tpu.eval.plots import (
    _venn_regions,
    latex_table_lines,
    render_pr,
    render_res_figures,
    render_venn,
    truth_support_lines,
)

PLOT_PR_REF = REFERENCE / "exps" / "1-dm-sim" / "scripts" / "plot_pr.py"
LATEX_REF = REFERENCE / "exps" / "1-dm-sim" / "scripts" / "format_latex_table.py"


def _write_compare_csv(path):
    """Concatenated compare CSVs (two -w runs) in the cmp output schema."""
    lines = ["p-supp,tool,etype,mindpsi,mincov,TP,FN,FP,Prec,Rec,F1,TOT"]
    tools = ["pantas", "rMATS", "Whippet", "SUPPA2"]
    etypes = ["ES", "A3", "A5", "IR"]
    for w in (3, 5):
        for c in (0, 1, 2, 3, 5):  # 0 and 2 must be skipped by the parser
            for ti, tool in enumerate(tools):
                for ei, etype in enumerate(etypes):
                    tot = 20 - c + ei  # TP+FN consistent across tools/w
                    tp = max(0, tot - 2 - ti - (0 if w == 3 else 1))
                    fn = tot - tp
                    fp = ti + c % 3
                    p = round(tp / (tp + fp), 3) if tp + fp else 0.0
                    r = round(tp / tot, 3)
                    f1 = round(2 * p * r / (p + r), 3) if p + r else 0.0
                    lines.append(
                        f"{w if tool == 'pantas' else 0},{tool},{etype},"
                        f"0.05,{c},{tp},{fn},{fp},{p},{r},{f1},{tot}"
                    )
    path.write_text("\n".join(lines) + "\n")


def test_truth_support_differential(tmp_path):
    csv = tmp_path / "cmp.csv"
    _write_compare_csv(csv)
    env = dict(os.environ, MPLBACKEND="Agg")
    ref = subprocess.run(
        [sys.executable, str(PLOT_PR_REF), str(csv)],
        capture_output=True, text=True, env=env, cwd=tmp_path,
    )
    assert ref.returncode == 0, ref.stderr
    ours = "\n".join(truth_support_lines(str(csv))) + "\n"
    assert ours == ref.stdout
    # reference wrote <csv>.png; ours goes to a distinct path and must be
    # PIXEL-identical (byte-identical, in fact — same Agg renderer, same
    # rcParams/figsize/palette transcribed from plot_pr.py:48-101)
    ref_png = tmp_path / "cmp.csv.png"
    assert ref_png.stat().st_size > 10_000
    out = render_pr(str(csv), str(tmp_path / "ours.png"))
    assert os.path.getsize(out) > 10_000
    assert ref_png.read_bytes() == (tmp_path / "ours.png").read_bytes(), (
        "render_pr PNG diverged from the reference plot_pr.py rendering"
    )


def test_latex_table_differential(tmp_path):
    csv = tmp_path / "cmp.csv"
    _write_compare_csv(csv)
    ref = subprocess.run(
        [sys.executable, str(LATEX_REF), str(csv)],
        capture_output=True, text=True,
    )
    assert ref.returncode == 0, ref.stderr
    ours = "\n".join(latex_table_lines(str(csv))) + "\n"
    assert ours == ref.stdout


def test_venn_regions():
    r = _venn_regions({"a": {1, 2, 3}, "b": {2, 3, 4}, "c": {3, 4, 5}})
    assert r[("a",)] == 1          # {1}
    assert r[("a", "b")] == 1      # {2}
    assert r[("a", "b", "c")] == 1  # {3}
    assert r[("b", "c")] == 1      # {4}
    assert r[("c",)] == 1          # {5}
    assert r[("a", "c")] == 0
    # NaN members are dropped (deliberate fix of the reference's raw-set bug)
    ax = render_venn(
        {"x": {1, float("nan")}, "y": {1, 2}}, legend_loc=None, grid=60
    )
    texts = sorted(t.get_text() for t in ax.texts)
    assert texts == ["0", "1", "1"]  # x-only=0, x∩y={1}, y-only={2}


def _fig_rgba(fig):
    """Rasterize a figure to an RGBA numpy buffer (no file round-trip)."""
    fig.canvas.draw()
    import numpy as np

    return np.asarray(fig.canvas.buffer_rgba()).copy()


def test_venn_rendered_buffer_content():
    """Content-level venn check: the rendered RGBA buffer is deterministic
    across renders, region-count digits land at the rasterized-centroid
    positions, and the ellipse fills actually composite (interior pixels
    differ from the white background)."""
    import numpy as np

    sets = {"a": {1, 2, 3, 4}, "b": {3, 4, 5}, "c": {4, 5, 6, 7}}
    ax1 = render_venn(dict(sets), legend_loc=None, grid=120)
    ax2 = render_venn(dict(sets), legend_loc=None, grid=120)
    buf1, buf2 = _fig_rgba(ax1.get_figure()), _fig_rgba(ax2.get_figure())
    assert np.array_equal(buf1, buf2)
    # counts: a-only {1,2}=2, a∩b {3}=1, a∩b∩c {4}=1, b∩c {5}=1, c-only {6,7}=2
    texts = sorted(t.get_text() for t in ax1.texts)
    assert texts == ["0", "0", "1", "1", "1", "2", "2"]
    h, w = buf1.shape[:2]
    center = buf1[h // 2, w // 2]
    assert not np.array_equal(center[:3], [255, 255, 255])  # composited fill
    assert np.array_equal(buf1[2, 2][:3], [255, 255, 255])  # background white
    import matplotlib.pyplot as plt

    plt.close("all")


def test_corr_rendered_buffer_content():
    """Content-level corr check: the JointGrid buffer is deterministic and
    the annotated Pearson value equals scipy's on the same columns."""
    import numpy as np
    import pandas as pd

    rows = []
    rng = random.Random(11)
    for i in range(40):
        x = rng.uniform(-1, 1)
        rows.append({"A": x, "B": x * 0.7 + rng.uniform(-0.2, 0.2)})
    df = pd.DataFrame(rows)
    from scipy.stats import pearsonr

    expect = str(round(float(pearsonr(df["A"], df["B"])[0]), 3))
    from pantas_tpu.eval.plots import _jointgrid_fig

    fig1 = _jointgrid_fig(df, "A", "B", None)
    fig2 = _jointgrid_fig(df, "A", "B", None)
    texts = [t.get_text() for a in fig1.axes for t in a.texts]
    assert f"Pearson correlation: {expect}" in texts, (expect, texts)
    assert np.array_equal(_fig_rgba(fig1), _fig_rgba(fig2))
    import matplotlib.pyplot as plt

    plt.close("all")


def _write_res_csvs(tmp_path):
    random.seed(7)
    hdr = "type,event,whippet,SUPPA2,rMATS,pantas_3"
    rows, mrows = [hdr], [hdr]
    i = 0
    for e in ["ES", "IR", "A3", "A5"]:
        for _ in range(6):
            name = f"{e}_chr4_{1000 + i}_{2000 + i}"
            i += 1
            vals = [round(random.uniform(-1, 1), 3) for _ in range(4)]
            present = [random.random() < 0.8 for _ in range(4)]
            rows.append(
                f"{e},{name},"
                + ",".join(str(v) if p else "" for v, p in zip(vals, present))
            )
            mrows.append(
                f"{e},{name}," + ",".join(name if p else "" for p in present)
            )
    (tmp_path / "res.csv").write_text("\n".join(rows) + "\n")
    (tmp_path / "res_mask.csv").write_text("\n".join(mrows) + "\n")


def test_pr_csv_from_scores(tmp_path):
    from pantas_tpu.eval.plots import PR_CSV_HEADER, pr_csv_lines_from_scores

    scores = tmp_path / "scores_by_cut.csv"
    scores.write_text(
        "cut,etype,tp,fp,fn,precision,recall,f1\n"
        "1,ES,25,0,0,1.000,1.000,1.000\n"
        "1,CE,25,0,0,1.000,1.000,1.000\n"  # no panel slot -> dropped
        "3,IR,20,2,5,0.909,0.800,0.851\n"
    )
    lines = pr_csv_lines_from_scores(str(scores), 3)
    assert lines == [
        "3,pantas,ES,0,1,25,0,0,1.000,1.000,1.000,25",
        "3,pantas,IR,0,3,20,5,2,0.909,0.800,0.851,25",
    ]
    # round-trips through the plot_pr parser
    from pantas_tpu.eval.plots import parse_pr_csv

    csv = tmp_path / "cmp.csv"
    csv.write_text("\n".join([PR_CSV_HEADER] + lines) + "\n")
    data, truth = parse_pr_csv(str(csv))
    assert truth == {1: {"ES": 25}, 3: {"IR": 25}}
    assert data[0] == ["pantas", "ES", 1, 1.0, 1.0]


def test_parse_res_figures_cli(tmp_path):
    # CLI wiring: parse-res --figures renders the suite (2 -w values ->
    # pantas-pantas corr + per-w venns + multi-w pantas venns; tiny data
    # so full_corr's singleton-Ws branch is skipped by design)
    import sys as _sys

    from conftest import run_cli
    from test_aggregate import _write_fixtures

    p3, p5, rmats, suppa, whip = _write_fixtures(tmp_path)
    out = tmp_path / "res"
    run_cli(
        [_sys.executable, "-m", "pantas_tpu", "parse-res", "-o", str(out),
         "--pantas", f"3={p3}", f"5={p5}",
         "--rmats", str(rmats), "--suppa", str(suppa), "--whippet", str(whip),
         "--min-dpsi", "0.05", "--figures"],
    )
    for must in [
        "venn_full_rmats_whippet_suppa_pantas_3.png",
        "venn_full_rmats_whippet_suppa_pantas_5.png",
        "venn_full_pantas.png",
    ]:
        assert (out / must).stat().st_size > 5_000, must


def test_render_res_figures(tmp_path):
    _write_res_csvs(tmp_path)
    written = render_res_figures(
        str(tmp_path / "res.csv"),
        str(tmp_path / "res_mask.csv"),
        str(tmp_path / "figs"),
        ["3"],
        per_etype=False,
    )
    for must in [
        "full_corr.png",
        "corr_pantas2_3_rmats.png",
        "corr_pantas2_3_whippet.png",
        "corr_pantas2_3_suppa.png",
        "corr_rmats_whippet.png",
        "corr_rmats_suppa.png",
        "corr_whippet_suppa.png",
        "venn_full_rmats_whippet_suppa_pantas.png",  # singleton-Ws legend venn
        "venn_full_rmats_whippet_suppa_pantas_3.png",
    ]:
        assert must in written, must
        assert os.path.getsize(tmp_path / "figs" / must) > 5_000, must
