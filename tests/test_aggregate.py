"""parse_res-equivalent aggregation: res/res_mask/venn tables.

The reference parse_res.py is Snakemake-embedded and imports plotting deps
absent here (SeabornFig2Grid, venn), so its data semantics are reproduced
and unit-tested rather than byte-diffed: merged per-event ΔPSI table in
reference row order, IR/SUPPA2 sign conventions, whippet region matching,
mask and venn-count derivations.
"""

import math
import sys

from conftest import run_cli


def _pantas_row(etype, gene, j1, j2, j3, psi1, psi2, dpsi):
    return ",".join(
        [etype, "annotated", "reference", "c", gene, "+", "n1", "n2", "n3",
         "x", "x", "x", j1, j2, j3, "5", "5", str(psi1), str(psi2), str(dpsi)]
    )


PANTAS_HEADER = (
    "etype,annotation_type,haplotype_type,chrom,gene,strand,junction1_name,"
    "junction2_name,junction3_name,junction1_nodes,junction2_nodes,"
    "junction3_nodes,junction1_positions,junction2_positions,"
    "junction3_positions,W1,W2,psi_c1,psi_c2,dpsi"
)


def _write_fixtures(tmp_path):
    p3 = tmp_path / "quant-remap.w3.csv"
    p3.write_text(
        PANTAS_HEADER + "\n" + "\n".join([
            _pantas_row("ES", "G1", "c:101-199", "c:301-399", "c:101-399",
                        0.8, 0.1, 0.7),
            _pantas_row("IR", "G2", "c:700-800", "c:650-850", ".",
                        0.9, 0.3, 0.6),
            _pantas_row("A3", "G3", "c:500-650", "c:500-600", ".",
                        0.9, 0.85, 0.04),  # below min_dpsi -> dropped
        ]) + "\n"
    )
    p5 = tmp_path / "quant-remap.w5.csv"
    p5.write_text(
        PANTAS_HEADER + "\n" + "\n".join([
            _pantas_row("ES", "G1", "c:101-199", "c:301-399", "c:101-399",
                        0.8, 0.15, 0.65),
            _pantas_row("A5", "G4", "c:900-999", "c:900-980", ".",
                        0.7, 0.2, 0.5),  # only at w=5
        ]) + "\n"
    )
    rmats = tmp_path / "rmats.csv"
    rmats.write_text(
        "etype,anno,chrom,gene,strand,j1,j2,j3,w1,w2,psi1,psi2,dpsi\n"
        "ES,anno,c,G1,+,c:101-399,c:101-199,c:301-399,0,0,0.82,0.12,0.7\n"
        "A3,anno,c,G9,+,c:40-60,c:40-80,.,0,0,0.9,0.2,0.7\n"
    )
    suppa = tmp_path / "suppa.csv"
    suppa.write_text(
        "etype,anno,chrom,gene,strand,j1,j2,j3,w1,w2,psi1,psi2,dpsi\n"
        "ES,anno,c,G1,+,c:101-399,c:101-199,c:301-399,0,0,0.2,0.8,-0.66\n"
    )
    whip = tmp_path / "whippet.diff"
    whip.write_text(
        "Gene\tNode\tCoord\tStrand\tType\tPsi_A\tPsi_B\tDeltaPsi\tProbability\tComplexity\tEntropy\n"
        # CE -> ES, region == pantas skipped exon span (event_j 101-399
        # after the whippet parse... matched by eq_event region equality)
        "G1\t2\tc:200-300\t+\tCE\t0.8\t0.1\t0.7\t0.95\tK1\t0.1\n"
        # unmatched AA -> A3, appends its own row
        "G8\t3\tc:10-20\t+\tAA\t0.5\t0.2\t0.3\t0.9\tK1\t0.1\n"
    )
    return p3, p5, rmats, suppa, whip


def test_aggregate_table(tmp_path):
    from pantas_tpu.eval.aggregate import (
        aggregate,
        parse_pantas_csv,
        parse_rmats_csv,
        parse_suppa_csv,
        parse_whippet_diff,
    )

    p3, p5, rmats, suppa, whip = _write_fixtures(tmp_path)
    pantas = {3: parse_pantas_csv(str(p3), 0.05), 5: parse_pantas_csv(str(p5), 0.05)}
    cols, rows = aggregate(
        pantas,
        parse_rmats_csv(str(rmats), 0.05),
        parse_suppa_csv(str(suppa), 0.05),
        parse_whippet_diff(str(whip), 0.05),
        relax=4,
    )
    assert cols == ["type", "event", "whippet", "SUPPA2", "rMATS", "pantas_3", "pantas_5"]
    by_name = {r["event"]: r for r in rows}

    # pantas ES event: seeded at w=3, updated at w=5, rMATS + SUPPA2 merged
    # on the same event key (rmats role order puts the skip junction first)
    es = [r for r in rows if r["type"] == "ES" and not math.isnan(r["pantas_3"])]
    assert len(es) == 1
    es = es[0]
    assert es["pantas_3"] == 0.7 and es["pantas_5"] == 0.65
    assert es["rMATS"] == 0.7
    assert es["SUPPA2"] == 0.66  # sign flipped on parse
    assert es["whippet"] == 0.7  # matched via region equality

    # pantas IR: sign flipped on parse; no other tool
    ir = [r for r in rows if r["type"] == "IR"][0]
    assert ir["pantas_3"] == -0.6
    assert math.isnan(ir["rMATS"]) and math.isnan(ir["whippet"])

    # below-min-dpsi pantas A3 dropped entirely; rMATS-only A3 present
    assert not any(r["type"] == "A3" and not math.isnan(r["pantas_3"]) for r in rows)
    assert any(r["type"] == "A3" and r["rMATS"] == 0.7 for r in rows)

    # w=5-only A5 row exists with NaN at w=3
    a5 = [r for r in rows if r["type"] == "A5"][0]
    assert math.isnan(a5["pantas_3"]) and a5["pantas_5"] == 0.5

    # unmatched whippet A3 appended under its own name
    assert any(
        r["type"] == "A3" and not (isinstance(r["whippet"], float) and math.isnan(r["whippet"]))
        for r in rows
    )


def test_parse_res_cli(tmp_path):
    p3, p5, rmats, suppa, whip = _write_fixtures(tmp_path)
    out = tmp_path / "res"
    run_cli(
        [sys.executable, "-m", "pantas_tpu", "parse-res", "-o", str(out),
         "--pantas", f"3={p3}", f"5={p5}",
         "--rmats", str(rmats), "--suppa", str(suppa), "--whippet", str(whip),
         "--min-dpsi", "0.05"],
    )
    res = (out / "res.csv").read_text().splitlines()
    assert res[0] == "type,event,whippet,SUPPA2,rMATS,pantas_3,pantas_5"
    mask = (out / "res_mask.csv").read_text().splitlines()
    assert len(mask) == len(res)
    # mask cells carry the event name where detected
    es_row = [l for l in res[1:] if l.startswith("ES,")][0]
    name = es_row.split(",")[1]
    assert name in [l for l in mask[1:] if l.startswith("ES,")][0].split(",")[2]
    venn = (out / "venn_counts.csv").read_text().splitlines()
    assert venn[0] == "etype,tools,count"
    # the ES event is detected by all five columns
    all_tools = [l for l in venn if l.startswith("ES,whippet|SUPPA2|rMATS|pantas_3|pantas_5")]
    assert all_tools and all_tools[0].endswith(",1")
