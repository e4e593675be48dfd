"""Reduced whole-genome-scale call regression (VERDICT r2 task 3).

Builds a ~1M-node synthetic pangenome (deterministic seeds), synthesizes
coverage along its transcript paths, augments natively, and runs the host
caller — guarding that `call` completes at representative graph scale
within a sane memory budget. The full 100 Mbp / 5.5M-node measurements
live in docs/PERFORMANCE.md (scripts/bench_call_scale.py).
"""

import resource
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))


@pytest.fixture(scope="session")
def scale_graph(tmp_path_factory):
    import io

    import stress_build

    from pantas_tpu.build.pipeline import build_pangenome
    from pantas_tpu.native import augment_gfa_native

    wd = tmp_path_factory.mktemp("callscale")
    stress_build.gen_inputs(
        wd, mbp=18.0, n_var=180_000, n_genes=1800, n_samples=10,
        n_chroms=1, n_exons=8, n_tx=6,
    )
    out = build_pangenome(
        str(wd / "g.fa"), str(wd / "g.gtf"), str(wd / "g.vcf"),
        str(wd / "out"), threads=2,
    )

    from bench_call_scale import synth_gaf

    gaf = wd / "reads.gaf"
    synth_gaf(Path(out), 50_000, gaf)
    aug = wd / "aug.gfa"
    with open(aug, "w") as fh:
        augment_gfa_native(str(gaf), str(out), out=fh, log=io.StringIO(), threads=2)
    return aug, wd / "g.gtf", out


def test_call_at_million_nodes(scale_graph):
    aug, gtf, gfa = scale_graph
    n_nodes = sum(1 for line in open(gfa) if line[0] == "S")
    assert n_nodes > 950_000, n_nodes  # representative scale

    from pantas_tpu.events import CallOptions, call_events

    rows = [r for r in call_events(str(aug), str(gtf), CallOptions(rca=0))]
    n_events = len(rows) - 1
    # deterministic inputs (seeded generators, seeded read sampling):
    # pin the count as a regression anchor alongside a sanity band
    assert 5_000 < n_events < 50_000, n_events
    etypes = {r.split(",")[0] for r in rows[1:]}
    assert {"ES", "A3", "A5", "IR"} <= etypes, etypes
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    assert peak_gb < 8.0, f"call peak RSS {peak_gb:.1f} GB at 1M nodes"
