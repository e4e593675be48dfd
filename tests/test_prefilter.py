"""shark-style gene-panel read prefilter (reference
exps/3-homo-real/workflow/rules/pantas.smk:57-75): panel reads are kept
with the right gene association, off-panel reads are dropped, low-quality
bases cannot confirm, and the native and python engines agree byte-wise.
"""

import random
import subprocess
import sys

from conftest import REPO_ROOT

from pantas_tpu.io.fasta import revcomp


def _mk_inputs(tmp_path, n_pairs=40, read_len=100):
    rng = random.Random(42)

    def rand_seq(n):
        return "".join(rng.choice("ACGT") for _ in range(n))

    genes = {f"GENE{i}": rand_seq(600) for i in range(3)}
    fa = tmp_path / "genes.fa"
    fa.write_text("".join(f">{g}\n{s}\n" for g, s in genes.items()))

    fq1, fq2, truth = [], [], {}
    for i in range(n_pairs):
        name = f"pair{i}"
        if i % 2 == 0:  # panel pair: fragment from a gene
            gname = f"GENE{i % 3}"
            src = genes[gname]
            start = rng.randrange(0, len(src) - 2 * read_len)
            frag = src[start : start + 2 * read_len]
            truth[name] = gname
        else:  # off-panel pair
            frag = rand_seq(2 * read_len)
            truth[name] = None
        m1 = frag[:read_len]
        m2 = revcomp(frag[-read_len:])
        fq1.append(f"@{name}\n{m1}\n+\n{'I' * read_len}\n")
        fq2.append(f"@{name}\n{m2}\n+\n{'I' * read_len}\n")
    p1 = tmp_path / "r1.fq"
    p2 = tmp_path / "r2.fq"
    p1.write_text("".join(fq1))
    p2.write_text("".join(fq2))
    return fa, p1, p2, truth


def _run(tmp_path, fa, p1, p2, engine, tag):
    o1 = tmp_path / f"f1_{tag}.fq"
    o2 = tmp_path / f"f2_{tag}.fq"
    res = subprocess.run(
        [sys.executable, "-m", "pantas_tpu", "prefilter", "-r", str(fa),
         "-1", str(p1), "-2", str(p2), "-o", str(o1), "-p", str(o2),
         "--engine", engine],
        capture_output=True, text=True, cwd=REPO_ROOT, check=True,
    )
    return o1.read_text(), o2.read_text(), res.stdout


def test_prefilter_separates_and_engines_agree(tmp_path):
    fa, p1, p2, truth = _mk_inputs(tmp_path)
    n_out1, n_out2, n_tsv = _run(tmp_path, fa, p1, p2, "native", "n")
    p_out1, p_out2, p_tsv = _run(tmp_path, fa, p1, p2, "python", "p")
    assert (n_out1, n_out2, n_tsv) == (p_out1, p_out2, p_tsv)

    assoc = dict(line.split("\t") for line in n_tsv.splitlines())
    kept = set(assoc)
    expected = {n for n, g in truth.items() if g is not None}
    assert kept == expected
    for name, gene in assoc.items():
        assert truth[name] == gene

    # kept FASTQ records re-emit verbatim, in input order
    orig1 = p1.read_text().splitlines()
    kept_names = [l[1:] for l in n_out1.splitlines()[::4]]
    assert kept_names == [n for n in (l[1:] for l in orig1[::4]) if n in kept]


def test_low_quality_bases_cannot_confirm(tmp_path):
    fa, p1, p2, truth = _mk_inputs(tmp_path, n_pairs=6)
    # rewrite both mates' qualities to phred 2 ('#'): every window is
    # disqualified at -q 10, so nothing is kept
    for p in (p1, p2):
        lines = p.read_text().splitlines()
        lines[3::4] = ["#" * len(q) for q in lines[3::4]]
        p.write_text("".join(l + "\n" for l in lines))
    o1 = tmp_path / "f1.fq"
    res = subprocess.run(
        [sys.executable, "-m", "pantas_tpu", "prefilter", "-r", str(fa),
         "-1", str(p1), "-2", str(p2), "-o", str(o1), "-p",
         str(tmp_path / "f2.fq")],
        capture_output=True, text=True, cwd=REPO_ROOT, check=True,
    )
    assert res.stdout == ""
    assert o1.read_text() == ""


def test_single_end_mode(tmp_path):
    fa, p1, p2, truth = _mk_inputs(tmp_path, n_pairs=10)
    o1 = tmp_path / "f1.fq"
    res = subprocess.run(
        [sys.executable, "-m", "pantas_tpu", "prefilter", "-r", str(fa),
         "-1", str(p1), "-o", str(o1)],
        capture_output=True, text=True, cwd=REPO_ROOT, check=True,
    )
    assoc = dict(line.split("\t") for line in res.stdout.splitlines())
    assert set(assoc) == {n for n, g in truth.items() if g is not None}
