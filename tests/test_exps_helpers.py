"""filter-reads / fix-vidx / clean-gtf helper parity.

clean_gtf and filter_reads run differentially against the reference
scripts (with the Bio/intervaltree stubs); filter_reads' N-patching uses
the UNSEEDED global RNG in the reference, so the differential fixture is
N-free and the N quirk (one base replaces every N of a record) is
unit-tested with a seed. fix_vidx's reference needs pysam (absent), so
its quirks — the stuck ``.1`` counter and the silent drop of non-chr
contigs — are asserted directly.
"""

import io
import os
import subprocess
import sys
from pathlib import Path

from conftest import REFERENCE, REPO_ROOT

STUBS = Path(__file__).parent / "stubs"
SCRIPTS = REFERENCE / "exps/1-dm-sim/scripts"


def _ref(cmd, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO_ROOT}:{STUBS}"
    env["PYTHONHASHSEED"] = "0"
    proc = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd=cwd)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


FQ1 = (
    "@r1/t1;mate1:5-10;mate2:20-25\nACGTACGT\n+\nIIIIIIII\n"
    "@r2/t1;mate1Start:1;mate2Start:1\nACGTACGT\n+\nIIIIIIII\n"
    "@r3/t2;mate1:9-14;mate2:30-35\nTTTTGGGG\n+\nIIIIIIII\n"
)
FQ2 = (
    "@r1/t1;mate1:5-10;mate2:20-25\nTGCATGCA\n+\nIIIIIIII\n"
    "@r2/t1;mate1Start:1;mate2Start:1\nTGCATGCA\n+\nIIIIIIII\n"
    "@r3/t2;mate1:9-14;mate2:30-35\nCCCCAAAA\n+\nIIIIIIII\n"
)


def test_filter_reads_differential(tmp_path):
    (tmp_path / "a_1.fq").write_text(FQ1)
    (tmp_path / "a_2.fq").write_text(FQ2)
    _ref([sys.executable, str(SCRIPTS / "filter_reads.py"), "a_1.fq", "a_2.fq"],
         tmp_path)
    ref1 = (tmp_path / "a_1.clean.fq").read_text()
    ref2 = (tmp_path / "a_2.clean.fq").read_text()

    from pantas_tpu.eval.exps_helpers import filter_reads

    o1, o2 = filter_reads(
        str(tmp_path / "a_1.fq"), str(tmp_path / "a_2.fq"),
        out1_path=str(tmp_path / "o1.fq"), out2_path=str(tmp_path / "o2.fq"),
    )
    assert open(o1).read() == ref1
    assert open(o2).read() == ref2
    assert "r2/" not in ref1  # the artifact pair is gone


def test_filter_reads_n_quirk(tmp_path):
    (tmp_path / "n_1.fq").write_text("@r1/t;mate1:1-2;mate2:3-4\nANNA\n+\nIIII\n")
    (tmp_path / "n_2.fq").write_text("@r1/t;mate1:1-2;mate2:3-4\nNCNC\n+\nIIII\n")
    from pantas_tpu.eval.exps_helpers import filter_reads

    o1, o2 = filter_reads(
        str(tmp_path / "n_1.fq"), str(tmp_path / "n_2.fq"), seed=11,
        out1_path=str(tmp_path / "o1.fq"), out2_path=str(tmp_path / "o2.fq"),
    )
    s1 = open(o1).read().splitlines()[1]
    s2 = open(o2).read().splitlines()[1]
    # every N of a record replaced by ONE base (reference quirk)
    assert "N" not in s1 and s1[0] == "A" and s1[3] == "A" and s1[1] == s1[2]
    assert "N" not in s2 and s2[0] == s2[2] and s2[1] == "C"


def test_fix_vidx_quirks():
    from pantas_tpu.eval.exps_helpers import fix_vidx

    vcf = io.StringIO(
        "##fileformat=VCFv4.2\n"
        "##contig=<ID=chr4,length=100>\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n"
        "chr4\t10\t.\tA\tT\t.\t.\t.\n"
        "chr4\t10\t.\tA\tG\t.\t.\t.\n"
        "5\t20\t.\tC\tG\t.\t.\t.\n"
    )
    out = io.StringIO()
    fix_vidx(vcf, out)
    lines = out.getvalue().splitlines()
    assert lines[1] == "##contig=<ID=4,length=100>"
    recs = [l for l in lines if not l.startswith("#")]
    # non-chr contig dropped (reference quirk); stuck .1 counter quirk
    assert len(recs) == 2
    assert recs[0].split("\t")[2] == "4-10.1"
    assert recs[1].split("\t")[2] == "4-10.1"


GTF = "".join(
    line + "\n"
    for line in [
        'c\tx\tgene\t100\t200\t.\t+\t.\tgene_id "G1";',
        'c\tx\texon\t100\t150\t.\t+\t.\tgene_id "G1";',
        'c\tx\tgene\t180\t300\t.\t+\t.\tgene_id "G2";',  # overlaps G1
        'c\tx\texon\t180\t240\t.\t+\t.\tgene_id "G2";',
        'c\tx\tgene\t400\t500\t.\t+\t.\tgene_id "G3";',  # clean
        'c\tx\texon\t400\t450\t.\t+\t.\tgene_id "G3";',
        'd\tx\tgene\t100\t200\t.\t-\t.\tgene_id "G4";',  # clean, other chrom
        'd\tx\texon\t120\t160\t.\t-\t.\tgene_id "G4";',
    ]
)


def test_clean_gtf_differential(tmp_path):
    gtf = tmp_path / "g.gtf"
    gtf.write_text(GTF)
    theirs = _ref([sys.executable, str(SCRIPTS / "clean_gtf.py"), "g.gtf"], tmp_path)
    from pantas_tpu.eval.exps_helpers import clean_gtf

    ours = io.StringIO()
    clean_gtf(str(gtf), ours)
    assert ours.getvalue() == theirs
    kept = {l.split('"')[1] for l in ours.getvalue().splitlines()}
    assert kept == {"G3", "G4"}
