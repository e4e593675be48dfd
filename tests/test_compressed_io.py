"""Transparent compressed stage IO (VERDICT r4 task 3).

Every stage input accepts ``.gz``/``.zst`` transparently and stage
outputs compress opt-in (``-o x.gz``). Byte-identity contracts are
defined on DECOMPRESSED content: each test drives the same engine on
plain and compressed inputs and requires identical bytes out.
"""

import gzip
import io
import os
import subprocess
import sys

import pytest

from fixtures_call import SPLICE_GFA, SPLICE_GTF
from fixtures_micro import MICRO_GAF, MICRO_GFA, write_micro
from fixtures_quant import write_quant_fixtures

from pantas_tpu.coverage import augment_gfa


def _gz(path, text):
    with gzip.open(path, "wt") as fh:
        fh.write(text)
    return str(path)


def _zst(path, text):
    zstandard = pytest.importorskip("zstandard")
    with open(path, "wb") as fh:
        fh.write(zstandard.ZstdCompressor().compress(text.encode()))
    return str(path)


@pytest.fixture()
def plain_result(tmp_path):
    gfa, gaf = write_micro(tmp_path)
    buf = io.StringIO()
    augment_gfa(gaf, gfa, out=buf, log=io.StringIO())
    return gfa, gaf, buf.getvalue()


def test_host_augment_gz_inputs(tmp_path, plain_result):
    _, _, want = plain_result
    gfa = _gz(tmp_path / "m.gfa.gz", MICRO_GFA)
    gaf = _gz(tmp_path / "m.gaf.gz", MICRO_GAF)
    buf = io.StringIO()
    augment_gfa(gaf, gfa, out=buf, log=io.StringIO())
    assert buf.getvalue() == want


def test_host_augment_zst_inputs(tmp_path, plain_result):
    _, _, want = plain_result
    gfa = _zst(tmp_path / "m.gfa.zst", MICRO_GFA)
    gaf = _zst(tmp_path / "m.gaf.zst", MICRO_GAF)
    buf = io.StringIO()
    augment_gfa(gaf, gfa, out=buf, log=io.StringIO())
    assert buf.getvalue() == want


def test_native_augment_gz_inputs(tmp_path, plain_result):
    native = pytest.importorskip("pantas_tpu.native")
    if not native.native_available():
        pytest.skip("native build unavailable")
    _, _, want = plain_result
    gfa = _gz(tmp_path / "m.gfa.gz", MICRO_GFA)
    gaf = _gz(tmp_path / "m.gaf.gz", MICRO_GAF)
    buf = io.StringIO()
    native.augment_gfa_native(gaf, gfa, out=buf, log=io.StringIO())
    assert buf.getvalue() == want


def test_device_native_augment_gz_inputs(tmp_path, plain_result):
    """The production device path: compressed GAF inflates once for the
    mmap slot session; offsets refer to the decompressed stream."""
    from pantas_tpu.coverage.device import augment_gfa_device_native

    _, _, want = plain_result
    gfa = _gz(tmp_path / "m.gfa.gz", MICRO_GFA)
    gaf = _gz(tmp_path / "m.gaf.gz", MICRO_GAF)
    buf = io.StringIO()
    augment_gfa_device_native(gaf, gfa, out=buf, log=io.StringIO())
    assert buf.getvalue() == want


def test_call_gz_inputs(tmp_path):
    """call on gz-compressed GFA + GTF: identical rows (native loader
    materializes; GTF parser streams through xopen)."""
    from pantas_tpu.events import CallOptions, call_events

    gfa = tmp_path / "s.gfa"
    gtf = tmp_path / "s.gtf"
    gfa.write_text(SPLICE_GFA)
    gtf.write_text(SPLICE_GTF)
    opts = CallOptions(rca=0, novel=True)
    want = list(call_events(str(gfa), str(gtf), opts))
    assert len(want) > 1

    gz_gfa = _gz(tmp_path / "s.gfa.gz", SPLICE_GFA)
    gz_gtf = _gz(tmp_path / "s.gtf.gz", SPLICE_GTF)
    assert list(call_events(gz_gfa, gz_gtf, opts)) == want
    zst_gfa = _zst(tmp_path / "s.gfa.zst", SPLICE_GFA)
    assert list(call_events(zst_gfa, str(gtf), opts)) == want


def test_quant_remap_gz_csvs(tmp_path):
    """quant accepts gz event CSVs; remap accepts a gz quant CSV + gz GTF."""
    from pantas_tpu.quant import quantify
    from pantas_tpu.remap import remap

    c1, c2, gtf = write_quant_fixtures(tmp_path)
    want = io.StringIO()
    quantify(c1, c2, both=False, out=want)

    gz1 = [_gz(tmp_path / (os.path.basename(p) + ".gz"), open(p).read()) for p in c1]
    gz2 = [_gz(tmp_path / (os.path.basename(p) + ".gz"), open(p).read()) for p in c2]
    got = io.StringIO()
    quantify(gz1, gz2, both=False, out=got)
    assert got.getvalue() == want.getvalue()

    qcsv = tmp_path / "quant.csv"
    qcsv.write_text(want.getvalue())
    r_plain = io.StringIO()
    remap(str(qcsv), gtf, out=r_plain)
    gz_q = _gz(tmp_path / "quant.csv.gz", want.getvalue())
    gz_gtf = _gz(tmp_path / "remap.gtf.gz", open(gtf).read())
    r_gz = io.StringIO()
    remap(gz_q, gz_gtf, out=r_gz)
    assert r_gz.getvalue() == r_plain.getvalue()


def test_map_gz_inputs(tmp_path):
    """map accepts gz GFA and gz FASTQs (native path loader materializes,
    FASTQ streams through xopen)."""
    from pantas_tpu.mapping.mapper import map_reads

    gfa_text = (
        "H\tVN:Z:1.1\n"
        "S\t1\tACGTTGCAAGGCTCATCGATGCATA\n"
        "S\t2\tGGTTAACCTGCCATTGCAACTGGCA\n"
        "L\t1\t+\t2\t+\t*\n"
        "P\tTX_R1\t1+,2+\t*\n"
    )
    seq = "ACGTTGCAAGGCTCATCGATGCATAGGTTAACC"
    fq_text = f"@r1\n{seq}\n+\n{'I' * len(seq)}\n"
    gfa = tmp_path / "m.gfa"
    fq = tmp_path / "r.fq"
    gfa.write_text(gfa_text)
    fq.write_text(fq_text)
    want = io.StringIO()
    map_reads(str(gfa), str(fq), None, out=want, log=io.StringIO())
    assert want.getvalue().startswith("r1\t")  # the read did map

    gz_gfa = _gz(tmp_path / "m.gfa.gz", gfa_text)
    gz_fq = _gz(tmp_path / "r.fq.gz", fq_text)
    got = io.StringIO()
    map_reads(gz_gfa, gz_fq, None, out=got, log=io.StringIO())
    assert got.getvalue() == want.getvalue()


def test_cli_augment_gz_output_and_inputs(tmp_path):
    """CLI: augment -o aug.gfa.gz routes the native fast-emit through the
    gzip subprocess pipe; gz positional inputs accepted; decompressed
    bytes identical to the plain run."""
    gfa, gaf = write_micro(tmp_path)

    def run(args):
        env = dict(os.environ)
        env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
        r = subprocess.run(
            [sys.executable, "-m", "pantas_tpu"] + args,
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, env=env,
        )
        assert r.returncode == 0, args
        return r.stdout

    plain_aug = run(["augment", gaf, gfa])
    run(["augment", gaf, gfa, "-o", str(tmp_path / "aug.gfa.gz")])
    with gzip.open(tmp_path / "aug.gfa.gz", "rb") as fh:
        assert fh.read() == plain_aug

    gz_gaf = _gz(tmp_path / "m.gaf.gz", MICRO_GAF)
    gz_gfa = _gz(tmp_path / "m.gfa.gz", MICRO_GFA)
    assert run(["augment", gz_gaf, gz_gfa]) == plain_aug


def test_checkpoint_resume_on_gz_gaf(tmp_path):
    """Checkpoint offsets are defined on the DECOMPRESSED stream, so an
    interrupt/resume cycle over a gz GAF must reproduce the plain run's
    emission byte-for-byte."""
    import os

    from pantas_tpu.coverage.device import augment_gfa_device_native

    gfa, gaf = write_micro(tmp_path)
    big_text = open(gaf).read() * 20
    big_gz = _gz(tmp_path / "big.gaf.gz", big_text)
    plain = tmp_path / "big.gaf"
    plain.write_text(big_text)
    expected = io.StringIO()
    augment_gfa(str(plain), str(gfa), out=expected, log=io.StringIO())

    ck = str(tmp_path / "ck.pkl")
    r = augment_gfa_device_native(
        big_gz, str(gfa), out=io.StringIO(), flush_every=64,
        checkpoint_path=ck, checkpoint_every=1, _stop_after=1,
        log=io.StringIO(),
    )
    assert r is None and os.path.exists(ck)
    buf = io.StringIO()
    augment_gfa_device_native(
        big_gz, str(gfa), out=buf, flush_every=64,
        checkpoint_path=ck, resume=True, log=io.StringIO(),
    )
    assert buf.getvalue() == expected.getvalue()


def test_resume_after_completion_gz_is_noop(tmp_path):
    """The FINAL checkpoint's offset must be the parser's decompressed
    end position (not the compressed file size): a resume after a
    completed gz run must re-add NOTHING and emit identically."""
    from pantas_tpu.coverage.device import augment_gfa_device_native

    gfa, gaf = write_micro(tmp_path)
    big_text = open(gaf).read() * 10
    big_gz = _gz(tmp_path / "big.gaf.gz", big_text)
    plain = tmp_path / "big.gaf"
    plain.write_text(big_text)
    expected = io.StringIO()
    augment_gfa(str(plain), str(gfa), out=expected, log=io.StringIO())

    ck = str(tmp_path / "ck.pkl")
    first = io.StringIO()
    augment_gfa_device_native(
        big_gz, str(gfa), out=first, flush_every=64,
        checkpoint_path=ck, log=io.StringIO(),
    )
    assert first.getvalue() == expected.getvalue()
    again = io.StringIO()
    augment_gfa_device_native(
        big_gz, str(gfa), out=again, flush_every=64,
        checkpoint_path=ck, resume=True, log=io.StringIO(),
    )
    assert again.getvalue() == expected.getvalue()


def test_novel_sites_gz_inputs(tmp_path):
    """Code-review r5: the clip-site scanners (python AND native) must
    accept compressed inputs like every other stage consumer."""
    from pantas_tpu.events.sites import detect_novel_sites

    import sys
    sys.path.insert(0, "/root/repo/tests")
    from test_novel_sites import GFA as SITES_GFA, _fixture

    gaf, gfa = _fixture(tmp_path)
    want = detect_novel_sites(str(gaf), str(gfa), w=3)
    assert want  # fixture produces sites

    gz_gaf = _gz(tmp_path / "a.gaf.gz", open(gaf).read())
    gz_gfa = _gz(tmp_path / "g.gfa.gz", open(gfa).read())
    for engine in ("host", "native"):
        got = detect_novel_sites(gz_gaf, gz_gfa, w=3, engine=engine)
        assert got == want, engine


def test_zst_binary_readline(tmp_path):
    """Code-review r5: xopen('rb') on .zst must support readline()
    (BufferedReader wrap) — line-oriented binary consumers crashed."""
    from pantas_tpu.io.xopen import xopen

    p = _zst(tmp_path / "t.txt.zst", "line1\nline2\n")
    with xopen(p, "rb") as fh:
        assert fh.readline() == b"line1\n"
        assert fh.readline() == b"line2\n"


def test_python_device_eof_offset_gz(tmp_path):
    """Code-review r5: the python-tokenizer device path's FINAL checkpoint
    must record the decompressed EOF (not the compressed size) — a resume
    after completion over gz must be a no-op."""
    from pantas_tpu.coverage.device import augment_gfa_device

    gfa, gaf = write_micro(tmp_path)
    text = open(gaf).read() * 5
    gz = _gz(tmp_path / "b.gaf.gz", text)
    plain = tmp_path / "b.gaf"
    plain.write_text(text)
    expected = io.StringIO()
    augment_gfa(str(plain), str(gfa), out=expected, log=io.StringIO())

    ck = str(tmp_path / "ck2.pkl")
    first = io.StringIO()
    augment_gfa_device(gz, str(gfa), out=first, flush_every=8,
                       checkpoint_path=ck, log=io.StringIO())
    assert first.getvalue() == expected.getvalue()
    again = io.StringIO()
    augment_gfa_device(gz, str(gfa), out=again, flush_every=8,
                       checkpoint_path=ck, resume=True, log=io.StringIO())
    assert again.getvalue() == expected.getvalue()


def test_map_cli_gz_fastq_native_batch(tmp_path):
    """Code-review r5: the CLI map path writes to a real fd, taking the
    fully-native batch reader which fopen()s the FASTQ paths — compressed
    FASTQs must inflate first (raw gzip bytes parsed as FASTQ silently
    emitted garbage records)."""
    gfa_text = (
        "H\tVN:Z:1.1\n"
        "S\t1\tACGTTGCAAGGCTCATCGATGCATA\n"
        "S\t2\tGGTTAACCTGCCATTGCAACTGGCA\n"
        "L\t1\t+\t2\t+\t*\n"
        "P\tTX_R1\t1+,2+\t*\n"
    )
    seq = "ACGTTGCAAGGCTCATCGATGCATAGGTTAACC"
    fq_text = f"@r1\n{seq}\n+\n{'I' * len(seq)}\n"
    gfa = tmp_path / "m.gfa"
    gfa.write_text(gfa_text)
    fq = tmp_path / "r.fq"
    fq.write_text(fq_text)
    gz_fq = _gz(tmp_path / "r.fq.gz", fq_text)

    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")

    def run(fq_path, out_name):
        out = tmp_path / out_name
        r = subprocess.run(
            [sys.executable, "-m", "pantas_tpu", "map", str(gfa), fq_path,
             "-o", str(out)],
            stderr=subprocess.DEVNULL, env=env,
        )
        assert r.returncode == 0
        return out.read_text()

    plain = run(str(fq), "p.gaf")
    assert plain.startswith("r1\t")
    assert run(gz_fq, "g.gaf") == plain


def test_gfa_tag_type_roundtrip(tmp_path):
    """Code-review r5: unknown tag TYPES must survive a load/dump round
    trip (SO:i:5 was silently rewritten to SO:Z:5)."""
    from pantas_tpu.io.gfa import Gfa

    text = (
        "H\tVN:Z:1.1\n"
        "S\t1\tACGT\tSN:Z:chr1\tSO:i:5\tSR:i:0\n"
        "S\t2\tGG\tXF:f:0.25\n"
        "L\t1\t+\t2\t+\t*\tXC:i:7\n"
    )
    src = tmp_path / "t.gfa"
    src.write_text(text)
    g = Gfa.load(str(src))
    out = io.StringIO()
    g.dump(out)
    assert out.getvalue() == text
