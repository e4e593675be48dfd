"""Native C++ coverage engine vs host accumulator (byte-identical)."""

import io

import pytest

from fixtures_micro import write_micro

from pantas_tpu.coverage import augment_gfa

native = pytest.importorskip("pantas_tpu.native")


@pytest.fixture(scope="module")
def have_native():
    if not native.native_available():
        pytest.skip("g++ / native build unavailable")


def test_native_matches_host_bytes(tmp_path, have_native):
    gfa, gaf = write_micro(tmp_path)
    host_buf, log = io.StringIO(), io.StringIO()
    augment_gfa(gaf, gfa, out=host_buf, log=log)

    nat_buf, log2 = io.StringIO(), io.StringIO()
    counts = native.augment_gfa_native(gaf, gfa, out=nat_buf, log=log2)
    assert nat_buf.getvalue() == host_buf.getvalue()
    assert counts.rejected == 1 and counts.skipped == 2 and counts.accepted == 12
