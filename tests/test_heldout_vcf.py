"""Held-out-sample VCF protocol helpers (reference rules/pantas.smk:1-10)."""

import gzip

from pantas_tpu.io.vcf import (
    consensus_snps,
    read_vcf,
    write_vcf_excluding_sample,
)

VCF = """##fileformat=VCFv4.2
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tsA\tsB\tsC
c\t3\tv1\tG\tT\t.\t.\t.\tGT\t1|0\t0|0\t0|1
c\t7\tv2\tA\tC,G\t.\t.\t.\tGT\t0|2\t1|1\t.|.
c\t10\tv3\tAT\tA\t.\t.\t.\tGT\t1|0\t0|0\t0|0
"""

REF = {"c": "ACGTACGATATCG"}


def test_exclude_sample(tmp_path):
    src = tmp_path / "v.vcf"
    src.write_text(VCF)
    out = tmp_path / "v2.vcf"
    write_vcf_excluding_sample(str(src), str(out), "sB")
    samples, variants = read_vcf(str(out))
    assert samples == ["sA", "sC"]
    assert len(variants) == 3
    assert variants[0].genotypes == [(1, 0), (0, 1)]

    gz = tmp_path / "v3.vcf.gz"
    write_vcf_excluding_sample(str(src), str(gz), "sA")
    with gzip.open(gz, "rt") as fh:
        assert "sA" not in fh.read().splitlines()[1]


def test_consensus_snps(tmp_path):
    src = tmp_path / "v.vcf"
    src.write_text(VCF)
    # sA hap1: v1 alt T at pos 3; v2 allele 0; v3 is an indel -> skipped
    cons = consensus_snps(REF, str(src), "sA", hap=1)
    assert cons["c"] == "ACTTACGATATCG"
    # sA hap2: v2 allele 2 (G) at pos 7
    cons = consensus_snps(REF, str(src), "sA", hap=2)
    assert cons["c"] == "ACGTACGATATCG"[:6] + "G" + "ACGTACGATATCG"[7:]
    # missing call ('.') applies reference
    cons = consensus_snps(REF, str(src), "sC", hap=1)
    assert cons["c"] == REF["c"]
