"""Minimal VCF parser (build layer: graph construction + haplotype threading).

Only what construction needs: positions, REF/ALT alleles, sample names, and
per-sample genotype allele indices. Symbolic alleles (``<...>``) are skipped,
matching the reference's haplotype synthesizer
(``scripts/add_haplotypes.py:39-41``).
"""

from __future__ import annotations

import gzip
from dataclasses import dataclass
from typing import Iterator, List, Optional, Tuple


@dataclass
class VcfVariant:
    chrom: str
    pos: int  # 1-based
    vid: str
    ref: str
    alts: Tuple[str, ...]
    # per-sample (h1, h2) allele indices; None where the call is missing ('.')
    genotypes: List[Tuple[Optional[int], Optional[int]]]
    phased: List[bool]

    @property
    def end(self) -> int:
        """1-based inclusive end of the REF allele span."""
        return self.pos + len(self.ref) - 1


def _open(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


_GT_CACHE: dict = {}


def _parse_gt(gt_field: str) -> Tuple[Tuple[Optional[int], Optional[int]], bool]:
    # genotype strings repeat massively across samples/variants: memoize
    cached = _GT_CACHE.get(gt_field)
    if cached is not None:
        return cached
    gt = gt_field.split(":", 1)[0]
    phased = "|" in gt
    parts = gt.replace("|", "/").split("/")
    idx: List[Optional[int]] = []
    for p in parts[:2]:
        idx.append(None if p in (".", "") else int(p))
    while len(idx) < 2:
        idx.append(idx[0] if idx else None)
    result = ((idx[0], idx[1]), phased)
    if len(_GT_CACHE) < 65536:
        _GT_CACHE[gt_field] = result
    return result


def read_vcf(path: str, chrom: Optional[str] = None) -> Tuple[List[str], List[VcfVariant]]:
    """Return (sample names, variants), optionally restricted to one chrom."""
    samples: List[str] = []
    variants: List[VcfVariant] = []
    for rec in iter_vcf(path, chrom, samples):
        variants.append(rec)
    return samples, variants


def iter_vcf(
    path: str, chrom: Optional[str] = None, samples_out: Optional[List[str]] = None
) -> Iterator[VcfVariant]:
    with _open(path) as fh:
        for line in fh:
            if line.startswith("##"):
                continue
            if line.startswith("#CHROM"):
                cols = line.rstrip("\n").split("\t")
                if samples_out is not None:
                    samples_out.extend(cols[9:])
                continue
            cols = line.rstrip("\n").split("\t")
            if chrom is not None and cols[0] != chrom:
                continue
            alts = tuple(cols[4].split(","))
            if any(a.startswith("<") for a in alts):
                continue
            gts = []
            phased = []
            for s in cols[9:]:
                g, ph = _parse_gt(s)
                gts.append(g)
                phased.append(ph)
            yield VcfVariant(
                chrom=cols[0],
                pos=int(cols[1]),
                vid=cols[2],
                ref=cols[3],
                alts=alts,
                genotypes=gts,
                phased=phased,
            )
