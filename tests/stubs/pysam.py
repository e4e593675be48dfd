"""Minimal pysam stub (VariantFile over plain/gzipped VCF) for running the
reference's add_haplotypes.py in differential tests. Only the surface that
script touches: iteration, rec.alts, rec.id, rec.samples[name].allele_indices
in header sample order."""

import gzip


class _SampleGT:
    __slots__ = ("allele_indices",)

    def __init__(self, gt_field):
        ix = []
        for tok in gt_field.split(":")[0].replace("|", "/").split("/"):
            ix.append(None if tok in (".", "") else int(tok))
        self.allele_indices = tuple(ix)


class _Record:
    __slots__ = ("alts", "id", "samples")

    def __init__(self, cols, sample_names):
        self.id = cols[2]
        self.alts = tuple(cols[4].split(","))
        self.samples = {
            name: _SampleGT(cols[9 + i]) for i, name in enumerate(sample_names)
        }


class VariantFile:
    def __init__(self, path):
        self._path = path
        self._samples = []

    def __iter__(self):
        op = gzip.open if str(self._path).endswith(".gz") else open
        with op(self._path, "rt") as fh:
            for line in fh:
                if line.startswith("##"):
                    continue
                if line.startswith("#CHROM"):
                    self._samples = line.rstrip("\n").split("\t")[9:]
                    continue
                cols = line.rstrip("\n").split("\t")
                yield _Record(cols, self._samples)
