"""FASTQ-only SeqIO.parse stub: yields records exposing ``.name`` with
biopython's semantics (first whitespace token of the header, sans '@')."""


class _Record:
    __slots__ = ("name", "id", "seq")

    def __init__(self, name, seq):
        self.name = name
        self.id = name
        self.seq = seq


def parse(path, fmt):
    assert fmt == "fastq", f"stub supports fastq only, got {fmt}"
    with open(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().strip()
            fh.readline()
            fh.readline()
            yield _Record(header[1:].strip().split(" ")[0].split("\t")[0], seq)
