"""FASTQ-only SeqIO stub: parse yields records with biopython's .id/.name
semantics (first whitespace token of the header); write re-emits fastq
with the record's description as header."""

from Bio.Seq import Seq


class _Record:
    __slots__ = ("id", "name", "description", "seq", "qual")

    def __init__(self, desc, seq, qual):
        self.description = desc
        self.id = desc.split(" ")[0]
        self.name = self.id
        self.seq = Seq(seq) if not isinstance(seq, Seq) else seq
        self.qual = qual


def parse(path, fmt):
    if fmt == "fasta":
        desc = None
        chunks = []
        with open(path) as fh:
            for line in fh:
                if line.startswith(">"):
                    if desc is not None:
                        yield _Record(desc, "".join(chunks), None)
                    desc = line[1:].rstrip("\n")
                    chunks = []
                else:
                    chunks.append(line.strip())
        if desc is not None:
            yield _Record(desc, "".join(chunks), None)
        return
    assert fmt == "fastq", f"stub supports fasta/fastq only, got {fmt}"
    with open(path) as fh:
        while True:
            header = fh.readline()
            if not header:
                break
            seq = fh.readline().strip()
            fh.readline()
            qual = fh.readline().strip()
            yield _Record(header[1:].rstrip("\n"), seq, qual)


def write(record, handle, fmt):
    assert fmt == "fastq"
    handle.write(f"@{record.description}\n{record.seq}\n+\n{record.qual}\n")
    return 1
