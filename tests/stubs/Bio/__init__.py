"""Minimal biopython stub (SeqIO fastq parse/write + Seq) for running the
reference's simrc.py / filter_reads.py in differential tests."""
