"""Minimal biopython stub (SeqIO.parse over fastq only) for running the
reference's simrc.py in differential tests."""
