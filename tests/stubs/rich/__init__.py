"""Minimal rich stub for running the reference's add_haplotypes.py."""
