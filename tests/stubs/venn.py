"""Minimal stub of the ``venn`` package used by the reference 3-homo
``compare.py`` (not installed here). Only the plotting entry point is
consumed, and only for figure output — the differential compares stdout,
so a no-op keeps the reference script runnable."""


def venn(data, fontsize=None, legend_loc=None, cmap=None, ax=None, **kwargs):
    return ax
