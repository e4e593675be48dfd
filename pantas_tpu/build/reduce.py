"""Gene-panel graph reduction (hp=2 mode).

Replaces the reference's ``build/reduce.py``: keep only nodes whose id falls
inside the [min, max] id interval of some transcript path (± k), and split
the reference path into kept sub-paths named ``{name}.N``
(``reduce.py:12-67``).
"""

from __future__ import annotations

from bisect import bisect_right
from typing import List, Sequence, Tuple


class IdIntervals:
    """Merged integer intervals with O(log n) membership."""

    def __init__(self, intervals: Sequence[Tuple[int, int]]):
        merged: List[Tuple[int, int]] = []
        for s, e in sorted(intervals):
            if merged and s <= merged[-1][1] + 1:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        self.starts = [s for s, _ in merged]
        self.ends = [e for _, e in merged]

    def __contains__(self, x: int) -> bool:
        i = bisect_right(self.starts, x) - 1
        return i >= 0 and x <= self.ends[i]

    def __len__(self) -> int:
        return len(self.starts)


def transcript_intervals(paths: Sequence[Sequence[int]], k: int = 0) -> IdIntervals:
    """One id interval per transcript path, extended by k, merged."""
    return IdIntervals(
        [(min(p) - k, max(p) + k) for p in paths if p]
    )
