"""Minimal stub of the ``intervaltree`` package API surface that the
reference's ``build/reduce.py`` uses (the real package is not installed in
this environment). Semantics match intervaltree 3.x for that subset:

- ``IntervalTree`` is a set of half-open intervals; identical intervals
  dedupe on insert (``tree[a:b] = data``);
- ``merge_overlaps()`` (default strict mode) merges overlapping — not
  merely touching — intervals;
- ``tree[point]`` returns the (sized) set of intervals containing point.
"""


class Interval:
    __slots__ = ("begin", "end", "data")

    def __init__(self, begin, end, data=None):
        self.begin = begin
        self.end = end
        self.data = data


class IntervalTree:
    def __init__(self):
        self._iv = set()

    def __setitem__(self, sl, data):
        self._iv.add((sl.start, sl.stop))

    def __len__(self):
        return len(self._iv)

    def merge_overlaps(self):
        merged = []
        for s, e in sorted(self._iv):
            if merged and s < merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        self._iv = {(s, e) for s, e in merged}

    def __getitem__(self, point):
        return [Interval(s, e) for s, e in self._iv if s <= point < e]

    def __iter__(self):
        return iter(Interval(s, e) for s, e in self._iv)
