"""Minimal stub of the ``intervaltree`` package API surface that the
reference's ``build/reduce.py`` and ``exps/1-dm-sim/scripts/simrc.py`` use
(the real package is not installed in this environment). Semantics match
intervaltree 3.x for that subset:

- ``IntervalTree`` is a set of intervals with optional data; identical
  intervals dedupe on insert (``tree[a:b] = data``);
- ``merge_overlaps()`` (default strict mode) merges overlapping — not
  merely touching — intervals;
- ``tree[point]`` returns the set of intervals containing point;
- ``tree[a:b]`` returns the set of intervals overlapping [a, b);
- ``Interval`` orders by (begin, end, data) like the real package.
"""


class Interval:
    __slots__ = ("begin", "end", "data")

    def __init__(self, begin, end, data=None):
        self.begin = begin
        self.end = end
        self.data = data

    def _key(self):
        return (self.begin, self.end, self.data)

    def __lt__(self, other):
        return self._key() < other._key()

    def __eq__(self, other):
        return isinstance(other, Interval) and self._key() == other._key()

    def __hash__(self):
        return hash(self._key())

    def __repr__(self):  # matches intervaltree's repr closely enough
        return f"Interval({self.begin}, {self.end}, {self.data!r})"


class IntervalTree:
    def __init__(self):
        self._iv = set()

    def __setitem__(self, sl, data):
        self._iv.add((sl.start, sl.stop, data))

    def __len__(self):
        return len(self._iv)

    def merge_overlaps(self):
        merged = []
        for s, e, _d in sorted(self._iv, key=lambda t: (t[0], t[1])):
            if merged and s < merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        self._iv = {(s, e, None) for s, e in merged}

    def __getitem__(self, key):
        if isinstance(key, slice):
            return {
                Interval(s, e, d)
                for (s, e, d) in self._iv
                if s < key.stop and e > key.start
            }
        return {Interval(s, e, d) for (s, e, d) in self._iv if s <= key < e}

    def __iter__(self):
        return iter(Interval(s, e, d) for s, e, d in self._iv)
