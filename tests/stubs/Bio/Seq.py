class Seq:
    def __init__(self, data):
        self._d = str(data)

    def replace(self, old, new):
        return Seq(self._d.replace(old, new))

    def __str__(self):
        return self._d

    def __contains__(self, x):
        return x in self._d

    def __len__(self):
        return len(self._d)

    def __eq__(self, other):
        # biopython Seq compares by string content (incl. vs plain str)
        return self._d == str(other)

    def __hash__(self):
        return hash(self._d)
