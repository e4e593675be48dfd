class Console:
    def __init__(self, file=None, **kwargs):
        self.file = file

    def print(self, *args, **kwargs):
        pass
