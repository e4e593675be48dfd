def track(iterable, description=None, console=None, **kwargs):
    return iter(iterable)
