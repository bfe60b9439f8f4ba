from . import preprocess, sim  # noqa: F401
