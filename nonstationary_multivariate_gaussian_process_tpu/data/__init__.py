from . import io, preprocess, sim  # noqa: F401
