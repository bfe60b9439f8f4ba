from . import analysis, stats, summary  # noqa: F401
