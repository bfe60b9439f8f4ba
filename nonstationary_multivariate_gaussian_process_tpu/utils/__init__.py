from . import artifacts, debug, timing  # noqa: F401
from .artifacts import ArtifactStore  # noqa: F401
from .timing import StageTimer  # noqa: F401
