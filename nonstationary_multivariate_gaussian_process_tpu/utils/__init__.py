from . import artifacts  # noqa: F401
from .artifacts import ArtifactStore  # noqa: F401
