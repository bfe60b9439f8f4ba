from .engine import PredictEngine  # noqa: F401
from .server import serve  # noqa: F401
