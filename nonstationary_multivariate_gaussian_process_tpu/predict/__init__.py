from . import gnmgp, gnmgp_sparse, hadamard, latent, lmc, snmgp  # noqa: F401
from .snmgp import GridPrediction, SampledPrediction  # noqa: F401
