from . import base, gnmgp, gnmgp_hetero, gnmgp_sparse, lmc, snmgp  # noqa: F401
from .base import FullData, HadamardData, as_full_data, as_hadamard_data  # noqa: F401
