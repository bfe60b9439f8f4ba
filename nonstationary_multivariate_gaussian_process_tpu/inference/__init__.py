from . import diagnostics, empirical, hmc, init, map  # noqa: F401
from .hmc import HMCResult, estimate_mass_matrix, hmc_sample  # noqa: F401
from .map import MapResult, fit_map, multi_start_map  # noqa: F401
