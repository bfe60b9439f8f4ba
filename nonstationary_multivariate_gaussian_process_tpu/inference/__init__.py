from . import diagnostics, drhmc, empirical, hmc, init, map, nuts, smc, tempering, warmup, whiten  # noqa: F401
from .drhmc import DRHMCResult, drhmc_sample  # noqa: F401
from .smc import SMCResult, smc_sample, smc_sample_runs  # noqa: F401
from .hmc import HMCResult, estimate_mass_matrix, hmc_sample  # noqa: F401
from .tempering import TemperedResult, tempered_hmc_sample  # noqa: F401
from .map import MapResult, fit_map, multi_start_map  # noqa: F401
from .nuts import NUTSResult, nuts_sample, nuts_sample_chains  # noqa: F401
