from . import buckets, fleet, fleet_predict, mesh, sharded_chol, sharded_obj  # noqa: F401
from .fleet import FleetResult, drhmc_fleet, fit_fleet_map, hmc_fleet  # noqa: F401
from .mesh import make_mesh, subject_sharding  # noqa: F401
from .sharded_chol import sharded_cholesky  # noqa: F401
from .sharded_obj import loglik_sharded, make_objective_sharded  # noqa: F401
