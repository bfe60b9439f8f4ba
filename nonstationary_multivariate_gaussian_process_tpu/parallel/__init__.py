from . import buckets, fleet, fleet_predict, mesh  # noqa: F401
from .fleet import FleetResult, fit_fleet_map, hmc_fleet  # noqa: F401
from .mesh import make_mesh, subject_sharding  # noqa: F401
