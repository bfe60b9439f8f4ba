"""nonstationary_multivariate_gaussian_process_tpu (nmgp-tpu).

A TPU-native (JAX / XLA / Pallas / pjit / shard_map) framework for Bayesian
inference in nonstationary multivariate Gaussian processes, built from scratch
with the capabilities of the reference codebase
``Corleno/Nonstationary_Multivariate_Gaussian_Process``.

Model families
--------------
* ``models.lmc``   — stationary multi-task GP (linear model of coregionalization)
* ``models.snmgp`` — separable nonstationary multivariate GP
* ``models.gnmgp`` — generalized/nonseparable nonstationary multivariate GP (SVC)

Each supports both the fully-observed (N×M) and Hadamard (one observation per
input/task pair) data layouts.

Subsystems: ``inference`` (MAP via optax+lax.scan, HMC via lax.scan leapfrog,
empirical variogram initialization), ``predict`` (vmapped posterior-predictive
machinery), ``evaluate`` (RMSE/LPD, G/P/D, AIC/BIC/DIC), ``data`` (synthetic
generators, preprocessing), ``parallel`` (subject-sharded fleets over a device
mesh), ``postprocess`` (population statistics).
"""

from . import settings  # noqa: F401  (must be first: flips jax_enable_x64)
from . import dists  # noqa: F401
from .ops import chol, kernels, kron, transforms  # noqa: F401

__version__ = "0.1.0"
