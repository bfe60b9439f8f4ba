"""GP kriging of the latent processes at new inputs.

Every reference prediction routine begins by conditioning the latent GP
processes (log-lengthscale, log-scale, L-entry processes) on their values at
the training inputs — one ``torch.solve`` per grid point per latent
(``Utility/prediction.py:54-71, 208-225, 927-941``).  Here the conditional is
computed for *all* grid points with one Cholesky solve: the projection matrix
``Σ⁻¹ K_cross`` is shared by every latent process with the same prior.

Pointwise semantics matched to the reference: variances are the *marginal*
conditional variances per grid point (not a joint draw), the prior is the
stationary RBF with nugget (so the self-variance term is ``α² + jitter``), and
negative variances clip to ``settings.precision`` (prediction.py:59-60).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import chol as chol_ops
from ..ops import kernels


class LatentConditional(NamedTuple):
    mean: jnp.ndarray  # (..., G) conditional mean per grid point
    var: jnp.ndarray  # (G,) marginal conditional variance per grid point


def krige_rbf(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    values: jnp.ndarray,
    mu: float,
    alpha: float,
    beta: float,
) -> LatentConditional:
    """Pointwise GP conditional of latent ``values`` (…, N) at ``grid`` (G,).

    ``values`` may carry leading batch axes (e.g. the T L-entry processes of
    the GNMGP, which share one projection).  Returns means (…, G) and the
    shared marginal variances (G,).

    Numerics: the smooth-RBF prior Gram has condition ~1e18, so the entire
    projection ``Σ⁻¹ K_cross`` is an f64 *island* — computed on the host in
    float64 when inputs are concrete (the projection itself is smooth and
    bounded, hence safe to cast back to the working dtype).  Under a trace
    the robust in-graph factorization is used instead.
    """
    import numpy as np

    if getattr(x, "ndim", 1) != 1 or getattr(grid, "ndim", 1) != 1:
        raise ValueError(
            f"krige_rbf expects 1-D training inputs and query grid; got "
            f"x shape {tuple(getattr(x, 'shape', ()))}, grid shape "
            f"{tuple(getattr(grid, 'shape', ()))}"
        )
    k_self = alpha**2 + settings.jitter
    if not isinstance(x, jax.core.Tracer) and not isinstance(grid, jax.core.Tracer):
        # concrete inputs: one source of truth for the f64-island numerics
        proj, var = krige_proj(x, grid, alpha, beta)
        mean = mu + (values - mu) @ proj
        return LatentConditional(mean=mean, var=var)

    sigma = kernels.rbf_cov(x, alpha=alpha, beta=beta)
    k_cross = kernels.rbf_cov(x, grid, alpha=alpha, beta=beta)  # (N, G)
    c = chol_ops.prior_cholesky(sigma)  # forced-robust under trace
    proj = chol_ops.chol_solve(c, k_cross)  # (N, G) = Σ⁻¹ K_cross
    mean = mu + (values - mu) @ proj  # (..., G)
    var = k_self - jnp.sum(k_cross * proj, axis=0)
    var = jnp.maximum(var, settings.precision)
    return LatentConditional(mean=mean, var=var)


def krige_proj(x, grid, alpha: float, beta: float):
    """The shared pieces of :func:`krige_rbf`: ``(proj (N, G), var (G,))``.

    For batched prediction over many parameter draws the projection
    ``Σ⁻¹ K_cross`` and the marginal variances depend only on (x, grid,
    prior); computing them once and applying ``mu + (values - mu) @ proj``
    per draw is the batched form of :func:`krige_rbf` (identical numerics:
    same host-f64 island, same nugget/clipping semantics).
    """
    import numpy as np

    k_self = alpha**2 + settings.jitter
    x64 = np.asarray(x, np.float64)
    g64 = np.asarray(grid, np.float64)
    d2 = (x64[:, None] - x64[None, :]) ** 2
    sigma = alpha**2 * np.exp(-0.5 * d2 / beta**2) + settings.jitter * np.eye(len(x64))
    k_cross_64 = alpha**2 * np.exp(-0.5 * (x64[:, None] - g64[None, :]) ** 2 / beta**2)
    proj64 = np.linalg.solve(sigma, k_cross_64)  # (N, G)
    var64 = k_self - np.sum(k_cross_64 * proj64, axis=0)
    return (
        jnp.asarray(proj64, settings.dtype),
        jnp.asarray(np.maximum(var64, settings.precision), settings.dtype),
    )


def sample_latent(key, cond: LatentConditional) -> jnp.ndarray:
    """Draw one pointwise sample of a latent process at the grid."""
    z = jax.random.normal(key, cond.mean.shape, dtype=cond.mean.dtype)
    return cond.mean + jnp.sqrt(cond.var) * z
