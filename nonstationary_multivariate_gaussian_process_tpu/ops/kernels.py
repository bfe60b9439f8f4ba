"""Covariance kernels.

TPU-native re-design of the reference's ``Utility/kernels.py``:

* ``rbf_cov``               — stationary RBF (reference ``RBF_cov``, kernels.py:24)
* ``nonstationary_rbf_cov`` — Gibbs / Paciorek–Schervish nonstationary RBF with
  pointwise scale and lengthscale processes (reference
  ``Nonstationary_RBF_cov``, kernels.py:46-73)

Semantics matched to the reference:

* squared Euclidean pairwise distances (kernels.py:5-21),
* the *self*-covariance variant (``x2 is None``) adds ``jitter * I`` on the
  diagonal (kernels.py:35, 64); the cross-covariance variant does not,
* Gibbs kernel: ``C * sqrt(2 ℓ_i ℓ_j / (ℓ_i² + ℓ_j²)) * exp(−d² / (ℓ_i² + ℓ_j²))``
  with ``C = σ_i σ_j``.

Everything is expressed as batched matmul-friendly ops so XLA tiles the hot
Gram assembly onto the MXU; a fused Pallas variant for large N lives in
``ops/pallas_kernels.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import settings


def sq_dists(x1: jnp.ndarray, x2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pairwise squared Euclidean distances between rows of x1 (N1,d) and x2 (N2,d).

    1-D inputs are treated as (N, 1). Mirrors reference kernels.py:5-21.
    """
    x1 = jnp.atleast_1d(x1)
    if x1.ndim == 1:
        x1 = x1[:, None]
    if x2 is None:
        x2 = x1
    else:
        x2 = jnp.atleast_1d(x2)
        if x2.ndim == 1:
            x2 = x2[:, None]
    n1 = jnp.sum(x1 * x1, axis=-1)[:, None]
    n2 = jnp.sum(x2 * x2, axis=-1)[None, :]
    d = n1 + n2 - 2.0 * x1 @ x2.T
    return d


def rbf_cov(
    x1: jnp.ndarray,
    x2: jnp.ndarray | None = None,
    alpha=1.0,
    beta=1.0,
    jitter: float | None = None,
) -> jnp.ndarray:
    """Stationary RBF covariance ``alpha² exp(-0.5 |x1/beta - x2/beta|²)``.

    When ``x2 is None`` a ``jitter * I`` nugget is added (reference
    kernels.py:33-35). ``alpha``/``beta`` may be scalars or 0-d arrays.
    """
    x1 = jnp.asarray(x1, settings.dtype)
    self_cov = x2 is None
    d = sq_dists(x1 / beta, None if self_cov else jnp.asarray(x2, settings.dtype) / beta)
    cov = jnp.exp(-0.5 * d) * alpha**2
    if self_cov:
        jit = settings.jitter if jitter is None else jitter
        cov = cov + jit * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return cov


def nonstationary_rbf_cov(
    x1: jnp.ndarray,
    sigma1: jnp.ndarray | None = None,
    ell1: jnp.ndarray | None = None,
    x2: jnp.ndarray | None = None,
    sigma2: jnp.ndarray | None = None,
    ell2: jnp.ndarray | None = None,
    jitter: float | None = None,
) -> jnp.ndarray:
    """Gibbs nonstationary RBF covariance with pointwise (σ(x), ℓ(x)) processes.

    ``K[i,j] = σ1_i σ2_j sqrt(2 ℓ1_i ℓ2_j / (ℓ1_i² + ℓ2_j²))
               · exp(−‖x1_i − x2_j‖² / (ℓ1_i² + ℓ2_j²))``

    Mirrors reference kernels.py:46-73 including the ``jitter * I`` nugget on
    the self-covariance (``x2 is None``) and σ/ℓ defaulting to ones.
    """
    x1 = jnp.asarray(x1, settings.dtype)
    n1 = x1.shape[0]
    ones1 = jnp.ones((n1,), settings.dtype)
    sigma1 = ones1 if sigma1 is None else jnp.asarray(sigma1, settings.dtype)
    ell1 = ones1 if ell1 is None else jnp.asarray(ell1, settings.dtype)
    self_cov = x2 is None
    if self_cov:
        x2, sigma2, ell2 = x1, sigma1, ell1
    else:
        x2 = jnp.asarray(x2, settings.dtype)
        n2 = x2.shape[0]
        ones2 = jnp.ones((n2,), settings.dtype)
        sigma2 = ones2 if sigma2 is None else jnp.asarray(sigma2, settings.dtype)
        ell2 = ones2 if ell2 is None else jnp.asarray(ell2, settings.dtype)

    d = sq_dists(x1, x2)
    a = (ell1**2)[:, None] + (ell2**2)[None, :]
    b = ell1[:, None] * ell2[None, :]
    c = sigma1[:, None] * sigma2[None, :]
    cov = c * jnp.sqrt(2.0 * b / a) * jnp.exp(-d / a)
    if self_cov:
        jit = settings.jitter if jitter is None else jitter
        cov = cov + jit * jnp.eye(cov.shape[0], dtype=cov.dtype)
    return cov
