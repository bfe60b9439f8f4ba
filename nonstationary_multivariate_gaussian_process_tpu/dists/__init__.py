"""Probability densities.

TPU-native re-design of the reference's ``Utility/distributions.py`` plus the
``torch.distributions`` calls scattered through ``Utility/logpos.py``.

Normalization conventions are matched to the reference *exactly* so posterior
values agree to float tolerance:

* the data likelihood is **unnormalized** — the reference drops the 2π constant
  (distributions.py:22),
* the GP priors use ``torch.distributions.MultivariateNormal.log_prob`` which
  **includes** the constant (logpos.py:274), as does ``Normal.log_prob``
  (logpos.py:283),
* ``inverse_gamma_logpdf`` includes its normalizer (distributions.py:126-134),
  the ``_u`` variant does not (:116-124).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import gammaln

from ..ops import chol as _chol
from ..ops import kron as _kron

_LOG2PI = float(jnp.log(2.0 * jnp.pi))


# -- multivariate normal -----------------------------------------------------


def mvn_logpdf_unnorm(y, mu, logdet, quad):
    """Unnormalized MVN log-density from precomputed logdet and quadratic form.

    Matches reference ``multivariate_normal_logpdf`` (distributions.py:10-23),
    which drops the ``-0.5 N log 2π`` constant.
    """
    del y, mu  # the caller folded (y - mu) into `quad`
    return -0.5 * logdet - 0.5 * quad


def mvn_logpdf_kron(y, mu, b, k, sigma2, mask=None):
    """Unnormalized MVN log-pdf with covariance ``B ⊗ K + σ² I`` (task-major y).

    Exact-arithmetic equal to reference ``multivariate_normal_logpdf0``
    (distributions.py:26-52) but computed through the rotated batched-Cholesky
    path (see ``ops/kron.py``) — no eigh(K), hence no NaN-retry loop.
    ``mask`` (N,) excludes padded inputs exactly (see kron_chol_logdet_quad).
    """
    logdet, quad = _kron.kron_chol_logdet_quad(b, k, sigma2, y - mu, mask=mask)
    return -0.5 * logdet - 0.5 * quad


def mvn_logpdf_dense_unnorm(y, mu, cov):
    """Unnormalized MVN log-pdf with a dense covariance.

    Replaces the reference's ``torch.inverse`` + ``torch.logdet`` likelihood on
    the GNMGP Gram (logpos.py:352-354) with one robust Cholesky.
    """
    logdet, quad = _chol.psd_logdet_quad(cov, y - mu)
    return -0.5 * logdet - 0.5 * quad


def mvn_logpdf(y, mu, cov):
    """Normalized MVN log-pdf (constant included) with a dense covariance.

    Matches ``torch.distributions.MultivariateNormal(...).log_prob`` as used
    for the GP priors at logpos.py:274, 279, 358, 365.
    """
    n = y.shape[-1]
    logdet, quad = _chol.psd_logdet_quad(cov, y - mu)
    return -0.5 * n * _LOG2PI - 0.5 * logdet - 0.5 * quad


class TriInv(NamedTuple):
    """Hoisted prior factor: ``w = chol(Σ)^{-1}`` plus ``logdet(Σ)``.

    Loop-invariant prior Grams are factored AND inverted once on the host
    (f64); inside the jitted objective the prior solve is then a matvec
    (``w @ (y-mu)``) instead of a sequential triangular substitution — on TPU
    the emulated-f64 trsm is latency-bound at ~tens of us per column, which
    would otherwise dominate the mixed-precision objective.
    """

    w: jnp.ndarray
    logdet: jnp.ndarray


def mvn_logpdf_chol(y, mu, chol):
    """Normalized MVN log-pdf given a precomputed Cholesky factor or TriInv.

    Lets a jitted objective reuse one prior-covariance factorization across
    many latent processes (the reference refactors Σ_L once per L-column at
    logpos.py:362-365).  When given a :class:`TriInv` the solve is a matvec.
    """
    import jax

    n = y.shape[-1]
    if isinstance(chol, TriInv):
        sol = (y - mu) @ chol.w.T
        logdet = chol.logdet
    else:
        sol = jax.scipy.linalg.solve_triangular(chol, y - mu, lower=True)
        logdet = _chol.chol_logdet(chol)
    return -0.5 * n * _LOG2PI - 0.5 * logdet - 0.5 * jnp.sum(sol * sol, axis=-1)


# -- scalar densities --------------------------------------------------------


def normal_logpdf(x, loc=0.0, scale=1.0):
    """Normalized univariate normal log-pdf (matches torch Normal.log_prob)."""
    z = (x - loc) / scale
    return -0.5 * z * z - jnp.log(scale) - 0.5 * _LOG2PI


def inverse_gamma_logpdf(x, alpha=1.0, beta=1.0):
    """Normalized inverse-gamma log-pdf (distributions.py:126-134)."""
    return (-alpha - 1.0) * jnp.log(x) - beta / x + alpha * jnp.log(beta) - gammaln(alpha)


def inverse_gamma_logpdf_u(x, alpha=1.0, beta=1.0):
    """Unnormalized inverse-gamma log-pdf (distributions.py:116-124)."""
    return (-alpha - 1.0) * jnp.log(x) - beta / x


def gamma_logpdf(x, alpha=1.0, beta=1.0):
    """Normalized gamma log-pdf (distributions.py:136-137)."""
    return (alpha - 1.0) * jnp.log(x) - beta * x + alpha * jnp.log(beta) - gammaln(alpha)
