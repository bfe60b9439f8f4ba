"""Robust dense Cholesky solves with a deterministic jitter ladder.

The reference guards ill-conditioned factorizations with a *stochastic* retry
loop — ``while loglik != loglik: …`` re-running a symeig with uniform-random
diagonal jitter (``Utility/logpos.py:267-268``, ``distributions.py:55-96``).
That is host control flow with nondeterministic results and cannot live inside
``jit``.

The TPU-native replacement is a deterministic jitter *ladder*: try Cholesky at
escalating jitter levels, select the first finite factorization with
``jnp.where`` — fully traced, reproducible, and differentiable (gradients flow
through the selected branch only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings

#: Jitter escalation ladder (multiples of settings.precision); level 0 = none.
LADDER = (0.0, 1.0, 1e2, 1e4)


def safe_cholesky(a: jnp.ndarray, ladder=LADDER) -> jnp.ndarray:
    """Cholesky of a symmetric PSD matrix with deterministic jitter escalation.

    Returns the factor from the smallest jitter level whose factorization is
    finite. If every level fails the last (largest-jitter) factor is returned,
    which surfaces NaNs to the caller rather than hiding them.
    """
    n = a.shape[-1]
    eye = jnp.eye(n, dtype=a.dtype)

    chol = jnp.linalg.cholesky(a + ladder[0] * settings.precision * eye)
    for lvl in ladder[1:]:
        ok = jnp.all(jnp.isfinite(chol))
        candidate = jnp.linalg.cholesky(a + lvl * settings.precision * eye)
        chol = jnp.where(ok, chol, candidate)
    return chol


def chol_logdet(chol: jnp.ndarray):
    """``logdet(A)`` from its Cholesky factor."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


def chol_solve(chol: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` given ``chol(A)``."""
    return jax.scipy.linalg.cho_solve((chol, True), b)


def psd_logdet_quad(a: jnp.ndarray, y: jnp.ndarray):
    """``(logdet A, yᵀ A⁻¹ y)`` via one robust Cholesky.

    Replaces the reference's dense ``torch.inverse`` + ``torch.logdet`` pair on
    the MN×MN GNMGP Gram (``Utility/logpos.py:352-353``) — one factorization
    instead of two O(n³) ops, with strictly better numerics.
    """
    c = safe_cholesky(a)
    sol = jax.scipy.linalg.solve_triangular(c, y, lower=True)
    return chol_logdet(c), jnp.sum(sol * sol, axis=-1)


def psd_solve(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``A x = b`` for symmetric PSD A with the robust Cholesky."""
    return chol_solve(safe_cholesky(a), b)
