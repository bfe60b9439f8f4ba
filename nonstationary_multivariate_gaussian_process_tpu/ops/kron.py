"""Kronecker-structured linear algebra for ``σ² I + B ⊗ K``.

TPU-native re-design of the reference's ``Utility/kronecker_operation.py``.
The reference materializes Kronecker factors with ``torch.symeig`` pairs
(kronecker_operation.py:36-69); here the *primary* solver path avoids
differentiating through an N×N eigendecomposition entirely:

    eigh(B) = (w_B, v_B)  with B only M×M (tiny), then
    σ²I + B⊗K  =  (v_B ⊗ I) diag_m(σ²I + w_B[m] K) (v_B ⊗ I)ᵀ

so the solve/logdet reduce to M independent N×N *Cholesky* factorizations,
batched with ``vmap`` onto the MXU — stable gradients (no degenerate-eigenvalue
NaNs, the reason the reference carries a jittered retry loop at
``Utility/logpos.py:267-268``) and O(M N³/3) instead of an O(N³)+ eigh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp



def kron(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dense Kronecker product (reference kronecker_product, :5-22)."""
    return jnp.kron(a, b)


def kron_diag(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Kronecker product of diagonals: outer(d1, d2) flattened (reference :25-33)."""
    return (d1[:, None] * d2[None, :]).reshape(-1)


def kron_mv(b: jnp.ndarray, k: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Compute ``(B ⊗ K) y`` without materializing the MN×MN matrix.

    ``y`` is length M2*N2 in task-major order (task index varies slowest),
    matching the reference's ``y = Y.T.flatten()`` layout
    (kronecker_operation.py:72-85).  Two matmuls: ``K @ Y.T @ B.T``.
    """
    m2 = b.shape[1]
    n2 = k.shape[1]
    yt = y.reshape(m2, n2).T  # (N2, M2)
    a = k @ yt @ b.T  # (N1, M1)
    return a.T.reshape(-1)


def kron_eigh(b: jnp.ndarray, k: jnp.ndarray):
    """Eigendecomposition of ``B ⊗ K`` via per-factor eigh (reference kron_inv/:36-55).

    Returns ``(w_B, v_B, w_K, v_K)``. Kept for parity/prediction paths where an
    explicit spectral form is genuinely needed; the likelihood solver below
    does NOT use eigh(K).
    """
    w_b, v_b = jnp.linalg.eigh(b)
    w_k, v_k = jnp.linalg.eigh(k)
    return w_b, v_b, w_k, v_k


def kron_logdet(sigma2, b: jnp.ndarray, k: jnp.ndarray):
    """``logdet(σ²I + B ⊗ K)`` via per-factor eigendecomposition (reference :57-69)."""
    w_b = jnp.linalg.eigvalsh(b)
    w_k = jnp.linalg.eigvalsh(k)
    return jnp.sum(jnp.log(kron_diag(w_b, w_k) + sigma2))


def kron_inv(sigma2, b: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Dense ``(σ²I + B ⊗ K)^{-1}`` (reference :36-54). Reference/debug path."""
    w_b, v_b, w_k, v_k = kron_eigh(b, k)
    u = kron(v_b, v_k)
    t = kron_diag(w_b, w_k)
    return (u * (1.0 / (t + sigma2))[None, :]) @ u.T


# ---------------------------------------------------------------------------
# Cholesky-based solver for σ²I + B⊗K — the TPU-native likelihood fast path.
# ---------------------------------------------------------------------------


def kron_chol_factors(b: jnp.ndarray, k: jnp.ndarray, sigma2):
    """Factor ``σ²I + B ⊗ K`` into (w_B, v_B, chols) with chols[m] = chol(σ²I + w_B[m] K).

    Batched Cholesky over the M rotated blocks (vmap → one fused batched
    kernel on TPU).
    """
    w_b, v_b = jnp.linalg.eigh(b)
    n = k.shape[0]
    eye = jnp.eye(n, dtype=k.dtype)

    def chol_m(w):
        return jnp.linalg.cholesky(w * k + sigma2 * eye)

    chols = jax.vmap(chol_m)(w_b)  # (M, N, N)
    return w_b, v_b, chols


def kron_chol_logdet_quad(
    b: jnp.ndarray, k: jnp.ndarray, sigma2, y: jnp.ndarray, mask: jnp.ndarray | None = None
):
    """Return ``(logdet, quad)`` for ``Σ = σ²I + B⊗K`` and ``quad = yᵀ Σ⁻¹ y``.

    ``y`` is task-major length M*N. Exact-arithmetic equal to the reference's
    eigen identity (distributions.py:26-52) but with Cholesky gradients.

    ``mask`` (N,) boolean marks real inputs for padded subjects.  Masked rows/
    cols of K are zeroed with a unit diagonal, masked observations zeroed, and
    the analytic contribution of the padded slots — each padded input adds
    ``log(w_B[m] + σ²)`` per rotated block — is subtracted, so the result
    equals the unpadded computation exactly.
    """
    m = b.shape[0]
    n = k.shape[0]
    if mask is not None:
        mv = jnp.asarray(mask, k.dtype)
        k = k * (mv[:, None] * mv[None, :]) + jnp.diag(1.0 - mv)
        y = y * jnp.tile(mv, m)
    from .. import settings
    from . import chol as _chol

    if settings.mixed_solves and k.dtype == jnp.float64 and n >= _chol.MIXED_MIN_N:
        # parity-precision fast path: the rotation reduces Σ to M independent
        # N×N SPD blocks w_B[m]·K + σ²I — exactly the shape of the corrected
        # mixed-precision kernel (ops/mixed.py), vmapped over blocks
        from . import mixed as _mixed

        w_b, v_b = jnp.linalg.eigh(b)
        eye = jnp.eye(n, dtype=k.dtype)
        blocks = w_b[:, None, None] * k[None] + sigma2 * eye[None]
        z = v_b.T @ y.reshape(m, n)
        lds, quads = jax.vmap(_mixed.mixed_logdet_quad)(blocks, z)
        logdet = jnp.sum(lds)
        quad = jnp.sum(quads)
        if mask is not None:
            n_pad = n - jnp.sum(jnp.asarray(mask, k.dtype))
            logdet = logdet - n_pad * jnp.sum(jnp.log(w_b + sigma2))
        return logdet, quad

    w_b, v_b, chols = kron_chol_factors(b, k, sigma2)
    z = (v_b.T @ y.reshape(m, n))  # rotate task axis: (M, N)
    sol = jax.vmap(
        lambda c, zm: jax.scipy.linalg.solve_triangular(c, zm, lower=True)
    )(chols, z)
    quad = jnp.sum(sol * sol)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chols, axis1=-2, axis2=-1)))
    if mask is not None:
        n_pad = n - jnp.sum(jnp.asarray(mask, k.dtype))
        logdet = logdet - n_pad * jnp.sum(jnp.log(w_b + sigma2))
    return logdet, quad


def kron_solve(b: jnp.ndarray, k: jnp.ndarray, sigma2, y: jnp.ndarray) -> jnp.ndarray:
    """Solve ``(σ²I + B⊗K) x = y`` (task-major y) via the rotated Cholesky path."""
    m = b.shape[0]
    n = k.shape[0]
    w_b, v_b, chols = kron_chol_factors(b, k, sigma2)
    z = v_b.T @ y.reshape(m, n)
    sol = jax.vmap(jax.scipy.linalg.cho_solve, in_axes=((0, None), 0))((chols, True), z)
    return (v_b @ sol).reshape(-1)
