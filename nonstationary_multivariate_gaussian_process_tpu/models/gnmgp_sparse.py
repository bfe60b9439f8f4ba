"""Sparse (inducing-point) GNMGP — the large-N tier.

The exact GNMGP likelihood factorizes a dense (MN x MN) Gram
(``models/gnmgp.py``; reference ``Utility/logpos.py:299-380``), which caps a
single chip near the reference's own N=200 and caps the *parameter* vector at
N + N*T + 1 (the latent lengthscale and Cholesky-entry processes are
parametrized at every input).  This module removes both ceilings with one
TPU-friendly construction:

1. **Latent processes live at m inducing inputs Z** (m << N).  Their values at
   the data are the *prior conditional mean* (kriging) under the same RBF
   priors the exact model uses — a fixed (m, N) projection, precomputed once
   on the host in float64 (the smooth-RBF prior Gram is an f64 island, see
   ``predict/latent.krige_proj``) and applied as one matmul per evaluation.
   Parameter count drops from ``N(1+T)+1`` to ``m(1+T)+1``.

2. **The f-process gets a Nystrom approximation** over the same inducing set:
   ``Q = K_nm K_mm^{-1} K_mn`` with either the FITC diagonal correction
   (``approx="fitc"``: Lambda = diag(K - Q) + sigma^2) or the Titsias VFE
   evidence lower bound (``approx="vfe"``: Lambda = sigma^2 plus the
   ``-tr(K - Q)/(2 sigma^2)`` penalty, a true lower bound on the exact
   marginal likelihood at the same latent fields).  The likelihood is one
   Woodbury solve: O(N M (mM)^2) flops and O(N M * mM) memory — at N=2000,
   M=2, m=64 that is ~65 MFLOP per evaluation versus the exact path's
   ~(MN)^3/3 = 21 GFLOP factorization, and every contraction is a large
   static-shape matmul that XLA tiles straight onto the MXU.

Everything downstream is unchanged: the packed-vector convention means MAP
(Adam/L-BFGS), HMC/NUTS/SMC, and the artifact store consume the sparse
objective exactly like any other model's.  The reference has no counterpart
for any of this (its only scaling strategy is more MPI ranks, one subject
each); the construction follows Quinonero-Candela & Rasmussen (2005) and
Titsias (2009), re-derived for the task-major multivariate layout.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dists, settings
from ..ops import chol, kernels, transforms
from .base import FullData, task_major
from .gnmgp import DEFAULT_HYPERS


class SparseParams(NamedTuple):
    tilde_l_z: jnp.ndarray  # (m_z,) log lengthscale process at Z
    ul_vecs_z: jnp.ndarray  # (m_z*T,) unconstrained Cholesky vectors at Z
    tilde_sigma2_err: jnp.ndarray  # () log noise variance


def n_params(m_z: int, m: int) -> int:
    return m_z + m_z * transforms.tri_size(m) + 1


def unpack(vec: jnp.ndarray, m_z: int, m: int) -> SparseParams:
    """Packed layout ``[tilde_l_z(m_z), uL_vecs_z(m_z*T), tilde_sigma2_err]``
    — the exact model's layout (logpos.py:32-43) with N replaced by m_z."""
    from . import base

    t = transforms.tri_size(m)
    base.check_vec(vec, m_z + m_z * t + 1, "gnmgp_sparse",
                   f"[tilde_l_z({m_z}), uL_vecs_z({m_z}*{t}), tilde_sigma2_err] "
                   f"for m_z={m_z}, M={m}")
    return SparseParams(
        tilde_l_z=vec[:m_z],
        ul_vecs_z=vec[m_z : m_z + m_z * t],
        tilde_sigma2_err=vec[-1],
    )


def pack(p: SparseParams) -> jnp.ndarray:
    return jnp.concatenate(
        [p.tilde_l_z, p.ul_vecs_z, jnp.reshape(p.tilde_sigma2_err, (1,))]
    )


def choose_inducing(x, m_z: int) -> jnp.ndarray:
    """Evenly-spaced quantile subset of the (sorted) inputs as inducing inputs.

    Data-supported locations avoid kriging extrapolation; quantiles track the
    input density.  Host-side (concrete x only).
    """
    import numpy as np

    x64 = np.sort(np.asarray(x, np.float64))
    n = x64.shape[0]
    if not 2 <= m_z <= n:
        raise ValueError(f"choose_inducing: need 2 <= m_z <= N, got m_z={m_z}, N={n}")
    idx = np.unique(np.round(np.linspace(0, n - 1, m_z)).astype(int))
    z = np.unique(x64[idx])
    return jnp.asarray(z, settings.dtype)


class SparseOps(NamedTuple):
    """Loop-invariant pieces, hoisted once per objective (host-f64 islands)."""

    z: jnp.ndarray  # (m_z,) inducing inputs
    proj_l: jnp.ndarray  # (m_z, N) prior-conditional projection, tilde_l kernel
    proj_ul: jnp.ndarray  # (m_z, N) projection under the L-entry kernel
    pc_l_z: object  # TriInv of the tilde_l prior Gram at Z
    pc_ul_z: object  # TriInv of the L-entry prior Gram at Z


def make_ops(x, z, hyper: dict | None = None) -> SparseOps:
    """Precompute the kriging projections Z->X and the prior factors at Z."""
    from ..predict.latent import krige_proj

    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    proj_l, _ = krige_proj(z, x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    proj_ul, _ = krige_proj(z, x, hp["alpha_L"], hp["beta_L"])
    pc_l_z = chol.prior_rbf_inv(z, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    pc_ul_z = chol.prior_rbf_inv(z, hp["alpha_L"], hp["beta_L"])
    return SparseOps(jnp.asarray(z, settings.dtype), proj_l, proj_ul, pc_l_z, pc_ul_z)


def latents_at_data(p: SparseParams, ops: SparseOps, m: int, hyper=None):
    """Kriged latent fields at the data: ``(tilde_l_x (N,), ul_x (N, T))``.

    The prior conditional mean under the exact model's own latent priors —
    the deterministic interpolant the sparse likelihood (and its tests)
    evaluate the f-process covariance at.
    """
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops.z.shape[0]
    t = transforms.tri_size(m)
    tl_x = hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ ops.proj_l
    ul_mat_z = p.ul_vecs_z.reshape(m_z, t)  # (m_z, T)
    ul_x = (hp["mu_L"] + (ul_mat_z.T - hp["mu_L"]) @ ops.proj_ul).T  # (N, T)
    return tl_x, ul_x


def cross_gram(k_xz: jnp.ndarray, lx: jnp.ndarray, lz: jnp.ndarray) -> jnp.ndarray:
    """Task-major cross Gram ``K[(a,n),(c,j)] = K_x[n,j] * (Lx_n Lz_j^T)[a,c]``.

    Rows follow ``models.gnmgp.gram``'s task-major layout (row = a*N + n),
    columns the same over the inducing set (col = c*m_z + j).
    """
    n, m, _ = lx.shape
    m_z = lz.shape[0]
    b4 = jnp.einsum("nab,jcb->najc", lx, lz, precision=jax.lax.Precision.HIGHEST)
    k4 = jnp.einsum("nj,najc->ancj", k_xz, b4, precision=jax.lax.Precision.HIGHEST)
    return k4.reshape(n * m, m_z * m)


class _Woodbury(NamedTuple):
    """Shared FITC/VFE factor set (everything prediction needs too)."""

    c_mm: jnp.ndarray  # (mM, mM) chol(K_mm)
    a: jnp.ndarray  # (mM, NM) = C^{-1} K_mn Lambda^{-1/2}, masked cols zeroed
    c_in: jnp.ndarray  # (mM, mM) chol(I + A A^T)
    lam: jnp.ndarray  # (NM,) diagonal (1.0 at masked slots)
    d: jnp.ndarray  # (NM,) = y_task_major / sqrt(Lambda), masked zeroed
    corr: jnp.ndarray  # (NM,) clamp(K_diag - Q_diag, 0) — FITC/VFE correction
    mv: jnp.ndarray | None  # (NM,) mask in task-major layout (None = all real)


def _half_woodbury(k_mm, k_nm, k_diag, y_flat, sigma2_err, approx: str,
                   mv=None):
    """Everything up to (but not including) the inner factorization:
    ``(a, lam, d, corr, c_mm)`` from assembled cross pieces.

    ``k_nm`` rows / ``k_diag`` / ``y_flat`` / ``mv`` share one flat
    observation axis (task-major NM for the full layout, N for Hadamard).
    """
    if mv is not None:
        k_nm = k_nm * mv[:, None]
        y_flat = y_flat * mv

    # K_mm is a Gram of exact-model type: factor with the robust ladder
    # (forced — an inducing Gram over few, widely-correlated points is
    # ill-conditioned in f32 even when the global fast path disables
    # retries), plus a small relative ridge — near-singular L_z rows make
    # K_mm rank-deficient in a way the data cannot see through Q (standard
    # inducing practice).
    ridge = (1e-8 if k_mm.dtype == jnp.float64 else 1e-5) * jnp.mean(
        jnp.diagonal(k_mm)
    )
    # small-f64 fast path when gated (the measured latency sink of the
    # mixed sparse objective, ROADMAP "shave the f64 K_mm factor"):
    # loop-free recursive factor + explicit triangular inverse, so the
    # m-solve is ONE f64 GEMM on the MXU (ops/blocked.py,
    # benchmarks/kmm_probe.py)
    c_mm = chol.robust_cholesky_small(
        k_mm + ridge * jnp.eye(k_mm.shape[0], dtype=k_mm.dtype)
    )
    b = chol.tri_solve_small(c_mm, k_nm.T)  # (mM, NM)
    q_diag = jnp.sum(b * b, axis=0)
    corr = jnp.maximum(k_diag - q_diag, 0.0)

    if approx == "fitc":
        lam = corr + sigma2_err
    elif approx == "vfe":
        # broadcast handles both the scalar and the hetero per-slot noise
        lam = jnp.broadcast_to(
            jnp.asarray(sigma2_err, q_diag.dtype), q_diag.shape
        )
    else:
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    if mv is not None:
        lam = jnp.where(mv > 0, lam, 1.0)

    rsqrt_lam = jax.lax.rsqrt(lam)
    a = b * rsqrt_lam[None, :]
    d = y_flat * rsqrt_lam
    return a, lam, d, corr, c_mm


def _woodbury_core(k_mm, k_nm, k_diag, y_flat, sigma2_err, approx: str,
                   mv=None) -> _Woodbury:
    """Layout-agnostic Woodbury factor set (see :func:`_half_woodbury`)."""
    a, lam, d, corr, c_mm = _half_woodbury(k_mm, k_nm, k_diag, y_flat,
                                           sigma2_err, approx, mv)
    inner = jnp.eye(a.shape[0], dtype=a.dtype) + a @ a.T
    c_in = chol.safe_cholesky(inner)
    return _Woodbury(c_mm, a, c_in, lam, d, corr, mv)


def _assemble_full(p: SparseParams, data: FullData, ops: SparseOps, m: int,
                   hyper=None, mask=None):
    """Cross pieces ``(k_mm, k_nm, k_diag, y_flat, mv)`` for the full layout."""
    m_z = ops.z.shape[0]
    tl_x, ul_x = latents_at_data(p, ops, m, hyper)
    lx = transforms.vec_to_tril(transforms.ulvec_to_lvec(ul_x, m), m)  # (N,M,M)
    lz = transforms.vec_to_tril(
        transforms.ulvec_to_lvec(p.ul_vecs_z.reshape(m_z, -1), m), m
    )  # (m_z, M, M)
    ell_x = jnp.exp(tl_x)
    ell_z = jnp.exp(p.tilde_l_z)

    from .gnmgp import gram

    k_zz = kernels.nonstationary_rbf_cov(ops.z, ell1=ell_z)  # self: + jitter I
    k_mm = gram(k_zz, lz)  # (mM, mM)
    k_xz = kernels.nonstationary_rbf_cov(data.x, ell1=ell_x, x2=ops.z, ell2=ell_z)
    k_nm = cross_gram(k_xz, lx, lz)  # (NM, mM)
    # Gibbs self-cov is 1 (+ jitter) so diag K[(a,n)] = (1+j) * ||Lx_n[a,:]||^2
    k_diag = ((1.0 + settings.jitter) * jnp.sum(lx * lx, axis=-1)).T.reshape(-1)

    mv = None
    if mask is not None:
        mv = jnp.tile(jnp.asarray(mask, data.y.dtype), m)  # task-major (NM,)
    return k_mm, k_nm, k_diag, task_major(data.y), mv


def _woodbury(p: SparseParams, data: FullData, ops: SparseOps, m: int,
              approx: str, hyper=None, mask=None) -> _Woodbury:
    k_mm, k_nm, k_diag, y_flat, mv = _assemble_full(p, data, ops, m, hyper, mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y_flat,
                          jnp.exp(p.tilde_sigma2_err), approx, mv)


def _loglik_from_woodbury(w: _Woodbury, sigma2_err, approx: str) -> jnp.ndarray:
    u = w.a @ w.d
    sol = chol.tri_solve(w.c_in, u)
    quad = jnp.sum(w.d * w.d) - jnp.sum(sol * sol)
    logdet = jnp.sum(jnp.log(w.lam)) + chol.chol_logdet(w.c_in)
    res = -0.5 * logdet - 0.5 * quad
    if approx == "vfe":
        corr = w.corr if w.mv is None else w.corr * w.mv
        res = res - 0.5 * jnp.sum(corr) / sigma2_err
    return res


def _loglik_mixed_inner(k_mm, k_nm, k_diag, y_flat, noise, approx: str,
                        mv=None) -> jnp.ndarray:
    """f64-accurate sparse log-likelihood with the inner system served by
    the mixed-precision kernel (NMGP_PRECISION=mixed, ``ops/mixed.py``).

    What routes through f32-preconditioned corrections and what stays f64
    is dictated by *measured* conditioning, not symmetry:

    * ``K_mm`` (inducing Gram, no noise floor) keeps the f64 robust factor —
      at generic (HMC-visited) hyperparameters cond(K_mm) ~ 1e8 and Jacobi
      scaling barely moves it (measured 3.7e8 → 1.1e8 at N=2000/m=64), so
      every eps32-preconditioned scheme diverges (contraction eps32·cond ≈
      24); the collapsed alternative ``K_mm + K_mn Λ^{-1} K_nm`` is worse
      still (measured cond 2.7e13).  The matrix is only (mM x mM) — the f64
      factor is a latency cost, not a FLOP cost.
    * the inner matrix ``I + A Aᵀ`` has eigenvalues in [1, 1+||A||²]
      (measured cond 7.4e4 in the same configuration) — squarely inside the
      mixed kernel's range, so its logdet and quadratic form come from
      ``mixed_logdet_quad`` at ~1e-9 accuracy with all O((mM)³) work in f32.

    ``noise`` broadcasts: scalar for the homoscedastic models, per-slot for
    the hetero tier (whose VFE penalty is pointwise).
    """
    from ..ops import mixed

    a, lam, d, corr, _ = _half_woodbury(k_mm, k_nm, k_diag, y_flat, noise,
                                        approx, mv)
    inner = jnp.eye(a.shape[0], dtype=a.dtype) + a @ a.T
    u = a @ d
    ld_in, quad_in = mixed.mixed_logdet_quad(inner, u)
    logdet = jnp.sum(jnp.log(lam)) + ld_in
    quad = jnp.sum(d * d) - quad_in
    res = -0.5 * logdet - 0.5 * quad
    if approx == "vfe":
        c = corr if mv is None else corr * mv
        res = res - 0.5 * jnp.sum(c / noise)
    return res


def _loglik_pieces(pieces, noise, approx: str) -> jnp.ndarray:
    """Dispatch assembled cross pieces to the factor path or, under
    NMGP_PRECISION=mixed with f64 inputs, the mixed-inner kernel."""
    k_mm, k_nm, k_diag, y_flat, mv = pieces
    if settings.mixed_solves and k_mm.dtype == jnp.float64:
        return _loglik_mixed_inner(k_mm, k_nm, k_diag, y_flat, noise,
                                   approx, mv)
    w = _woodbury_core(k_mm, k_nm, k_diag, y_flat, noise, approx, mv)
    if approx == "vfe" and jnp.ndim(noise) > 0:
        # per-slot noise: the Titsias penalty is pointwise (hetero tier)
        res = _loglik_from_woodbury(w, 1.0, approx="fitc")
        c = w.corr if w.mv is None else w.corr * w.mv
        return res - 0.5 * jnp.sum(c / noise)
    return _loglik_from_woodbury(w, noise, approx)


def _inner_logdet_quad(inner, u):
    """``(logdet, uᵀ inner⁻¹ u)`` of the Woodbury inner system, dispatched
    by precision: the mixed kernel under NMGP_PRECISION=mixed (the
    ``_loglik_mixed_inner`` tail — eigenvalues in [1, 1+||A||²], squarely
    inside its range), else the robust factor via the measured-best small
    kernel (``chol.robust_cholesky_small``)."""
    if settings.mixed_solves and inner.dtype == jnp.float64:
        from ..ops import mixed

        return mixed.mixed_logdet_quad(inner, u)
    c_in = chol.robust_cholesky_small(inner)
    sol = chol.tri_solve_small(c_in, u)
    return chol.chol_logdet(c_in), jnp.sum(sol * sol)


_HI = jax.lax.Precision.HIGHEST


def _loglik_separable(b_f, k_zz, k_xz, k_x_diag, y_nm, noise, approx: str,
                      mask=None) -> jnp.ndarray:
    """Kronecker-factored sparse likelihood for the separable tier.

    Mathematically identical to assembling ``K_mm = B_f ⊗ K_zz`` /
    ``K_nm = B_f ⊗ K_xz`` and dispatching through :func:`_loglik_pieces`,
    but the Kronecker products are never materialized — the same structure
    the reference itself exploits on the exact model
    (``/root/reference/Utility/distributions.py:26-52``):

    * ``chol(B ⊗ K) = chol(B) ⊗ chol(K)`` — the f64 factor drops from
      (m_z·M)³ (and its ~64 us/column TPU latency) to M³ + m_z³, both
      served by the loop-free recursive kernel off-CPU,
    * the m-solve ``C⁻¹ K_mn`` stays factored:
      ``B_b = L_b⁻¹ B_f`` (M×M) and ``B_k = L_k⁻¹ K_xzᵀ`` (m_z×N), so
      ``Q``'s diagonal is the rank-1 product of their column norms,
    * the inner Gram ``I + A Aᵀ`` assembles from M small (m_z×N×m_z)
      GEMMs — M× fewer FLOPs than the dense ``A Aᵀ`` — grouped per task:
      ``inner = Σ_a (B_b[:,a] B_b[:,a]ᵀ) ⊗ (B_k diag(w_a) B_kᵀ) + I``.

    The per-factor ridges replace the dense path's single ridge on the
    assembled ``K_mm`` (same 1e-8-relative magnitude; loglik differences
    are at the regularization scale, far below the 1e-6 parity bar).
    ``y_nm`` is the (N, M) observation matrix; ``mask`` (N,) excludes
    padded rows exactly (zero weight, unit lambda).
    """
    m = b_f.shape[0]
    m_z = k_zz.shape[0]
    dtype = k_zz.dtype
    rel = 1e-8 if dtype == jnp.float64 else 1e-5
    lb = chol.robust_cholesky_small(
        b_f + rel * jnp.mean(jnp.diag(b_f)) * jnp.eye(m, dtype=dtype)
    )
    lk = chol.robust_cholesky_small(
        k_zz + rel * jnp.mean(jnp.diag(k_zz)) * jnp.eye(m_z, dtype=dtype)
    )
    bb = chol.tri_solve_small(lb, b_f)  # (M, M)
    bk = chol.tri_solve_small(lk, k_xz.T)  # (m_z, N)

    y_mn = y_nm.T  # task-major rows (M, N)
    qb = jnp.sum(bb * bb, axis=0)  # (M,)
    qk = jnp.sum(bk * bk, axis=0)  # (N,)
    corr = jnp.maximum(
        jnp.diag(b_f)[:, None] * k_x_diag[None, :]
        - qb[:, None] * qk[None, :], 0.0,
    )
    if approx == "fitc":
        lam = corr + noise
    elif approx == "vfe":
        lam = jnp.broadcast_to(jnp.asarray(noise, dtype), corr.shape)
    else:
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    mv = None if mask is None else jnp.asarray(mask, dtype)  # (N,)
    if mv is not None:
        lam = jnp.where(mv[None, :] > 0, lam, 1.0)
        y_mn = y_mn * mv[None, :]
    w = 1.0 / lam if mv is None else mv[None, :] / lam  # (M, N)

    dd = jnp.sum(y_mn * y_mn / lam)
    t_u = jnp.matmul(bk, (y_mn / lam).T, precision=_HI)  # (m_z, M)
    u = jnp.einsum("ca,ja->cj", bb, t_u, precision=_HI).reshape(-1)
    g = jnp.einsum("jn,an,kn->ajk", bk, w, bk, precision=_HI)
    inner = jnp.einsum("ca,da,ajk->cjdk", bb, bb, g,
                       precision=_HI).reshape(m * m_z, m * m_z)
    inner = inner + jnp.eye(m * m_z, dtype=dtype)
    ld_in, quad_in = _inner_logdet_quad(inner, u)
    res = -0.5 * (jnp.sum(jnp.log(lam)) + ld_in) - 0.5 * (dd - quad_in)
    if approx == "vfe":
        c = corr if mv is None else corr * mv[None, :]
        res = res - 0.5 * jnp.sum(c) / noise
    return res


def _loglik_separable_hadamard(b_f, k_zz, k_xz, indx, k_diag, y, noise,
                               approx: str, mask=None) -> jnp.ndarray:
    """Hadamard-layout counterpart of :func:`_loglik_separable`.

    Each observation row selects its task, so the solved cross factor is a
    Khatri-Rao column product ``b[:,i] = B_b[:,indx_i] ⊗ B_k[:,i]`` — the
    inner Gram still assembles per task via a one-hot weight split.
    """
    m = b_f.shape[0]
    m_z = k_zz.shape[0]
    dtype = k_zz.dtype
    rel = 1e-8 if dtype == jnp.float64 else 1e-5
    lb = chol.robust_cholesky_small(
        b_f + rel * jnp.mean(jnp.diag(b_f)) * jnp.eye(m, dtype=dtype)
    )
    lk = chol.robust_cholesky_small(
        k_zz + rel * jnp.mean(jnp.diag(k_zz)) * jnp.eye(m_z, dtype=dtype)
    )
    bb = chol.tri_solve_small(lb, b_f)  # (M, M)
    bk = chol.tri_solve_small(lk, k_xz.T)  # (m_z, N)

    ix = jnp.asarray(indx, jnp.int32)
    qb = jnp.sum(bb * bb, axis=0)  # (M,)
    qk = jnp.sum(bk * bk, axis=0)  # (N,)
    corr = jnp.maximum(k_diag - qb[ix] * qk, 0.0)
    if approx == "fitc":
        lam = corr + noise
    elif approx == "vfe":
        lam = jnp.broadcast_to(jnp.asarray(noise, dtype), corr.shape)
    else:
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    mv = None if mask is None else jnp.asarray(mask, dtype)
    if mv is not None:
        lam = jnp.where(mv > 0, lam, 1.0)
        y = y * mv
    w = 1.0 / lam if mv is None else mv / lam  # (N,)

    dd = jnp.sum(y * y / lam)
    bb_g = bb[:, ix]  # (M, N) per-observation task columns
    u = jnp.einsum("ci,ji->cj", bb_g, bk * (y / lam)[None, :],
                   precision=_HI).reshape(-1)
    onehot = (ix[None, :] == jnp.arange(m)[:, None]).astype(dtype)  # (M, N)
    g = jnp.einsum("jn,an,kn->ajk", bk, onehot * w[None, :], bk,
                   precision=_HI)
    inner = jnp.einsum("ca,da,ajk->cjdk", bb, bb, g,
                       precision=_HI).reshape(m * m_z, m * m_z)
    inner = inner + jnp.eye(m * m_z, dtype=dtype)
    ld_in, quad_in = _inner_logdet_quad(inner, u)
    res = -0.5 * (jnp.sum(jnp.log(lam)) + ld_in) - 0.5 * (dd - quad_in)
    if approx == "vfe":
        c = corr if mv is None else corr * mv
        res = res - 0.5 * jnp.sum(c) / noise
    return res


def log_lik(p: SparseParams, data: FullData, ops: SparseOps,
            approx: str = "fitc", hyper=None, mask=None) -> jnp.ndarray:
    """Sparse marginal log-likelihood (unnormalized, reference convention).

    ``approx="fitc"``: log N(y; 0, Q + diag(K-Q) + sigma^2 I).
    ``approx="vfe"``:  log N(y; 0, Q + sigma^2 I) - tr(K-Q)/(2 sigma^2)
    — Titsias' collapsed bound, ``<=`` the exact GNMGP log-likelihood at the
    same latent fields (Q is a Nystrom compression, K - Q is PSD).
    ``mask`` (N,) excludes padded observations exactly (rows of K_nm zeroed,
    unit Lambda, zero observation — nothing reaches logdet or the quadratic).
    Under ``NMGP_PRECISION=mixed`` the evaluation routes through the
    collapsed mixed-precision kernel (:func:`_loglik_collapsed_mixed`).
    """
    pieces = _assemble_full(p, data, ops, data.y.shape[1], hyper, mask)
    return _loglik_pieces(pieces, jnp.exp(p.tilde_sigma2_err), approx)


def log_posterior(p: SparseParams, data: FullData, ops: SparseOps,
                  approx: str = "fitc", hyper=None, prior: bool = True,
                  mask=None):
    """Sparse log-posterior: the exact model's priors, over the Z-latents.

    GP priors (RBF at Z, same hypers as the exact model's at X), the
    inverse-gamma noise prior and its exp-transform Jacobian — mirrors
    ``logpos_SVC`` (logpos.py:326-380) with the latent fields at Z.
    """
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops.z.shape[0]
    m = data.y.shape[1]
    t = transforms.tri_size(m)
    loglik = log_lik(p, data, ops, approx=approx, hyper=hp, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)

    lp_l = dists.mvn_logpdf_chol(p.tilde_l_z, hp["mu_tilde_l"], ops.pc_l_z)
    ul_mat = p.ul_vecs_z.reshape(m_z, t)
    lp_uL = jnp.sum(
        jax.vmap(lambda col: dists.mvn_logpdf_chol(col, hp["mu_L"], ops.pc_ul_z))(
            ul_mat.T
        )
    )
    lp_s2 = dists.inverse_gamma_logpdf(sigma2_err, alpha=hp["a"], beta=hp["b"])

    res = loglik
    if prior:
        res = res + lp_l + lp_uL + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_uL_vecs": lp_uL,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


def make_objective(data: FullData, z=None, n_inducing: int = 64,
                   hyper: dict | None = None, approx: str = "fitc",
                   prior: bool = True, mask=None):
    """Jit-friendly sparse negative-log-posterior closure.

    Returns ``(nlp, ops)``: the objective over the packed
    ``m_z(1+T)+1`` vector, and the hoisted :class:`SparseOps` (needed again
    by prediction).  ``z`` defaults to ``choose_inducing(x, n_inducing)``.
    """
    from . import base

    base.check_full_data(data, "gnmgp_sparse")
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    if z is None:
        x_real = data.x if mask is None else data.x[: int(jnp.sum(mask))]
        z = choose_inducing(x_real, min(n_inducing, x_real.shape[0]))
    ops = make_ops(data.x, z, hp)
    m_z = ops.z.shape[0]
    m = data.y.shape[1]

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, m_z, m)
        res, _ = log_posterior(p, data, ops, approx=approx, hyper=hp,
                               prior=prior, mask=mask)
        return -res

    return nlp, ops


def make_ops_traced(x, z, hyper: dict | None = None) -> SparseOps:
    """Differentiable-in-Z :class:`SparseOps` for inducing refinement.

    :func:`make_ops` hoists host-f64 islands (projections, prior factors)
    that break the gradient path through Z; this builds the same pieces
    in-graph with the robust traced factorization, so
    ``jax.grad(objective)(z)`` flows through the kriging projections
    K_zz^{-1} K_zx, the f-process cross-Gram, AND the latent priors at Z.
    The prior factors come back as plain Cholesky factors (not ``TriInv``);
    ``dists.mvn_logpdf_chol`` accepts either.  Use only inside
    :func:`refine_inducing`'s Z-steps — rebuild with :func:`make_ops` at
    the refined Z for everything downstream.
    """
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    x = jnp.asarray(x, settings.dtype)
    z = jnp.asarray(z, settings.dtype)

    def pieces(alpha, beta):
        sigma = kernels.rbf_cov(z, alpha=alpha, beta=beta)
        k_cross = kernels.rbf_cov(z, x, alpha=alpha, beta=beta)
        c = chol.safe_cholesky(sigma, force_robust=True)
        return chol.chol_solve(c, k_cross), c

    proj_l, c_l = pieces(hp["alpha_tilde_l"], hp["beta_tilde_l"])
    proj_ul, c_ul = pieces(hp["alpha_L"], hp["beta_L"])
    return SparseOps(z, proj_l, proj_ul, c_l, c_ul)


def make_ops_traced_hetero(x, z, hyper: dict | None = None) -> SparseHeteroOps:
    """Differentiable-in-Z :class:`SparseHeteroOps` (see
    :func:`make_ops_traced`): the base pieces plus the noise GP's kriging
    projection and prior factor, all built in-graph so ``jax.grad`` flows
    through Z."""
    hp = {**HETERO_DEFAULT_HYPERS, **(hyper or {})}
    base_t = make_ops_traced(x, z, hp)
    x = jnp.asarray(x, settings.dtype)
    z = jnp.asarray(z, settings.dtype)
    sigma = kernels.rbf_cov(z, alpha=hp["alpha_err"], beta=hp["beta_err"])
    k_cross = kernels.rbf_cov(z, x, alpha=hp["alpha_err"], beta=hp["beta_err"])
    c = chol.safe_cholesky(sigma, force_robust=True)
    return SparseHeteroOps(base_t, chol.chol_solve(c, k_cross), c)


def _refine_builders(model: str, hadamard: bool):
    """Per-model pieces for :func:`refine_inducing`:
    ``(default_hypers, traced_ops(x, z, hp), unpack(vec, m_z, m),
    logpost(p, data, ops, m, ...), objective(data, m, z, ...))``.

    Every sparse model is differentiable in Z — the GNMGP family through
    its traced kriging projections, the separable family through its
    (kernel-only) cross pieces, the stationary LMC directly (its ops ARE
    just Z).
    """
    if model == "gnmgp_sparse":
        return (
            HADAMARD_DEFAULT_HYPERS if hadamard else DEFAULT_HYPERS,
            make_ops_traced,
            unpack,
            ((lambda p, d, o, m, **kw: log_posterior_hadamard(p, d, o, m, **kw))
             if hadamard else
             (lambda p, d, o, m, **kw: log_posterior(p, d, o, **kw))),
            ((lambda d, m, **kw: make_objective_hadamard(d, m, **kw))
             if hadamard else
             (lambda d, m, **kw: make_objective(d, **kw))),
        )
    if model == "gnmgp_hetero_sparse":
        if hadamard:
            raise ValueError("gnmgp_hetero_sparse has no Hadamard objective")
        return (
            HETERO_DEFAULT_HYPERS,
            make_ops_traced_hetero,
            unpack_hetero,
            lambda p, d, o, m, **kw: log_posterior_hetero(p, d, o, **kw),
            lambda d, m, **kw: make_objective_hetero(d, **kw),
        )
    if model == "snmgp_sparse":
        from . import snmgp_sparse as ssp
        from .snmgp import DEFAULT_HYPERS as SNMGP_HYPERS

        return (
            SNMGP_HYPERS,
            ssp.make_ops_traced,
            ssp.unpack,
            ((lambda p, d, o, m, **kw: ssp.log_posterior_hadamard(p, d, o, m, **kw))
             if hadamard else
             (lambda p, d, o, m, **kw: ssp.log_posterior(p, d, o, **kw))),
            ((lambda d, m, **kw: ssp.make_objective_hadamard(d, m, **kw))
             if hadamard else
             (lambda d, m, **kw: ssp.make_objective(d, **kw))),
        )
    if model == "lmc_sparse":
        from . import lmc_sparse as lsp
        from .lmc import DEFAULT_HYPERS as LMC_HYPERS

        return (
            LMC_HYPERS,
            # the stationary tier's ops ARE the inducing set — directly traced
            lambda x, z, hp: lsp.SparseOps(jnp.asarray(z, settings.dtype)),
            lambda vec, m_z, m: lsp.unpack(vec, m),
            ((lambda p, d, o, m, **kw: lsp.log_posterior_hadamard(p, d, o, m, **kw))
             if hadamard else
             (lambda p, d, o, m, **kw: lsp.log_posterior(p, d, o, **kw))),
            ((lambda d, m, **kw: lsp.make_objective_hadamard(d, m, **kw))
             if hadamard else
             (lambda d, m, **kw: lsp.make_objective(d, **kw))),
        )
    raise ValueError(f"unknown sparse model {model!r}")


def refine_inducing(data: FullData, z0, vec0, n_rounds: int = 2,
                    z_iters: int = 40, vec_iters: int = 200,
                    lr_z: float = 5e-3, lr_vec: float = 2e-1,
                    hyper: dict | None = None, approx: str = "fitc",
                    prior: bool = True, mask=None, method: str = "adam",
                    hypers_base: dict | None = None, m: int | None = None,
                    model: str = "gnmgp_sparse"):
    """Alternating inducing-input refinement: move Z down the objective.

    The FITC/VFE objective is differentiable in Z (kriging projections and
    prior factors at Z are closed-form in Z — :func:`make_ops_traced` and
    per-model analogs via :func:`_refine_builders`), so at small m the
    fidelity lost to a fixed quantile grid can be bought back by *moving*
    the inducing inputs instead of growing them (the measured m=32 underfit
    at N=200, ROADMAP "Inducing-point refinement").  Alternates (a)
    ``z_iters`` Adam steps on Z at fixed latents, Z clamped to the data
    range, and (b) a fresh MAP refit of the latents at the re-sorted Z
    through the standard host-f64 ops.  Returns ``(z, vec, ops, final_nlp)``
    with ``ops`` rebuilt at the refined Z.

    ``model`` picks the sparse family (``gnmgp_sparse`` /
    ``gnmgp_hetero_sparse`` / ``snmgp_sparse`` / ``lmc_sparse``);
    ``hypers_base`` overrides its default-hyper table; the layout is taken
    from ``data``'s type — :class:`FullData` → full, 3-tuple (Hadamard,
    which must pass ``m`` explicitly) → Hadamard.
    """
    import numpy as np
    import optax

    from ..inference import map as map_mod

    hadamard = not isinstance(data, FullData) and len(data) == 3
    base_default, traced_ops, unpack_fn, logpost_fn, objective_fn = (
        _refine_builders(model, hadamard))
    base_hp = hypers_base if hypers_base is not None else base_default
    hp = {**base_hp, **(hyper or {})}
    x = jnp.asarray(data[0] if hadamard else data.x, settings.dtype)
    if hadamard:
        if m is None:
            raise ValueError("refine_inducing on Hadamard data needs the "
                             "task count m")
        m = int(m)
    else:
        m = int(data.y.shape[1])
    lo, hi = float(jnp.min(x)), float(jnp.max(x))
    z = jnp.asarray(z0, settings.dtype)
    vec = jnp.asarray(vec0, settings.dtype)
    m_z = int(z.shape[0])

    def nlp_z(z_, vec_):
        ops_t = traced_ops(x, z_, hp)
        p = unpack_fn(vec_, m_z, m)
        res, _ = logpost_fn(p, data, ops_t, m, approx=approx, hyper=hp,
                            prior=prior, mask=mask)
        return -res

    opt_z = optax.adam(lr_z)

    @jax.jit
    def z_descent(z_, vec_):
        def body(carry, _):
            zc, state = carry
            val, g = jax.value_and_grad(nlp_z)(zc, vec_)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            upd, state = opt_z.update(g, state)
            zc = jnp.clip(zc + upd, lo, hi)
            return (zc, state), val
        (z_new, _), vals = jax.lax.scan(
            body, (z_, opt_z.init(z_)), None, length=z_iters)
        return z_new, vals

    final_nlp = None
    ops = None
    for _ in range(max(1, int(n_rounds))):
        z_new, _ = z_descent(z, vec)
        # re-sort and de-collide: the kriging Gram at Z degenerates when two
        # inducing inputs coincide
        z_np = np.sort(np.asarray(z_new, np.float64))
        min_gap = 1e-6 * max(hi - lo, 1e-12)
        for i in range(1, m_z):
            if z_np[i] - z_np[i - 1] < min_gap:
                z_np[i] = z_np[i - 1] + min_gap
        z = jnp.asarray(np.clip(z_np, lo, hi + m_z * min_gap), settings.dtype)
        nlp, ops = objective_fn(data, m, z=z, hyper=hyper, approx=approx,
                                prior=prior, mask=mask)
        res = map_mod.fit_map(nlp, vec, n_iters=vec_iters, lr=lr_vec,
                              method=method)
        vec, final_nlp = res.vec, float(nlp(res.vec))
    return z, vec, ops, final_nlp


def init_from_empirical(emp_vec, n: int, m_z: int, m: int, x, z) -> jnp.ndarray:
    """Subsample an exact-model empirical init (N-layout) onto the Z-layout.

    Each inducing slot takes the latent values of its nearest data input —
    the same initialization quality the exact tier gets from
    ``inference/empirical.py``, restated at m_z points.
    """
    import numpy as np

    from . import gnmgp as dense

    p = dense.unpack(jnp.asarray(emp_vec), n, m)
    x64 = np.asarray(x, np.float64)
    z64 = np.asarray(z, np.float64)
    nearest = np.argmin(np.abs(x64[None, :] - z64[:, None]), axis=1)  # (m_z,)
    t = transforms.tri_size(m)
    tl_z = jnp.asarray(np.asarray(p.tilde_l)[nearest], settings.dtype)
    ul_z = jnp.asarray(
        np.asarray(p.ul_vecs.reshape(n, t))[nearest].reshape(-1), settings.dtype
    )
    return jnp.concatenate(
        [tl_z, ul_z, jnp.reshape(jnp.asarray(p.tilde_sigma2_err, settings.dtype), (1,))]
    )


# ---------------------------------------------------------------------------
# Hadamard variant: one observation per (input, task) pair.
# ---------------------------------------------------------------------------

#: Hadamard hyper defaults mirror the exact Hadamard SVC's (logpos.py:566-585).
HADAMARD_DEFAULT_HYPERS = {
    "mu_tilde_l": 0.0, "alpha_tilde_l": 1.0, "beta_tilde_l": 1.0,
    "mu_L": 0.0, "alpha_L": 1.0, "beta_L": 1.0, "a": 1.0, "b": 1.0,
}


def make_ops_hadamard(x, z, hyper: dict | None = None) -> SparseOps:
    """:func:`make_ops` under the Hadamard hyper defaults."""
    return make_ops(x, z, {**HADAMARD_DEFAULT_HYPERS, **(hyper or {})})


def _assemble_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                       hyper=None, mask=None):
    """Hadamard-layout cross pieces ``(k_mm, k_nm, k_diag, y, mv)``.

    Reference Hadamard-SVC conventions apply (``models.gnmgp.
    log_posterior_hadamard``): the per-input Cholesky vectors are used
    *raw* (no exp transform on the diagonal slots), so ``p.ul_vecs_z``
    holds plain L_vecs at Z and the kriged field is used as-is.
    """
    hp = {**HADAMARD_DEFAULT_HYPERS, **(hyper or {})}
    x, indx, y = data
    n = y.shape[0]
    m_z = ops.z.shape[0]
    t = transforms.tri_size(m)
    tl_x, l_x = latents_at_data(p, ops, m, hp)  # raw L_vecs kriged
    lx = transforms.vec_to_tril(l_x, m)  # (N, M, M)
    lz = transforms.vec_to_tril(p.ul_vecs_z.reshape(m_z, t), m)  # (m_z, M, M)
    rows = lx[jnp.arange(n), indx, :]  # (N, M) observed task rows
    ell_x = jnp.exp(tl_x)
    ell_z = jnp.exp(p.tilde_l_z)

    from .gnmgp import gram

    k_zz = kernels.nonstationary_rbf_cov(ops.z, ell1=ell_z)
    k_mm = gram(k_zz, lz)  # (m_z*M, m_z*M), cols (c, j) c-major
    k_xz = kernels.nonstationary_rbf_cov(x, ell1=ell_x, x2=ops.z, ell2=ell_z)
    b3 = jnp.einsum("ib,jcb->icj", rows, lz,
                    precision=jax.lax.Precision.HIGHEST)  # (N, M, m_z)
    k_nm = (k_xz[:, None, :] * b3).reshape(n, m * m_z)  # cols match k_mm
    k_diag = (1.0 + settings.jitter) * jnp.sum(rows * rows, axis=-1)

    mv = None if mask is None else jnp.asarray(mask, y.dtype)
    return k_mm, k_nm, k_diag, y, mv


def _woodbury_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                       approx: str, hyper=None, mask=None) -> _Woodbury:
    """Hadamard-layout Woodbury factors (see :func:`_assemble_hadamard`)."""
    k_mm, k_nm, k_diag, y, mv = _assemble_hadamard(p, data, ops, m, hyper, mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y,
                          jnp.exp(p.tilde_sigma2_err), approx, mv)


def log_lik_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                     approx: str = "fitc", hyper=None, mask=None) -> jnp.ndarray:
    """Sparse Hadamard marginal log-likelihood (see :func:`log_lik`)."""
    pieces = _assemble_hadamard(p, data, ops, m, hyper, mask)
    return _loglik_pieces(pieces, jnp.exp(p.tilde_sigma2_err), approx)


def log_posterior_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                           approx: str = "fitc", hyper=None,
                           prior: bool = True, mask=None):
    """Sparse Hadamard log-posterior — the exact Hadamard SVC's priors over
    the Z-latents (raw-L_vec GP priors, unnormalized inverse-gamma + the
    exp-transform Jacobian; ``models.gnmgp.log_posterior_hadamard``)."""
    hp = {**HADAMARD_DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops.z.shape[0]
    t = transforms.tri_size(m)
    loglik = log_lik_hadamard(p, data, ops, m, approx=approx, hyper=hp,
                              mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    lp_l = dists.mvn_logpdf_chol(p.tilde_l_z, hp["mu_tilde_l"], ops.pc_l_z)
    l_mat = p.ul_vecs_z.reshape(m_z, t)
    lp_L = jnp.sum(
        jax.vmap(lambda col: dists.mvn_logpdf_chol(col, hp["mu_L"], ops.pc_ul_z))(
            l_mat.T
        )
    )
    lp_s2 = dists.inverse_gamma_logpdf_u(sigma2_err, alpha=hp["a"], beta=hp["b"])
    res = loglik
    if prior:
        res = res + lp_l + lp_L + lp_s2 + p.tilde_sigma2_err
    comps = {"loglik": loglik, "log_prior_tilde_l": lp_l,
             "log_prior_L_vecs": lp_L, "log_prior_sigma2_err": lp_s2}
    return res, comps


def make_objective_hadamard(data, m: int, z=None, n_inducing: int = 64,
                            hyper: dict | None = None, approx: str = "fitc",
                            prior: bool = True, mask=None):
    """Jit-friendly sparse Hadamard negative-log-posterior closure.

    Returns ``(nlp, ops)`` like :func:`make_objective`.  ``data`` is a
    :class:`..models.base.HadamardData`; ``m`` the task count.
    """
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    hp = {**HADAMARD_DEFAULT_HYPERS, **(hyper or {})}
    if z is None:
        import numpy as _np

        x_real = (data.x if mask is None
                  else data.x[: int(_np.asarray(mask).sum())])
        z = choose_inducing(x_real, min(n_inducing, x_real.shape[0]))
    ops = make_ops(data.x, z, hp)
    m_z = ops.z.shape[0]

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, m_z, m)
        res, _ = log_posterior_hadamard(p, data, ops, m, approx=approx,
                                        hyper=hp, prior=prior, mask=mask)
        return -res

    return nlp, ops


# ---------------------------------------------------------------------------
# Heteroscedastic variant: per-(input, task) noise GP, also at Z.
# ---------------------------------------------------------------------------

#: Hetero hyper defaults mirror models/gnmgp_hetero.py (noise GP replaces IG).
HETERO_DEFAULT_HYPERS = {
    k: v for k, v in DEFAULT_HYPERS.items() if k not in ("a", "b")
}
HETERO_DEFAULT_HYPERS.update({"mu_err": 0.0, "alpha_err": 1.0, "beta_err": 1.0})


class SparseHeteroOps(NamedTuple):
    """Sparse ops + the noise process's kriging projection / prior factor."""

    base: SparseOps
    proj_err: jnp.ndarray  # (m_z, N)
    pc_err_z: object  # TriInv of the noise-GP prior Gram at Z


def n_params_hetero(m_z: int, m: int) -> int:
    return m_z + m_z * transforms.tri_size(m) + m_z * m


def unpack_hetero(vec: jnp.ndarray, m_z: int, m: int):
    """Layout ``[tilde_l_z(m_z), uL_vecs_z(m_z*T), tilde_sigma2_err_z(m_z*M
    task-major)]`` — models/gnmgp_hetero.py's layout with N -> m_z."""
    from . import base as base_mod
    from .gnmgp_hetero import Params as HeteroParams

    t = transforms.tri_size(m)
    base_mod.check_vec(vec, m_z + m_z * t + m_z * m, "gnmgp_hetero_sparse",
                       f"[tilde_l_z({m_z}), uL_vecs_z({m_z}*{t}), "
                       f"tilde_sigma2_err_z({m_z}*{m})] for m_z={m_z}, M={m}")
    return HeteroParams(
        tilde_l=vec[:m_z],
        ul_vecs=vec[m_z : m_z + m_z * t],
        tilde_sigma2_err=vec[m_z + m_z * t :],
    )


def make_ops_hetero(x, z, hyper: dict | None = None) -> SparseHeteroOps:
    from ..predict.latent import krige_proj

    hp = {**HETERO_DEFAULT_HYPERS, **(hyper or {})}
    base_ops = make_ops(x, z, hp)
    proj_err, _ = krige_proj(z, x, hp["alpha_err"], hp["beta_err"])
    pc_err_z = chol.prior_rbf_inv(z, hp["alpha_err"], hp["beta_err"])
    return SparseHeteroOps(base_ops, proj_err, pc_err_z)


def noise_at_data(p, ops_h: SparseHeteroOps, m: int, hyper=None) -> jnp.ndarray:
    """Kriged task-major (N*M,) log-noise field at the data inputs."""
    hp = {**HETERO_DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops_h.base.z.shape[0]
    err_mat_z = p.tilde_sigma2_err.reshape(m, m_z)  # task-major rows
    return (hp["mu_err"]
            + (err_mat_z - hp["mu_err"]) @ ops_h.proj_err).reshape(-1)


def log_lik_hetero(p, data: FullData, ops_h: SparseHeteroOps,
                   approx: str = "fitc", hyper=None, mask=None) -> jnp.ndarray:
    """Sparse heteroscedastic marginal log-likelihood.

    Identical Nystrom structure with a per-slot noise diagonal
    ``exp(kriged log-noise)``; the VFE penalty becomes the per-slot
    ``-corr_i / (2 lambda_i)`` (the Titsias bound holds pointwise).
    """
    m = data.y.shape[1]
    sp_p = SparseParams(p.tilde_l, p.ul_vecs,
                        jnp.zeros((), data.y.dtype))  # sigma2 unused below
    noise = jnp.exp(noise_at_data(p, ops_h, m, hyper))  # (N*M,)
    pieces = _assemble_full(sp_p, data, ops_h.base, m, hyper, mask)
    return _loglik_pieces(pieces, noise, approx)


def _woodbury_noise(sp_p: SparseParams, data: FullData, ops: SparseOps,
                    m: int, approx: str, noise: jnp.ndarray, hyper=None,
                    mask=None) -> _Woodbury:
    """:func:`_woodbury` with an explicit per-slot noise diagonal."""
    k_mm, k_nm, k_diag, y_flat, mv = _assemble_full(sp_p, data, ops, m, hyper,
                                                    mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y_flat, noise, approx, mv)


def log_posterior_hetero(p, data: FullData, ops_h: SparseHeteroOps,
                         approx: str = "fitc", hyper=None,
                         prior: bool = True, mask=None):
    """Sparse hetero log-posterior: the exact hetero model's priors at Z
    (models/gnmgp_hetero.log_posterior — GP priors on tilde_l, the L-entry
    columns, and each task's log-noise row, plus the exp Jacobian sum)."""
    hp = {**HETERO_DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops_h.base.z.shape[0]
    m = data.y.shape[1]
    t = transforms.tri_size(m)
    loglik = log_lik_hetero(p, data, ops_h, approx=approx, hyper=hp, mask=mask)

    lp_l = dists.mvn_logpdf_chol(p.tilde_l, hp["mu_tilde_l"], ops_h.base.pc_l_z)
    ul_mat = p.ul_vecs.reshape(m_z, t)
    lp_uL = jnp.sum(
        jax.vmap(lambda col: dists.mvn_logpdf_chol(
            col, hp["mu_L"], ops_h.base.pc_ul_z))(ul_mat.T)
    )
    err_mat = p.tilde_sigma2_err.reshape(m, m_z)
    lp_err = jnp.sum(
        jax.vmap(lambda row: dists.mvn_logpdf_chol(
            row, hp["mu_err"], ops_h.pc_err_z))(err_mat)
    )
    res = loglik
    if prior:
        res = res + lp_l + lp_uL + lp_err + jnp.sum(p.tilde_sigma2_err)
    comps = {"loglik": loglik, "log_prior_tilde_l": lp_l,
             "log_prior_uL_vecs": lp_uL, "log_prior_sigma2_err": lp_err}
    return res, comps


def make_objective_hetero(data: FullData, z=None, n_inducing: int = 64,
                          hyper: dict | None = None, approx: str = "fitc",
                          prior: bool = True, mask=None):
    """Jit-friendly sparse hetero negative-log-posterior: ``(nlp, ops_h)``."""
    from . import base as base_mod

    base_mod.check_full_data(data, "gnmgp_hetero_sparse")
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    hp = {**HETERO_DEFAULT_HYPERS, **(hyper or {})}
    if z is None:
        x_real = data.x if mask is None else data.x[: int(jnp.sum(mask))]
        z = choose_inducing(x_real, min(n_inducing, x_real.shape[0]))
    ops_h = make_ops_hetero(data.x, z, hp)
    m_z = ops_h.base.z.shape[0]
    m = data.y.shape[1]

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack_hetero(vec, m_z, m)
        res, _ = log_posterior_hetero(p, data, ops_h, approx=approx,
                                      hyper=hp, prior=prior, mask=mask)
        return -res

    return nlp, ops_h
