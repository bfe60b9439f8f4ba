"""Sparse (inducing-point) SNMGP — the separable model's large-N tier.

The exact SNMGP likelihood (``models/snmgp.py``; reference
``Utility/logpos.py:216-296``) rides the rotated Kronecker solver at
O(N^3 + M^3), and its parameter vector grows as 2N + T + 1 (log-lengthscale
and log-scale processes live at every input).  This module applies the same
inducing-point construction as the GNMGP tier (``models/gnmgp_sparse.py``):

1. **Latent processes at m_z inducing inputs Z**, kriged to the data as the
   prior conditional mean under the exact model's own RBF priors (fixed
   (m_z, N) projections, host-f64 islands).  Parameters drop to
   ``2 m_z + T + 1``.

2. **Nystrom compression of the f-process** over the same Z.  The separable
   covariance keeps its Kronecker structure through the compression:
   ``K_mm = B_f ⊗ K_x(Z,Z)`` and ``K_nm = B_f ⊗ K_x(X,Z)`` are literal
   ``jnp.kron``s — the cross-Gram assembler the ROADMAP's "LMC/SNMGP sparse
   analogs" item called for — and the likelihood is the same layout-agnostic
   Woodbury factor set (``gnmgp_sparse._woodbury_core``) at
   O(N M (m_z M)^2) with FITC or the Titsias VFE lower bound.

The reference has no sparse tier for any model; construction follows
Quinonero-Candela & Rasmussen (2005) / Titsias (2009), stated in the
task-major layout (row = a*N + n) every objective here shares.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dists, settings
from ..ops import chol, kernels, transforms
from .base import FullData, task_major
from .gnmgp_sparse import (_loglik_separable,
                           _loglik_separable_hadamard, _woodbury_core,
                           choose_inducing)
from .snmgp import DEFAULT_HYPERS


class SparseParams(NamedTuple):
    tilde_l_z: jnp.ndarray  # (m_z,) log lengthscale process at Z
    tilde_sigma_z: jnp.ndarray  # (m_z,) log scale process at Z
    ul_vec: jnp.ndarray  # (T,) unconstrained task-Cholesky vector (global)
    tilde_sigma2_err: jnp.ndarray  # () log noise variance


def n_params(m_z: int, m: int) -> int:
    return 2 * m_z + transforms.tri_size(m) + 1


def unpack(vec: jnp.ndarray, m_z: int, m: int) -> SparseParams:
    """Packed layout ``[tilde_l_z(m_z), tilde_sigma_z(m_z), uL_vec(T),
    tilde_sigma2_err]`` — the exact layout (logpos.py:17-29) with N -> m_z."""
    from . import base

    t = transforms.tri_size(m)
    base.check_vec(vec, 2 * m_z + t + 1, "snmgp_sparse",
                   f"[tilde_l_z({m_z}), tilde_sigma_z({m_z}), uL_vec({t}), "
                   f"tilde_sigma2_err] for m_z={m_z}, M={m}")
    return SparseParams(
        tilde_l_z=vec[:m_z],
        tilde_sigma_z=vec[m_z : 2 * m_z],
        ul_vec=vec[2 * m_z : 2 * m_z + t],
        tilde_sigma2_err=vec[-1],
    )


def pack(p: SparseParams) -> jnp.ndarray:
    return jnp.concatenate(
        [p.tilde_l_z, p.tilde_sigma_z, p.ul_vec,
         jnp.reshape(p.tilde_sigma2_err, (1,))]
    )


class SparseOps(NamedTuple):
    """Loop-invariant pieces, hoisted once per objective (host-f64 islands)."""

    z: jnp.ndarray  # (m_z,) inducing inputs
    proj_l: jnp.ndarray  # (m_z, N) kriging projection, tilde_l prior
    proj_sigma: jnp.ndarray  # (m_z, N) kriging projection, tilde_sigma prior
    pc_l_z: object  # TriInv of the tilde_l prior Gram at Z
    pc_sigma_z: object  # TriInv of the tilde_sigma prior Gram at Z


def make_ops(x, z, hyper: dict | None = None) -> SparseOps:
    """Precompute the kriging projections Z->X and the prior factors at Z."""
    from ..predict.latent import krige_proj

    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    proj_l, _ = krige_proj(z, x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    proj_sigma, _ = krige_proj(z, x, hp["alpha_tilde_sigma"],
                               hp["beta_tilde_sigma"])
    pc_l_z = chol.prior_rbf_inv(z, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    pc_sigma_z = chol.prior_rbf_inv(z, hp["alpha_tilde_sigma"],
                                    hp["beta_tilde_sigma"])
    return SparseOps(jnp.asarray(z, settings.dtype), proj_l, proj_sigma,
                     pc_l_z, pc_sigma_z)


def make_ops_traced(x, z, hyper: dict | None = None) -> SparseOps:
    """Differentiable-in-Z :class:`SparseOps` for inducing refinement.

    The separable analog of ``gnmgp_sparse.make_ops_traced``: both latent
    processes' kriging projections and prior factors are rebuilt in-graph
    (robust traced factorization) so ``jax.grad`` flows through Z.  The
    prior factors come back as plain Cholesky factors; ``dists.
    mvn_logpdf_chol`` accepts either.  Use only inside
    ``gnmgp_sparse.refine_inducing``'s Z-steps.
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
    proj_s, c_s = pieces(hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
    return SparseOps(z, proj_l, proj_s, c_l, c_s)


def latents_at_data(p: SparseParams, ops: SparseOps, hyper=None):
    """Kriged latent fields at the data: ``(tilde_l_x (N,), tilde_sigma_x (N,))``."""
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    tl_x = hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ ops.proj_l
    ts_x = (hp["mu_tilde_sigma"]
            + (p.tilde_sigma_z - hp["mu_tilde_sigma"]) @ ops.proj_sigma)
    return tl_x, ts_x


def _factors(p: SparseParams, data: FullData, ops: SparseOps, m: int,
             hyper=None):
    """Separable covariance factors ``(b_f, k_zz, k_xz, k_x_diag)`` — the
    pieces ``K_** = B_f ⊗ K_x(·,·)`` is built from."""
    tl_x, ts_x = latents_at_data(p, ops, hyper)
    ell_x, sig_x = jnp.exp(tl_x), jnp.exp(ts_x)
    ell_z, sig_z = jnp.exp(p.tilde_l_z), jnp.exp(p.tilde_sigma_z)
    l_mat = transforms.vec_to_tril(transforms.ulvec_to_lvec(p.ul_vec, m), m)
    b_f = l_mat @ l_mat.T

    k_zz = kernels.nonstationary_rbf_cov(ops.z, sigma1=sig_z, ell1=ell_z)
    k_xz = kernels.nonstationary_rbf_cov(data.x, sigma1=sig_x, ell1=ell_x,
                                         x2=ops.z, sigma2=sig_z, ell2=ell_z)
    # Gibbs self-cov diag is sigma_n^2 (+ additive jitter, kernels.py:109-111)
    k_x_diag = sig_x * sig_x + settings.jitter
    return b_f, k_zz, k_xz, k_x_diag


def _assemble(p: SparseParams, data: FullData, ops: SparseOps, m: int,
              hyper=None, mask=None):
    """Separable-layout cross pieces: ``K_** = B_f ⊗ K_x(·,·)`` (the
    materialized form — prediction/LOO; the likelihood hot path stays
    factored, :func:`~.gnmgp_sparse._loglik_separable`)."""
    b_f, k_zz, k_xz, k_x_diag = _factors(p, data, ops, m, hyper)
    k_mm = jnp.kron(b_f, k_zz)  # (m_z M, m_z M), cols c-major (c*m_z + j)
    k_nm = jnp.kron(b_f, k_xz)  # (NM, m_z M), rows task-major (a*N + n)
    k_diag = (jnp.diag(b_f)[:, None] * k_x_diag[None, :]).reshape(-1)

    mv = None
    if mask is not None:
        mv = jnp.tile(jnp.asarray(mask, data.y.dtype), m)
    return k_mm, k_nm, k_diag, task_major(data.y), mv


def _woodbury(p: SparseParams, data: FullData, ops: SparseOps, m: int,
              approx: str, hyper=None, mask=None):
    k_mm, k_nm, k_diag, y_flat, mv = _assemble(p, data, ops, m, hyper, mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y_flat,
                          jnp.exp(p.tilde_sigma2_err), approx, mv)


def log_lik(p: SparseParams, data: FullData, ops: SparseOps,
            approx: str = "fitc", hyper=None, mask=None) -> jnp.ndarray:
    """Sparse separable marginal log-likelihood (unnormalized convention).

    ``approx="fitc"``: log N(y; 0, Q + diag(K-Q) + sigma^2 I).
    ``approx="vfe"``:  Titsias' collapsed bound ``<=`` the exact SNMGP
    log-likelihood (``models.snmgp.log_lik``) at the same kriged fields.
    ``mask`` (N,) excludes padded observations exactly.  The Kronecker
    structure is never materialized: ``chol(B_f ⊗ K_zz) = chol(B_f) ⊗
    chol(K_zz)`` (``gnmgp_sparse._loglik_separable``) drops the f64 factor
    to M³ + m_z³ and the inner-Gram GEMMs by M×; the inner system routes
    through the mixed kernel under ``NMGP_PRECISION=mixed``.
    """
    b_f, k_zz, k_xz, k_x_diag = _factors(p, data, ops, data.y.shape[1],
                                         hyper)
    return _loglik_separable(b_f, k_zz, k_xz, k_x_diag, data.y,
                             jnp.exp(p.tilde_sigma2_err), approx, mask)


def log_posterior(p: SparseParams, data: FullData, ops: SparseOps,
                  approx: str = "fitc", hyper=None, prior: bool = True,
                  mask=None):
    """Sparse log-posterior: the exact model's priors over the Z-latents.

    GP priors (RBF at Z, the exact model's hypers), N(0, c) on the task
    vector, the inverse-gamma noise prior and its exp Jacobian — mirrors
    ``logpos`` (logpos.py:237-296) with the latent fields at Z.
    """
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    loglik = log_lik(p, data, ops, approx=approx, hyper=hp, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)

    lp_l = dists.mvn_logpdf_chol(p.tilde_l_z, hp["mu_tilde_l"], ops.pc_l_z)
    lp_sigma = dists.mvn_logpdf_chol(p.tilde_sigma_z, hp["mu_tilde_sigma"],
                                     ops.pc_sigma_z)
    lp_ul = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, hp["c"]))
    lp_s2 = dists.inverse_gamma_logpdf(sigma2_err, alpha=hp["a"], beta=hp["b"])

    res = loglik
    if prior:
        res = res + lp_l + lp_sigma + lp_ul + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_tilde_sigma": lp_sigma,
        "log_prior_uL_vec": lp_ul,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


def make_objective(data: FullData, z=None, n_inducing: int = 64,
                   hyper: dict | None = None, approx: str = "fitc",
                   prior: bool = True, mask=None):
    """Jit-friendly sparse negative-log-posterior closure: ``(nlp, ops)``.

    The objective runs over the packed ``2 m_z + T + 1`` vector; ``ops`` is
    needed again by prediction.  ``z`` defaults to
    ``choose_inducing(x, n_inducing)``.
    """
    from . import base

    base.check_full_data(data, "snmgp_sparse")
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


# ---------------------------------------------------------------------------
# Hadamard variant: one observation per (input, task) pair.
# ---------------------------------------------------------------------------


def _assemble_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                       hyper=None, mask=None):
    """Hadamard-layout cross pieces.

    Reference Hadamard conventions apply (``models.snmgp.
    log_posterior_hadamard``, logpos.py:502-563): the task-Cholesky vector
    enters *raw* (no exp on diagonal slots).  Inducing latents are the full
    task set at Z — ``K_mm = B_f ⊗ K_x(Z,Z)`` — while each observation row
    selects its task: ``K_nm[i,(c,j)] = B_f[indx_i,c] K_x(x_i,z_j)``.
    """
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    x, indx, y = data
    n = y.shape[0]
    m_z = ops.z.shape[0]
    tl_x, ts_x = latents_at_data(p, ops, hp)
    ell_x, sig_x = jnp.exp(tl_x), jnp.exp(ts_x)
    ell_z, sig_z = jnp.exp(p.tilde_l_z), jnp.exp(p.tilde_sigma_z)
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (Hadamard)
    b_f = l_mat @ l_mat.T

    k_zz = kernels.nonstationary_rbf_cov(ops.z, sigma1=sig_z, ell1=ell_z)
    k_mm = jnp.kron(b_f, k_zz)  # cols c-major (c*m_z + j)
    k_xz = kernels.nonstationary_rbf_cov(x, sigma1=sig_x, ell1=ell_x,
                                         x2=ops.z, sigma2=sig_z, ell2=ell_z)
    ix = jnp.asarray(indx, jnp.int32)
    b_rows = b_f[ix]  # (N, M)
    k_nm = (k_xz[:, None, :] * b_rows[:, :, None]).reshape(n, m * m_z)
    k_diag = b_f[ix, ix] * (sig_x * sig_x + settings.jitter)

    mv = None if mask is None else jnp.asarray(mask, y.dtype)
    return k_mm, k_nm, k_diag, y, mv


def _woodbury_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                       approx: str, hyper=None, mask=None):
    """Hadamard-layout Woodbury factors (see :func:`_assemble_hadamard`)."""
    k_mm, k_nm, k_diag, y, mv = _assemble_hadamard(p, data, ops, m, hyper,
                                                   mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y,
                          jnp.exp(p.tilde_sigma2_err), approx, mv)


def log_lik_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                     approx: str = "fitc", hyper=None,
                     mask=None) -> jnp.ndarray:
    """Sparse Hadamard marginal log-likelihood (see :func:`log_lik`) —
    Khatri-Rao-factored, the Kronecker K_mm never materialized
    (``gnmgp_sparse._loglik_separable_hadamard``)."""
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    x, indx, y = data
    tl_x, ts_x = latents_at_data(p, ops, hp)
    ell_x, sig_x = jnp.exp(tl_x), jnp.exp(ts_x)
    ell_z, sig_z = jnp.exp(p.tilde_l_z), jnp.exp(p.tilde_sigma_z)
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (Hadamard)
    b_f = l_mat @ l_mat.T
    k_zz = kernels.nonstationary_rbf_cov(ops.z, sigma1=sig_z, ell1=ell_z)
    k_xz = kernels.nonstationary_rbf_cov(x, sigma1=sig_x, ell1=ell_x,
                                         x2=ops.z, sigma2=sig_z, ell2=ell_z)
    ix = jnp.asarray(indx, jnp.int32)
    k_diag = b_f[ix, ix] * (sig_x * sig_x + settings.jitter)
    return _loglik_separable_hadamard(
        b_f, k_zz, k_xz, ix, k_diag, y, jnp.exp(p.tilde_sigma2_err),
        approx, mask,
    )


def log_posterior_hadamard(p: SparseParams, data, ops: SparseOps, m: int,
                           approx: str = "fitc", hyper=None,
                           prior: bool = True, mask=None):
    """Sparse Hadamard log-posterior — the exact Hadamard SNMGP's priors
    over the Z-latents (raw-L_vec N(0,c), unnormalized inverse-gamma + the
    exp Jacobian; ``models.snmgp.log_posterior_hadamard``)."""
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    loglik = log_lik_hadamard(p, data, ops, m, approx=approx, hyper=hp,
                              mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    lp_l = dists.mvn_logpdf_chol(p.tilde_l_z, hp["mu_tilde_l"], ops.pc_l_z)
    lp_sigma = dists.mvn_logpdf_chol(p.tilde_sigma_z, hp["mu_tilde_sigma"],
                                     ops.pc_sigma_z)
    lp_l_vec = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, hp["c"]))
    lp_s2 = dists.inverse_gamma_logpdf_u(sigma2_err, alpha=hp["a"],
                                         beta=hp["b"])
    res = loglik
    if prior:
        res = res + lp_l + lp_sigma + lp_l_vec + lp_s2 + p.tilde_sigma2_err
    comps = {"loglik": loglik, "log_prior_tilde_l": lp_l,
             "log_prior_tilde_sigma": lp_sigma,
             "log_prior_L_vec": lp_l_vec, "log_prior_sigma2_err": lp_s2}
    return res, comps


def make_objective_hadamard(data, m: int, z=None, n_inducing: int = 64,
                            hyper: dict | None = None, approx: str = "fitc",
                            prior: bool = True, mask=None):
    """Jit-friendly sparse Hadamard negative-log-posterior: ``(nlp, ops)``."""
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
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


def init_from_empirical(emp_vec, n: int, m_z: int, m: int, x, z) -> jnp.ndarray:
    """Subsample an exact-model empirical init (N-layout) onto the Z-layout.

    Each inducing slot takes the latent values at its nearest data input
    (the GNMGP tier's ``init_from_empirical`` restated for the separable
    layout); the global ``uL_vec`` and noise slots pass through unchanged.
    """
    import numpy as np

    from . import snmgp as dense

    p = dense.unpack(jnp.asarray(emp_vec), n, m)
    x64 = np.asarray(x, np.float64)
    z64 = np.asarray(z, np.float64)
    nearest = np.argmin(np.abs(x64[None, :] - z64[:, None]), axis=1)  # (m_z,)
    tl_z = jnp.asarray(np.asarray(p.tilde_l)[nearest], settings.dtype)
    ts_z = jnp.asarray(np.asarray(p.tilde_sigma)[nearest], settings.dtype)
    return jnp.concatenate([
        tl_z, ts_z, jnp.asarray(p.ul_vec, settings.dtype),
        jnp.reshape(jnp.asarray(p.tilde_sigma2_err, settings.dtype), (1,)),
    ])
