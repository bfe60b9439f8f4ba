"""Sparse (inducing-point) LMC — the stationary model's large-N tier.

The exact LMC likelihood (``models/lmc.py``; reference
``Utility/logpos.py:383-462``) rides the rotated Kronecker solver at
O(N^3 + M^3).  The parameter vector is already N-free (3 + T slots), so the
sparse tier changes *only* the likelihood cost: the stationary separable
covariance ``B_f ⊗ K_x`` Nystrom-compresses over m_z inducing inputs exactly
like the SNMGP tier (``models/snmgp_sparse.py`` — ``K_mm = B_f ⊗ K_x(Z,Z)``,
``K_nm = B_f ⊗ K_x(X,Z)``), and the likelihood is the shared Woodbury factor
set (``gnmgp_sparse._woodbury_core``) at O(N M (m_z M)^2): FITC, or the
Titsias VFE bound on the exact marginal.

The reference has no sparse tier; this one matters for serving stationary
baselines at N in the thousands (ROADMAP "LMC/SNMGP sparse analogs").
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import dists, settings
from ..ops import kernels, transforms
from .base import FullData, task_major
from .gnmgp_sparse import (_loglik_separable,
                           _loglik_separable_hadamard, _woodbury_core,
                           choose_inducing)
from .lmc import DEFAULT_HYPERS, Params, n_params, pack, unpack  # noqa: F401
# The sparse LMC shares the dense packed layout — unpack/pack re-exported so
# callers treat this module like every other model module.


class SparseOps(NamedTuple):
    """The stationary tier has no latent processes to krige: ops is just Z."""

    z: jnp.ndarray  # (m_z,) inducing inputs


def make_ops(x, z, hyper: dict | None = None) -> SparseOps:
    del x, hyper
    return SparseOps(jnp.asarray(z, settings.dtype))


def _assemble(p: Params, data: FullData, ops: SparseOps, m: int, mask=None):
    """Stationary separable cross pieces: ``K_** = B_f ⊗ K_x(·,·)``."""
    n = data.y.shape[0]
    m_z = ops.z.shape[0]
    l_mat = transforms.vec_to_tril(transforms.ulvec_to_lvec(p.ul_vec, m), m)
    b_f = l_mat @ l_mat.T
    # scalars broadcast to pointwise processes, as the dense tier does
    # (models/lmc.py log_lik; reference logpos.py:424-429)
    ell_x = jnp.exp(p.tilde_l) * jnp.ones((n,), data.y.dtype)
    sig_x = jnp.exp(p.tilde_sigma) * jnp.ones((n,), data.y.dtype)
    ell_z = jnp.exp(p.tilde_l) * jnp.ones((m_z,), data.y.dtype)
    sig_z = jnp.exp(p.tilde_sigma) * jnp.ones((m_z,), data.y.dtype)

    k_zz = kernels.nonstationary_rbf_cov(ops.z, sigma1=sig_z, ell1=ell_z)
    k_mm = jnp.kron(b_f, k_zz)
    k_xz = kernels.nonstationary_rbf_cov(data.x, sigma1=sig_x, ell1=ell_x,
                                         x2=ops.z, sigma2=sig_z, ell2=ell_z)
    k_nm = jnp.kron(b_f, k_xz)  # (NM, m_z M), rows task-major
    k_x_diag = sig_x * sig_x + settings.jitter
    k_diag = (jnp.diag(b_f)[:, None] * k_x_diag[None, :]).reshape(-1)

    mv = None
    if mask is not None:
        mv = jnp.tile(jnp.asarray(mask, data.y.dtype), m)
    return k_mm, k_nm, k_diag, task_major(data.y), mv


def _woodbury(p: Params, data: FullData, ops: SparseOps, m: int,
              approx: str, mask=None):
    k_mm, k_nm, k_diag, y_flat, mv = _assemble(p, data, ops, m, mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y_flat,
                          jnp.exp(p.tilde_sigma2_err), approx, mv)


def log_lik(p: Params, data: FullData, ops: SparseOps, approx: str = "fitc",
            hyper=None, mask=None) -> jnp.ndarray:
    """Sparse stationary marginal log-likelihood (unnormalized convention);
    ``approx="vfe"`` lower-bounds the exact ``models.lmc.log_lik``.
    ``hyper`` is accepted for driver uniformity (no latent processes — the
    likelihood does not depend on it).  Kronecker-factored hot path
    (``gnmgp_sparse._loglik_separable``: the K_mm kron is never
    materialized); the inner system routes through the mixed kernel under
    ``NMGP_PRECISION=mixed``."""
    del hyper
    m = data.y.shape[1]
    n = data.y.shape[0]
    m_z = ops.z.shape[0]
    l_mat = transforms.vec_to_tril(transforms.ulvec_to_lvec(p.ul_vec, m), m)
    b_f = l_mat @ l_mat.T
    ell_x = jnp.exp(p.tilde_l) * jnp.ones((n,), data.y.dtype)
    sig_x = jnp.exp(p.tilde_sigma) * jnp.ones((n,), data.y.dtype)
    ell_z = jnp.exp(p.tilde_l) * jnp.ones((m_z,), data.y.dtype)
    sig_z = jnp.exp(p.tilde_sigma) * jnp.ones((m_z,), data.y.dtype)
    k_zz = kernels.nonstationary_rbf_cov(ops.z, sigma1=sig_z, ell1=ell_z)
    k_xz = kernels.nonstationary_rbf_cov(data.x, sigma1=sig_x, ell1=ell_x,
                                         x2=ops.z, sigma2=sig_z, ell2=ell_z)
    k_x_diag = sig_x * sig_x + settings.jitter
    return _loglik_separable(b_f, k_zz, k_xz, k_x_diag, data.y,
                             jnp.exp(p.tilde_sigma2_err), approx, mask)


def log_posterior(p: Params, data: FullData, ops: SparseOps,
                  approx: str = "fitc", hyper=None, prior: bool = True,
                  mask=None):
    """Sparse log-posterior under the exact LMC priors (logpos.py:405-462):
    N(mu, sigma) on tilde_l, N(0, c) on the task vector, inverse-gamma on the
    noise plus the exp Jacobian."""
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    loglik = log_lik(p, data, ops, approx=approx, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    lp_l = dists.normal_logpdf(p.tilde_l, hp["mu_tilde_l"], hp["sigma_tilde_l"])
    lp_ul = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, hp["c"]))
    lp_s2 = dists.inverse_gamma_logpdf(sigma2_err, alpha=hp["a"], beta=hp["b"])
    res = loglik
    if prior:
        res = res + lp_l + lp_ul + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_uL_vec": lp_ul,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


# ---------------------------------------------------------------------------
# Hadamard variant: one observation per (input, task) pair.
# ---------------------------------------------------------------------------


def _assemble_hadamard(p: Params, data, ops: SparseOps, m: int, mask=None):
    """Hadamard-layout cross pieces under the reference's stationary
    conventions (``models.lmc.log_posterior_hadamard``, logpos.py:676-716):
    raw task-Cholesky vector, stationary ``rbf_cov(alpha=sigma, beta=ell)``.
    ``K_mm = B_f ⊗ K_x(Z,Z)``; ``K_nm[i,(c,j)] = B_f[indx_i,c] K_x(x_i,z_j)``.
    """
    x, indx, y = data
    n = y.shape[0]
    m_z = ops.z.shape[0]
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (Hadamard)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sig = jnp.exp(p.tilde_sigma)

    k_zz = kernels.rbf_cov(ops.z, alpha=sig, beta=ell)  # self: + jitter I
    k_mm = jnp.kron(b_f, k_zz)
    k_xz = kernels.rbf_cov(x, ops.z, alpha=sig, beta=ell)
    ix = jnp.asarray(indx, jnp.int32)
    b_rows = b_f[ix]  # (N, M)
    k_nm = (k_xz[:, None, :] * b_rows[:, :, None]).reshape(n, m * m_z)
    k_diag = b_f[ix, ix] * (sig * sig + settings.jitter)

    mv = None if mask is None else jnp.asarray(mask, y.dtype)
    return k_mm, k_nm, k_diag, y, mv


def _woodbury_hadamard(p: Params, data, ops: SparseOps, m: int,
                       approx: str, mask=None):
    """Hadamard-layout Woodbury factors (see :func:`_assemble_hadamard`)."""
    k_mm, k_nm, k_diag, y, mv = _assemble_hadamard(p, data, ops, m, mask)
    return _woodbury_core(k_mm, k_nm, k_diag, y,
                          jnp.exp(p.tilde_sigma2_err), approx, mv)


def log_lik_hadamard(p: Params, data, ops: SparseOps, m: int,
                     approx: str = "fitc", hyper=None,
                     mask=None) -> jnp.ndarray:
    """Sparse Hadamard marginal log-likelihood (see :func:`log_lik`) —
    Khatri-Rao-factored (``gnmgp_sparse._loglik_separable_hadamard``)."""
    del hyper
    x, indx, y = data
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (Hadamard)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sig = jnp.exp(p.tilde_sigma)
    k_zz = kernels.rbf_cov(ops.z, alpha=sig, beta=ell)  # self: + jitter I
    k_xz = kernels.rbf_cov(x, ops.z, alpha=sig, beta=ell)
    ix = jnp.asarray(indx, jnp.int32)
    k_diag = b_f[ix, ix] * (sig * sig + settings.jitter)
    return _loglik_separable_hadamard(
        b_f, k_zz, k_xz, ix, k_diag, y, jnp.exp(p.tilde_sigma2_err),
        approx, mask,
    )


def log_posterior_hadamard(p: Params, data, ops: SparseOps, m: int,
                           approx: str = "fitc", hyper=None,
                           prior: bool = True, mask=None):
    """Sparse Hadamard log-posterior under the exact Hadamard LMC priors
    (raw-L_vec N(0,c), unnormalized inverse-gamma + exp Jacobian)."""
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    loglik = log_lik_hadamard(p, data, ops, m, approx=approx, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    lp_l = dists.normal_logpdf(p.tilde_l, hp["mu_tilde_l"],
                               hp["sigma_tilde_l"])
    lp_lvec = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, hp["c"]))
    lp_s2 = dists.inverse_gamma_logpdf_u(sigma2_err, alpha=hp["a"],
                                         beta=hp["b"])
    res = loglik
    if prior:
        res = res + lp_l + lp_lvec + lp_s2 + p.tilde_sigma2_err
    comps = {"loglik": loglik, "log_prior_tilde_l": lp_l,
             "log_prior_L_vec": lp_lvec, "log_prior_sigma2_err": lp_s2}
    return res, comps


def make_objective_hadamard(data, m: int, z=None, n_inducing: int = 64,
                            hyper: dict | None = None, approx: str = "fitc",
                            prior: bool = True, mask=None):
    """Jit-friendly sparse Hadamard negative-log-posterior: ``(nlp, ops)``."""
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    if z is None:
        import numpy as _np

        x_real = (data.x if mask is None
                  else data.x[: int(_np.asarray(mask).sum())])
        z = choose_inducing(x_real, min(n_inducing, x_real.shape[0]))
    ops = make_ops(data.x, z)

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, m)
        res, _ = log_posterior_hadamard(p, data, ops, m, approx=approx,
                                        hyper=hyper, prior=prior, mask=mask)
        return -res

    return nlp, ops


def make_objective(data: FullData, z=None, n_inducing: int = 64,
                   hyper: dict | None = None, approx: str = "fitc",
                   prior: bool = True, mask=None):
    """Jit-friendly sparse negative-log-posterior closure: ``(nlp, ops)``.

    The objective runs over the dense LMC packed vector (``3 + T`` slots —
    the layout is already N-free); only the likelihood cost changes.
    """
    from . import base

    base.check_full_data(data, "lmc_sparse")
    if approx not in ("fitc", "vfe"):
        raise ValueError(f"approx must be 'fitc' or 'vfe', got {approx!r}")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    if z is None:
        x_real = data.x if mask is None else data.x[: int(jnp.sum(mask))]
        z = choose_inducing(x_real, min(n_inducing, x_real.shape[0]))
    ops = make_ops(data.x, z, hp)
    m = data.y.shape[1]

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, m)
        res, _ = log_posterior(p, data, ops, approx=approx, hyper=hp,
                               prior=prior, mask=mask)
        return -res

    return nlp, ops
