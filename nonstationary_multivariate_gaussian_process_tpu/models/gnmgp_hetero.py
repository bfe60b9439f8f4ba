"""Heteroscedastic-noise GNMGP: per-(input, task) noise variance with a GP prior.

The reference attempts this model in
``Nonseparable_Model/Nonseparable_model_mpiKAISER_extended.py:155-247`` but the
local objective copy is unfinished WIP — it has unresolved names
(``kernel``/``beta_err``), sums only the last task's noise prior, and slices
the noise vector with ``[m*N : m*(N+1)]``.  This module implements the model
the code *intends*:

* parameters ``[tilde_l (N), uL_vecs (N·T), tilde_sigma2_err (N·M)]`` —
  the noise log-variance becomes an (input × task) process,
* likelihood ``MVN(0, K + diag(exp(tilde_sigma2_err)))`` with the SVC Gram,
* independent GP priors on each task's noise log-variance process, plus the
  log-Jacobian of the exp transform (summed over all N·M entries),
* the same GP priors on ``tilde_l`` and the L-entry processes as the
  homoscedastic GNMGP.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dists
from ..ops import chol, kernels, transforms
from . import gnmgp as base
from .base import FullData, task_major

DEFAULT_HYPERS = {
    **base.DEFAULT_HYPERS,
    "mu_err": 0.0,
    "alpha_err": 1.0,
    "beta_err": 1.0,
}
# the base inverse-gamma hypers are replaced by the noise-GP hypers
DEFAULT_HYPERS.pop("a", None)
DEFAULT_HYPERS.pop("b", None)


class Params(NamedTuple):
    tilde_l: jnp.ndarray  # (N,)
    ul_vecs: jnp.ndarray  # (N*T,)
    tilde_sigma2_err: jnp.ndarray  # (N*M,) task-major log noise variances


def n_params(n: int, m: int) -> int:
    return n + n * transforms.tri_size(m) + n * m


def unpack(vec: jnp.ndarray, n: int, m: int) -> Params:
    from .base import check_vec

    t = transforms.tri_size(m)
    check_vec(vec, n + n * t + n * m, "gnmgp_hetero",
              f"[tilde_l({n}), uL_vecs({n}·{t}), tilde_sigma2_err({n}·{m} "
              f"task-major)] for N={n}, M={m}")
    return Params(
        tilde_l=vec[:n],
        ul_vecs=vec[n : n + n * t],
        tilde_sigma2_err=vec[n + n * t :],
    )


def pack(p: Params) -> jnp.ndarray:
    return jnp.concatenate([p.tilde_l, p.ul_vecs, p.tilde_sigma2_err])


def log_lik(p: Params, data: FullData, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Marginal log-likelihood; optional input mask for padded subjects.

    ``mask``: (N,) boolean, True for real observations.  Masked entries are
    projected out of the Gram exactly as in the homoscedastic model
    (models/gnmgp.log_lik): rows/cols zeroed, unit diagonal, zero observation
    — the padded slots' noise latents then only feel their GP prior.
    """
    n, m = data.y.shape
    ls = base.chol_process(p.ul_vecs, n, m)
    ell = jnp.exp(p.tilde_l)
    k_x = kernels.nonstationary_rbf_cov(data.x, ell1=ell)
    cov = base.gram(k_x, ls)
    y = task_major(data.y)
    noise = jnp.exp(p.tilde_sigma2_err)  # (N*M,) task-major
    if mask is None:
        cov = cov + jnp.diag(noise)
    else:
        mv = jnp.tile(jnp.asarray(mask, data.y.dtype), m)  # task-major (N*M,)
        cov = cov * (mv[:, None] * mv[None, :])
        cov = cov + jnp.diag(jnp.where(mv > 0, noise, 1.0))
        y = y * mv
    return dists.mvn_logpdf_dense_unnorm(y, 0.0, cov)


def log_posterior(
    p: Params,
    data: FullData,
    mu_tilde_l=0.0,
    alpha_tilde_l=5.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=5.0,
    beta_L=1.0,
    mu_err=0.0,
    alpha_err=1.0,
    beta_err=1.0,
    prior: bool = True,
    prior_chol_l=None,
    prior_chol_L=None,
    prior_chol_err=None,
    mask=None,
):
    x = data.x
    n, m = data.y.shape
    t = transforms.tri_size(m)
    loglik = log_lik(p, data, mask=mask)

    if prior_chol_l is None:
        prior_chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_l, beta=beta_tilde_l)
        )
    if prior_chol_L is None:
        prior_chol_L = chol.safe_cholesky(kernels.rbf_cov(x, alpha=alpha_L, beta=beta_L))
    if prior_chol_err is None:
        prior_chol_err = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_err, beta=beta_err)
        )

    lp_l = dists.mvn_logpdf_chol(p.tilde_l, mu_tilde_l, prior_chol_l)
    lp_uL = base._l_process_prior(p.ul_vecs.reshape(n, t), mu_L, prior_chol_L)
    # one GP prior per task's noise log-variance process (task-major layout)
    err_mat = p.tilde_sigma2_err.reshape(m, n)
    lp_err = jnp.sum(
        jax.vmap(lambda row: dists.mvn_logpdf_chol(row, mu_err, prior_chol_err))(err_mat)
    )

    res = loglik
    if prior:
        # + log-Jacobian of exp over every noise entry
        res = res + lp_l + lp_uL + lp_err + jnp.sum(p.tilde_sigma2_err)
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_uL_vecs": lp_uL,
        "log_prior_sigma2_err": lp_err,
    }
    return res, comps


def nlogpos(vec, y, x, verbose=False, prior=True, **hyper):
    hp = {**DEFAULT_HYPERS, **hyper}
    n, m = y.shape
    p = unpack(vec, n, m)
    res, comps = log_posterior(p, FullData(x, y), prior=prior, **hp)
    if verbose:
        return (-res,) + tuple(comps.values())
    return -res


def deviance(vec, y, x):
    n, m = y.shape
    return -2.0 * log_lik(unpack(vec, n, m), FullData(x, y))


def make_objective(data: FullData, hyper: dict | None = None, prior: bool = True,
                   mask=None):
    from .base import check_full_data

    check_full_data(data, "gnmgp_hetero")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    x = data.x
    pc_l = chol.prior_rbf_inv(x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    pc_L = chol.prior_rbf_inv(x, hp["alpha_L"], hp["beta_L"])
    pc_e = chol.prior_rbf_inv(x, hp["alpha_err"], hp["beta_err"])
    n, m = data.y.shape

    def nlp(vec):
        p = unpack(vec, n, m)
        res, _ = log_posterior(
            p, data, prior=prior, mask=mask,
            prior_chol_l=pc_l, prior_chol_L=pc_L, prior_chol_err=pc_e, **hp
        )
        return -res

    return nlp


def init_from_gnmgp(gn_vec, n: int, m: int) -> jnp.ndarray:
    """Warm-start: homoscedastic GNMGP MAP with its scalar noise broadcast."""
    gn_vec = jnp.asarray(gn_vec)
    return jnp.concatenate(
        [gn_vec[:-1], jnp.full((n * m,), gn_vec[-1], gn_vec.dtype)]
    )
