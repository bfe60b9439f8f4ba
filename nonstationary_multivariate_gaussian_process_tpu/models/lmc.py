"""LMC — stationary multi-task GP (linear model of coregionalization).

Covariance ``B_f ⊗ K_x(σ, ℓ) + σ²_err I`` with scalar lengthscale/scale.

TPU-native re-design of the reference objectives at ``Utility/logpos.py``:
``vec2pars_S`` (:46), ``logpos_S``/``nlogpos_obj_S`` (:383-462) and the
Hadamard variant (:662-716).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import dists
from ..ops import kernels, transforms
from . import base
from .base import FullData, HadamardData, mask_dense_gram, task_major

#: Reference default hyper-parameters (Stationary_model.py:80).
DEFAULT_HYPERS = {
    "mu_tilde_l": 0.0,
    "sigma_tilde_l": 1.0,
    "a": 1.0,
    "b": 1.0,
    "c": 10.0,
}


class Params(NamedTuple):
    tilde_l: jnp.ndarray  # () log lengthscale
    tilde_sigma: jnp.ndarray  # () log scale (fixed at 0 in the reference driver)
    ul_vec: jnp.ndarray  # (T,) unconstrained task-covariance Cholesky vector
    tilde_sigma2_err: jnp.ndarray  # () log noise variance


def n_params(m: int) -> int:
    return 2 + transforms.tri_size(m) + 1


def unpack(vec: jnp.ndarray, m: int) -> Params:
    """Layout identical to reference vec2pars_S (logpos.py:46-57)."""
    t = transforms.tri_size(m)
    base.check_vec(vec, 3 + t, "lmc",
                   "[tilde_l, tilde_sigma, uL_vec(T), tilde_sigma2_err]")
    return Params(
        tilde_l=vec[0],
        tilde_sigma=vec[1],
        ul_vec=vec[2 : 2 + t],
        tilde_sigma2_err=vec[-1],
    )


def pack(p: Params) -> jnp.ndarray:
    return jnp.concatenate(
        [
            jnp.reshape(p.tilde_l, (1,)),
            jnp.reshape(p.tilde_sigma, (1,)),
            p.ul_vec,
            jnp.reshape(p.tilde_sigma2_err, (1,)),
        ]
    )


def log_lik(p: Params, data: FullData, mask=None) -> jnp.ndarray:
    """Kronecker fast-path marginal log-likelihood (logpos.py:424-443).

    ``mask`` (N,) boolean excludes padded inputs exactly (ragged fleets).
    """
    n, m = data.y.shape
    l_vec = transforms.ulvec_to_lvec(p.ul_vec, m)
    l_mat = transforms.vec_to_tril(l_vec, m)
    b_f = l_mat @ l_mat.T
    # Broadcast scalars to pointwise processes, matching the reference's use of
    # the nonstationary kernel with constant σ/ℓ (logpos.py:424-429).
    ones = jnp.ones((n,), data.y.dtype)
    ell = jnp.exp(p.tilde_l) * ones
    sigma = jnp.exp(p.tilde_sigma) * ones
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(data.x, sigma1=sigma, ell1=ell)
    return dists.mvn_logpdf_kron(task_major(data.y), 0.0, b_f, k_x, sigma2_err, mask=mask)


def log_posterior(
    p: Params,
    data: FullData,
    mu_tilde_l=0.0,
    sigma_tilde_l=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior: bool = True,
    mask=None,
):
    """Mirrors reference ``logpos_S`` (logpos.py:405-462)."""
    loglik = log_lik(p, data, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    lp_l = dists.normal_logpdf(p.tilde_l, mu_tilde_l, sigma_tilde_l)
    lp_ul = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, c))
    lp_s2 = dists.inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)
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


def nlogpos(vec, y, x, mu_tilde_l=0.0, sigma_tilde_l=1.0, verbose=False, prior=True, **hyper):
    """Parity API, mirrors ``nlogpos_obj_S`` (logpos.py:383-402)."""
    hp = {**DEFAULT_HYPERS, **hyper, "mu_tilde_l": mu_tilde_l, "sigma_tilde_l": sigma_tilde_l}
    n, m = y.shape
    p = unpack(vec, m)
    res, comps = log_posterior(p, FullData(x, y), prior=prior, **hp)
    if verbose:
        return (-res,) + tuple(comps.values())
    return -res


def deviance(vec, y, x):
    n, m = y.shape
    return -2.0 * log_lik(unpack(vec, m), FullData(x, y))


def make_objective(data: FullData, hyper: dict | None = None, prior: bool = True):
    base.check_full_data(data, "lmc")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, data.y.shape[1])
        res, _ = log_posterior(p, data, prior=prior, **hp)
        return -res

    return nlp


# ---------------------------------------------------------------------------
# Hadamard variant.
# ---------------------------------------------------------------------------


def log_posterior_hadamard(
    p: Params,
    data: HadamardData,
    m: int,
    mu_tilde_l=0.0,
    sigma_tilde_l=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior: bool = True,
    mask=None,
):
    """Mirrors reference ``logpos_hadamard_S`` (logpos.py:676-716).

    As in the other Hadamard objectives the task-Cholesky vector enters
    untransformed (logpos.py:679) and the stationary ``rbf_cov`` (with nugget)
    builds K_x (logpos.py:685).  ``mask`` excludes padded observations.
    """
    x, indx, y = data
    n = y.shape[0]
    l_mat = transforms.vec_to_tril(p.ul_vec, m)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.rbf_cov(x, alpha=sigma, beta=ell)
    k_i = b_f[indx[:, None], indx[None, :]]
    if mask is None:
        cov = k_x * k_i + sigma2_err * jnp.eye(n, dtype=y.dtype)
    else:
        cov, y = mask_dense_gram(k_x * k_i, sigma2_err, y, mask)
    loglik = dists.mvn_logpdf_dense_unnorm(y, 0.0, cov)

    lp_l = dists.normal_logpdf(p.tilde_l, mu_tilde_l, sigma_tilde_l)
    lp_lvec = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, c))
    lp_s2 = dists.inverse_gamma_logpdf_u(sigma2_err, alpha=a, beta=b)
    res = loglik
    if prior:
        res = res + lp_l + lp_lvec + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_L_vec": lp_lvec,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


def nlogpos_hadamard(vec, x, indx, y, m: int, mu_tilde_l=0.0, sigma_tilde_l=1.0,
                     verbose=False, prior=True, **hyper):
    """Parity API, mirrors ``nlogpos_obj_hadamard_S`` (logpos.py:662-673)."""
    hp = {**DEFAULT_HYPERS, **hyper, "mu_tilde_l": mu_tilde_l, "sigma_tilde_l": sigma_tilde_l}
    p = unpack(vec, m)
    res, comps = log_posterior_hadamard(p, HadamardData(x, indx, y), m, prior=prior, **hp)
    if verbose:
        return (-res,) + tuple(comps.values())
    return -res
