"""SNMGP — separable nonstationary multivariate Gaussian process.

Covariance ``B_f ⊗ K_x(σ(x), ℓ(x)) + σ²_err I`` with GP priors on the
log-lengthscale and log-scale processes.

TPU-native re-design of the reference objectives at ``Utility/logpos.py``:
``vec2pars`` (:17), ``logpos``/``nlogpos_obj`` (:216-296) and the Hadamard
variant ``logpos_hadamard``/``nlogpos_obj_hadamard`` (:465-563).  The
likelihood runs through the rotated batched-Cholesky Kronecker solver
(``ops/kron.py``) instead of the reference's double symeig + stochastic
NaN-retry (logpos.py:266-268).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .. import dists
from ..ops import chol, kernels, kron, transforms
from . import base
from .base import FullData, HadamardData, mask_dense_gram, task_major

#: Reference default hyper-parameters (logpos.py:14).
DEFAULT_HYPERS = {
    "mu_tilde_l": 0.0,
    "alpha_tilde_l": 1.0,
    "beta_tilde_l": 1.0,
    "mu_tilde_sigma": 0.0,
    "alpha_tilde_sigma": 1.0,
    "beta_tilde_sigma": 1.0,
    "a": 1.0,
    "b": 1.0,
    "c": 10.0,
}


class Params(NamedTuple):
    tilde_l: jnp.ndarray  # (N,) log lengthscale process
    tilde_sigma: jnp.ndarray  # (N,) log scale process
    ul_vec: jnp.ndarray  # (T,) unconstrained task-covariance Cholesky vector
    tilde_sigma2_err: jnp.ndarray  # () log noise variance


def n_params(n: int, m: int) -> int:
    return 2 * n + transforms.tri_size(m) + 1


def unpack(vec: jnp.ndarray, n: int, m: int) -> Params:
    """Flat vector → params; layout identical to reference vec2pars (logpos.py:17-29)."""
    t = transforms.tri_size(m)
    base.check_vec(vec, 2 * n + t + 1, "snmgp",
                   f"[tilde_l({n}), tilde_sigma({n}), uL_vec({t}), "
                   "tilde_sigma2_err] for N=%d, M=%d" % (n, m))
    return Params(
        tilde_l=vec[:n],
        tilde_sigma=vec[n : 2 * n],
        ul_vec=vec[2 * n : 2 * n + t],
        tilde_sigma2_err=vec[-1],
    )


def pack(p: Params) -> jnp.ndarray:
    return jnp.concatenate(
        [p.tilde_l, p.tilde_sigma, p.ul_vec, jnp.reshape(p.tilde_sigma2_err, (1,))]
    )


def _covs(p: Params, x: jnp.ndarray, m: int):
    l_vec = transforms.ulvec_to_lvec(p.ul_vec, m)
    l_mat = transforms.vec_to_tril(l_vec, m)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(x, sigma1=sigma, ell1=ell)
    return b_f, k_x, sigma2_err


def covariances(vec: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> dict:
    """Materialize (B_f, K_x, σ²_err) from a packed vector for inspection.

    Mirrors the reference's ``show_covs`` debug printer (logpos.py:140-157)
    but returns the arrays instead of printing.
    """
    n, m = y.shape
    p = unpack(jnp.asarray(vec), n, m)
    b_f, k_x, sigma2_err = _covs(p, jnp.asarray(x), m)
    return {"B_f": b_f, "K_x": k_x, "sigma2_err": sigma2_err}


def log_lik(p: Params, data: FullData, mask=None) -> jnp.ndarray:
    """Marginal log-likelihood (unnormalized, reference convention).

    ``mask`` (N,) boolean excludes padded inputs exactly (ragged fleets).
    """
    n, m = data.y.shape
    b_f, k_x, sigma2_err = _covs(p, data.x, m)
    y = task_major(data.y)
    return dists.mvn_logpdf_kron(y, 0.0, b_f, k_x, sigma2_err, mask=mask)


def log_posterior(
    p: Params,
    data: FullData,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior: bool = True,
    prior_chol_l: jnp.ndarray | None = None,
    prior_chol_sigma: jnp.ndarray | None = None,
    mask=None,
):
    """Log joint posterior; mirrors reference ``logpos`` (logpos.py:237-296).

    Returns ``(logpos, components)`` where components is a dict with the same
    decomposition the reference prints in verbose mode.
    """
    x = data.x
    loglik = log_lik(p, data, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)

    if prior_chol_l is None:
        prior_chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_l, beta=beta_tilde_l)
        )
    if prior_chol_sigma is None:
        prior_chol_sigma = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_sigma, beta=beta_tilde_sigma)
        )
    lp_l = dists.mvn_logpdf_chol(p.tilde_l, mu_tilde_l, prior_chol_l)
    lp_sigma = dists.mvn_logpdf_chol(p.tilde_sigma, mu_tilde_sigma, prior_chol_sigma)
    lp_ul = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, c))
    lp_s2 = dists.inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)

    res = loglik
    if prior:
        # + log-Jacobian of the exp transform on tilde_sigma2_err (logpos.py:292)
        res = res + lp_l + lp_sigma + lp_ul + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_tilde_sigma": lp_sigma,
        "log_prior_uL_vec": lp_ul,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


def nlogpos(vec: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray, verbose=False, prior=True, **hyper):
    """Parity API: negative log posterior from a flat vector.

    Mirrors reference ``nlogpos_obj`` (logpos.py:216-234).
    """
    hp = {**DEFAULT_HYPERS, **hyper}
    n, m = y.shape
    p = unpack(vec, n, m)
    res, comps = log_posterior(p, FullData(x, y), prior=prior, **hp)
    if verbose:
        return (-res,) + tuple(comps.values())
    return -res


def deviance(vec: jnp.ndarray, y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Deviance ``-2 loglik`` (reference deviance/deviance_obj, logpos.py:176-213)."""
    n, m = y.shape
    p = unpack(vec, n, m)
    return -2.0 * log_lik(p, FullData(x, y))


def make_objective(data: FullData, hyper: dict | None = None, prior: bool = True):
    """Jit-friendly negative-log-posterior closure with hoisted prior factors."""
    base.check_full_data(data, "snmgp")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    n, m = data.y.shape
    pc_l = chol.prior_rbf_inv(data.x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    pc_sigma = chol.prior_rbf_inv(data.x, hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, n, m)
        res, _ = log_posterior(
            p, data, prior=prior, prior_chol_l=pc_l, prior_chol_sigma=pc_sigma, **hp
        )
        return -res

    return nlp


# ---------------------------------------------------------------------------
# Hadamard variant: one observation per (input, task) pair.
# ---------------------------------------------------------------------------


def hadamard_gram(p: Params, x: jnp.ndarray, indx: jnp.ndarray, m: int):
    """Dense N×N Gram ``K = K_x ∘ B_f[indx, indx'] + σ² I``.

    NOTE: the reference's Hadamard objectives treat the task-Cholesky vector as
    *unconstrained-free* — ``vec2lowtriangle(L_vec)`` directly with no exp on
    the diagonal (logpos.py:517) — so this uses ``p.ul_vec`` as a plain L_vec.
    """
    l_mat = transforms.vec_to_tril(p.ul_vec, m)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    k_x = kernels.nonstationary_rbf_cov(x, sigma1=sigma, ell1=ell)
    k_i = b_f[indx[:, None], indx[None, :]]
    return k_x * k_i


def log_posterior_hadamard(
    p: Params,
    data: HadamardData,
    m: int,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_tilde_sigma=0.0,
    alpha_tilde_sigma=1.0,
    beta_tilde_sigma=1.0,
    a=1.0,
    b=1.0,
    c=10.0,
    prior: bool = True,
    prior_chol_l=None,
    prior_chol_sigma=None,
    mask=None,
):
    """Mirrors reference ``logpos_hadamard`` (logpos.py:502-563).

    ``mask`` (N,) bool excludes padded observations exactly (ragged Hadamard
    cohorts; see ``models.base.mask_dense_gram``)."""
    x, indx, y = data
    n = y.shape[0]
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    if mask is None:
        cov = hadamard_gram(p, x, indx, m) + sigma2_err * jnp.eye(n, dtype=y.dtype)
    else:
        cov, y = mask_dense_gram(hadamard_gram(p, x, indx, m), sigma2_err, y, mask)
    loglik = dists.mvn_logpdf_dense_unnorm(y, 0.0, cov)

    if prior_chol_l is None:
        prior_chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_l, beta=beta_tilde_l)
        )
    if prior_chol_sigma is None:
        prior_chol_sigma = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_sigma, beta=beta_tilde_sigma)
        )
    lp_l = dists.mvn_logpdf_chol(p.tilde_l, mu_tilde_l, prior_chol_l)
    lp_sigma = dists.mvn_logpdf_chol(p.tilde_sigma, mu_tilde_sigma, prior_chol_sigma)
    lp_l_vec = jnp.sum(dists.normal_logpdf(p.ul_vec, 0.0, c))
    lp_s2 = dists.inverse_gamma_logpdf_u(sigma2_err, alpha=a, beta=b)

    res = loglik
    if prior:
        res = res + lp_l + lp_sigma + lp_l_vec + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_tilde_sigma": lp_sigma,
        "log_prior_L_vec": lp_l_vec,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


def nlogpos_hadamard(vec, x, indx, y, m: int, verbose=False, prior=True, **hyper):
    """Parity API, mirrors ``nlogpos_obj_hadamard`` (logpos.py:465-499).

    ``m`` (number of tasks) is an explicit static argument — the reference
    derives it with ``torch.unique`` (logpos.py:479) which is not
    shape-static under jit.
    """
    hp = {**DEFAULT_HYPERS, **hyper}
    n = y.shape[0]
    p = unpack(vec, n, m)
    res, comps = log_posterior_hadamard(p, HadamardData(x, indx, y), m, prior=prior, **hp)
    if verbose:
        return (-res,) + tuple(comps.values())
    return -res
