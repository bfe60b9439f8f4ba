"""GNMGP — generalized (nonseparable) nonstationary multivariate GP ("SVC").

A full covariance *process*: at every input x_n the task covariance is
``B_f(x_n) = L_n L_nᵀ``, giving the Gram

    K[(m,n), (m',n')] = K_x[n,n'] · (L_n L_{n'}ᵀ)[m,m']        (task-major)

TPU-native re-design of the reference objectives at ``Utility/logpos.py``:
``vec2pars_SVC`` (:32), ``logpos_SVC``/``nlogpos_obj_SVC`` (:299-380) and the
Hadamard variant (:566-659).

Design notes vs the reference:

* the reference assembles the Gram by concatenating N Python-level M×M blocks
  and permuting (logpos.py:339-349); here it is one einsum that XLA maps
  straight onto the MXU,
* the reference computes ``torch.inverse`` **and** ``torch.logdet`` of the
  MN×MN matrix (logpos.py:352-353, O((MN)³) twice, with reverse-mode AD
  through the inverse); here a single robust Cholesky provides logdet,
  quadratic form, and stable gradients,
* the M(M+1)/2 independent GP priors on the L-entry processes
  (logpos.py:362-365) are evaluated with one batched triangular solve against
  a single precomputed prior Cholesky.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import dists, settings
from ..ops import chol, kernels, transforms
from .base import FullData, HadamardData, mask_dense_gram, task_major

#: Reference default hyper-parameters (logpos.py:299 signature defaults).
DEFAULT_HYPERS = {
    "mu_tilde_l": 0.0,
    "alpha_tilde_l": 5.0,
    "beta_tilde_l": 1.0,
    "mu_L": 0.0,
    "alpha_L": 5.0,
    "beta_L": 1.0,
    "a": 1.0,
    "b": 1.0,
}


class Params(NamedTuple):
    tilde_l: jnp.ndarray  # (N,) log lengthscale process
    ul_vecs: jnp.ndarray  # (N*T,) unconstrained per-input Cholesky vectors
    tilde_sigma2_err: jnp.ndarray  # () log noise variance


def n_params(n: int, m: int) -> int:
    return n + n * transforms.tri_size(m) + 1


def unpack(vec: jnp.ndarray, n: int, m: int) -> Params:
    """Layout identical to reference vec2pars_SVC (logpos.py:32-43)."""
    from . import base

    t = transforms.tri_size(m)
    base.check_vec(vec, n + n * t + 1, "gnmgp",
                   f"[tilde_l({n}), uL_vecs({n}·{t}), tilde_sigma2_err] "
                   f"for N={n}, M={m}")
    return Params(
        tilde_l=vec[:n],
        ul_vecs=vec[n : n + n * t],
        tilde_sigma2_err=vec[-1],
    )


def pack(p: Params) -> jnp.ndarray:
    return jnp.concatenate(
        [p.tilde_l, p.ul_vecs, jnp.reshape(p.tilde_sigma2_err, (1,))]
    )


def chol_process(ul_vecs: jnp.ndarray, n: int, m: int) -> jnp.ndarray:
    """(N*T,) unconstrained vectors → (N, M, M) lower-triangular factors."""
    t = transforms.tri_size(m)
    l_vecs = transforms.ulvec_to_lvec(ul_vecs.reshape(n, t), m)
    return transforms.vec_to_tril(l_vecs, m)


def gram(
    k_x: jnp.ndarray, ls: jnp.ndarray
) -> jnp.ndarray:
    """Assemble the task-major MN×MN Gram from K_x (N,N) and L-process (N,M,M).

    Replaces the reference's block-concatenate + permutation
    (logpos.py:345-349): ``K[(a,n),(c,p)] = K_x[n,p] · (L_n L_pᵀ)[a,c]``.

    The tiny-K task contraction ``b4[n,a,p,c] = Σ_b L[n,a,b]·L[p,c,b]`` is
    built per dtype (all figures measured on TPU v5e, N=1000, M=2, full
    objective gradient):

    * **f64 / mixed** — m fused rank-1 broadcast terms: pure elementwise, no
      emulated-f64 matmul.  Exact, and it lifted the mixed-mode gradient rate
      16.4 → 26.8 evals/s.
    * **f32 (default)** — the plain einsum: XLA's default (bf16-pass) matmul
      lowering is the fastest gradient path (302 vs 278 evals/s for the exact
      broadcast form) at the cost of ~5e-3 relative Gram error — acceptable
      for the speed tier (parity lives in mixed/f64).  Set
      ``NMGP_GRAM_EXACT=1`` to use the exact broadcast form in f32 too.
      (einsum with precision=HIGHEST is also exact but slower on the
      gradient: 274 evals/s.)
    """
    n, m, _ = ls.shape
    if ls.dtype == jnp.float32 and not settings.gram_exact:
        b4 = jnp.einsum("nab,pcb->napc", ls, ls)
    else:
        b4 = ls[:, :, 0][:, :, None, None] * ls[:, :, 0][None, None, :, :]
        for b in range(1, m):
            b4 = b4 + (
                ls[:, :, b][:, :, None, None] * ls[:, :, b][None, None, :, :]
            )
    k4 = jnp.einsum("np,napc->ancp", k_x, b4)  # (M,N,M,N) task-major
    return k4.reshape(n * m, n * m)


def log_lik(p: Params, data: FullData, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Marginal log-likelihood; optional input mask for padded subjects.

    ``mask``: (N,) boolean, True for real observations.  Masked entries are
    projected out of the Gram (rows/cols zeroed, unit diagonal, zero
    observation) so they contribute exactly nothing to logdet or the quadratic
    form — the shape-static analogue of fitting only the real prefix.
    """
    n, m = data.y.shape
    ls = chol_process(p.ul_vecs, n, m)
    ell = jnp.exp(p.tilde_l)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(data.x, ell1=ell)
    cov = gram(k_x, ls)
    y = task_major(data.y)
    if mask is None:
        cov = cov + sigma2_err * jnp.eye(n * m, dtype=data.y.dtype)
    else:
        mv = jnp.tile(jnp.asarray(mask, data.y.dtype), m)  # task-major (N*M,)
        cov = cov * (mv[:, None] * mv[None, :])
        diag = jnp.where(mv > 0, sigma2_err, 1.0)
        cov = cov + jnp.diag(diag)
        y = y * mv
    return dists.mvn_logpdf_dense_unnorm(y, 0.0, cov)


def _l_process_prior(ul_mat: jnp.ndarray, mu_L, prior_chol: jnp.ndarray):
    """Sum of T independent GP log-priors over the columns of (N, T) ul_mat.

    Matches logpos.py:362-365 — one normalized MVN log-pdf per L-entry process,
    batched via a single triangular solve with T right-hand sides.
    """
    return jnp.sum(
        jax.vmap(lambda col: dists.mvn_logpdf_chol(col, mu_L, prior_chol))(ul_mat.T)
    )


def log_posterior(
    p: Params,
    data: FullData,
    mu_tilde_l=0.0,
    alpha_tilde_l=5.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=5.0,
    beta_L=1.0,
    a=1.0,
    b=1.0,
    prior: bool = True,
    prior_chol_l=None,
    prior_chol_L=None,
    mask=None,
):
    """Mirrors reference ``logpos_SVC`` (logpos.py:326-380).

    With ``mask``, padded observations are excluded from the likelihood (see
    :func:`log_lik`); the GP priors still extend over the padded latent slots,
    which regularizes them toward the prior without influencing the fit of the
    real data.
    """
    x = data.x
    n, m = data.y.shape
    t = transforms.tri_size(m)
    loglik = log_lik(p, data, mask=mask)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)

    if prior_chol_l is None:
        prior_chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_l, beta=beta_tilde_l)
        )
    if prior_chol_L is None:
        prior_chol_L = chol.safe_cholesky(kernels.rbf_cov(x, alpha=alpha_L, beta=beta_L))

    lp_l = dists.mvn_logpdf_chol(p.tilde_l, mu_tilde_l, prior_chol_l)
    lp_uL = _l_process_prior(p.ul_vecs.reshape(n, t), mu_L, prior_chol_L)
    lp_s2 = dists.inverse_gamma_logpdf(sigma2_err, alpha=a, beta=b)

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


def nlogpos(vec, y, x, verbose=False, prior=True, **hyper):
    """Parity API, mirrors ``nlogpos_obj_SVC`` (logpos.py:299-323)."""
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
    """Jit-friendly negative-log-posterior closure with hoisted prior factors."""
    from . import base

    base.check_full_data(data, "gnmgp")
    hp = {**DEFAULT_HYPERS, **(hyper or {})}
    n, m = data.y.shape
    pc_l = chol.prior_rbf_inv(data.x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    pc_L = chol.prior_rbf_inv(data.x, hp["alpha_L"], hp["beta_L"])

    def nlp(vec: jnp.ndarray) -> jnp.ndarray:
        p = unpack(vec, n, m)
        res, _ = log_posterior(
            p, data, prior=prior, prior_chol_l=pc_l, prior_chol_L=pc_L, mask=mask, **hp
        )
        return -res

    return nlp


# ---------------------------------------------------------------------------
# Hadamard variant.
# ---------------------------------------------------------------------------


def hadamard_gram(l_vecs_mat: jnp.ndarray, indx: jnp.ndarray, k_x: jnp.ndarray, m: int):
    """N×N Gram ``K = K_x ∘ K_i`` with ``K_i[i,j] = ⟨L_i[indx_i,:], L_j[indx_j,:]⟩``.

    Matches ``generate_K_index_SVC_hadamard0`` (logpos.py:121-124) without the
    per-row Python loop: gather each observation's task row, one matmul.
    """
    ls = transforms.vec_to_tril(l_vecs_mat, m)  # (N, M, M)
    rows = ls[jnp.arange(ls.shape[0]), indx, :]  # (N, M)
    return k_x * jax.lax.dot(rows, rows.T, precision=jax.lax.Precision.HIGHEST)


def log_posterior_hadamard(
    p: Params,
    data: HadamardData,
    m: int,
    mu_tilde_l=0.0,
    alpha_tilde_l=1.0,
    beta_tilde_l=1.0,
    mu_L=0.0,
    alpha_L=1.0,
    beta_L=1.0,
    a=1.0,
    b=1.0,
    prior: bool = True,
    prior_chol_l=None,
    prior_chol_L=None,
    mask=None,
):
    """Mirrors reference ``logpos_hadamard_SVC`` (logpos.py:588-659).

    NOTE: in the reference's Hadamard SVC the per-input Cholesky vectors are
    used *directly* (no exp transform on diagonals, logpos.py:603-604) and the
    GP prior applies to these raw L_vecs (:643); ``p.ul_vecs`` therefore holds
    plain L_vecs here.
    """
    x, indx, y = data
    n = y.shape[0]
    t = transforms.tri_size(m)
    ell = jnp.exp(p.tilde_l)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(x, ell1=ell)
    gram_h = hadamard_gram(p.ul_vecs.reshape(n, t), indx, k_x, m)
    if mask is None:
        cov = gram_h + sigma2_err * jnp.eye(n, dtype=y.dtype)
    else:
        cov, y = mask_dense_gram(gram_h, sigma2_err, y, mask)
    loglik = dists.mvn_logpdf_dense_unnorm(y, 0.0, cov)

    if prior_chol_l is None:
        prior_chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=alpha_tilde_l, beta=beta_tilde_l)
        )
    if prior_chol_L is None:
        prior_chol_L = chol.safe_cholesky(kernels.rbf_cov(x, alpha=alpha_L, beta=beta_L))
    lp_l = dists.mvn_logpdf_chol(p.tilde_l, mu_tilde_l, prior_chol_l)
    lp_L = _l_process_prior(p.ul_vecs.reshape(n, t), mu_L, prior_chol_L)
    lp_s2 = dists.inverse_gamma_logpdf_u(sigma2_err, alpha=a, beta=b)

    res = loglik
    if prior:
        res = res + lp_l + lp_L + lp_s2 + p.tilde_sigma2_err
    comps = {
        "loglik": loglik,
        "log_prior_tilde_l": lp_l,
        "log_prior_L_vecs": lp_L,
        "log_prior_sigma2_err": lp_s2,
    }
    return res, comps


def nlogpos_hadamard(vec, x, indx, y, m: int, verbose=False, prior=True, **hyper):
    """Parity API, mirrors ``nlogpos_obj_hadamard_SVC`` (logpos.py:566-585)."""
    hp = {"mu_tilde_l": 0.0, "alpha_tilde_l": 1.0, "beta_tilde_l": 1.0,
          "mu_L": 0.0, "alpha_L": 1.0, "beta_L": 1.0, "a": 1.0, "b": 1.0, **hyper}
    n = y.shape[0]
    p = unpack(vec, n, m)
    res, comps = log_posterior_hadamard(p, HadamardData(x, indx, y), m, prior=prior, **hp)
    if verbose:
        return (-res,) + tuple(comps.values())
    return -res
