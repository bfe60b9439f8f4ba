"""Posterior prediction for Hadamard-layout data (one observation per
(input, task) pair), for all three model families.

TPU-native re-design of the Hadamard blocks of ``Utility/prediction.py``:
LMC ``point/pointwise/indexedpoint/test_predmap_S_hadamard`` (:1695-1792),
GNMGP ``point_predmap_SVC_hadamard`` (:1401-1563), SNMGP Hadamard sampling
(:461-910).  The reference refactorizes the dense N×N Gram per grid point;
here it is one robust Cholesky, with every (grid point × task) pair served by
a single batched triangular solve.

All routines return per-task predictions on the grid: mean/σ for y(x*, task a)
for every task a, in the shapes the reference uses ((G, 3, M) percentile
stacks, or (mean, std) vectors for indexed test points).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import chol as chol_ops
from ..ops import kernels, transforms
from ..models import gnmgp as gnmgp_model
from ..models import lmc as lmc_model
from ..models import snmgp as snmgp_model
from ..models.base import HadamardData
from .latent import krige_rbf
from .snmgp import GridPrediction


def _percentiles(mu, s2):
    sd = jnp.sqrt(s2)
    return GridPrediction(
        percentiles=jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1),
        mean=mu,
        std=sd,
    )


def _solve_moments(r, beta, k_cross_full, self_var, sigma2_err):
    """Shared dense-path moments.

    ``k_cross_full``: (N, G, M) cross covariance for every (grid, task) pair,
    ``self_var``: (G, M) prior variance of f(x*, a), ``beta`` = Σ⁻¹y.
    """
    n, g, m = k_cross_full.shape
    mu = jnp.einsum("nga,n->ga", k_cross_full, beta)
    s = jax.scipy.linalg.solve_triangular(
        r, k_cross_full.reshape(n, g * m), lower=True
    )
    d = jnp.sum(s * s, axis=0).reshape(g, m)
    sigma2_y = self_var - d + sigma2_err
    # noise-variance floor (see predict/snmgp._moments)
    return mu, jnp.maximum(sigma2_y, sigma2_err)


# ---------------------------------------------------------------------------
# LMC (stationary) Hadamard
# ---------------------------------------------------------------------------


def _lmc_setup(vec, data: HadamardData, m: int):
    p = lmc_model.unpack(jnp.asarray(vec), m)
    x, indx, y = data
    n = y.shape[0]
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (logpos.py:679)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.rbf_cov(x, alpha=sigma, beta=ell)
    cov = k_x * b_f[indx[:, None], indx[None, :]] + sigma2_err * jnp.eye(n, dtype=y.dtype)
    r = chol_ops.safe_cholesky(cov)
    beta = chol_ops.chol_solve(r, y)
    return p, b_f, ell, sigma, sigma2_err, r, beta


def lmc_predict_map(vec, data: HadamardData, grid, m: int) -> GridPrediction:
    """point/pointwise_predmap_S_hadamard (prediction.py:1695-1740)."""
    p, b_f, ell, sigma, sigma2_err, r, beta = _lmc_setup(vec, data, m)
    grid = jnp.asarray(grid, data.x.dtype)
    k_cross = kernels.rbf_cov(data.x, grid, alpha=sigma, beta=ell)  # (N, G)
    cv = b_f[data.indx, :]  # (N, M)
    k_full = k_cross[:, :, None] * cv[:, None, :]  # (N, G, M)
    # prior self term: kron(B_f, RBF self at one point) includes the nugget
    # (prediction.py:1719)
    self_var = (sigma**2 + settings.jitter) * jnp.diag(b_f)[None, :]
    self_var = jnp.broadcast_to(self_var, (grid.shape[0], m))
    mu, s2 = _solve_moments(r, beta, k_full, self_var, sigma2_err)
    return _percentiles(mu, s2)


def lmc_predict_test(vec, data: HadamardData, x_test, indx_test, m: int):
    """indexedpoint/test_predmap_S_hadamard (prediction.py:1742-1792): per-test
    (x*, task*) posterior mean and std."""
    pred = lmc_predict_map(vec, data, x_test, m)
    idx = jnp.asarray(indx_test)
    g = jnp.arange(idx.shape[0])
    return pred.mean[g, idx], pred.std[g, idx]


# ---------------------------------------------------------------------------
# SNMGP (separable nonstationary) Hadamard
# ---------------------------------------------------------------------------


def _snmgp_setup(vec, data: HadamardData, m: int):
    x, indx, y = data
    n = y.shape[0]
    p = snmgp_model.unpack(jnp.asarray(vec), n, m)
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (logpos.py:517)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(x, sigma1=sigma, ell1=ell)
    cov = k_x * b_f[indx[:, None], indx[None, :]] + sigma2_err * jnp.eye(n, dtype=y.dtype)
    r = chol_ops.safe_cholesky(cov)
    beta = chol_ops.chol_solve(r, y)
    return p, b_f, ell, sigma, sigma2_err, r, beta


def snmgp_predict_map(vec, data: HadamardData, grid, m: int, hyper=None) -> GridPrediction:
    """MAP prediction with kriged latent processes (prediction.py:710-809 analog)."""
    hp = {**snmgp_model.DEFAULT_HYPERS, **(hyper or {})}
    p, b_f, ell, sigma, sigma2_err, r, beta = _snmgp_setup(vec, data, m)
    grid = jnp.asarray(grid, data.x.dtype)
    cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
    cond_s = krige_rbf(data.x, grid, p.tilde_sigma, hp["mu_tilde_sigma"], hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
    l_star = jnp.exp(cond_l.mean)
    sigma_star = jnp.exp(cond_s.mean)
    k_cross = kernels.nonstationary_rbf_cov(
        data.x, sigma1=sigma, ell1=ell, x2=grid, sigma2=sigma_star, ell2=l_star
    )
    cv = b_f[data.indx, :]
    k_full = k_cross[:, :, None] * cv[:, None, :]
    self_var = (sigma_star**2 + settings.jitter)[:, None] * jnp.diag(b_f)[None, :]
    mu, s2 = _solve_moments(r, beta, k_full, self_var, sigma2_err)
    return _percentiles(mu, s2)


def snmgp_predict_test(vec, data: HadamardData, x_test, indx_test, m: int, hyper=None):
    pred = snmgp_predict_map(vec, data, x_test, m, hyper)
    idx = jnp.asarray(indx_test)
    g = jnp.arange(idx.shape[0])
    return pred.mean[g, idx], pred.std[g, idx]


def snmgp_predict_sample(
    key, hist_vecs, data: HadamardData, grid, m: int, hyper=None, n_sample=None
):
    """Posterior-sample prediction over a chain (point_predsample_hadamard,
    prediction.py:461-583).  Returns (G, S, M) y-draws."""
    hp = {**snmgp_model.DEFAULT_HYPERS, **(hyper or {})}
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    def draw(vec, k):
        p, b_f, ell, sigma, sigma2_err, r, beta = _snmgp_setup(vec, data, m)
        cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
        cond_s = krige_rbf(data.x, grid, p.tilde_sigma, hp["mu_tilde_sigma"], hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
        k_l, k_s, k_y = jax.random.split(k, 3)
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        ts = cond_s.mean + jnp.sqrt(cond_s.var) * jax.random.normal(k_s, (g,), grid.dtype)
        k_cross = kernels.nonstationary_rbf_cov(
            data.x, sigma1=sigma, ell1=ell, x2=grid, sigma2=jnp.exp(ts), ell2=jnp.exp(tl)
        )
        cv = b_f[data.indx, :]
        k_full = k_cross[:, :, None] * cv[:, None, :]
        self_var = (jnp.exp(ts) ** 2 + settings.jitter)[:, None] * jnp.diag(b_f)[None, :]
        mu, s2 = _solve_moments(r, beta, k_full, self_var, sigma2_err)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)
    return jnp.moveaxis(ys, 0, 1)


# ---------------------------------------------------------------------------
# GNMGP (SVC) Hadamard
# ---------------------------------------------------------------------------


def _svc_setup(vec, data: HadamardData, m: int):
    x, indx, y = data
    n = y.shape[0]
    t = transforms.tri_size(m)
    p = gnmgp_model.unpack(jnp.asarray(vec), n, m)
    # Hadamard SVC uses raw (constrained) L_vecs (logpos.py:603-604)
    ls = transforms.vec_to_tril(p.ul_vecs.reshape(n, t), m)  # (N, M, M)
    rows = ls[jnp.arange(n), indx, :]  # (N, M)
    ell = jnp.exp(p.tilde_l)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(x, ell1=ell)
    cov = k_x * (rows @ rows.T) + sigma2_err * jnp.eye(n, dtype=y.dtype)
    r = chol_ops.safe_cholesky(cov)
    beta = chol_ops.chol_solve(r, y)
    return p, ls, rows, ell, sigma2_err, r, beta


def svc_predict_map(vec, data: HadamardData, grid, m: int, hyper=None) -> GridPrediction:
    """point_predmap_SVC_hadamard (prediction.py:1401-1478)."""
    hp = {**gnmgp_model.DEFAULT_HYPERS, **(hyper or {})}
    n = data.y.shape[0]
    t = transforms.tri_size(m)
    p, ls, rows, ell, sigma2_err, r, beta = _svc_setup(vec, data, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
    # krige the raw L-entry processes (prior applies to them directly)
    l_mat = p.ul_vecs.reshape(n, t).T  # (T, N)
    cond_lv = krige_rbf(data.x, grid, l_mat, hp["mu_L"], hp["alpha_L"], hp["beta_L"])
    ls_star = transforms.vec_to_tril(cond_lv.mean.T, m)  # (G, M, M)
    l_star = jnp.exp(cond_l.mean)
    ones_n = jnp.ones((n,), grid.dtype)
    ones_g = jnp.ones((g,), grid.dtype)
    k_cross = kernels.nonstationary_rbf_cov(
        data.x, sigma1=ones_n, ell1=ell, x2=grid, sigma2=ones_g, ell2=l_star
    )
    # cross term ⟨L_n[indx_n,:], L*_g[a,:]⟩
    k_full = jnp.einsum("ng,nb,gab->nga", k_cross, rows, ls_star)
    self_var = (1.0 + settings.jitter) * jnp.sum(ls_star**2, axis=-1)  # (G, M)
    mu, s2 = _solve_moments(r, beta, k_full, self_var, sigma2_err)
    return _percentiles(mu, s2)


def svc_predict_test(vec, data: HadamardData, x_test, indx_test, m: int, hyper=None):
    pred = svc_predict_map(vec, data, x_test, m, hyper)
    idx = jnp.asarray(indx_test)
    g = jnp.arange(idx.shape[0])
    return pred.mean[g, idx], pred.std[g, idx]


def svc_predict_sample(
    key, hist_vecs, data: HadamardData, grid, m: int, hyper=None, n_sample=None
):
    """Posterior-sample Hadamard-SVC prediction over a chain.

    Completes the reference surface around ``point_predmap_SVC_hadamard``
    (prediction.py:1401-1563) with a chain-sampling path: per draw, sample the
    pointwise latents (ℓ(x*), L-entry processes) at the grid and one y* draw.
    Returns (G, S, M).
    """
    hp = {**gnmgp_model.DEFAULT_HYPERS, **(hyper or {})}
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    n = data.y.shape[0]
    t = transforms.tri_size(m)

    def draw(vec, k):
        p, ls, rows, ell, sigma2_err, r, beta = _svc_setup(vec, data, m)
        cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
        l_mat = p.ul_vecs.reshape(n, t).T
        cond_lv = krige_rbf(data.x, grid, l_mat, hp["mu_L"], hp["alpha_L"], hp["beta_L"])
        k_l, k_lv, k_y = jax.random.split(k, 3)
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        z = jax.random.normal(k_lv, cond_lv.mean.shape, grid.dtype)
        lv_star = (cond_lv.mean + jnp.sqrt(cond_lv.var)[None, :] * z).T  # (G, T)
        ls_star = transforms.vec_to_tril(lv_star, m)
        ones_n = jnp.ones((n,), grid.dtype)
        ones_g = jnp.ones((g,), grid.dtype)
        k_cross = kernels.nonstationary_rbf_cov(
            data.x, sigma1=ones_n, ell1=ell, x2=grid, sigma2=ones_g, ell2=jnp.exp(tl)
        )
        k_full = jnp.einsum("ng,nb,gab->nga", k_cross, rows, ls_star)
        self_var = (1.0 + settings.jitter) * jnp.sum(ls_star**2, axis=-1)
        mu, s2 = _solve_moments(r, beta, k_full, self_var, sigma2_err)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)
    return jnp.moveaxis(ys, 0, 1)


# ---------------------------------------------------------------------------
# Indexed (x*, task*) chain-sample prediction — the KAISER scoring path.
# ---------------------------------------------------------------------------


def _select_indexed(ys, indx_test):
    """(G, S, M) grid-draws → (G, S) draws at each point's own task index."""
    idx = jnp.asarray(indx_test)
    return jnp.take_along_axis(ys, idx[:, None, None], axis=2)[:, :, 0]


def snmgp_predict_test_sample(
    key, hist_vecs, data: HadamardData, x_test, indx_test, m: int,
    hyper=None, n_sample=None,
):
    """Posterior-draw predictions at indexed (x*, task*) test pairs over a
    chain — ``indexedpoint_predsample_hadamard``/``test_predsample_hadamard``
    (prediction.py:585-708).  Returns (G_test, S) y-draws.

    The reference loops test points and chain draws in Python, re-sampling
    the latent conditionals per point (independent normals per point, their
    marginal variances only — prediction.py:600-625); sampling all points
    jointly with independent per-point normals has identical marginals, so
    this is one vmapped pass per chain draw.
    """
    ys = snmgp_predict_sample(key, hist_vecs, data, x_test, m, hyper, n_sample)
    return _select_indexed(ys, indx_test)


def svc_predict_test_sample(
    key, hist_vecs, data: HadamardData, x_test, indx_test, m: int,
    hyper=None, n_sample=None,
):
    """GNMGP-Hadamard analogue of :func:`snmgp_predict_test_sample`
    (completes the surface around prediction.py:1480-1563).  (G_test, S)."""
    ys = svc_predict_sample(key, hist_vecs, data, x_test, m, hyper, n_sample)
    return _select_indexed(ys, indx_test)


def lmc_predict_sample(
    key, hist_vecs, data: HadamardData, grid, m: int, n_sample=None
):
    """Chain-sample Hadamard-LMC prediction, (G, S, M) draws.

    The reference ships only MAP prediction for Hadamard-LMC
    (prediction.py:1695-1792); this extends the family so all three models
    expose the same sample-based scoring surface.
    """
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)

    def draw(vec, k):
        p, b_f, ell, sigma, sigma2_err, r, beta = _lmc_setup(vec, data, m)
        k_cross = kernels.rbf_cov(data.x, grid, alpha=sigma, beta=ell)
        cv = b_f[data.indx, :]
        k_full = k_cross[:, :, None] * cv[:, None, :]
        self_var = (sigma**2 + settings.jitter) * jnp.diag(b_f)[None, :]
        self_var = jnp.broadcast_to(self_var, (grid.shape[0], m))
        mu, s2 = _solve_moments(r, beta, k_full, self_var, sigma2_err)
        return mu + jnp.sqrt(s2) * jax.random.normal(k, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)
    return jnp.moveaxis(ys, 0, 1)


def lmc_predict_test_sample(
    key, hist_vecs, data: HadamardData, x_test, indx_test, m: int, n_sample=None
):
    """(G_test, S) indexed chain-sample draws for Hadamard-LMC."""
    ys = lmc_predict_sample(key, hist_vecs, data, x_test, m, n_sample)
    return _select_indexed(ys, indx_test)
