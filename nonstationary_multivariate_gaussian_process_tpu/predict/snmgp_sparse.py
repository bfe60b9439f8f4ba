"""Posterior-predictive machinery for the sparse (inducing-point) SNMGP.

Same SGPR predictive algebra as the GNMGP sparse tier
(``predict/gnmgp_sparse.py``): with ``A = C^{-1} K_mn Lambda^{-1/2}`` and
``L_in = chol(I + A A^T)`` from the likelihood's Woodbury factor set,

    mu*  = t*^T L_in^{-T} L_in^{-1} (A d),     t* = C^{-1} K_m*
    var* = K**_diag - diag(t*^T t*) + diag(w*^T w*),  w* = L_in^{-1} t*

so a grid of G points costs one (m_z M x G M) triangular solve pair.  The
separable cross-Gram is a literal Kronecker, ``K_*m = B_f ⊗ K_x(*, Z)``; the
latent (log-lengthscale / log-scale) processes at new inputs are kriged from
their inducing values under the exact model's RBF priors, exactly as the
dense tier kriges them from the data (``predict/snmgp.py``, reference
``Utility/prediction.py:337-458``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import chol as chol_ops
from ..ops import kernels, transforms
from ..models import snmgp_sparse as model
from ..models.base import FullData
from ..models.snmgp import DEFAULT_HYPERS
from .latent import krige_proj
from .snmgp import GridPrediction


def _hp(hyper):
    return {**DEFAULT_HYPERS, **(hyper or {})}


def star_moments(w, k_gm: jnp.ndarray, k_star_diag: jnp.ndarray):
    """Shared SGPR predictive solves from a Woodbury factor set.

    ``k_gm`` rows share one flat prediction axis (task-major GM here, G for
    an indexed layout); returns flat ``(mu, var_f)`` on that axis.
    """
    t_star = chol_ops.tri_solve(w.c_mm, k_gm.T)
    w_star = chol_ops.tri_solve(w.c_in, t_star)
    v = chol_ops.tri_solve(w.c_in, w.a @ w.d)
    mu = w_star.T @ v
    var = (k_star_diag - jnp.sum(t_star * t_star, axis=0)
           + jnp.sum(w_star * w_star, axis=0))
    return mu, var


def _moments(vec, data: FullData, ops: model.SparseOps, grid, hyper=None,
             approx: str = "fitc", mask=None, latents_star=None):
    """Predictive mean/variance at ``grid``: ``(mu (G,M), s2_y (G,M))``.

    ``latents_star=(tilde_l*, tilde_sigma*)`` overrides the kriged conditional
    means (used by :func:`predict_sample` to inject sampled latents).
    """
    hp = _hp(hyper)
    n, m = data.y.shape
    m_z = ops.z.shape[0]
    p = model.unpack(jnp.asarray(vec), m_z, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    if latents_star is None:
        proj_l, _ = krige_proj(ops.z, grid, hp["alpha_tilde_l"],
                               hp["beta_tilde_l"])
        proj_s, _ = krige_proj(ops.z, grid, hp["alpha_tilde_sigma"],
                               hp["beta_tilde_sigma"])
        tl_g = hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
        ts_g = (hp["mu_tilde_sigma"]
                + (p.tilde_sigma_z - hp["mu_tilde_sigma"]) @ proj_s)
    else:
        tl_g, ts_g = latents_star

    w = model._woodbury(p, data, ops, m, approx, hp, mask)
    l_mat = transforms.vec_to_tril(transforms.ulvec_to_lvec(p.ul_vec, m), m)
    b_f = l_mat @ l_mat.T
    k_gz = kernels.nonstationary_rbf_cov(
        grid, sigma1=jnp.exp(ts_g), ell1=jnp.exp(tl_g),
        x2=ops.z, sigma2=jnp.exp(p.tilde_sigma_z), ell2=jnp.exp(p.tilde_l_z))
    k_gm = jnp.kron(b_f, k_gz)  # (GM, m_z M), rows task-major
    k_x_diag = jnp.exp(2.0 * ts_g) + settings.jitter
    k_star_diag = (jnp.diag(b_f)[:, None] * k_x_diag[None, :]).reshape(-1)

    mu_flat, var_flat = star_moments(w, k_gm, k_star_diag)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    mu = mu_flat.reshape(m, g).T  # (G, M) from task-major flat
    s2_y = var_flat.reshape(m, g).T + sigma2_err
    s2_y = jnp.maximum(s2_y, sigma2_err)  # noise floor (see predict/snmgp)
    return mu, s2_y


def predict_map(vec, data: FullData, ops: model.SparseOps, grid,
                hyper=None, approx: str = "fitc",
                mask=None) -> GridPrediction:
    """Plug-in MAP grid prediction — the sparse analogue of
    ``predict.snmgp.predict_map`` (reference point/pointwise/test_predmap)."""
    mu, s2 = _moments(vec, data, ops, grid, hyper, approx, mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPrediction(percentiles=pct, mean=mu, std=sd)


def predict_test(vec, data: FullData, ops: model.SparseOps, x_test,
                 hyper=None, approx: str = "fitc", mask=None):
    """Held-out predictive ``(mean (G,M), var (G,M))`` for RMSE/LPD scoring."""
    return _moments(vec, data, ops, x_test, hyper, approx, mask)


def _moments_hadamard(vec, data, ops: model.SparseOps, m: int, grid,
                      indx_grid=None, hyper=None, approx: str = "fitc",
                      mask=None):
    """Sparse Hadamard predictive moments (raw-L_vec conventions).

    ``indx_grid=None`` → per-task moments at every grid point ((G, M) each);
    with task indices → per-observation moments ((G,) each) for test scoring.
    """
    hp = _hp(hyper)
    m_z = ops.z.shape[0]
    p = model.unpack(jnp.asarray(vec), m_z, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    proj_l, _ = krige_proj(ops.z, grid, hp["alpha_tilde_l"],
                           hp["beta_tilde_l"])
    proj_s, _ = krige_proj(ops.z, grid, hp["alpha_tilde_sigma"],
                           hp["beta_tilde_sigma"])
    tl_g = hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
    ts_g = (hp["mu_tilde_sigma"]
            + (p.tilde_sigma_z - hp["mu_tilde_sigma"]) @ proj_s)

    w = model._woodbury_hadamard(p, data, ops, m, approx, hp, mask)
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (Hadamard)
    b_f = l_mat @ l_mat.T
    k_gz = kernels.nonstationary_rbf_cov(
        grid, sigma1=jnp.exp(ts_g), ell1=jnp.exp(tl_g),
        x2=ops.z, sigma2=jnp.exp(p.tilde_sigma_z), ell2=jnp.exp(p.tilde_l_z))
    k_self = jnp.exp(2.0 * ts_g) + settings.jitter
    if indx_grid is None:
        k_gm = jnp.kron(b_f, k_gz)  # (GM, m_z M), rows task-major
        k_star_diag = (jnp.diag(b_f)[:, None] * k_self[None, :]).reshape(-1)
    else:
        ix = jnp.asarray(indx_grid, jnp.int32)
        b_rows = b_f[ix]  # (G, M)
        k_gm = (k_gz[:, None, :] * b_rows[:, :, None]).reshape(g, -1)
        k_star_diag = b_f[ix, ix] * k_self

    mu_flat, var_flat = star_moments(w, k_gm, k_star_diag)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    if indx_grid is None:
        mu = mu_flat.reshape(m, g).T
        s2 = var_flat.reshape(m, g).T + sigma2_err
    else:
        mu, s2 = mu_flat, var_flat + sigma2_err
    return mu, jnp.maximum(s2, sigma2_err)


def predict_map_hadamard(vec, data, ops: model.SparseOps, m: int, grid,
                         hyper=None, approx: str = "fitc", mask=None):
    """Plug-in MAP grid prediction, all tasks (sparse Hadamard analogue of
    ``predict.hadamard.snmgp_predict_map``)."""
    mu, s2 = _moments_hadamard(vec, data, ops, m, grid, None, hyper, approx,
                               mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPrediction(percentiles=pct, mean=mu, std=sd)


def predict_test_hadamard(vec, data, ops: model.SparseOps, m: int, x_test,
                          indx_test, hyper=None, approx: str = "fitc",
                          mask=None):
    """Held-out per-observation ``(mean (G,), var (G,))`` for RMSE/LPD."""
    return _moments_hadamard(vec, data, ops, m, x_test, indx_test, hyper,
                             approx, mask)


def predict_test_hadamard_sample(key, hist_vecs, data, ops: model.SparseOps,
                                 m: int, x_test, indx_test, hyper=None,
                                 approx: str = "fitc", mask=None,
                                 n_sample: int | None = None):
    """(G_test, S) indexed chain-sample draws — the sample-based scoring
    path (``predict.hadamard.snmgp_predict_test_sample`` analogue): per
    posterior draw, one y* draw from the indexed predictive."""
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]

    def draw(vec, k):
        mu, s2 = _moments_hadamard(vec, data, ops, m, x_test, indx_test,
                                   hyper, approx, mask)
        return mu + jnp.sqrt(s2) * jax.random.normal(k, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G)
    return ys.T  # (G, S)


def predict_sample(key, hist_vecs, data: FullData, ops: model.SparseOps,
                   grid, hyper=None, approx: str = "fitc", mask=None,
                   n_sample: int | None = None) -> jnp.ndarray:
    """Chain-sample prediction: (G, S, M) y-draws (sparse analogue of
    ``predict.snmgp.predict_sample``).  Per draw the latent fields are
    sampled at the grid from their kriging conditionals at Z."""
    hp = _hp(hyper)
    n, m = data.y.shape
    m_z = ops.z.shape[0]
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    proj_l, var_l = krige_proj(ops.z, grid, hp["alpha_tilde_l"],
                               hp["beta_tilde_l"])
    proj_s, var_s = krige_proj(ops.z, grid, hp["alpha_tilde_sigma"],
                               hp["beta_tilde_sigma"])

    def draw(vec, k):
        p = model.unpack(vec, m_z, m)
        k_l, k_s, k_y = jax.random.split(k, 3)
        tl = (hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
              + jnp.sqrt(var_l) * jax.random.normal(k_l, (g,), grid.dtype))
        ts = (hp["mu_tilde_sigma"]
              + (p.tilde_sigma_z - hp["mu_tilde_sigma"]) @ proj_s
              + jnp.sqrt(var_s) * jax.random.normal(k_s, (g,), grid.dtype))
        mu, s2 = _moments(vec, data, ops, grid, hp, approx, mask,
                          latents_star=(tl, ts))
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G, M)
    return jnp.moveaxis(ys, 0, 1)  # (G, S, M)
