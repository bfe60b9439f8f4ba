"""Posterior-predictive machinery for the sparse (inducing-point) LMC.

The stationary special case of ``predict/snmgp_sparse.py``: no latent
processes to krige — the cross-Gram at new inputs is the literal Kronecker
``B_f ⊗ K_x(*, Z)`` at the scalar (sigma, ell), and the SGPR predictive
solves are shared (:func:`predict.snmgp_sparse.star_moments`).  Dense-tier
counterpart: ``predict/lmc.py`` (reference ``Utility/prediction.py``'s
stationary predmap paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import kernels, transforms
from ..models import lmc_sparse as model
from ..models.base import FullData
from .snmgp import GridPrediction
from .snmgp_sparse import star_moments


def _moments(vec, data: FullData, ops: model.SparseOps, grid,
             approx: str = "fitc", mask=None):
    """Predictive mean/variance at ``grid``: ``(mu (G,M), s2_y (G,M))``."""
    n, m = data.y.shape
    m_z = ops.z.shape[0]
    p = model.unpack(jnp.asarray(vec), m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    w = model._woodbury(p, data, ops, m, approx, mask)
    l_mat = transforms.vec_to_tril(transforms.ulvec_to_lvec(p.ul_vec, m), m)
    b_f = l_mat @ l_mat.T
    ell_g = jnp.exp(p.tilde_l) * jnp.ones((g,), grid.dtype)
    sig_g = jnp.exp(p.tilde_sigma) * jnp.ones((g,), grid.dtype)
    ell_z = jnp.exp(p.tilde_l) * jnp.ones((m_z,), grid.dtype)
    sig_z = jnp.exp(p.tilde_sigma) * jnp.ones((m_z,), grid.dtype)
    k_gz = kernels.nonstationary_rbf_cov(grid, sigma1=sig_g, ell1=ell_g,
                                         x2=ops.z, sigma2=sig_z, ell2=ell_z)
    k_gm = jnp.kron(b_f, k_gz)
    k_x_diag = sig_g * sig_g + settings.jitter
    k_star_diag = (jnp.diag(b_f)[:, None] * k_x_diag[None, :]).reshape(-1)

    mu_flat, var_flat = star_moments(w, k_gm, k_star_diag)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    mu = mu_flat.reshape(m, g).T
    s2_y = var_flat.reshape(m, g).T + sigma2_err
    return mu, jnp.maximum(s2_y, sigma2_err)


def predict_map(vec, data: FullData, ops: model.SparseOps, grid,
                hyper=None, approx: str = "fitc",
                mask=None) -> GridPrediction:
    """Plug-in MAP grid prediction (sparse analogue of ``predict.lmc``).
    ``hyper`` is accepted for driver uniformity (no latent processes)."""
    del hyper
    mu, s2 = _moments(vec, data, ops, grid, approx, mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPrediction(percentiles=pct, mean=mu, std=sd)


def predict_test(vec, data: FullData, ops: model.SparseOps, x_test,
                 hyper=None, approx: str = "fitc", mask=None):
    """Held-out predictive ``(mean (G,M), var (G,M))`` for RMSE/LPD."""
    del hyper
    return _moments(vec, data, ops, x_test, approx, mask)


def _moments_hadamard(vec, data, ops: model.SparseOps, m: int, grid,
                      indx_grid=None, approx: str = "fitc", mask=None):
    """Sparse Hadamard predictive moments (stationary, raw-L_vec)."""
    m_z = ops.z.shape[0]
    p = model.unpack(jnp.asarray(vec), m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    w = model._woodbury_hadamard(p, data, ops, m, approx, mask)
    l_mat = transforms.vec_to_tril(p.ul_vec, m)  # raw L_vec (Hadamard)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sig = jnp.exp(p.tilde_sigma)
    k_gz = kernels.rbf_cov(grid, ops.z, alpha=sig, beta=ell)
    k_self = sig * sig + settings.jitter
    if indx_grid is None:
        k_gm = jnp.kron(b_f, k_gz)
        k_star_diag = jnp.repeat(jnp.diag(b_f) * k_self, g)
    else:
        ix = jnp.asarray(indx_grid, jnp.int32)
        b_rows = b_f[ix]
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
    ``predict.hadamard.lmc_predict_map``)."""
    del hyper
    mu, s2 = _moments_hadamard(vec, data, ops, m, grid, None, approx, mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPrediction(percentiles=pct, mean=mu, std=sd)


def predict_test_hadamard(vec, data, ops: model.SparseOps, m: int, x_test,
                          indx_test, hyper=None, approx: str = "fitc",
                          mask=None):
    """Held-out per-observation ``(mean (G,), var (G,))`` for RMSE/LPD."""
    del hyper
    return _moments_hadamard(vec, data, ops, m, x_test, indx_test, approx,
                             mask)


def predict_test_hadamard_sample(key, hist_vecs, data, ops: model.SparseOps,
                                 m: int, x_test, indx_test, hyper=None,
                                 approx: str = "fitc", mask=None,
                                 n_sample: int | None = None):
    """(G_test, S) indexed chain-sample draws for sample-based scoring."""
    del hyper
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]

    def draw(vec, k):
        mu, s2 = _moments_hadamard(vec, data, ops, m, x_test, indx_test,
                                   approx, mask)
        return mu + jnp.sqrt(s2) * jax.random.normal(k, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G)
    return ys.T  # (G, S)


def predict_sample(key, hist_vecs, data: FullData, ops: model.SparseOps,
                   grid, hyper=None, approx: str = "fitc", mask=None,
                   n_sample: int | None = None) -> jnp.ndarray:
    """Chain-sample prediction: (G, S, M) y-draws over posterior vectors."""
    del hyper
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)

    def draw(vec, k):
        mu, s2 = _moments(vec, data, ops, grid, approx, mask)
        return mu + jnp.sqrt(s2) * jax.random.normal(k, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G, M)
    return jnp.moveaxis(ys, 0, 1)  # (G, S, M)
