"""Posterior-predictive machinery for the LMC (stationary) model.

TPU-native re-design of the stationary block of ``Utility/prediction.py``:
``pointwise_predmap_S`` (:1566), ``test_predmap_S`` (:1601),
``pointwise/test_predsample_S`` (:1640, :1667).

The reference materializes and inverts the dense MN×MN covariance
(prediction.py:1588); here the Kronecker structure is factorized once (M
batched N×N Choleskys) and the whole grid is served by batched triangular
solves, exactly as in ``predict.snmgp``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import kernels, kron, transforms
from ..models import lmc as model
from ..models.base import FullData, task_major
from .snmgp import GridPrediction


def _factorize(p: model.Params, data: FullData):
    n, m = data.y.shape
    l_vec = transforms.ulvec_to_lvec(p.ul_vec, m)
    l_mat = transforms.vec_to_tril(l_vec, m)
    b_f = l_mat @ l_mat.T
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.rbf_cov(data.x, alpha=sigma, beta=ell)
    w_b, v_b, chols = kron.kron_chol_factors(b_f, k_x, sigma2_err)
    z = v_b.T @ task_major(data.y).reshape(m, n)
    sol = jax.vmap(jax.scipy.linalg.cho_solve, in_axes=((0, None), 0))((chols, True), z)
    alpha_mat = v_b @ sol
    w_mat = v_b.T @ b_f
    return b_f, sigma, ell, sigma2_err, chols, alpha_mat, w_mat


def _moments(p, data, grid, factors):
    b_f, sigma, ell, sigma2_err, chols, alpha_mat, w_mat = factors
    k_cross = kernels.rbf_cov(data.x, grid, alpha=sigma, beta=ell)  # (N, G)
    mu_f = (b_f @ (alpha_mat @ k_cross)).T  # (G, M)
    s = jax.vmap(
        lambda c: jax.scipy.linalg.solve_triangular(c, k_cross, lower=True)
    )(chols)
    q = jnp.sum(s * s, axis=1)  # (M, G)
    d = ((w_mat**2).T @ q).T  # (G, M)
    # self term σ²·diag(B_f), no nugget (prediction.py:1594)
    sigma2_f = (sigma**2) * jnp.diag(b_f)[None, :] - d
    sigma2_y = sigma2_f + sigma2_err
    # noise-variance floor (see predict/snmgp._moments)
    return jnp.maximum(sigma2_y, sigma2_err), mu_f


def predict_map(vec, data: FullData, grid) -> GridPrediction:
    """Plug-in MAP prediction on a grid (pointwise_predmap_S / test_predmap_S)."""
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), m)
    grid = jnp.asarray(grid, data.x.dtype)
    factors = _factorize(p, data)
    s2, mu = _moments(p, data, grid, factors)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPrediction(percentiles=pct, mean=mu, std=sd)


def predict_sample(key, hist_vecs, data: FullData, grid, n_sample: int | None = None):
    """Posterior-sample prediction over a chain (pointwise/test_predsample_S).

    Returns (S, G, M) y-draws.  (The reference reuses a single scalar normal
    across all outputs of a draw, prediction.py:1662; here each output gets an
    independent draw.)
    """
    n, m = data.y.shape
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)

    def draw(vec, k):
        p = model.unpack(vec, m)
        factors = _factorize(p, data)
        s2, mu = _moments(p, data, grid, factors)
        return mu + jnp.sqrt(s2) * jax.random.normal(k, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    return jax.vmap(draw)(hist_vecs, keys)
