"""Posterior-predictive machinery for the heteroscedastic-noise GNMGP.

The reference's extended driver
(``Nonseparable_Model/Nonseparable_model_mpiKAISER_extended.py:428-582``) runs
prediction and HMC around its (unfinished) heteroscedastic objective by
re-using the inhomogeneous prediction helpers with the noise re-kriged per
point.  Here the noise log-variance is an (input x task) latent process with
a GP prior (``models/gnmgp_hetero.py``), so prediction additionally kriges
``tilde_sigma2_err`` to the query points — each task's noise process gets the
same GP conditional treatment as the lengthscale process.

All heavy lifting (one factorization per parameter draw, batched grid solves)
is shared with ``predict/gnmgp.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import chol as chol_ops
from ..ops import kernels, transforms
from ..models import gnmgp_hetero as model
from ..models import gnmgp as base_model
from ..models.base import FullData, task_major
from .latent import krige_rbf
from .gnmgp import _latent_conds, _moments


class GridPredictionHetero(NamedTuple):
    percentiles: jnp.ndarray  # (G, 3, M)
    mean: jnp.ndarray  # (G, M)
    std: jnp.ndarray  # (G, M)
    l_vecs: jnp.ndarray  # (G, T) kriged constrained Cholesky vectors
    noise_var: jnp.ndarray  # (G, M) kriged noise variances at the grid


def _hp(hyper):
    return {**model.DEFAULT_HYPERS, **(hyper or {})}


def _factorize(p: model.Params, data: FullData):
    """Like gnmgp's but with the per-(input, task) noise diagonal."""
    n, m = data.y.shape
    ls = base_model.chol_process(p.ul_vecs, n, m)
    ell = jnp.exp(p.tilde_l)
    k_x = kernels.nonstationary_rbf_cov(data.x, ell1=ell)
    cov = base_model.gram(k_x, ls) + jnp.diag(jnp.exp(p.tilde_sigma2_err))
    r = chol_ops.safe_cholesky(cov)
    alpha = chol_ops.chol_solve(r, task_major(data.y)).reshape(m, n)
    c = jnp.einsum("nmb,mn->nb", ls, alpha)
    # the sigma2_err slot is a placeholder: _moments gets noise_var explicitly
    return ls, ell, jnp.zeros((), data.y.dtype), r, c


def _noise_cond(p: model.Params, data: FullData, grid, hp, n, m):
    """GP conditional of each task's noise log-variance process at the grid."""
    err_mat = p.tilde_sigma2_err.reshape(m, n)  # task-major rows
    return krige_rbf(
        data.x, grid, err_mat, hp["mu_err"], hp["alpha_err"], hp["beta_err"]
    )  # .mean: (M, G)


def predict_map(vec, data: FullData, grid, hyper=None) -> GridPredictionHetero:
    """Plug-in MAP prediction with the kriged noise process."""
    hp = _hp(hyper)
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), n, m)
    grid = jnp.asarray(grid, data.x.dtype)
    cond_l, cond_ul = _latent_conds(p, data, grid, hp, n, m)
    cond_err = _noise_cond(p, data, grid, hp, n, m)
    noise_var = jnp.exp(cond_err.mean).T  # (G, M)
    l_vec_star = transforms.ulvec_to_lvec(cond_ul.mean.T, m)
    ls_star = transforms.vec_to_tril(l_vec_star, m)
    factors = _factorize(p, data)
    mu, s2 = _moments(
        data, grid, jnp.exp(cond_l.mean), ls_star, factors, noise_var=noise_var
    )
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPredictionHetero(
        percentiles=pct, mean=mu, std=sd, l_vecs=l_vec_star, noise_var=noise_var
    )


def predict_sample(
    key, hist_vecs, data: FullData, grid, hyper=None, n_sample: int | None = None
) -> jnp.ndarray:
    """Prediction over an HMC chain: per draw, sample the latent lengthscale,
    L-process AND noise process at the grid from their GP conditionals, then
    draw y* from the plug-in predictive.  Returns (G, S, M)."""
    hp = _hp(hyper)
    n, m = data.y.shape
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    def draw(vec, k):
        p = model.unpack(vec, n, m)
        cond_l, cond_ul = _latent_conds(p, data, grid, hp, n, m)
        cond_err = _noise_cond(p, data, grid, hp, n, m)
        k_l, k_ul, k_e, k_y = jax.random.split(k, 4)
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        z = jax.random.normal(k_ul, cond_ul.mean.shape, grid.dtype)
        ul = cond_ul.mean + jnp.sqrt(cond_ul.var)[None, :] * z
        ze = jax.random.normal(k_e, cond_err.mean.shape, grid.dtype)
        te = cond_err.mean + jnp.sqrt(cond_err.var)[None, :] * ze  # (M, G)
        ls_star = transforms.vec_to_tril(transforms.ulvec_to_lvec(ul.T, m), m)
        factors = _factorize(p, data)
        mu, s2 = _moments(
            data, grid, jnp.exp(tl), ls_star, factors, noise_var=jnp.exp(te).T
        )
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)
    return jnp.moveaxis(ys, 0, 1)


def predict_noise_map(vec, data: FullData, grid, hyper=None) -> jnp.ndarray:
    """Kriged MAP noise-variance process at the grid — (G, M).

    The extended driver's analogue of ``pred_smoothness_grids`` for the noise
    latent (its scientific target: time-varying measurement noise)."""
    hp = _hp(hyper)
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), n, m)
    grid = jnp.asarray(grid, data.x.dtype)
    cond_err = _noise_cond(p, data, grid, hp, n, m)
    return jnp.exp(cond_err.mean).T
