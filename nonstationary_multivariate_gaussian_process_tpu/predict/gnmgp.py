"""Posterior-predictive machinery for the GNMGP (nonseparable/SVC) model.

TPU-native re-design of the "inhomogeneous" block of ``Utility/prediction.py``:

* :func:`predict_map`          — plug-in MAP prediction + kriged L-process
  (``point_predmap_inhomogeneous``, prediction.py:912-1036)
* :func:`predict_map_sampling` — latent-sampling at the MAP, with
  ``pred_smoothness``/``pred_cov`` modes returning posterior draws of ℓ(x*) or
  L_f(x*) alone (``point_predmap_inhomogeneous_sampling``, prediction.py:1038-1235)
* :func:`predict_sample`       — prediction over an HMC chain
  (``point_predsample_inhomogeneous``, prediction.py:1265-1398)

The reference rebuilds and re-eigendecomposes the MN×MN Gram *per grid point
per sample* (survey §3.4 — the hottest loop in the repo).  Here the Gram is
factorized once per parameter draw and all G grid points are served by one
batched triangular solve:

    μ_f(x*) = L*(x*) · Cᵀ k_*(x*),       C[n] = L_nᵀ α[:,n],  α = mat(Σ⁻¹y)
    Σ_f(x*) = k_**(x*) L*L*ᵀ − L* (FᵀΣ⁻¹F)(x*) L*ᵀ,  F[(m,n),b] = k_*[n] L_n[m,b]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import chol as chol_ops
from ..ops import kernels, transforms
from ..models import gnmgp as model
from ..models.base import FullData, task_major
from .latent import krige_rbf
from .snmgp import GridPrediction, SampledPrediction


class GridPredictionSVC(NamedTuple):
    percentiles: jnp.ndarray  # (G, 3, M)
    mean: jnp.ndarray  # (G, M)
    std: jnp.ndarray  # (G, M)
    l_vecs: jnp.ndarray  # (G, T) kriged constrained Cholesky vectors at the grid


def _factorize(p: model.Params, data: FullData):
    n, m = data.y.shape
    ls = model.chol_process(p.ul_vecs, n, m)  # (N, M, M)
    ell = jnp.exp(p.tilde_l)
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    k_x = kernels.nonstationary_rbf_cov(data.x, ell1=ell)
    cov = model.gram(k_x, ls) + sigma2_err * jnp.eye(n * m, dtype=data.y.dtype)
    r = chol_ops.safe_cholesky(cov)
    alpha = chol_ops.chol_solve(r, task_major(data.y)).reshape(m, n)  # (M, N)
    c = jnp.einsum("nmb,mn->nb", ls, alpha)  # (N, M): L_nᵀ α[:, n]
    return ls, ell, sigma2_err, r, c


def _moments(data, grid, l_star, ls_star, factors, noise_var=None):
    """Predictive mean/variance at all grid points given latent values there.

    ``l_star``: (G,) lengthscales at the grid; ``ls_star``: (G, M, M) Cholesky
    factors of B_f(x*).  ``noise_var`` ((G, M) or scalar) overrides the
    training noise in the predictive variance — the heteroscedastic model
    passes its kriged noise process here.
    """
    ls, ell, sigma2_err, r, c = factors
    if noise_var is not None:
        sigma2_err = noise_var
    n, m, _ = ls.shape
    g = grid.shape[0]
    ones_n = jnp.ones((n,), grid.dtype)
    ones_g = jnp.ones((g,), grid.dtype)
    k_cross = kernels.nonstationary_rbf_cov(
        data.x, sigma1=ones_n, ell1=ell, x2=grid, sigma2=ones_g, ell2=l_star
    )  # (N, G)
    t = k_cross.T @ c  # (G, M)
    mu_f = jnp.einsum("gab,gb->ga", ls_star, t)  # (G, M)

    # F[(m,n), b, g] = k_cross[n,g] · L_n[m,b]  → one triangular solve, G·M RHS
    f = jnp.einsum("ng,nmb->mnbg", k_cross, ls).reshape(m * n, m * g)
    s = jax.scipy.linalg.solve_triangular(r, f, lower=True).reshape(m * n, m, g)
    h = jnp.einsum("kbg,kcg->gbc", s, s)  # (G, M, M) = FᵀΣ⁻¹F per grid point
    d = jnp.einsum("gab,gbc,gac->ga", ls_star, h, ls_star)  # diag(L* H L*ᵀ)
    k_self_star = 1.0 + settings.jitter  # Gibbs self-cov with σ≡1 (prediction.py:976)
    b_star_diag = jnp.sum(ls_star**2, axis=-1)  # (G, M) = diag(L* L*ᵀ)
    sigma2_f = k_self_star * b_star_diag - d
    sigma2_y = sigma2_f + sigma2_err
    # noise-variance floor (see predict/snmgp._moments)
    sigma2_y = jnp.maximum(sigma2_y, sigma2_err)
    return mu_f, sigma2_y


def _hp(hyper):
    return {**model.DEFAULT_HYPERS, **(hyper or {})}


def _latent_conds(p, data, grid, hp, n, m):
    t = transforms.tri_size(m)
    cond_l = krige_rbf(
        data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"]
    )
    ul_mat = p.ul_vecs.reshape(n, t).T  # (T, N)
    cond_ul = krige_rbf(data.x, grid, ul_mat, hp["mu_L"], hp["alpha_L"], hp["beta_L"])
    return cond_l, cond_ul  # cond_ul.mean: (T, G)


def predict_map(vec, data: FullData, grid, hyper=None) -> GridPredictionSVC:
    """Plug-in MAP prediction (reference point_predmap_inhomogeneous)."""
    hp = _hp(hyper)
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), n, m)
    grid = jnp.asarray(grid, data.x.dtype)
    cond_l, cond_ul = _latent_conds(p, data, grid, hp, n, m)
    l_vec_star = transforms.ulvec_to_lvec(cond_ul.mean.T, m)  # (G, T)
    ls_star = transforms.vec_to_tril(l_vec_star, m)  # (G, M, M)
    factors = _factorize(p, data)
    mu, s2 = _moments(data, grid, jnp.exp(cond_l.mean), ls_star, factors)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPredictionSVC(percentiles=pct, mean=mu, std=sd, l_vecs=l_vec_star)


def predict_map_sampling(
    key,
    n_sample: int,
    vec,
    data: FullData,
    grid,
    hyper=None,
    pred_smoothness: bool = False,
    pred_cov: bool = False,
):
    """Latent-sampling prediction at the MAP (point_predmap_inhomogeneous_sampling).

    ``pred_smoothness=True`` → (G, S) draws of tilde_l(x*);
    ``pred_cov=True``        → (G, S, M, M) draws of L_f(x*);
    otherwise                → SampledPrediction over y draws.
    """
    hp = _hp(hyper)
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), n, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    cond_l, cond_ul = _latent_conds(p, data, grid, hp, n, m)

    if pred_smoothness:
        keys = jax.random.split(key, n_sample)
        tl = jax.vmap(
            lambda k: cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k, (g,), grid.dtype)
        )(keys)
        return jnp.moveaxis(tl, 0, 1)  # (G, S)

    if pred_cov:
        keys = jax.random.split(key, n_sample)

        def draw_l(k):
            z = jax.random.normal(k, cond_ul.mean.shape, grid.dtype)
            ul = cond_ul.mean + jnp.sqrt(cond_ul.var)[None, :] * z  # (T, G)
            lv = transforms.ulvec_to_lvec(ul.T, m)  # (G, T)
            return transforms.vec_to_tril(lv, m)  # (G, M, M)

        lf = jax.vmap(draw_l)(keys)  # (S, G, M, M)
        return jnp.moveaxis(lf, 0, 1)  # (G, S, M, M)

    factors = _factorize(p, data)

    def draw(k):
        k_l, k_ul, k_y = jax.random.split(k, 3)
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        z = jax.random.normal(k_ul, cond_ul.mean.shape, grid.dtype)
        ul = cond_ul.mean + jnp.sqrt(cond_ul.var)[None, :] * z
        lv = transforms.ulvec_to_lvec(ul.T, m)
        ls_star = transforms.vec_to_tril(lv, m)
        mu, s2 = _moments(data, grid, jnp.exp(tl), ls_star, factors)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    ys = jax.vmap(draw)(jax.random.split(key, n_sample))  # (S, G, M)
    q = jnp.percentile(ys, jnp.asarray([2.5, 97.5]), axis=0)
    return SampledPrediction(
        quantiles=jnp.moveaxis(q, 0, 1), mean=jnp.mean(ys, axis=0), std=jnp.std(ys, axis=0)
    )


def predict_sample(
    key, hist_vecs, data: FullData, grid, hyper=None, n_sample: int | None = None
) -> jnp.ndarray:
    """Prediction over an HMC chain (point_predsample_inhomogeneous).

    Returns (G, S, M) samples.  NOTE: in the reference the L-process
    conditional krigs the *constrained* L_vecs of each draw
    (prediction.py:1300-1308); we follow the MAP-path convention of kriging
    the unconstrained uL_vecs and transforming, which keeps the sampled
    factors valid Cholesky factors by construction.
    """
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
        k_l, k_ul, k_y = jax.random.split(k, 3)
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        z = jax.random.normal(k_ul, cond_ul.mean.shape, grid.dtype)
        ul = cond_ul.mean + jnp.sqrt(cond_ul.var)[None, :] * z
        lv = transforms.ulvec_to_lvec(ul.T, m)
        ls_star = transforms.vec_to_tril(lv, m)
        factors = _factorize(p, data)
        mu, s2 = _moments(data, grid, jnp.exp(tl), ls_star, factors)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)
    return jnp.moveaxis(ys, 0, 1)
