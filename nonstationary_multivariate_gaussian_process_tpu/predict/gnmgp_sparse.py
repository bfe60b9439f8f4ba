"""Posterior-predictive machinery for the sparse (inducing-point) GNMGP.

Prediction rides the same Woodbury factor set the likelihood builds
(``models/gnmgp_sparse._woodbury``): with ``A = C^{-1} K_mn Lambda^{-1/2}``
and ``L_in = chol(I + A A^T)``,

    mu*   = t*^T inner^{-1} (A d)           t* = C^{-1} K_m*
    var*  = K**_diag - ||L_in^{-1}... ||    (exact SGPR predictive)
          = K**_diag - diag(t*^T t*) + diag(w*^T w*),  w* = L_in^{-1} t*

so a grid of G points costs one (mM x GM) triangular solve pair — no
refactorization per point (the reference refactorizes the dense Gram per grid
point per draw, ``Utility/prediction.py:1194-1235``; the exact-tier
replacement is ``predict/gnmgp.py``, this is its O(N M (mM)^2) analogue).

Latent processes at new inputs are kriged from the inducing values under the
same RBF priors (prior conditional mean + marginal variances), exactly like
the exact tier kriges them from the data inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import chol as chol_ops
from ..ops import kernels, transforms
from ..models import gnmgp_sparse as model
from ..models.base import FullData
from ..models.gnmgp import DEFAULT_HYPERS
from .gnmgp import GridPredictionSVC
from .latent import krige_proj


def _hp(hyper):
    return {**DEFAULT_HYPERS, **(hyper or {})}


def _latents_at(p: model.SparseParams, z, grid, hp, m: int):
    """Kriged latent fields Z -> grid: ``(tilde_l* (G,), ls* (G, M, M))``."""
    m_z = z.shape[0]
    t = transforms.tri_size(m)
    proj_l, _ = krige_proj(z, grid, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    proj_ul, _ = krige_proj(z, grid, hp["alpha_L"], hp["beta_L"])
    tl_g = hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
    ul_mat_z = p.ul_vecs_z.reshape(m_z, t)
    ul_g = (hp["mu_L"] + (ul_mat_z.T - hp["mu_L"]) @ proj_ul).T  # (G, T)
    l_vec_g = transforms.ulvec_to_lvec(ul_g, m)  # (G, T)
    ls_g = transforms.vec_to_tril(l_vec_g, m)  # (G, M, M)
    return tl_g, l_vec_g, ls_g


def _moments(vec, data: FullData, ops: model.SparseOps, grid,
             hyper=None, approx: str = "fitc", mask=None):
    """Predictive mean/variance at ``grid``: ``(mu (G,M), s2_y (G,M), l_vecs)``."""
    hp = _hp(hyper)
    n, m = data.y.shape
    m_z = ops.z.shape[0]
    p = model.unpack(jnp.asarray(vec), m_z, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    w = model._woodbury(p, data, ops, m, approx, hp, mask)
    tl_g, l_vec_g, ls_g = _latents_at(p, ops.z, grid, hp, m)
    ell_g = jnp.exp(tl_g)
    ell_z = jnp.exp(p.tilde_l_z)
    lz = transforms.vec_to_tril(
        transforms.ulvec_to_lvec(p.ul_vecs_z.reshape(m_z, -1), m), m
    )
    k_gz = kernels.nonstationary_rbf_cov(grid, ell1=ell_g, x2=ops.z, ell2=ell_z)
    k_gm = model.cross_gram(k_gz, ls_g, lz)  # (GM, mM)

    t_star = chol_ops.tri_solve(w.c_mm, k_gm.T)  # (mM, GM)
    w_star = chol_ops.tri_solve(w.c_in, t_star)  # (mM, GM)
    v = chol_ops.tri_solve(w.c_in, w.a @ w.d)  # (mM,)
    mu_flat = w_star.T @ v  # (GM,)
    k_star_diag = ((1.0 + settings.jitter) * jnp.sum(ls_g * ls_g, axis=-1)).T.reshape(-1)
    var_flat = (
        k_star_diag
        - jnp.sum(t_star * t_star, axis=0)
        + jnp.sum(w_star * w_star, axis=0)
    )
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    mu = mu_flat.reshape(m, g).T  # (G, M) from task-major flat
    s2_y = var_flat.reshape(m, g).T + sigma2_err
    s2_y = jnp.maximum(s2_y, sigma2_err)  # noise floor (see predict/snmgp)
    return mu, s2_y, l_vec_g


def predict_map(vec, data: FullData, ops: model.SparseOps, grid,
                hyper=None, approx: str = "fitc", mask=None) -> GridPredictionSVC:
    """Plug-in MAP grid prediction — the sparse analogue of
    ``predict.gnmgp.predict_map`` (reference point_predmap_inhomogeneous)."""
    mu, s2, l_vec_g = _moments(vec, data, ops, grid, hyper, approx, mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPredictionSVC(percentiles=pct, mean=mu, std=sd, l_vecs=l_vec_g)


def predict_test(vec, data: FullData, ops: model.SparseOps, x_test,
                 hyper=None, approx: str = "fitc", mask=None):
    """Held-out predictive ``(mean (G,M), var (G,M))`` for RMSE/LPD scoring."""
    mu, s2, _ = _moments(vec, data, ops, x_test, hyper, approx, mask)
    return mu, s2


def predict_sample(key, hist_vecs, data: FullData, ops: model.SparseOps, grid,
                   hyper=None, approx: str = "fitc", mask=None,
                   n_sample: int | None = None) -> jnp.ndarray:
    """Prediction over a chain: (G, S, M) y-draws (sparse analogue of
    ``predict.gnmgp.predict_sample``).  Latent uncertainty at the grid enters
    through the kriging marginal variances, observation uncertainty through
    the sparse predictive variance."""
    hp = _hp(hyper)
    n, m = data.y.shape
    m_z = ops.z.shape[0]
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    t = transforms.tri_size(m)
    proj_l, var_l = krige_proj(ops.z, grid, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    proj_ul, var_ul = krige_proj(ops.z, grid, hp["alpha_L"], hp["beta_L"])

    def draw(vec, k):
        p = model.unpack(vec, m_z, m)
        k_l, k_ul, k_y = jax.random.split(k, 3)
        tl = (hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
              + jnp.sqrt(var_l) * jax.random.normal(k_l, (g,), grid.dtype))
        ul_mat_z = p.ul_vecs_z.reshape(m_z, t)
        ul = (hp["mu_L"] + (ul_mat_z.T - hp["mu_L"]) @ proj_ul
              + jnp.sqrt(var_ul)[None, :]
              * jax.random.normal(k_ul, (t, g), grid.dtype))  # (T, G)
        ls_star = transforms.vec_to_tril(transforms.ulvec_to_lvec(ul.T, m), m)

        w = model._woodbury(p, data, ops, m, approx, hp, mask)
        ell_z = jnp.exp(p.tilde_l_z)
        lz = transforms.vec_to_tril(
            transforms.ulvec_to_lvec(p.ul_vecs_z.reshape(m_z, -1), m), m
        )
        k_gz = kernels.nonstationary_rbf_cov(
            grid, ell1=jnp.exp(tl), x2=ops.z, ell2=ell_z
        )
        k_gm = model.cross_gram(k_gz, ls_star, lz)
        t_star = chol_ops.tri_solve(w.c_mm, k_gm.T)
        w_star = chol_ops.tri_solve(w.c_in, t_star)
        v = chol_ops.tri_solve(w.c_in, w.a @ w.d)
        mu = (w_star.T @ v).reshape(m, g).T
        k_star_diag = (
            (1.0 + settings.jitter) * jnp.sum(ls_star * ls_star, axis=-1)
        ).T.reshape(-1)
        var = (k_star_diag - jnp.sum(t_star * t_star, axis=0)
               + jnp.sum(w_star * w_star, axis=0)).reshape(m, g).T
        sigma2_err = jnp.exp(p.tilde_sigma2_err)
        s2 = jnp.maximum(var + sigma2_err, sigma2_err)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G, M)
    return jnp.moveaxis(ys, 0, 1)


# ---------------------------------------------------------------------------
# Hadamard variant.
# ---------------------------------------------------------------------------


def _latents_at_hadamard(p, z, grid, hp, m: int):
    """Kriged latents at the grid under Hadamard conventions (raw L_vecs)."""
    m_z = z.shape[0]
    t = transforms.tri_size(m)
    proj_l, _ = krige_proj(z, grid, hp["alpha_tilde_l"], hp["beta_tilde_l"])
    proj_ul, _ = krige_proj(z, grid, hp["alpha_L"], hp["beta_L"])
    tl_g = hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
    l_mat_z = p.ul_vecs_z.reshape(m_z, t)
    l_g = (hp["mu_L"] + (l_mat_z.T - hp["mu_L"]) @ proj_ul).T  # (G, T) raw
    return tl_g, l_g, transforms.vec_to_tril(l_g, m)


def _moments_hadamard(vec, data, ops: model.SparseOps, m: int, grid,
                      indx_grid=None, hyper=None, approx: str = "fitc",
                      mask=None):
    """Sparse Hadamard predictive moments.

    ``indx_grid=None`` → per-task moments at every grid point ((G, M) each);
    with task indices → per-observation moments ((G,) each) for test scoring
    (the reference's indexed Hadamard prediction, prediction.py:585-708).
    """
    hp = {**model.HADAMARD_DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops.z.shape[0]
    p = model.unpack(jnp.asarray(vec), m_z, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    t = transforms.tri_size(m)

    w = model._woodbury_hadamard(p, data, ops, m, approx, hp, mask)
    tl_g, l_g, ls_g = _latents_at_hadamard(p, ops.z, grid, hp, m)
    ell_g = jnp.exp(tl_g)
    ell_z = jnp.exp(p.tilde_l_z)
    lz = transforms.vec_to_tril(p.ul_vecs_z.reshape(m_z, t), m)
    k_gz = kernels.nonstationary_rbf_cov(grid, ell1=ell_g, x2=ops.z, ell2=ell_z)

    if indx_grid is None:
        k_gm = model.cross_gram(k_gz, ls_g, lz)  # (GM, mM), task-major rows
        k_star_diag = (
            (1.0 + settings.jitter) * jnp.sum(ls_g * ls_g, axis=-1)
        ).T.reshape(-1)
    else:
        rows = ls_g[jnp.arange(g), jnp.asarray(indx_grid, jnp.int32), :]  # (G, M)
        b3 = jnp.einsum("ib,jcb->icj", rows, lz,
                        precision=jax.lax.Precision.HIGHEST)  # (G, M, m_z)
        k_gm = (k_gz[:, None, :] * b3).reshape(g, -1)
        k_star_diag = (1.0 + settings.jitter) * jnp.sum(rows * rows, axis=-1)

    t_star = chol_ops.tri_solve(w.c_mm, k_gm.T)
    w_star = chol_ops.tri_solve(w.c_in, t_star)
    v = chol_ops.tri_solve(w.c_in, w.a @ w.d)
    mu_flat = w_star.T @ v
    var_flat = (k_star_diag - jnp.sum(t_star * t_star, axis=0)
                + jnp.sum(w_star * w_star, axis=0))
    sigma2_err = jnp.exp(p.tilde_sigma2_err)
    if indx_grid is None:
        mu = mu_flat.reshape(m, g).T
        s2 = var_flat.reshape(m, g).T + sigma2_err
    else:
        mu = mu_flat
        s2 = var_flat + sigma2_err
    s2 = jnp.maximum(s2, sigma2_err)
    return mu, s2, l_g


def predict_map_hadamard(vec, data, ops: model.SparseOps, m: int, grid,
                         hyper=None, approx: str = "fitc",
                         mask=None) -> GridPredictionSVC:
    """Plug-in MAP grid prediction, all tasks (sparse Hadamard analogue of
    ``predict.hadamard.predict_map_svc``)."""
    mu, s2, l_g = _moments_hadamard(vec, data, ops, m, grid, None, hyper,
                                    approx, mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPredictionSVC(percentiles=pct, mean=mu, std=sd, l_vecs=l_g)


def predict_test_hadamard(vec, data, ops: model.SparseOps, m: int, x_test,
                          indx_test, hyper=None, approx: str = "fitc",
                          mask=None):
    """Held-out per-observation ``(mean (G,), var (G,))`` for RMSE/LPD."""
    mu, s2, _ = _moments_hadamard(vec, data, ops, m, x_test, indx_test,
                                  hyper, approx, mask)
    return mu, s2


def predict_sample_hadamard(key, hist_vecs, data, ops: model.SparseOps,
                            m: int, grid, hyper=None, approx: str = "fitc",
                            mask=None, n_sample: int | None = None):
    """Chain-sample sparse Hadamard prediction — (G, S, M) y-draws.

    The sparse analogue of ``predict.hadamard.svc_predict_sample``
    (reference predsample path, prediction.py:585-708): per draw the latent
    fields are *sampled* at the grid from their kriging conditionals
    (mean + marginal variance under the RBF priors at Z), the Woodbury
    factors give the f-conditional, and observation noise is added.
    """
    hp = {**model.HADAMARD_DEFAULT_HYPERS, **(hyper or {})}
    m_z = ops.z.shape[0]
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]
    t = transforms.tri_size(m)
    proj_l, var_l = krige_proj(ops.z, grid, hp["alpha_tilde_l"],
                               hp["beta_tilde_l"])
    proj_ul, var_ul = krige_proj(ops.z, grid, hp["alpha_L"], hp["beta_L"])

    def draw(vec, k):
        p = model.unpack(vec, m_z, m)
        k_l, k_ul, k_y = jax.random.split(k, 3)
        tl = (hp["mu_tilde_l"] + (p.tilde_l_z - hp["mu_tilde_l"]) @ proj_l
              + jnp.sqrt(var_l) * jax.random.normal(k_l, (g,), grid.dtype))
        l_mat_z = p.ul_vecs_z.reshape(m_z, t)  # raw L_vecs (Hadamard)
        lv = (hp["mu_L"] + (l_mat_z.T - hp["mu_L"]) @ proj_ul
              + jnp.sqrt(var_ul)[None, :]
              * jax.random.normal(k_ul, (t, g), grid.dtype))  # (T, G)
        ls_star = transforms.vec_to_tril(lv.T, m)

        w = model._woodbury_hadamard(p, data, ops, m, approx, hp, mask)
        ell_z = jnp.exp(p.tilde_l_z)
        lz = transforms.vec_to_tril(l_mat_z, m)
        k_gz = kernels.nonstationary_rbf_cov(
            grid, ell1=jnp.exp(tl), x2=ops.z, ell2=ell_z
        )
        k_gm = model.cross_gram(k_gz, ls_star, lz)
        t_star = chol_ops.tri_solve(w.c_mm, k_gm.T)
        w_star = chol_ops.tri_solve(w.c_in, t_star)
        v = chol_ops.tri_solve(w.c_in, w.a @ w.d)
        mu = (w_star.T @ v).reshape(m, g).T
        k_star_diag = (
            (1.0 + settings.jitter) * jnp.sum(ls_star * ls_star, axis=-1)
        ).T.reshape(-1)
        var = (k_star_diag - jnp.sum(t_star * t_star, axis=0)
               + jnp.sum(w_star * w_star, axis=0)).reshape(m, g).T
        sigma2_err = jnp.exp(p.tilde_sigma2_err)
        s2 = jnp.maximum(var + sigma2_err, sigma2_err)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G, M)
    return jnp.moveaxis(ys, 0, 1)


def predict_test_hadamard_sample(key, hist_vecs, data, ops: model.SparseOps,
                                 m: int, x_test, indx_test, hyper=None,
                                 approx: str = "fitc", mask=None,
                                 n_sample: int | None = None):
    """(G_test, S) indexed chain-sample draws — the sparse analogue of
    ``predict.hadamard.svc_predict_test_sample`` (the KAISER sample-based
    scoring path, reference prediction.py:678-708)."""
    from .hadamard import _select_indexed

    ys = predict_sample_hadamard(key, hist_vecs, data, ops, m, x_test,
                                 hyper, approx, mask, n_sample)
    return _select_indexed(ys, indx_test)


# ---------------------------------------------------------------------------
# Heteroscedastic variant: predictive noise kriged from the Z noise field.
# ---------------------------------------------------------------------------


def _moments_hetero(vec, data: FullData, ops_h, grid, hyper=None,
                    approx: str = "fitc", mask=None):
    """Sparse hetero predictive moments: the homoscedastic machinery with a
    per-slot training noise and the *kriged* noise at the grid in the
    predictive variance (the exact-tier analogue is
    ``predict/gnmgp_hetero.py``'s kriged-noise override)."""
    hp = {**model.HETERO_DEFAULT_HYPERS, **(hyper or {})}
    n, m = data.y.shape
    m_z = ops_h.base.z.shape[0]
    p = model.unpack_hetero(jnp.asarray(vec), m_z, m)
    grid = jnp.asarray(grid, data.x.dtype)
    g = grid.shape[0]

    sp_p = model.SparseParams(p.tilde_l, p.ul_vecs, jnp.zeros((), data.y.dtype))
    noise_tr = jnp.exp(model.noise_at_data(p, ops_h, m, hp))
    w = model._woodbury_noise(sp_p, data, ops_h.base, m, approx, noise_tr,
                              hp, mask)
    tl_g, l_vec_g, ls_g = _latents_at(sp_p, ops_h.base.z, grid, hp, m)
    ell_g = jnp.exp(tl_g)
    ell_z = jnp.exp(p.tilde_l)
    lz = transforms.vec_to_tril(
        transforms.ulvec_to_lvec(p.ul_vecs.reshape(m_z, -1), m), m
    )
    k_gz = kernels.nonstationary_rbf_cov(grid, ell1=ell_g, x2=ops_h.base.z,
                                         ell2=ell_z)
    k_gm = model.cross_gram(k_gz, ls_g, lz)

    t_star = chol_ops.tri_solve(w.c_mm, k_gm.T)
    w_star = chol_ops.tri_solve(w.c_in, t_star)
    v = chol_ops.tri_solve(w.c_in, w.a @ w.d)
    mu = (w_star.T @ v).reshape(m, g).T
    k_star_diag = ((1.0 + settings.jitter)
                   * jnp.sum(ls_g * ls_g, axis=-1)).T.reshape(-1)
    var = (k_star_diag - jnp.sum(t_star * t_star, axis=0)
           + jnp.sum(w_star * w_star, axis=0)).reshape(m, g).T

    # kriged per-task log-noise at the grid
    proj_err, _ = krige_proj(ops_h.base.z, grid, hp["alpha_err"], hp["beta_err"])
    err_mat_z = p.tilde_sigma2_err.reshape(m, m_z)
    noise_g = jnp.exp(
        hp["mu_err"] + (err_mat_z - hp["mu_err"]) @ proj_err
    ).T  # (G, M)
    s2 = jnp.maximum(var + noise_g, noise_g)
    return mu, s2, l_vec_g


def predict_map_hetero(vec, data: FullData, ops_h, grid, hyper=None,
                       approx: str = "fitc", mask=None) -> GridPredictionSVC:
    mu, s2, l_vec_g = _moments_hetero(vec, data, ops_h, grid, hyper, approx,
                                      mask)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)
    return GridPredictionSVC(percentiles=pct, mean=mu, std=sd, l_vecs=l_vec_g)


def predict_test_hetero(vec, data: FullData, ops_h, x_test, hyper=None,
                        approx: str = "fitc", mask=None):
    mu, s2, _ = _moments_hetero(vec, data, ops_h, x_test, hyper, approx, mask)
    return mu, s2
