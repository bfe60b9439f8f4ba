"""Posterior-predictive machinery for the SNMGP (separable) model.

TPU-native re-design of the SNMGP block of ``Utility/prediction.py``:

* :func:`predict_map`          — plug-in MAP prediction
  (``point_predmap``/``pointwise_predmap``/``test_predmap``, prediction.py:337-458)
* :func:`predict_map_sampling` — latent-sampling at the MAP
  (``point_predmap_sampling``/…, prediction.py:189-334)
* :func:`predict_sample`       — full posterior-sample prediction over an HMC
  chain (``point_predsample``/…, prediction.py:34-186)

The reference loops grid points × samples in Python, re-factorizing the N×N
kernel *inside* the loop (§3.4 of the survey).  Here the structure
``Σ = B_f ⊗ K_x + σ²I = (v_B ⊗ I) blockdiag_j(w_j K_x + σ²I) (v_B ⊗ I)ᵀ``
is factorized ONCE (M batched N×N Choleskys) and every grid point reduces to
batched triangular solves:

    μ_f(x*) = B_f · α · k_*(x*),           α = mat(Σ⁻¹y)
    σ²_f(x*)[m] = k_**(x*) B_f[m,m] − Σ_j (v_BᵀB_f)[j,m]² ‖R_j⁻ᵀ k_*(x*)‖²

giving all G grid points in O(M N² G) MXU work with no Python loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import settings
from ..ops import kernels, kron
from ..models import snmgp as model
from ..models.base import FullData, task_major
from .latent import krige_rbf


class GridPrediction(NamedTuple):
    percentiles: jnp.ndarray  # (G, 3, M): mean ∓ 1.96σ, mean, mean + 1.96σ
    mean: jnp.ndarray  # (G, M)
    std: jnp.ndarray  # (G, M)


class SampledPrediction(NamedTuple):
    quantiles: jnp.ndarray  # (G, 2, M): 2.5 / 97.5 percentiles over draws
    mean: jnp.ndarray  # (G, M)
    std: jnp.ndarray  # (G, M)


def _factorize(p: model.Params, data: FullData):
    """One-time factorization of Σ = B_f ⊗ K_x + σ²I."""
    n, m = data.y.shape
    b_f, k_x, sigma2_err = model._covs(p, data.x, m)
    w_b, v_b, chols = kron.kron_chol_factors(b_f, k_x, sigma2_err)
    y = task_major(data.y)
    z = v_b.T @ y.reshape(m, n)
    sol = jax.vmap(jax.scipy.linalg.cho_solve, in_axes=((0, None), 0))((chols, True), z)
    alpha_mat = v_b @ sol  # (M, N) = mat(Σ⁻¹ y)
    w_mat = v_b.T @ b_f  # (M, M)
    return b_f, sigma2_err, chols, alpha_mat, w_mat


def _moments(p, data, grid, l_star, sigma_star, factors):
    """Predictive mean/variance at all grid points given latent values there."""
    b_f, sigma2_err, chols, alpha_mat, w_mat = factors
    ell = jnp.exp(p.tilde_l)
    sigma = jnp.exp(p.tilde_sigma)
    k_cross = kernels.nonstationary_rbf_cov(
        data.x, sigma1=sigma, ell1=ell, x2=grid, sigma2=sigma_star, ell2=l_star
    )  # (N, G)
    mu_f = (b_f @ (alpha_mat @ k_cross)).T  # (G, M)
    s = jax.vmap(
        lambda c: jax.scipy.linalg.solve_triangular(c, k_cross, lower=True)
    )(chols)  # (M, N, G)
    q = jnp.sum(s * s, axis=1)  # (M, G)
    d = ((w_mat**2).T @ q).T  # (G, M)
    k_self_star = sigma_star**2 + settings.jitter  # Gibbs self-cov (kernels.py:64)
    sigma2_f = k_self_star[:, None] * jnp.diag(b_f)[None, :] - d
    sigma2_y = sigma2_f + sigma2_err
    # floor at the noise variance: the predictive variance cannot fall below
    # sigma2_err; float32 cancellation in sigma2_f otherwise produces
    # near-zero (overconfident) variances (the reference clips to 1e-6)
    sigma2_y = jnp.maximum(sigma2_y, sigma2_err)
    return mu_f, sigma2_y


def _hp(hyper):
    return {**model.DEFAULT_HYPERS, **(hyper or {})}


def predict_map(vec: jnp.ndarray, data: FullData, grid, hyper=None) -> GridPrediction:
    """Plug-in MAP prediction on a grid (reference point/pointwise/test_predmap).

    Latent processes at the grid are set to their GP-conditional means
    (prediction.py:354-366); y-moments follow in closed form.
    """
    hp = _hp(hyper)
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), n, m)
    grid = jnp.asarray(grid, data.x.dtype)
    cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
    cond_s = krige_rbf(data.x, grid, p.tilde_sigma, hp["mu_tilde_sigma"], hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
    factors = _factorize(p, data)
    mu, s2 = _moments(p, data, grid, jnp.exp(cond_l.mean), jnp.exp(cond_s.mean), factors)
    sd = jnp.sqrt(s2)
    pct = jnp.stack([mu - 1.96 * sd, mu, mu + 1.96 * sd], axis=1)  # (G, 3, M)
    return GridPrediction(percentiles=pct, mean=mu, std=sd)


def predict_map_sampling(
    key, n_sample: int, vec: jnp.ndarray, data: FullData, grid, hyper=None
) -> SampledPrediction:
    """Latent-sampling prediction at the MAP (prediction.py:189-277).

    Per draw: sample pointwise latents at the grid, compute y-moments, sample
    y*.  The Σ factorization is shared across draws — only the O(MN²G)
    cross-solve repeats, vmapped over draws.
    """
    hp = _hp(hyper)
    n, m = data.y.shape
    p = model.unpack(jnp.asarray(vec), n, m)
    grid = jnp.asarray(grid, data.x.dtype)
    cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
    cond_s = krige_rbf(data.x, grid, p.tilde_sigma, hp["mu_tilde_sigma"], hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
    factors = _factorize(p, data)

    def draw(k):
        k_l, k_s, k_y = jax.random.split(k, 3)
        g = grid.shape[0]
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        ts = cond_s.mean + jnp.sqrt(cond_s.var) * jax.random.normal(k_s, (g,), grid.dtype)
        mu, s2 = _moments(p, data, grid, jnp.exp(tl), jnp.exp(ts), factors)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    ys = jax.vmap(draw)(jax.random.split(key, n_sample))  # (S, G, M)
    q = jnp.percentile(ys, jnp.asarray([2.5, 97.5]), axis=0)  # (2, G, M)
    return SampledPrediction(
        quantiles=jnp.moveaxis(q, 0, 1), mean=jnp.mean(ys, axis=0), std=jnp.std(ys, axis=0)
    )


def predict_sample(
    key,
    hist_vecs: jnp.ndarray,
    data: FullData,
    grid,
    hyper=None,
    n_sample: int | None = None,
) -> jnp.ndarray:
    """Posterior-sample prediction over an HMC chain (prediction.py:34-157).

    For each of the last ``n_sample`` posterior draws: sample pointwise latents
    at the grid, then one y* draw from the predictive.  Fully vmapped over
    draws (each refactorizes its own Σ as a batched Cholesky).

    Returns samples with shape (G, S, M) matching the reference's
    ``pointwise_predsample`` output layout.
    """
    hp = _hp(hyper)
    n, m = data.y.shape
    hist_vecs = jnp.asarray(hist_vecs)
    if n_sample is not None:
        hist_vecs = hist_vecs[-n_sample:]
    grid = jnp.asarray(grid, data.x.dtype)

    def draw(vec, k):
        p = model.unpack(vec, n, m)
        cond_l = krige_rbf(data.x, grid, p.tilde_l, hp["mu_tilde_l"], hp["alpha_tilde_l"], hp["beta_tilde_l"])
        cond_s = krige_rbf(data.x, grid, p.tilde_sigma, hp["mu_tilde_sigma"], hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
        k_l, k_s, k_y = jax.random.split(k, 3)
        g = grid.shape[0]
        tl = cond_l.mean + jnp.sqrt(cond_l.var) * jax.random.normal(k_l, (g,), grid.dtype)
        ts = cond_s.mean + jnp.sqrt(cond_s.var) * jax.random.normal(k_s, (g,), grid.dtype)
        factors = _factorize(p, data)
        mu, s2 = _moments(p, data, grid, jnp.exp(tl), jnp.exp(ts), factors)
        return mu + jnp.sqrt(s2) * jax.random.normal(k_y, mu.shape, mu.dtype)

    keys = jax.random.split(key, hist_vecs.shape[0])
    ys = jax.vmap(draw)(hist_vecs, keys)  # (S, G, M)
    return jnp.moveaxis(ys, 0, 1)  # (G, S, M)
