"""Initialization strategies for MAP training.

Mirrors the init logic embedded in the reference drivers:

* LMC from empirical estimates — ``Stationary_Model/Stationary_model.py:88-101``
* SNMGP from {stationary MAP, empirical, combined} —
  ``Separable_Model/Separable_model.py:101-144``
* GNMGP from {separable MAP, empirical, random} —
  ``Nonseparable_Model/Nonseparable_model.py:115-151``

Each builder returns a flat parameter vector in the corresponding model's
packed layout.  The multi-start pattern (fit each init, keep the argmin —
``Nonseparable_model_mpisim.py:322-348``) is provided by
``inference.map.multi_start_map``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import settings
from ..ops import transforms
from .empirical import EmpiricalEstimate


def _as(x):
    return jnp.asarray(x, settings.dtype)


# -- LMC ---------------------------------------------------------------------


def lmc_from_empirical(emp: EmpiricalEstimate, n: int, m: int) -> jnp.ndarray:
    """Stationary_model.py:88-101: means of the local empirical estimates."""
    tilde_l = np.mean(np.log(emp.est_ls))
    ul_vecs = np.asarray(
        transforms.lvecs_to_ulvecs(_as(emp.est_l_vecs), n, m)
    ).reshape(n, -1)
    ul_vec = ul_vecs.mean(axis=0)
    tilde_sigma = 0.0  # fixed for correlation (Stationary_model.py:88)
    return _as(np.concatenate([[tilde_l, tilde_sigma], ul_vec, [emp.est_tilde_sigma2_err]]))


def lmc_random(key, m: int) -> jnp.ndarray:
    """Stationary_model.py:102-105 fallback init."""
    import jax

    t = transforms.tri_size(m)
    ul_vec = jax.random.uniform(key, (t,), dtype=settings.dtype)
    return jnp.concatenate(
        [
            _as([-3.0, 0.0]),
            ul_vec,
            _as([float(np.log(0.1))]),
        ]
    )


# -- SNMGP -------------------------------------------------------------------


def snmgp_from_empirical(emp: EmpiricalEstimate, n: int, m: int) -> jnp.ndarray:
    """Separable_model.py:112-125: empirical ℓ-process, unit σ-process."""
    tilde_l = np.log(emp.est_ls)
    ul_vecs = np.asarray(
        transforms.lvecs_to_ulvecs(_as(emp.est_l_vecs), n, m)
    ).reshape(n, -1)
    ul_vec = ul_vecs.mean(axis=0)
    tilde_sigma = np.ones(n)
    return _as(
        np.concatenate([tilde_l, tilde_sigma, ul_vec, [emp.est_tilde_sigma2_err]])
    )


def snmgp_from_stationary(lmc_vec, n: int, key=None, noise_scale: float = 0.1) -> jnp.ndarray:
    """Separable_model.py:101-111: broadcast the stationary MAP + small noise."""
    import jax

    lmc_vec = np.asarray(lmc_vec)
    if key is None:
        eps_l = eps_s = np.zeros(n)
    else:
        k1, k2 = jax.random.split(key)
        eps_l = noise_scale * np.asarray(jax.random.normal(k1, (n,), dtype=settings.dtype))
        eps_s = noise_scale * np.asarray(jax.random.normal(k2, (n,), dtype=settings.dtype))
    tilde_l = lmc_vec[0] * np.ones(n) + eps_l
    tilde_sigma = lmc_vec[1] * np.ones(n) + eps_s
    return _as(np.concatenate([tilde_l, tilde_sigma, lmc_vec[2:-1], [lmc_vec[-1]]]))


def snmgp_combined(lmc_vec, emp: EmpiricalEstimate, n: int, m: int, key=None) -> jnp.ndarray:
    """Separable_model.py:126-144: stationary ℓ + empirical task covariance."""
    import jax

    lmc_vec = np.asarray(lmc_vec)
    eps = (
        0.1 * np.asarray(jax.random.normal(key, (n,), dtype=settings.dtype))
        if key is not None
        else np.zeros(n)
    )
    tilde_l = lmc_vec[0] * np.ones(n) + eps
    ul_vecs = np.asarray(
        transforms.lvecs_to_ulvecs(_as(emp.est_l_vecs), n, m)
    ).reshape(n, -1)
    ul_vec = ul_vecs.mean(axis=0)
    tilde_sigma = np.ones(n)
    return _as(
        np.concatenate([tilde_l, tilde_sigma, ul_vec, [emp.est_tilde_sigma2_err]])
    )


# -- GNMGP -------------------------------------------------------------------


def gnmgp_from_empirical(
    emp: EmpiricalEstimate, n: int, m: int, smooth: bool = False
) -> jnp.ndarray:
    """Nonseparable_model.py:132-141: empirical ℓ-process and L-process."""
    tilde_l = np.log(emp.smooth_ls if smooth else emp.est_ls)
    ul_vecs = np.asarray(transforms.lvecs_to_ulvecs(_as(emp.est_l_vecs), n, m))
    return _as(np.concatenate([tilde_l, ul_vecs, [emp.est_tilde_sigma2_err]]))


def gnmgp_from_separable(snmgp_vec, n: int, m: int) -> jnp.ndarray:
    """Nonseparable_model.py:117-130: scale the separable task-Cholesky by σ(x).

    The per-input factor is ``L_vec · exp(tilde_sigma_n)`` — the reference's
    separable-to-SVC warm start.
    """
    v = np.asarray(snmgp_vec)
    tilde_l = v[:n]
    tilde_sigma = v[n : 2 * n]
    l_vec = v[2 * n : -1]
    l_vecs = np.concatenate([l_vec * s for s in np.exp(tilde_sigma)])
    ul_vecs = np.asarray(transforms.lvecs_to_ulvecs(_as(np.abs(l_vecs) + 1e-12), n, m))
    # off-diagonals keep their sign; only diagonal slots were abs-ed for the log
    t = transforms.tri_size(m)
    diag = transforms.diag_indices_vec(m)
    mask = np.zeros(t, bool)
    mask[diag] = True
    ul_vecs = np.where(np.tile(mask, n), ul_vecs, l_vecs)
    return _as(np.concatenate([tilde_l, ul_vecs, [v[-1]]]))


def gnmgp_random(key, n: int, m: int) -> jnp.ndarray:
    """Nonseparable_model.py:142-146 fallback init.

    (The reference draws *constrained* L_vecs from N(0,1) and then logs the
    diagonals, which NaNs half the time — here the draw is directly in the
    unconstrained space.)
    """
    import jax

    t = transforms.tri_size(m)
    k1, k2 = jax.random.split(key)
    ul_vecs = jax.random.normal(k1, (n * t,), dtype=settings.dtype)
    ts2 = jnp.log(jax.random.uniform(k2, (), dtype=settings.dtype))
    return jnp.concatenate([-4.0 * jnp.ones((n,), settings.dtype), ul_vecs, ts2[None]])


# -- Multichain start construction -------------------------------------------


def adam_descent(potential_fn, q0, n_iters: int, *, lr: float = 1e-1):
    """``n_iters`` guarded Adam steps on ``potential_fn`` from ``q0``.

    Non-finite values/gradients skip the update (the fit_map guard idiom).
    Traceable — safe under ``vmap``/``shard_map`` for batched descents.
    """
    import jax
    import optax

    from .map import guarded_adam_step

    opt = optax.adam(lr)
    # same guarded body as every MAP engine; this caller wants the *final*
    # descended point (a typical-set start), so best_vec is ignored
    big = jnp.asarray(jnp.inf, q0.dtype) + 0.0 * q0[0]
    (qf, _, _, _), _ = jax.lax.scan(
        guarded_adam_step(potential_fn, opt),
        (q0, opt.init(q0), q0, big), None, length=n_iters
    )
    return qf


def multichain_starts(
    potential_fn,
    center,
    n_chains: int,
    key,
    *,
    jitter: float = 0.1,
    descent_iters: int = 300,
    lr: float = 1e-1,
    include_center: bool = True,
):
    """Overdispersed-but-feasible multichain inits: jitter, then descend.

    Raw position jitter is the classic multichain init (chain 0 at the MAP,
    the rest at ``center + jitter * N(0, I)``), but on a sharp
    high-dimensional posterior it strands chains far above the typical set:
    measured on the whitened GNMGP at N=200 (P=801), a 0.1-std jitter sits
    +2-3k nats above the mode with gradient norms of ~5e3, a 400-draw
    warmup cannot relax it (split-R-hat ~1e5), and ChEES-style *shared*
    adaptation death-spirals (the stranded chain pins the cross-chain
    accept statistic at zero; eps -> 1e-6).  The reference sidesteps the
    question by never running multiple chains at all
    (``Nonseparable_model.py:228-231`` — one chain, one start).

    The fix: each jittered start runs a short vmapped Adam descent of the
    potential, so every chain *enters the typical set* before sampling
    while keeping a distinct position (and basin, if there are several).
    On the TPU the K descents batch into one program — K-row matmuls on
    the MXU — so this costs about one chain's descent in wall clock.

    Returns ``(n_chains, P)`` starts; chain 0 is ``center`` itself when
    ``include_center`` (the multichain convention).  Non-finite descents
    fall back to ``center``.
    """
    import jax
    import optax

    center = jnp.asarray(center)
    if center.ndim != 1:
        raise ValueError(f"center must be (P,), got {center.shape}")
    k_init, _ = jax.random.split(jnp.asarray(key))
    noise = jitter * jax.random.normal(
        k_init, (n_chains,) + center.shape, center.dtype
    )
    if include_center:
        noise = noise.at[0].set(0.0)
    starts = center[None] + noise
    if descent_iters <= 0:
        return starts

    out = jax.jit(jax.vmap(
        lambda q: adam_descent(potential_fn, q, descent_iters, lr=lr)
    ))(starts)
    if include_center:
        out = out.at[0].set(center)
    u = jax.vmap(potential_fn)(out)
    return jnp.where(jnp.isfinite(u)[:, None], out, center[None])
