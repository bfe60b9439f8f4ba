"""Pathfinder: quasi-Newton variational inference (Zhang et al., JMLR 2022).

The L-BFGS optimization path visits the full range of posterior scales on
its way to the mode, and its inverse-Hessian estimate is a free local
covariance at every iterate.  Pathfinder turns the MAP engine's existing
quasi-Newton tier (``inference/map.py``, ``method="lbfgs"``) into a
posterior *approximation*:

1. run L-BFGS on the negative log posterior, storing every iterate and
   gradient,
2. at each iterate ``l``, build the Gaussian ``q_l = N(mu_l, H_l)`` where
   ``H_l`` is the L-BFGS inverse-Hessian (compact low-rank-plus-scaled-
   identity form from the last ``history`` curvature pairs — Byrd, Nocedal
   & Schnabel 1994) and ``mu_l`` is one Newton step from the iterate,
3. score every ``q_l`` by a Monte-Carlo ELBO in **batched potential
   sweeps** (the TPU shape: the ``L x K`` evaluations ride vmapped
   ``sweep_chunk``-row blocks under ``lax.map`` — large enough to fill
   the MXU, bounded so live Gram intermediates fit HBM at N=200), and
4. return draws from the ELBO-argmax Gaussian with exact ``log q`` values,
   plus Pareto-smoothed importance weights (PSIS, Vehtari et al. 2024)
   against the target.

:func:`multipathfinder` runs ``n_paths`` independent paths (vmapped) from
jittered starts and importance-resamples the pooled draws — the cheap
multi-basin approximation that pairs with this framework's measured N=200
posture: the GNMGP posterior's basins defeat single chains
(ROADMAP, "many-chain verdict"), and while tempered SMC is the exact
answer, Pathfinder gives a *seconds-scale* approximate one — and its
(mean, scale) moments seed :func:`..inference.smc.smc_sample`'s reference
distribution (``ref_mean`` / ``ref_scale``), shortening the
prior-to-posterior tempering path.

Everything here is whitened-space native: pass the whitened potential
(``whiten.make_whitener(...).wrap(nlp)``) exactly as the HMC/SMC tiers do.

No reference counterpart: the reference's only inference engines are
Adam MAP + fixed-budget external HMC (``Nonseparable_model.py:161-231``).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
import optax


class PathfinderResult(NamedTuple):
    draws: jnp.ndarray        # (n_draws, P) draws from the ELBO-best q
    log_q: jnp.ndarray        # (n_draws,) exact log-density under that q
    log_w: jnp.ndarray        # (n_draws,) raw log importance weights -U - log_q
    elbo: jnp.ndarray         # (L,) per-iterate ELBO estimates
    best_iter: jnp.ndarray    # argmax iterate index
    mu: jnp.ndarray           # (P,) mean of the best q
    alpha: jnp.ndarray        # scalar identity scale of the best H
    logdet: jnp.ndarray       # log|H| of the best q
    trajectory: jnp.ndarray   # (L+1, P) the L-BFGS iterates
    values: jnp.ndarray       # (L+1,) objective value at each iterate


def _lbfgs_trajectory(potential_fn, x0, max_iters: int, memory: int):
    """Run guarded L-BFGS, emitting every iterate/gradient/value.

    Same optimizer and guard posture as ``map.guarded_lbfgs_step`` (zoom
    linesearch, non-finite steps held); here the scan *records* the path
    instead of only tracking the best point.
    """
    optimizer = optax.lbfgs(memory_size=int(memory))
    value_and_grad = optax.value_and_grad_from_state(potential_fn)

    def step(carry, _):
        v, s = carry
        val, grad = value_and_grad(v, state=s)
        ok = jnp.isfinite(val) & jnp.all(jnp.isfinite(grad))
        grad_s = jnp.where(ok, grad, jnp.zeros_like(grad))
        updates, s_new = optimizer.update(
            grad_s, s, v, value=val, grad=grad_s, value_fn=potential_fn
        )
        v_new = optax.apply_updates(v, updates)
        v_new = jnp.where(ok & jnp.all(jnp.isfinite(v_new)), v_new, v)
        return (v_new, s_new), (v, grad_s, val)

    state0 = optimizer.init(x0)
    (v_fin, s_fin), (thetas, grads, vals) = jax.lax.scan(
        step, (x0, state0), None, length=max_iters
    )
    val_fin, grad_fin = jax.value_and_grad(potential_fn)(v_fin)
    grad_fin = jnp.where(jnp.isfinite(grad_fin), grad_fin, 0.0)
    thetas = jnp.concatenate([thetas, v_fin[None]], axis=0)   # (L+1, P)
    grads = jnp.concatenate([grads, grad_fin[None]], axis=0)  # (L+1, P)
    vals = jnp.concatenate([vals, val_fin[None]], axis=0)     # (L+1,)
    return thetas, grads, vals


def _gauss_factors(thetas, grads, l, memory: int, dtype):
    """The compact inverse-Hessian Gaussian at trajectory index ``l``.

    ``H = alpha I + W M W^T`` with ``W = [S, alpha*Y]`` over the last
    ``memory`` curvature pairs ending at ``l`` (Byrd/Nocedal/Schnabel's
    compact representation of the L-BFGS inverse Hessian), orthogonalized
    to ``H = alpha I + (Q U) diag(lam) (Q U)^T`` via one thin QR + one
    2m x 2m eigh — so sampling, ``log q``, and ``log|H|`` are all exact
    and O(P m) per draw.  Invalid pairs (window underrun or curvature
    ``s^T y <= 0``) are masked to zero columns with identity placeholders
    in the small matrices.

    Returns ``(mu, alpha, qu, lam, logdet)`` where ``qu`` is (P, 2m)
    column-orthonormal (padded columns are exactly zero).
    """
    p = thetas.shape[1]
    m = memory
    # pairs s_j = theta_{j+1}-theta_j ending at l: indices l-m .. l-1
    idx = l - m + jnp.arange(m)          # (m,) trajectory pair indices
    valid_w = idx >= 0
    idx_c = jnp.clip(idx, 0, thetas.shape[0] - 2)
    s_pairs = thetas[idx_c + 1] - thetas[idx_c]      # (m, P)
    y_pairs = grads[idx_c + 1] - grads[idx_c]        # (m, P)
    sy = jnp.sum(s_pairs * y_pairs, axis=1)          # (m,)
    ss = jnp.sum(s_pairs * s_pairs, axis=1)
    yy = jnp.sum(y_pairs * y_pairs, axis=1)
    # curvature condition (relative): reject flat/negative-curvature pairs
    valid = valid_w & (sy > 1e-12 * jnp.sqrt(ss * yy + 1e-300))
    vf = valid.astype(dtype)
    s_pairs = s_pairs * vf[:, None]
    y_pairs = y_pairs * vf[:, None]
    # alpha from the most recent valid pair: s^T y / y^T y
    recency = jnp.where(valid, jnp.arange(m), -1)
    has_any = jnp.any(valid)
    j_last = jnp.argmax(recency)
    alpha = jnp.where(
        has_any,
        jnp.clip(sy[j_last] / jnp.maximum(yy[j_last], 1e-300), 1e-10, 1e10),
        jnp.asarray(1.0, dtype),
    )
    # small matrices over the window
    sty = s_pairs @ y_pairs.T                        # (m, m) S^T Y
    r_u = jnp.triu(sty) + jnp.diag(1.0 - vf)         # unit rows for masked
    d_v = jnp.diag(sty) + (1.0 - vf)
    yty = y_pairs @ y_pairs.T
    r_inv = jax.scipy.linalg.solve_triangular(
        r_u, jnp.eye(m, dtype=dtype), lower=False
    )
    top_left = r_inv.T @ (jnp.diag(d_v) + alpha * yty) @ r_inv
    mm = jnp.block([[top_left, -r_inv.T], [-r_inv, jnp.zeros((m, m), dtype)]])
    w_mat = jnp.concatenate([s_pairs, alpha * y_pairs], axis=0).T  # (P, 2m)
    # thin QR -> 2m x 2m eigh: H = alpha I + (QU) diag(lam) (QU)^T
    q_mat, r_mat = jnp.linalg.qr(w_mat)              # (P, 2m), (2m, 2m)
    a_small = r_mat @ mm @ r_mat.T
    a_small = 0.5 * (a_small + a_small.T)
    lam, u_mat = jnp.linalg.eigh(a_small)
    # numerical floor: H must stay PD (exact arithmetic guarantees it for
    # curvature-valid pairs; masked columns contribute lam = 0)
    lam = jnp.maximum(lam, (-1.0 + 1e-6) * alpha)
    qu = q_mat @ u_mat                               # (P, k) orthonormal
    # reduced QR keeps k = min(P, 2m) columns: count the alpha-only
    # directions against the actual eigenvalue count, not the window size
    logdet = (p - lam.shape[0]) * jnp.log(alpha) + jnp.sum(
        jnp.log(alpha + lam)
    )
    # Newton-step mean from the iterate: mu = theta - H g
    theta = thetas[l]
    g = grads[l]
    hg = alpha * g + w_mat @ (mm @ (w_mat.T @ g))
    mu = theta - hg
    return mu, alpha, qu, lam, logdet


def _q_sample(key, mu, alpha, qu, lam, n: int, dtype):
    """Draw ``n`` samples from ``N(mu, alpha I + QU diag(lam) QU^T)``.

    Returns ``(draws, log_q)``; ``log q`` is exact because the draw's
    whitened coordinates are known by construction.
    """
    p = mu.shape[0]
    z = jax.random.normal(key, (n, p), dtype=dtype)
    u = z @ qu                                       # (n, 2m)
    scale = jnp.sqrt(alpha + lam) - jnp.sqrt(alpha)  # (2m,)
    x = mu + jnp.sqrt(alpha) * z + (u * scale) @ qu.T
    logdet = (p - qu.shape[1]) * jnp.log(alpha) + jnp.sum(
        jnp.log(alpha + lam)
    )
    log_q = (
        -0.5 * p * jnp.log(2.0 * jnp.pi)
        - 0.5 * logdet
        - 0.5 * jnp.sum(z * z, axis=1)
    )
    return x, log_q


def _u_chunked(potential_fn, x, chunk: int):
    """``vmap(potential_fn)`` over rows of ``x``, ``chunk`` rows at a time.

    Bounds live memory: one flat vmap over the ELBO sweep materializes
    every row's likelihood intermediates at once — at the reference scale
    (N=200, Gram (2N)²) a (paths × iters × n_elbo)-row sweep is ~20 GB and
    faults the 16 GB chip; ``lax.map`` over fixed-size blocks keeps it at
    ``chunk`` rows (per vmapped path) with identical values.
    """
    n = x.shape[0]
    if chunk <= 0 or n <= chunk:
        return jax.vmap(potential_fn)(x)
    n_pad = (-n) % chunk
    xp = (
        jnp.concatenate([x, jnp.broadcast_to(x[:1], (n_pad,) + x.shape[1:])])
        if n_pad
        else x
    )
    blocks = xp.reshape(-1, chunk, *x.shape[1:])
    out = jax.lax.map(jax.vmap(potential_fn), blocks)
    return out.reshape(-1)[:n]


@partial(jax.jit, static_argnames=("potential_fn", "max_iters", "memory",
                                   "n_elbo", "n_draws", "sweep_chunk"))
def _pathfinder_jit(potential_fn, x0, key, max_iters, memory, n_elbo,
                    n_draws, sweep_chunk=256):
    dtype = x0.dtype
    thetas, grads, vals = _lbfgs_trajectory(
        potential_fn, x0, max_iters, memory
    )
    n_iter = thetas.shape[0]
    u_batch = partial(_u_chunked, potential_fn, chunk=sweep_chunk)

    k_elbo, k_draw = jax.random.split(key)

    def factors_at(l):
        return _gauss_factors(thetas, grads, l, memory, dtype)

    mus, alphas, qus, lams, logdets = jax.vmap(factors_at)(
        jnp.arange(1, n_iter)
    )

    # one batched ELBO sweep over every iterate's q: (L, K, P) -> (L*K,)
    def draws_at(i, k):
        return _q_sample(k, mus[i], alphas[i], qus[i], lams[i], n_elbo,
                         dtype)

    keys = jax.random.split(k_elbo, n_iter - 1)
    xs, log_qs = jax.vmap(draws_at)(jnp.arange(n_iter - 1), keys)
    pots = u_batch(xs.reshape(-1, x0.shape[0])).reshape(n_iter - 1, n_elbo)
    pots = jnp.where(jnp.isfinite(pots), pots, jnp.inf)
    elbo = jnp.mean(-pots - log_qs, axis=1)
    elbo = jnp.where(jnp.isfinite(elbo), elbo, -jnp.inf)

    best = jnp.argmax(elbo)
    draws, log_q = _q_sample(
        k_draw, mus[best], alphas[best], qus[best], lams[best], n_draws,
        dtype,
    )
    pots_d = u_batch(draws)
    log_w = jnp.where(jnp.isfinite(pots_d), -pots_d - log_q, -jnp.inf)
    return PathfinderResult(
        draws=draws,
        log_q=log_q,
        log_w=log_w,
        elbo=elbo,
        best_iter=best + 1,
        mu=mus[best],
        alpha=alphas[best],
        logdet=logdets[best],
        trajectory=thetas,
        values=vals,
    )


def pathfinder(
    potential_fn: Callable,
    x0,
    key,
    max_iters: int = 100,
    memory: int = 6,
    n_elbo: int = 32,
    n_draws: int = 1000,
    sweep_chunk: int = 256,
) -> PathfinderResult:
    """Single-path Pathfinder over ``exp(-potential_fn)``.

    Same potential-over-packed-vector contract as ``hmc_sample`` /
    ``smc_sample``; intended pairing is the whitened space.  ``x0`` is the
    start (e.g. a jittered empirical init — do NOT start at the MAP: the
    value of the path is that it *passes through* the posterior's scales
    before the mode collapses them).

    Cost: ``max_iters`` sequential L-BFGS steps (~1 gradient + linesearch
    probes each) + one batched sweep of ``max_iters * n_elbo`` potential
    evaluations + ``n_draws`` more — roughly one SMC *stage*, for a full
    (approximate) posterior.
    """
    key = jax.random.PRNGKey(key) if isinstance(key, int) else key
    x0 = jnp.asarray(x0)
    return _pathfinder_jit(
        potential_fn, x0, key, int(max_iters), int(memory), int(n_elbo),
        int(n_draws), sweep_chunk=int(sweep_chunk),
    )


def psis_smooth(log_w: np.ndarray) -> tuple[np.ndarray, float]:
    """Pareto-smoothed importance weights (Vehtari et al. 2024).

    Fits a generalized Pareto distribution to the largest
    ``M = min(0.2 R, 3 sqrt(R))`` raw weights (Zhang & Stephens 2009
    profile-posterior estimator) and replaces them by the fitted
    quantiles.  Returns ``(smoothed log weights, k_hat)``; ``k_hat > 0.7``
    flags an unreliable proposal (the standard PSIS diagnostic).
    """
    lw = np.asarray(log_w, dtype=np.float64).copy()
    r = lw.shape[0]
    finite = np.isfinite(lw)
    if finite.sum() < 5:
        return lw, np.inf
    m = int(min(np.ceil(0.2 * r), np.ceil(3.0 * np.sqrt(r))))
    if m < 5:
        return lw, 0.0
    order = np.argsort(lw)
    tail_idx = order[-m:]
    cutoff = lw[order[-m - 1]] if r > m else lw[order[0]]
    if lw[order[-1]] - cutoff > 700.0:
        # tail spread overflows exp in weight space: the proposal is
        # degenerate (one draw dominates by >e^700); smoothing can't help
        return lw, np.inf
    # exceedances over the cutoff, in weight space
    exc = np.exp(lw[tail_idx] - cutoff) - 1.0
    exc = np.maximum(exc, 1e-300)
    k_hat, sigma = _gpd_fit(np.sort(exc))
    if not np.isfinite(k_hat):
        return lw, np.inf
    # replace tail by fitted quantiles at the expected order statistics
    q = (np.arange(1, m + 1) - 0.5) / m
    if abs(k_hat) < 1e-12:
        smoothed = -sigma * np.log1p(-q)
    else:
        smoothed = sigma / k_hat * (np.power(1.0 - q, -k_hat) - 1.0)
    ranks = np.argsort(np.argsort(lw[tail_idx]))
    lw[tail_idx] = cutoff + np.log1p(smoothed[ranks])
    # never let smoothing raise a weight above the observed max
    lw[tail_idx] = np.minimum(lw[tail_idx], np.max(log_w))
    return lw, float(k_hat)


def _gpd_fit(x: np.ndarray) -> tuple[float, float]:
    """Zhang & Stephens (2009) GPD fit on sorted exceedances ``x``."""
    n = x.shape[0]
    if n < 5 or x[-1] <= 0:
        return np.inf, np.nan
    prior_bs = 3.0
    m_grid = 30 + int(np.floor(np.sqrt(n)))
    jj = np.arange(1, m_grid + 1, dtype=np.float64)
    x_star = x[max(int(np.floor(n / 4.0 + 0.5)) - 1, 0)]
    theta = 1.0 / x[-1] + (1.0 - np.sqrt(m_grid / (jj - 0.5))) / (
        prior_bs * max(x_star, 1e-300)
    )
    # profile likelihood over theta with k(theta) = E log1p(-theta x)
    # (the usual Pareto shape xi; heavy tail <=> theta < 0 <=> k > 0)
    with np.errstate(invalid="ignore", divide="ignore"):
        k_of = np.mean(np.log1p(-theta[:, None] * x[None, :]), axis=1)
        # Z&S's shape is -k_of; their profile l(theta) = n(log(theta/k_zs)
        # + k_zs - 1) becomes, in the usual-xi convention:
        l_prof = n * (np.log(-theta / k_of) - k_of - 1.0)
    l_prof = np.where(np.isfinite(l_prof), l_prof, -np.inf)
    if not np.any(np.isfinite(l_prof)):
        return np.inf, np.nan
    w = np.exp(l_prof - l_prof.max())
    w = w / w.sum()
    theta_hat = float(np.sum(theta * w))
    k_hat = float(np.mean(np.log1p(-theta_hat * x)))
    sigma = -k_hat / theta_hat if theta_hat != 0 else np.nan
    # Vehtari et al.'s weakly-informative regularization of k
    k_hat = (n * k_hat + 5.0) / (n + 10.0)
    return k_hat, float(sigma)


class MultiPathfinderResult(NamedTuple):
    draws: jnp.ndarray       # (n_out, P) PSIS-resampled pooled draws
    k_hat: float             # Pareto shape diagnostic of the pooled weights
    elbos: jnp.ndarray       # (n_paths,) best ELBO per path
    log_evidence: jnp.ndarray  # IS estimate of log integral exp(-U)
    ref_mean: jnp.ndarray    # (P,) importance-weighted posterior mean
    ref_scale: jnp.ndarray   # (P,) importance-weighted posterior std
    paths: PathfinderResult  # stacked per-path results (leading axis)


def multipathfinder(
    potential_fn: Callable,
    x0,
    key,
    n_paths: int = 8,
    jitter: float = 2.0,
    n_out: int = 1000,
    max_iters: int = 100,
    memory: int = 6,
    n_elbo: int = 32,
    n_draws: int = 400,
    sweep_chunk: int = 256,
) -> MultiPathfinderResult:
    """Multi-path Pathfinder: vmapped paths, PSIS-resampled pooled draws.

    ``x0`` may be a single (P,) start (paths jitter around it with scale
    ``jitter`` — in the whitened space that is prior units) or an
    (n_paths, P) stack of explicit starts.  Draws are pooled across paths
    with each draw weighted against its *own* path's proposal, smoothed by
    PSIS, and resampled without replacement (Gumbel top-k) to ``n_out``.

    ``ref_mean`` / ``ref_scale`` are the smoothed-importance-weighted
    posterior moments — the intended seed for
    ``smc_sample(ref_mean=..., ref_scale=...)``: a reference already
    shaped like the posterior starts the tempering telescope most of the
    way along its path (measured stage counts in ROADMAP).  The pooled
    self-normalized IS evidence estimate ``log_evidence`` is exact for a
    perfect proposal and downward-noisy otherwise — the SMC telescope
    remains the calibrated evidence; this one is the free sanity check.
    """
    key = jax.random.PRNGKey(key) if isinstance(key, int) else key
    x0 = jnp.asarray(x0)
    k_init, k_run, k_pick = jax.random.split(key, 3)
    if x0.ndim == 1:
        starts = x0 + jitter * jax.random.normal(
            k_init, (int(n_paths), x0.shape[0]), dtype=x0.dtype
        )
    else:
        starts = x0
        n_paths = x0.shape[0]
    keys = jax.random.split(k_run, int(n_paths))
    runs = jax.vmap(
        lambda s, k: _pathfinder_jit(
            potential_fn, s, k, int(max_iters), int(memory), int(n_elbo),
            int(n_draws), sweep_chunk=int(sweep_chunk),
        )
    )(starts, keys)

    pooled = runs.draws.reshape(-1, starts.shape[-1])
    log_w = np.asarray(runs.log_w.reshape(-1), dtype=np.float64)
    lw_s, k_hat = psis_smooth(log_w)
    # self-normalized IS evidence from the raw (unsmoothed) weights
    finite = np.isfinite(log_w)
    log_ev = (
        float(jax.scipy.special.logsumexp(jnp.asarray(log_w[finite])))
        - np.log(max(finite.sum(), 1))
        if finite.any()
        else -np.inf
    )
    # Gumbel top-k = sampling without replacement proportional to weights
    g = np.asarray(
        jax.random.gumbel(k_pick, (lw_s.shape[0],)), dtype=np.float64
    )
    scores = np.where(np.isfinite(lw_s), lw_s + g, -np.inf)
    top = np.argsort(scores)[::-1][: int(n_out)]
    if top.shape[0] < int(n_out):
        # pool smaller than the requested draw count: cycle the ranked
        # indices so callers get the n_out rows they asked for (matches
        # fleet._pf_host_resample)
        top = np.resize(top, int(n_out))
    draws = pooled[jnp.asarray(np.ascontiguousarray(top))]
    # smoothed-weight posterior moments (for the SMC reference seed)
    fin_s = np.isfinite(lw_s)
    if fin_s.any():
        w_n = np.exp(lw_s - lw_s[fin_s].max())
        w_n = np.where(np.isfinite(w_n), w_n, 0.0)
    else:
        # every pooled weight non-finite (all paths diverged): uniform
        # weights keep the designed degenerate result (k_hat=inf, -inf
        # evidence, moments from the unweighted pool) instead of crashing
        # on an empty .max() — mirrors fleet._pf_host_resample's guard
        w_n = np.ones(lw_s.shape[0], dtype=np.float64)
    w_n = w_n / max(w_n.sum(), 1e-300)
    pool_np = np.asarray(pooled, dtype=np.float64)
    mean = w_n @ pool_np
    var = w_n @ (pool_np - mean) ** 2
    ess = 1.0 / max(float(np.sum(w_n**2)), 1e-300)
    return MultiPathfinderResult(
        draws=draws,
        k_hat=float(k_hat),
        elbos=jnp.max(runs.elbo, axis=1),
        log_evidence=jnp.asarray(log_ev),
        ref_mean=jnp.asarray(mean, dtype=pooled.dtype),
        ref_scale=jnp.asarray(
            np.sqrt(np.maximum(var, 1e-12)), dtype=pooled.dtype
        ),
        paths=runs,
    )
