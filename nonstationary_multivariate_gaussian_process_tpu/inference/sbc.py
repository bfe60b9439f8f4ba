"""Simulation-based calibration (Talts et al. 2018) for the sampler tiers.

Beyond the reference's test strategy: SBC validates the *whole* inference
stack end-to-end — prior, likelihood, and sampler together.  For each
replicate draw ``θ̃ ~ p(θ)``, simulate ``ỹ ~ p(y | θ̃)``, sample the
posterior ``p(θ | ỹ)``, and record the rank of ``θ̃`` among the posterior
draws per coordinate.  If (and only if) the sampler targets the correct
posterior, the ranks are uniform on ``{0, …, S}``; a chi-squared test per
coordinate turns systematic bias (wrong prior factor, likelihood scaling,
step-size bias, non-mixing) into a failing p-value.

The exact prior samplers below draw from the *same* jittered prior factors
the objectives use (``chol.safe_cholesky(kernels.rbf_cov(...))``), and the
likelihood simulator reuses ``evaluate.observation_cov`` — the covariance
each ``log_lik`` assembles — so a calibration failure localizes to the
sampler, not to a drifted re-implementation of the model.

Caveat (lmc): the reference driver fixes ``tilde_sigma = 0`` and gives it no
prior (``Stationary_model.py:88``); its slot is pinned to 0 in the prior
draw, and lmc SBC is only meaningful with a sampler that keeps it fixed.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .. import settings
from ..ops import chol, kernels, transforms


def _gp_draw(key, chol_factor, mu):
    z = jax.random.normal(key, (chol_factor.shape[0],), chol_factor.dtype)
    return mu + chol_factor @ z


def _inv_gamma_draw(key, a, b):
    """σ² ~ InvGamma(a, b) (pdf ∝ x^{−a−1} e^{−b/x}): 1/σ² ~ Gamma(a, rate=b)."""
    return b / jax.random.gamma(key, a, dtype=settings.dtype)


def make_prior_sampler(model: str, x, m: int, hyper: dict | None = None) -> Callable:
    """Exact sampler for the packed-vector prior of ``model`` at inputs ``x``.

    Returns ``prior_fn(key) -> vec`` drawing from precisely the prior density
    each model's ``log_posterior`` evaluates (same jittered RBF prior factors,
    same inverse-gamma noise, same task-major layouts).
    """
    from ..models import gnmgp, gnmgp_hetero, lmc, snmgp

    x = jnp.asarray(x, settings.dtype)
    n = x.shape[0]
    t = transforms.tri_size(m)

    if model in ("gnmgp", "gnmgp_hetero"):
        mod = gnmgp if model == "gnmgp" else gnmgp_hetero
        hp = {**mod.DEFAULT_HYPERS, **(hyper or {})}
        chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=hp["alpha_tilde_l"], beta=hp["beta_tilde_l"])
        )
        chol_ul = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=hp["alpha_L"], beta=hp["beta_L"])
        )
        if model == "gnmgp_hetero":
            chol_err = chol.safe_cholesky(
                kernels.rbf_cov(x, alpha=hp["alpha_err"], beta=hp["beta_err"])
            )

        def prior_fn(key):
            ks = jax.random.split(key, t + 1 + m)
            tilde_l = _gp_draw(ks[0], chol_l, hp["mu_tilde_l"])
            ul = jnp.stack(
                [_gp_draw(ks[1 + j], chol_ul, hp["mu_L"]) for j in range(t)],
                axis=1,
            )  # (N, T) columns are the L-entry processes
            if model == "gnmgp":
                s2 = _inv_gamma_draw(ks[-1], hp["a"], hp["b"])
                return jnp.concatenate(
                    [tilde_l, ul.reshape(-1), jnp.log(s2)[None]]
                )
            err = jnp.concatenate(
                [_gp_draw(ks[t + 1 + j], chol_err, hp["mu_err"]) for j in range(m)]
            )  # (N·M,) task-major noise log-variances
            return jnp.concatenate([tilde_l, ul.reshape(-1), err])

        return prior_fn

    if model == "snmgp":
        hp = {**snmgp.DEFAULT_HYPERS, **(hyper or {})}
        chol_l = chol.safe_cholesky(
            kernels.rbf_cov(x, alpha=hp["alpha_tilde_l"], beta=hp["beta_tilde_l"])
        )
        chol_s = chol.safe_cholesky(
            kernels.rbf_cov(
                x, alpha=hp["alpha_tilde_sigma"], beta=hp["beta_tilde_sigma"]
            )
        )

        def prior_fn(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            tilde_l = _gp_draw(k1, chol_l, hp["mu_tilde_l"])
            tilde_s = _gp_draw(k2, chol_s, hp["mu_tilde_sigma"])
            ul = hp["c"] * jax.random.normal(k3, (t,), settings.dtype)
            s2 = _inv_gamma_draw(k4, hp["a"], hp["b"])
            return jnp.concatenate([tilde_l, tilde_s, ul, jnp.log(s2)[None]])

        return prior_fn

    if model == "lmc":
        hp = {**lmc.DEFAULT_HYPERS, **(hyper or {})}

        def prior_fn(key):
            k1, k2, k3 = jax.random.split(key, 3)
            tilde_l = hp["mu_tilde_l"] + hp["sigma_tilde_l"] * jax.random.normal(
                k1, (), settings.dtype
            )
            ul = hp["c"] * jax.random.normal(k2, (t,), settings.dtype)
            s2 = _inv_gamma_draw(k3, hp["a"], hp["b"])
            # tilde_sigma pinned at 0: no prior in the model (see module doc)
            return jnp.concatenate(
                [tilde_l[None], jnp.zeros((1,), settings.dtype), ul,
                 jnp.log(s2)[None]]
            )

        return prior_fn

    raise ValueError(f"unknown model {model!r}")


def make_simulator(model: str, x, m: int) -> Callable:
    """``simulate_fn(key, vec) -> y (N, M)`` drawing from the exact likelihood.

    ``y`` is one draw of ``MVN(0, observation_cov(model, vec))`` — the same
    covariance assembly each ``log_lik`` evaluates (``evaluate.observation_cov``,
    pinned against the models at 1e-8 in tests/test_loo.py).
    """
    from .. import evaluate

    x = jnp.asarray(x, settings.dtype)
    n = x.shape[0]

    def simulate_fn(key, vec):
        cov = evaluate.observation_cov(model, vec, x, n, m)
        l = chol.safe_cholesky(cov)
        y_tm = l @ jax.random.normal(key, (n * m,), cov.dtype)
        return y_tm.reshape(m, n).T  # task-major → (N, M)

    return simulate_fn


class SBCResult(NamedTuple):
    ranks: np.ndarray  # (R, D) int — rank of θ̃ among the posterior draws
    n_draws: int       # S: draws per replicate (ranks live in {0..S})


def sbc_ranks(
    prior_fn: Callable,
    simulate_fn: Callable,
    posterior_fn: Callable,
    key,
    n_replicates: int,
    coords=None,
    progress: Callable | None = None,
) -> SBCResult:
    """Run the SBC loop: ``R`` replicates of draw-simulate-sample-rank.

    ``posterior_fn(key, theta_true, y) -> (S, D) draws`` is the inference
    procedure under test (it may use ``theta_true`` only for warm-starting
    diagnostics — a correct sampler's output must not depend on it).
    ``coords`` restricts ranking to a coordinate subset.  Draws should be
    approximately independent (thin the chain); autocorrelation inflates the
    chi-squared statistic (Talts et al. §5.1).
    """
    ranks = []
    n_draws = None
    for r in range(int(n_replicates)):
        key, k1, k2, k3 = jax.random.split(key, 4)
        theta = prior_fn(k1)
        y = simulate_fn(k2, theta)
        draws = np.asarray(posterior_fn(k3, theta, y))
        th = np.asarray(theta)
        if coords is not None:
            th = th[coords]
            draws = draws[:, coords]
        n_draws = draws.shape[0]
        ranks.append((draws < th[None, :]).sum(axis=0))
        if progress is not None:
            progress(r, n_replicates)
    return SBCResult(np.stack(ranks).astype(np.int64), int(n_draws))


def uniformity_pvalues(result: SBCResult, n_bins: int | None = None) -> np.ndarray:
    """Per-coordinate chi-squared uniformity p-values of the SBC ranks.

    Ranks take values in ``{0..S}``; they are binned into ``n_bins`` equal
    cells (default: enough replicates for ≥5 expected per cell, capped at 10)
    and tested against the uniform expectation with ``n_bins − 1`` degrees of
    freedom.  Small p-values flag mis-calibration of that coordinate.
    """
    from scipy import stats

    r, d = result.ranks.shape
    s = result.n_draws
    if n_bins is None:
        n_bins = int(max(2, min(10, (s + 1), r // 5)))
    edges = np.linspace(0, s + 1, n_bins + 1)
    expected = r / n_bins
    ps = np.empty(d)
    for j in range(d):
        counts, _ = np.histogram(result.ranks[:, j], bins=edges)
        chi2 = float(((counts - expected) ** 2 / expected).sum())
        ps[j] = float(stats.chi2.sf(chi2, n_bins - 1))
    return ps
