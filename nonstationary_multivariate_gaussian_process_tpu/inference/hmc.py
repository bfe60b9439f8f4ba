"""Hamiltonian Monte Carlo, fully jitted.

The reference depends on an *external sibling repo* for HMC
(``Nonseparable_Model/Nonseparable_model.py:24-25`` imports
``Hamiltonian_Monte_Carlo/HMC_Sampler``; call sites at :228-231 and
``Stationary_model_mpiKAISER.py:205`` show the contract: potential function
over a flat vector, MAP warm start, fixed step size + leapfrog count,
optional mass-matrix preconditioning and step-size adaptation,
``duplicate_samples=True`` i.e. rejected proposals repeat the current state).

This module is a from-scratch TPU-native sampler with that contract:

* the whole chain is one ``lax.scan`` — leapfrog integration, the Metropolis
  correction, and dual-averaging step-size adaptation all live on device; a
  1000-sample × 20-leapfrog chain is a single XLA program,
* mass matrix: identity, diagonal, or dense SPD (supplied as the matrix; its
  Cholesky is taken once) — the reference builds one from a pilot-run sample
  covariance (``Nonseparable_model_mpiKAISER_extended.py:542-570``),
* step-size adaptation: Nesterov dual averaging toward a target accept rate
  during ``n_warmup`` draws, then frozen (replaces the reference's
  ``adaptive_step_size`` flag).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class HMCResult(NamedTuple):
    samples: jnp.ndarray  # (n_samples, P) post-warmup draws
    accept_prob: jnp.ndarray  # (n_total,) per-draw acceptance probabilities
    accepted: jnp.ndarray  # (n_total,) accept indicator
    step_size: jnp.ndarray  # final (possibly adapted) step size
    potentials: jnp.ndarray  # (n_samples,) potential at each kept draw
    inv_mass: jnp.ndarray | None = None  # (P,) adapted inverse metric (windowed warmup)


def estimate_mass_matrix(pilot_samples: jnp.ndarray, reg: float = 1e-10) -> jnp.ndarray:
    """Mass matrix = inverse of a regularized pilot sample covariance.

    Mirrors the reference's preconditioning recipe
    (``Nonseparable_model_mpiKAISER_extended.py:542-570``).
    """
    cov = jnp.cov(pilot_samples.T) + reg * jnp.eye(pilot_samples.shape[1])
    return jnp.linalg.inv(cov)


def _mass_ops(mass, dim, dtype):
    """Return (sample_momentum(key), kinetic(p), minv(p)) for the mass spec."""
    if mass is None:
        return (
            lambda key: jax.random.normal(key, (dim,), dtype=dtype),
            lambda p: 0.5 * jnp.dot(p, p),
            lambda p: p,
        )
    mass = jnp.asarray(mass, dtype)
    if mass.ndim == 1:
        sqrt_m = jnp.sqrt(mass)
        return (
            lambda key: sqrt_m * jax.random.normal(key, (dim,), dtype=dtype),
            lambda p: 0.5 * jnp.dot(p, p / mass),
            lambda p: p / mass,
        )
    chol_m = jnp.linalg.cholesky(mass)
    return (
        lambda key: chol_m @ jax.random.normal(key, (dim,), dtype=dtype),
        lambda p: 0.5 * jnp.dot(p, jax.scipy.linalg.cho_solve((chol_m, True), p)),
        lambda p: jax.scipy.linalg.cho_solve((chol_m, True), p),
    )


@partial(jax.jit, static_argnames=("potential_fn", "n_samples", "n_leapfrog", "n_warmup", "adapt_step_size", "mass_is_dense", "mass_is_diag"))
def _run(
    potential_fn,
    q0,
    key,
    n_samples: int,
    step_size0,
    n_leapfrog: int,
    n_warmup: int,
    adapt_step_size: bool,
    target_accept,
    mass,
    mass_is_dense: bool,
    mass_is_diag: bool,
):
    dim = q0.shape[0]
    dtype = q0.dtype
    sample_p, kinetic, minv = _mass_ops(
        mass if (mass_is_dense or mass_is_diag) else None, dim, dtype
    )
    grad_u = jax.grad(potential_fn)
    val_grad_u = jax.value_and_grad(potential_fn)

    def leapfrog(q, p, g_q, eps):
        """Fused leapfrog: n_leapfrog steps cost n_leapfrog gradient evals.

        The textbook half-kick/drift/half-kick form costs 2 grads per step;
        chaining adjacent half-kicks into full kicks and re-using the cached
        gradient at the entry point brings it to one grad per step plus the
        final value_and_grad (whose value the Metropolis test needs anyway).
        Bit-wise this differs from the two-half-kick form only in rounding.
        """
        p = p - 0.5 * eps * g_q
        q = q + eps * minv(p)

        def body(_, carry):
            q, p = carry
            p = p - eps * grad_u(q)
            q = q + eps * minv(p)
            return (q, p)

        q, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q, p))
        u, g = val_grad_u(q)
        p = p - 0.5 * eps * g
        return q, p, u, g

    # dual-averaging state: (log_eps, log_eps_bar, h_bar)
    mu = jnp.log(10.0 * step_size0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry, inp):
        q, u_q, g_q, da_state, eps = carry
        i, k = inp
        k_mom, k_acc = jax.random.split(k)
        p = sample_p(k_mom)
        h0 = u_q + kinetic(p)
        q_new, p_new, u_new, g_new = leapfrog(q, p, g_q, eps)
        h1 = u_new + kinetic(p_new)
        log_accept = jnp.where(jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1), -jnp.inf)
        accept_prob = jnp.exp(log_accept)
        accept = jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_accept
        q = jnp.where(accept, q_new, q)
        u_q = jnp.where(accept, u_new, u_q)
        g_q = jnp.where(accept, g_new, g_q)

        if adapt_step_size:
            log_eps, log_eps_bar, h_bar = da_state
            in_warmup = i < n_warmup
            m = (i + 1).astype(dtype)
            eta = 1.0 / (m + t0)
            h_bar_new = (1.0 - eta) * h_bar + eta * (target_accept - accept_prob)
            log_eps_new = mu - jnp.sqrt(m) / gamma * h_bar_new
            w = m ** (-kappa)
            log_eps_bar_new = w * log_eps_new + (1.0 - w) * log_eps_bar
            da_state = (
                jnp.where(in_warmup, log_eps_new, log_eps),
                jnp.where(in_warmup, log_eps_bar_new, log_eps_bar),
                jnp.where(in_warmup, h_bar_new, h_bar),
            )
            eps = jnp.where(in_warmup, jnp.exp(da_state[0]), jnp.exp(da_state[1]))

        return (q, u_q, g_q, da_state, eps), (q, u_q, accept_prob, accept)

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    # tie the scalar carries to q0 so that under shard_map they carry the
    # same varying-axes type as the evolving state (the adapted step size is
    # per-subject data-dependent; a plain constant init trips the scan
    # varying-manual-axes check)
    zero = jnp.asarray(0.0, dtype) * q0[0]
    da0 = (jnp.log(step_size0) + zero, jnp.log(step_size0) + zero, zero)
    u0, g0 = val_grad_u(q0)
    init = (q0, u0, g0, da0, jnp.asarray(step_size0, dtype) + zero)
    (qf, uf, gf, daf, epsf), (qs, us, aps, accs) = jax.lax.scan(
        step, init, (jnp.arange(n_total), keys)
    )
    return qs, us, aps, accs, epsf


@partial(
    jax.jit,
    static_argnames=("potential_fn", "n_samples", "n_leapfrog", "n_warmup"),
)
def _run_adapt(
    potential_fn,
    q0,
    key,
    n_samples: int,
    step_size0,
    n_leapfrog: int,
    n_warmup: int,
    target_accept,
    in_slow,
    window_end,
    da_step,
):
    """Windowed warmup: joint step-size + diagonal-mass adaptation.

    The Stan-style schedule (see :mod:`.warmup`) rides the scan as
    precomputed per-iteration arrays; the inverse diagonal metric and the
    Welford accumulators live in the carry, so the whole warmup+sampling
    chain stays one fixed-shape XLA program (no host round-trips between
    adaptation windows).
    """
    dim = q0.shape[0]
    dtype = q0.dtype
    grad_u = jax.grad(potential_fn)
    val_grad_u = jax.value_and_grad(potential_fn)

    def leapfrog(q, p, g_q, eps, m_inv):
        p = p - 0.5 * eps * g_q
        q = q + eps * m_inv * p

        def body(_, carry):
            q, p = carry
            p = p - eps * grad_u(q)
            q = q + eps * m_inv * p
            return (q, p)

        q, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q, p))
        u, g = val_grad_u(q)
        p = p - 0.5 * eps * g
        return q, p, u, g

    gamma, t0, kappa = 0.05, 10.0, 0.75

    def step(carry, inp):
        q, u_q, g_q, da, m_inv, wf = carry
        log_eps, log_eps_bar, h_bar, mu = da
        w_count, w_mean, w_m2 = wf
        i, k, slow_i, wend_i, m_i = inp
        in_warmup = i < n_warmup
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))

        k_mom, k_acc = jax.random.split(k)
        p = jax.random.normal(k_mom, (dim,), dtype=dtype) / jnp.sqrt(m_inv)
        h0 = u_q + 0.5 * jnp.dot(p, m_inv * p)
        q_new, p_new, u_new, g_new = leapfrog(q, p, g_q, eps, m_inv)
        h1 = u_new + 0.5 * jnp.dot(p_new, m_inv * p_new)
        log_accept = jnp.where(jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1), -jnp.inf)
        accept_prob = jnp.exp(log_accept)
        accept = jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_accept
        q = jnp.where(accept, q_new, q)
        u_q = jnp.where(accept, u_new, u_q)
        g_q = jnp.where(accept, g_new, g_q)

        # dual averaging within the current epoch (m_i restarts per window)
        m = m_i.astype(dtype)
        eta = 1.0 / (m + t0)
        h_bar_n = (1.0 - eta) * h_bar + eta * (target_accept - accept_prob)
        log_eps_n = mu - jnp.sqrt(m) / gamma * h_bar_n
        w = m ** (-kappa)
        log_eps_bar_n = w * log_eps_n + (1.0 - w) * log_eps_bar
        log_eps = jnp.where(in_warmup, log_eps_n, log_eps)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_n, log_eps_bar)
        h_bar = jnp.where(in_warmup, h_bar_n, h_bar)

        # Welford accumulation over slow-window draws
        upd = slow_i.astype(dtype)
        c_n = w_count + upd
        delta = q - w_mean
        mean_n = w_mean + upd * delta / jnp.maximum(c_n, 1.0)
        m2_n = w_m2 + upd * delta * (q - mean_n)

        # window end: refresh the metric, restart dual averaging around the
        # averaged step size, reset the accumulators
        var = m2_n / jnp.maximum(c_n - 1.0, 1.0)
        shrink = c_n / (c_n + 5.0)
        m_inv_new = shrink * var + 1e-3 * (1.0 - shrink)
        m_inv = jnp.where(wend_i, m_inv_new, m_inv)
        eps_r = jnp.exp(log_eps_bar)
        log_eps = jnp.where(wend_i, jnp.log(eps_r), log_eps)
        mu = jnp.where(wend_i, jnp.log(10.0 * eps_r), mu)
        h_bar = jnp.where(wend_i, 0.0, h_bar)
        w_count = jnp.where(wend_i, 0.0, c_n)
        w_mean = jnp.where(wend_i, 0.0, mean_n)
        w_m2 = jnp.where(wend_i, 0.0, m2_n)

        carry = (
            q,
            u_q,
            g_q,
            (log_eps, log_eps_bar, h_bar, mu),
            m_inv,
            (w_count, w_mean, w_m2),
        )
        return carry, (q, u_q, accept_prob, accept)

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    pad = n_samples
    in_slow_a = jnp.concatenate([jnp.asarray(in_slow, bool), jnp.zeros((pad,), bool)])
    wend_a = jnp.concatenate([jnp.asarray(window_end, bool), jnp.zeros((pad,), bool)])
    da_a = jnp.concatenate(
        [jnp.asarray(da_step, jnp.int32), jnp.ones((pad,), jnp.int32)]
    )
    zero = jnp.asarray(0.0, dtype) * q0[0]  # ties carry vma under shard_map
    le0 = jnp.log(jnp.asarray(step_size0, dtype)) + zero
    da0 = (le0, le0, zero, jnp.log(10.0 * jnp.asarray(step_size0, dtype)) + zero)
    wf0 = (
        zero,
        jnp.zeros((dim,), dtype) + zero,
        jnp.zeros((dim,), dtype) + zero,
    )
    u0, g0 = val_grad_u(q0)
    init = (q0, u0, g0, da0, jnp.ones((dim,), dtype) + zero, wf0)
    (qf, uf, gf, daf, m_inv_f, _), (qs, us, aps, accs) = jax.lax.scan(
        step, init, (jnp.arange(n_total), keys, in_slow_a, wend_a, da_a)
    )
    return qs, us, aps, accs, jnp.exp(daf[1]), m_inv_f


def _run_host(
    potential_fn,
    q0,
    key,
    n_samples: int,
    step_size0,
    n_leapfrog: int,
    n_warmup: int,
    adapt_step_size: bool,
    target_accept,
):
    """Host-driven draw loop: ONE XLA dispatch per draw (identity mass).

    The tunneled-TPU posture for strict-IEEE-f64 chains at model scale: the
    monolithic scan program (minutes of emulated-f64 leapfrog in one
    execution) trips the runtime's device fault (CLAUDE.md), while a
    per-draw program is seconds long.  Same step math and key threading as
    :func:`_run`'s scan body — draws agree to roundoff (the scan wrapper
    fuses differently, tests/test_hmc_host.py pins 1e-9).
    """
    dtype = q0.dtype
    val_grad_u = jax.value_and_grad(potential_fn)
    mu = jnp.log(10.0 * step_size0)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    ta = jnp.asarray(target_accept, dtype)

    @jax.jit
    def step_j(q, u_q, g_q, eps, k):
        k_mom, k_acc = jax.random.split(k)
        p = jax.random.normal(k_mom, q.shape, dtype=dtype)
        h0 = u_q + 0.5 * jnp.dot(p, p)
        # fused leapfrog (one grad per step, _run.leapfrog)
        p = p - 0.5 * eps * g_q
        q_new = q + eps * p

        def body(_, carry):
            q, p = carry
            p = p - eps * jax.grad(potential_fn)(q)
            q = q + eps * p
            return (q, p)

        q_new, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q_new, p))
        u_new, g_new = val_grad_u(q_new)
        p = p - 0.5 * eps * g_new
        h1 = u_new + 0.5 * jnp.dot(p, p)
        log_accept = jnp.where(
            jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1), -jnp.inf
        )
        accept_prob = jnp.exp(log_accept)
        accept = jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_accept
        q = jnp.where(accept, q_new, q)
        u_q = jnp.where(accept, u_new, u_q)
        g_q = jnp.where(accept, g_new, g_q)
        return q, u_q, g_q, accept_prob, accept

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    u_q, g_q = val_grad_u(q0)
    q = q0
    log_eps = jnp.log(jnp.asarray(step_size0, dtype))
    log_eps_bar, h_bar = log_eps, jnp.asarray(0.0, dtype)
    eps = jnp.exp(log_eps)
    qs, us, aps, accs = [], [], [], []
    for i in range(n_total):
        q, u_q, g_q, ap, acc = step_j(q, u_q, g_q, eps, keys[i])
        jax.block_until_ready(q)
        qs.append(q)
        us.append(u_q)
        aps.append(ap)
        accs.append(acc)
        if adapt_step_size:
            # end-of-step eps exactly as _run's scan body computes it: the
            # freshly-adapted eps while the CURRENT step is a warmup one
            # (including the last warmup step), eps_bar afterwards
            if i < n_warmup:
                m = jnp.asarray(float(i + 1), dtype)
                eta = 1.0 / (m + t0)
                h_bar = (1.0 - eta) * h_bar + eta * (ta - ap)
                log_eps = mu - jnp.sqrt(m) / gamma * h_bar
                w = m ** (-kappa)
                log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
                eps = jnp.exp(log_eps)
            else:
                eps = jnp.exp(log_eps_bar)
    return (jnp.stack(qs), jnp.stack(us), jnp.stack(aps), jnp.stack(accs),
            eps)


def hmc_sample(
    potential_fn: Callable,
    init_position: jnp.ndarray,
    n_samples: int,
    key,
    step_size: float = 1e-4,
    n_leapfrog: int = 20,
    n_warmup: int = 0,
    adapt_step_size: bool = False,
    target_accept: float = 0.75,
    mass_matrix=None,
    adapt_mass: bool = False,
    dispatch: str = "device",
) -> HMCResult:
    """Draw ``n_samples`` HMC samples (after ``n_warmup`` adaptation draws).

    ``potential_fn`` is the negative log posterior over the packed parameter
    vector — exactly the objective the MAP engine minimizes, matching the
    reference's ``potential_func=logpos.nlogpos_obj_SVC`` usage
    (Nonseparable_model.py:228-230).

    ``adapt_mass=True`` runs Stan-style windowed warmup instead of the plain
    dual-averaging phase: expanding slow windows estimate a diagonal inverse
    metric from the warmup draws while the step size re-adapts per window
    (see :mod:`.warmup`); supersedes the reference's manual pilot-run mass
    recipe.  Mutually exclusive with an explicit ``mass_matrix``.

    ``dispatch="host"`` runs the chain as one XLA dispatch per draw instead
    of a single scan program (:func:`_run_host`) — the posture that lets a
    strict-IEEE-f64 chain run on the tunneled TPU, whose runtime faults
    minutes-long single-program executions (CLAUDE.md).  Identity mass
    only; draws match the scan driver to roundoff.
    """
    q0 = jnp.asarray(init_position)
    if dispatch not in ("device", "host"):
        raise ValueError(f"unknown dispatch {dispatch!r} "
                         "(want 'device' or 'host')")
    if dispatch == "host":
        if adapt_mass or mass_matrix is not None:
            raise ValueError("dispatch='host' supports the identity-mass "
                             "plain chain (use the scan driver for "
                             "mass-matrix/windowed warmup)")
        qs, us, aps, accs, epsf = _run_host(
            potential_fn, q0, key, int(n_samples), float(step_size),
            int(n_leapfrog), int(n_warmup), bool(adapt_step_size),
            float(target_accept),
        )
        return HMCResult(
            samples=qs[n_warmup:],
            accept_prob=aps,
            accepted=accs,
            step_size=epsf,
            potentials=us[n_warmup:],
        )
    if adapt_mass:
        if mass_matrix is not None:
            raise ValueError("adapt_mass=True adapts the metric; drop mass_matrix")
        from .warmup import window_schedule

        sched = window_schedule(int(n_warmup))
        qs, us, aps, accs, epsf, m_inv = _run_adapt(
            potential_fn,
            q0,
            key,
            int(n_samples),
            float(step_size),
            int(n_leapfrog),
            int(n_warmup),
            float(target_accept),
            sched.in_slow,
            sched.window_end,
            sched.da_step,
        )
        return HMCResult(
            samples=qs[n_warmup:],
            accept_prob=aps,
            accepted=accs,
            step_size=epsf,
            potentials=us[n_warmup:],
            inv_mass=m_inv,
        )
    mass_is_dense = mass_matrix is not None and jnp.ndim(mass_matrix) == 2
    mass_is_diag = mass_matrix is not None and jnp.ndim(mass_matrix) == 1
    mass = jnp.asarray(mass_matrix) if mass_matrix is not None else jnp.zeros((0,), q0.dtype)
    qs, us, aps, accs, epsf = _run(
        potential_fn,
        q0,
        key,
        int(n_samples),
        float(step_size),
        int(n_leapfrog),
        int(n_warmup),
        bool(adapt_step_size),
        float(target_accept),
        mass,
        mass_is_dense,
        mass_is_diag,
    )
    return HMCResult(
        samples=qs[n_warmup:],
        accept_prob=aps,
        accepted=accs,
        step_size=epsf,
        potentials=us[n_warmup:],
    )


def hmc_sample_chains(
    potential_fn: Callable,
    init_positions: jnp.ndarray,
    n_samples: int,
    key,
    **kwargs,
) -> HMCResult:
    """Run several independent chains batched on-device.

    ``init_positions``: (C, P) — e.g. the MAP plus jittered restarts.  The
    chains vmap into one batched program (batched Choleskys keep the MXU
    busy); all HMCResult fields gain a leading chain axis.  Feed
    ``samples`` to ``inference.diagnostics.rhat`` for convergence checks.
    """
    keys = jax.random.split(key, init_positions.shape[0])
    return jax.vmap(
        lambda q0, k: hmc_sample(potential_fn, q0, n_samples, k, **kwargs)
    )(init_positions, keys)
