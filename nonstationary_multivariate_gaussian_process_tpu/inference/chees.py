"""ChEES-HMC: cross-chain adaptive trajectory lengths, fully jitted.

The round-3 sampler study (inference/drhmc.py, inference/rmhmc.py) measured
every *single-chain* escalation on the GNMGP posterior at the reference
scale (N=200) and none moves min-ESS out of a 3-5 band per 400-draw budget:
the posterior's nonlinear collective ridge defeats fixed linear maps and
global step-size schedules alike.  The TPU-native counterattack is to stop
spending the chip on one latency-bound chain: a single N=200 GNMGP gradient
uses a small fraction of the MXU, so K lockstep chains cost nearly the wall
clock of one.  What many chains need is a sampler whose *adaptation is
cross-chain by design* — that is ChEES-HMC (Hoffman, Radul & Sountsov,
AISTATS 2021, "An Adaptive-MCMC Scheme for Setting Trajectory Lengths in
Hamiltonian Monte Carlo"):

* all K chains integrate in lockstep with a **shared** jittered trajectory
  time ``tau_t = u_t * T_t`` (``u_t`` a Halton point, so trajectory lengths
  are stratified rather than i.i.d.) — one ``lax.while_loop`` advances the
  whole (K, P) batch, so the MXU sees K-row matmuls instead of vectors,
* the trajectory length ``T_t`` follows a stochastic gradient of the ChEES
  criterion ``E[(||q' - mean q'||^2 - ||q - mean q||^2)^2] / 4`` — the
  change in squared distance from the *cross-chain* mean; its tau-gradient
  per chain is ``(||dq'||^2 - ||dq||^2) * (dq' . v')`` with ``v'`` the
  final velocity, importance-weighted by the MH accept probability.  The
  criterion needs many chains to estimate the center — it is undefined for
  one chain, which is why it has no single-chain counterpart above,
* step size follows dual averaging toward the harmonic-mean cross-chain
  accept rate; an optional diagonal metric is estimated from the pooled
  cross-chain+time second moments during warmup (Welford over K*t draws —
  K chains shorten the metric's burn-in by a factor of K),
* everything is one ``lax.scan`` over draws; post-warmup the tuned
  ``(eps, T, metric)`` freeze and the Halton jitter keeps stratifying.

The reference has no counterpart (its sampler is an external fixed-budget
HMC, ``Nonseparable_model.py:228-231``); chains there would be K separate
processes that never talk.  Scored honestly with rank-normalized POOLED
ESS + split-R-hat (``diagnostics.ess_multichain``), never a per-chain sum.

Measured (benchmarks/sampler_bench.py --samplers chees): see ROADMAP for
the GNMGP N=200 many-chain verdict.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class CheesResult(NamedTuple):
    samples: jnp.ndarray  # (n_chains, n_samples, P) post-warmup draws
    accept_prob: jnp.ndarray  # (n_total, n_chains) per-draw accept probs
    step_size: jnp.ndarray  # final (dual-averaged) step size
    trajectory_length: jnp.ndarray  # final adapted mean trajectory time T
    n_leapfrog: jnp.ndarray  # (n_total,) shared leapfrog count per draw
    inv_mass: jnp.ndarray  # (P,) diagonal inverse metric in effect at the end
    potentials: jnp.ndarray  # (n_chains, n_samples) potential at kept draws


def _halton_base2(n: int) -> np.ndarray:
    """First ``n`` points of the base-2 van der Corput sequence, in (0, 1).

    The ChEES paper jitters the shared trajectory time with a quasi-random
    sequence so successive draws stratify (short, long, medium, ...) instead
    of clumping the way i.i.d. uniforms do.  Bit-reversal form, exact.
    """
    idx = np.arange(1, n + 1, dtype=np.uint64)
    out = np.zeros(n)
    f = 0.5
    while idx.any():
        out += f * (idx & 1)
        idx >>= 1
        f *= 0.5
    return out


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn", "n_samples", "n_warmup", "max_leapfrog", "adapt_mass",
    ),
)
def _run(
    potential_fn,
    q0,  # (K, P)
    key,
    n_samples: int,
    n_warmup: int,
    step_size0,
    traj0,
    max_leapfrog: int,
    target_accept,
    adapt_mass: bool,
    inv_mass0,  # (P,)
    halton,  # (n_total,) in (0, 1)
):
    n_chains, dim = q0.shape
    dtype = q0.dtype

    grad_u = jax.vmap(jax.grad(potential_fn))
    val_grad_u = jax.vmap(jax.value_and_grad(potential_fn))

    def leapfrog(q, p, g_q, eps, m_inv, n_steps):
        """Lockstep fused leapfrog over the (K, P) batch, traced length.

        Same one-grad-per-step fusion as ``hmc._run``: entry half-kick uses
        the cached gradient, the ``while_loop`` runs ``n_steps - 1`` fused
        kick+drifts, and the exit ``value_and_grad`` feeds both the final
        half-kick and the Metropolis test.
        """
        p = p - 0.5 * eps * g_q
        q = q + eps * (m_inv[None, :] * p)

        def cond(c):
            return c[0] < n_steps - 1

        def body(c):
            i, q, p = c
            p = p - eps * grad_u(q)
            q = q + eps * (m_inv[None, :] * p)
            return (i + 1, q, p)

        _, q, p = jax.lax.while_loop(cond, body, (jnp.zeros((), jnp.int32), q, p))
        u, g = val_grad_u(q)
        p = p - 0.5 * eps * g
        return q, p, u, g

    # dual averaging (shared step size, cross-chain accept statistic)
    mu = jnp.log(10.0 * step_size0)
    gamma, t0, kappa = 0.05, 10.0, 0.75
    # Adam on log T
    b1, b2, adam_eps, adam_lr = 0.9, 0.999, 1e-8, 0.05

    def step(carry, inp):
        (q, u_q, g_q, da, log_t, log_t_bar, adam_m, adam_v,
         m_inv, wf) = carry
        i, k, u_i = inp
        in_warmup = i < n_warmup

        log_eps, log_eps_bar, h_bar = da
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))
        t_now = jnp.where(in_warmup, jnp.exp(log_t), jnp.exp(log_t_bar))

        # shared jittered trajectory time -> shared leapfrog count
        tau = u_i * t_now
        n_steps = jnp.clip(
            jnp.ceil(tau / eps).astype(jnp.int32), 1, max_leapfrog
        )

        k_mom, k_acc = jax.random.split(k)
        xi = jax.random.normal(k_mom, q.shape, dtype=dtype)
        p = xi / jnp.sqrt(m_inv)[None, :]
        kin = lambda p: 0.5 * jnp.sum(p * p * m_inv[None, :], axis=1)
        h0 = u_q + kin(p)

        q_new, p_new, u_new, g_new = leapfrog(q, p, g_q, eps, m_inv, n_steps)
        h1 = u_new + kin(p_new)
        log_accept = jnp.where(
            jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1), -jnp.inf
        )
        accept_prob = jnp.exp(log_accept)
        accept = (
            jnp.log(jax.random.uniform(k_acc, (n_chains,), dtype=dtype))
            < log_accept
        )
        q_out = jnp.where(accept[:, None], q_new, q)
        u_out = jnp.where(accept, u_new, u_q)
        g_out = jnp.where(accept[:, None], g_new, g_q)

        # --- ChEES trajectory-length gradient (cross-chain) ---
        # centered displacements; proposals enter regardless of acceptance,
        # weighted by their accept probability (Hoffman et al. 2021, eq. 8)
        dq0 = q - jnp.mean(q, axis=0, keepdims=True)
        dq1 = q_new - jnp.mean(q_new, axis=0, keepdims=True)
        v1 = m_inv[None, :] * p_new
        per_chain = (
            jnp.sum(dq1 * dq1, axis=1) - jnp.sum(dq0 * dq0, axis=1)
        ) * jnp.sum(dq1 * v1, axis=1)
        wsum = jnp.sum(accept_prob) + 1e-12
        g_tau = jnp.sum(accept_prob * per_chain) / wsum
        # d tau / d log T = tau; Adam's sqrt(v) normalization makes the
        # update scale-free, so the raw chain-ruled gradient suffices
        g_logt = jnp.where(jnp.isfinite(g_tau), g_tau * tau, 0.0)

        m_new = b1 * adam_m + (1 - b1) * g_logt
        v_new = b2 * adam_v + (1 - b2) * g_logt * g_logt
        m_i = i.astype(dtype) + 1.0
        mhat = m_new / (1 - b1**m_i)
        vhat = v_new / (1 - b2**m_i)
        log_t_new = log_t + adam_lr * mhat / (jnp.sqrt(vhat) + adam_eps)
        # keep T integrable within the leapfrog cap at the current eps
        log_t_new = jnp.clip(
            log_t_new,
            jnp.log(eps),
            jnp.log(0.9 * max_leapfrog * eps),
        )
        w_t = m_i ** (-kappa)
        log_t_bar_new = w_t * log_t_new + (1 - w_t) * log_t_bar
        log_t = jnp.where(in_warmup, log_t_new, log_t)
        log_t_bar = jnp.where(in_warmup, log_t_bar_new, log_t_bar)
        adam_m = jnp.where(in_warmup, m_new, adam_m)
        adam_v = jnp.where(in_warmup, v_new, adam_v)

        # --- dual averaging on the harmonic-mean cross-chain accept ---
        # guards: a NaN accept (NaN potential at a degenerate start) counts
        # as 0, and the mean is clipped into [0, 1] so one pathological
        # chain can shrink eps but never NaN the adaptation state
        acc_safe = jnp.where(jnp.isnan(accept_prob), 0.0, accept_prob)
        hm_accept = jnp.clip(
            n_chains / jnp.sum(1.0 / (acc_safe + 1e-6)), 0.0, 1.0
        )
        eta = 1.0 / (m_i + t0)
        h_bar_new = (1 - eta) * h_bar + eta * (target_accept - hm_accept)
        log_eps_new = mu - jnp.sqrt(m_i) / gamma * h_bar_new
        w_e = m_i ** (-kappa)
        log_eps_bar_new = w_e * log_eps_new + (1 - w_e) * log_eps_bar
        da = (
            jnp.where(in_warmup, log_eps_new, log_eps),
            jnp.where(in_warmup, log_eps_bar_new, log_eps_bar),
            jnp.where(in_warmup, h_bar_new, h_bar),
        )

        # --- pooled diagonal metric (warmup only) ---
        if adapt_mass:
            # per-chain Welford, averaged across chains: the WITHIN-chain
            # variance.  Total pooled variance would add the between-chain
            # spread of the centers — before chains meet, that estimate is
            # inflated by orders of magnitude and the resulting huge metric
            # destabilizes the dynamics into a step-size collapse (measured
            # on the GNMGP posterior: eps -> 1e-6, R-hat ~5e4).  The
            # within-chain average is exactly what agreeing chains pool and
            # what disagreeing chains cannot poison.
            w_count, w_mean, w_m2 = wf  # scalar, (K, P), (K, P)
            cnt = w_count + 1.0
            delta = q_out - w_mean
            mean_new = w_mean + delta / cnt
            w_m2_new = w_m2 + delta * (q_out - mean_new)
            wf = (
                jnp.where(in_warmup, cnt, w_count),
                jnp.where(in_warmup, mean_new, w_mean),
                jnp.where(in_warmup, w_m2_new, w_m2),
            )
            var = jnp.mean(w_m2_new, axis=0) / jnp.maximum(cnt - 1.0, 1.0)
            # Stan-style shrink, toward the identity (the natural prior in
            # a whitened space) rather than Stan's 1e-3
            pooled = cnt * n_chains
            var = (pooled / (pooled + 5.0)) * var + (5.0 / (pooled + 5.0))
            ready = in_warmup & (cnt >= 20.0)
            m_inv = jnp.where(ready, var, m_inv)

        return (
            (q_out, u_out, g_out, da, log_t, log_t_bar, adam_m, adam_v,
             m_inv, wf),
            (q_out, u_out, accept_prob, n_steps),
        )

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    zero = jnp.asarray(0.0, dtype) * q0[0, 0]
    da0 = (jnp.log(step_size0) + zero, jnp.log(step_size0) + zero, zero)
    wf0 = (
        zero,
        jnp.zeros((n_chains, dim), dtype) + zero,
        jnp.zeros((n_chains, dim), dtype) + zero,
    )
    # sanitize starts: a chain whose initial potential is non-finite (an
    # overdispersed jitter can overflow an f32 likelihood) — or stranded so
    # far above the typical set that no shared step size ever accepts its
    # moves (measured on GNMGP N=200: +9k nats at 0.5-std jitter) — would
    # pin the shared cross-chain accept statistic at zero and death-spiral
    # eps for every chain — pull such chains back to chain 0's start
    # instead (measured collapse signature: eps -> 1e-6, R-hat ~1e149).
    # Threshold: 10·dim nats above the best chain — a chi-square typical
    # set is O(sqrt(dim)) nats wide and a descended start lands within a
    # few hundred, so 10·dim only fires on genuinely stranded chains.
    # Use init.multichain_starts (jitter + short descent) to build starts
    # that keep their dispersion *inside* the feasible set.
    u0 = jax.vmap(potential_fn)(q0)
    ok0 = jnp.isfinite(u0) & (
        u0 <= jnp.min(jnp.where(jnp.isfinite(u0), u0, jnp.inf)) + 10 * dim
    )
    q0 = jnp.where(ok0[:, None], q0, q0[0:1])
    u0, g0 = val_grad_u(q0)
    init = (
        q0, u0, g0, da0,
        jnp.log(traj0) + zero, jnp.log(traj0) + zero,
        zero, zero,
        jnp.asarray(inv_mass0, dtype) + zero, wf0,
    )
    (qf, uf, gf, daf, log_tf, log_tbf, _, _, m_inv_f, _), outs = jax.lax.scan(
        step, init, (jnp.arange(n_total), keys, jnp.asarray(halton, dtype))
    )
    qs, us, aps, n_steps = outs
    return (
        qs[n_warmup:].swapaxes(0, 1),  # (K, S, P)
        aps,
        jnp.exp(daf[1]),
        jnp.exp(log_tbf),
        n_steps,
        m_inv_f,
        us[n_warmup:].swapaxes(0, 1),
    )


def chees_sample(
    potential_fn,
    q0,
    n_samples: int,
    key,
    *,
    n_chains: int = 16,
    step_size: float = 1e-2,
    trajectory_length: float | None = None,
    n_warmup: int = 400,
    max_leapfrog: int = 256,
    target_accept: float = 0.651,
    chain_jitter: float = 0.5,
    adapt_mass: bool = True,
    inv_mass: jnp.ndarray | None = None,
) -> CheesResult:
    """Run K lockstep ChEES-HMC chains; see the module docstring.

    ``q0`` is either ``(P,)`` — chain 0 starts there, chains 1..K-1 are
    jittered by ``chain_jitter`` std normal (the fleet's multichain
    convention) — or an explicit ``(K, P)`` start matrix.  ``target_accept``
    defaults to the paper's 0.651 optimum for jittered trajectories.
    ``trajectory_length`` is the initial mean trajectory *time* T (default:
    ``20 * step_size`` — the reference's fixed budget as the warm start);
    adaptation moves it in log space during warmup and freezes the
    kappa-averaged iterate after.  Returns pooled ``(K, S, P)`` samples —
    score them with :func:`diagnostics.ess_multichain`, never per-chain sums.
    """
    q0 = jnp.asarray(q0)
    if n_samples < 1:
        raise ValueError(f"n_samples must be >= 1, got {n_samples}")
    if q0.ndim == 1:
        k_init, key = jax.random.split(jnp.asarray(key))
        jit = chain_jitter * jax.random.normal(
            k_init, (n_chains, q0.shape[0]), q0.dtype
        )
        q0 = q0[None, :] + jit.at[0].set(0.0)
    elif q0.ndim == 2:
        n_chains = q0.shape[0]
    else:
        raise ValueError(f"q0 must be (P,) or (K, P), got {q0.shape}")
    if n_chains < 2:
        raise ValueError(
            "ChEES needs >= 2 chains (the criterion centers on the "
            f"cross-chain mean), got {n_chains}"
        )
    dim = q0.shape[1]
    traj0 = (
        20.0 * step_size if trajectory_length is None else trajectory_length
    )
    inv_mass0 = (
        jnp.ones((dim,), q0.dtype)
        if inv_mass is None
        else jnp.asarray(inv_mass, q0.dtype)
    )
    if inv_mass0.shape != (dim,):
        raise ValueError(
            f"inv_mass must be a ({dim},) diagonal, got {inv_mass0.shape}"
        )
    halton = _halton_base2(n_warmup + n_samples)
    samples, aps, eps_f, t_f, n_steps, m_inv_f, pots = _run(
        potential_fn,
        q0,
        jnp.asarray(key),
        int(n_samples),
        int(n_warmup),
        jnp.asarray(step_size, q0.dtype),
        jnp.asarray(traj0, q0.dtype),
        int(max_leapfrog),
        jnp.asarray(target_accept, q0.dtype),
        bool(adapt_mass) and inv_mass is None,
        inv_mass0,
        halton,
    )
    return CheesResult(
        samples=samples,
        accept_prob=aps,
        step_size=eps_f,
        trajectory_length=t_f,
        n_leapfrog=n_steps,
        inv_mass=m_inv_f,
        potentials=pots,
    )
