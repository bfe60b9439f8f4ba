"""Replica-exchange (parallel-tempering) HMC, fully jitted.

Scope (measured, not assumed): replica exchange repairs **multimodality**
— started in one mode of a well-separated ±mu Gaussian mixture, plain HMC
never crosses (0% mass in the far mode) while a 12-rung ladder recovers
the 50/50 split (tests/test_tempering.py).  It does **not** repair the
GNMGP *funnel*: on Neal's funnel the cold chain stays biased away from the
neck across seeds, because the neck is a step-size geometry problem, not
an energy-barrier problem — flat-tempered replicas concentrate near the
reference and visit the neck even less than the cold chain, so swaps
inject nothing useful.  This matches the round-2/3 sampler study
(inference/whiten.py; benchmarks/sampler_bench.py): at N=200 on the TPU
every fixed linear reparameterization and metric {whitened NUTS, windowed
HMC, Hessian-diag mass, PNCP} holds min-ESS at ~3.3-3.5 per 400-draw
budget and longer chains do not help (3.5 at 2400 draws).  Use this tier
when the posterior is suspected multimodal (e.g. symmetric-mode SVC
factors); use whitened multichain NUTS + R-hat for the funnel regime.

The reference has no counterpart (its HMC is an external fixed-budget
sampler, ``Nonseparable_model.py:228-231``); this is a beyond-reference
sampler tier like NUTS.

Ladder sizing: the swap bottleneck is the *coldest* pairs' energy gap;
``swap_accept`` exposes it per pair.  A geometric ladder with
``n_replicas=12, beta_min=0.05`` restores healthy (0.2+) cold-pair rates
where 8 rungs collapse to 0.02 on the mixture above.

TPU shape: the whole ladder is ONE ``lax.scan`` over draws; each scan step
vmaps the HMC transition across the K replicas (K batched leapfrog chains =
batched small matmuls/Choleskys that keep the MXU busier than a single
latency-bound chain) and then performs one even/odd adjacent-pair swap
sweep.  Per-replica step sizes dual-average independently during warmup —
hot replicas want much larger steps than the cold chain.

Tempering acts on the *likelihood summand only*: with a reference
``R`` (default the standard-normal potential — exactly the prior of the
whitened parameterization, inference/whiten.py) the replica-k potential is

    U_k(q) = beta_k * U(q) + (1 - beta_k) * R(q),

so beta=1 is the target posterior and beta->0 approaches the proper
reference; swap acceptance between adjacent replicas i,j is
``exp((beta_i - beta_j) * (E(q_i) - E(q_j)))`` with ``E = U - R``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class TemperedResult(NamedTuple):
    samples: jnp.ndarray  # (n_samples, P) beta=1 post-warmup draws
    accept_stat: jnp.ndarray  # (K,) mean per-replica HMC acceptance (sampling phase)
    swap_accept: jnp.ndarray  # (K-1,) mean adjacent-pair swap acceptance
    step_sizes: jnp.ndarray  # (K,) final adapted per-replica step sizes
    betas: jnp.ndarray  # (K,) the inverse-temperature ladder
    potentials: jnp.ndarray  # (n_samples,) U at each kept beta=1 draw


def geometric_ladder(n_replicas: int, beta_min: float, dtype=jnp.float32):
    """Geometric inverse-temperature ladder: betas[0]=1 down to beta_min.

    Geometric spacing equalizes adjacent swap rates when the energy scale
    grows smoothly with beta — the standard default ladder.
    """
    k = jnp.arange(n_replicas, dtype=dtype)
    return jnp.power(jnp.asarray(beta_min, dtype), k / max(n_replicas - 1, 1))


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn",
        "reference_fn",
        "n_samples",
        "n_leapfrog",
        "n_warmup",
        "has_mass",
    ),
)
def _run_tempered(
    potential_fn,
    reference_fn,
    q0,  # (K, P) per-replica initial positions
    betas,  # (K,)
    key,
    n_samples: int,
    step_size0,  # (K,)
    n_leapfrog: int,
    n_warmup: int,
    target_accept,
    mass,  # (P,) diagonal or (1,) dummy
    has_mass: bool,
):
    n_rep, dim = q0.shape
    dtype = q0.dtype
    m_diag = jnp.asarray(mass, dtype) if has_mass else jnp.ones((dim,), dtype)
    sqrt_m = jnp.sqrt(m_diag)
    m_inv = 1.0 / m_diag

    def u_full(q):
        return potential_fn(q)

    def u_ref(q):
        return reference_fn(q)

    def pot_k(q, beta):
        return beta * u_full(q) + (1.0 - beta) * u_ref(q)

    val_grad_k = jax.value_and_grad(pot_k, argnums=0)
    grad_k = jax.grad(pot_k, argnums=0)

    def transition(q, beta, eps, k):
        """One HMC draw from the replica-``beta`` tempered target.

        Recomputes the entry gradient (rather than caching it in the carry)
        because swaps move positions between betas, invalidating any cached
        tempered gradient: +1 grad per draw, ~5% at 20 leapfrogs.
        """
        k_mom, k_acc = jax.random.split(k)
        u_q, g_q = val_grad_k(q, beta)
        p = sqrt_m * jax.random.normal(k_mom, (dim,), dtype=dtype)
        h0 = u_q + 0.5 * jnp.dot(p, m_inv * p)
        # fused leapfrog (see hmc.py): one grad per step
        p1 = p - 0.5 * eps * g_q
        q1 = q + eps * m_inv * p1

        def body(_, carry):
            q, p = carry
            p = p - eps * grad_k(q, beta)
            q = q + eps * m_inv * p
            return (q, p)

        q1, p1 = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q1, p1))
        u1, g1 = val_grad_k(q1, beta)
        p1 = p1 - 0.5 * eps * g1
        h1 = u1 + 0.5 * jnp.dot(p1, m_inv * p1)
        log_acc = jnp.where(jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1), -jnp.inf)
        acc_p = jnp.exp(log_acc)
        accept = jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_acc
        q = jnp.where(accept, q1, q)
        return q, acc_p

    gamma, t0c, kappa = 0.05, 10.0, 0.75
    mu0 = jnp.log(10.0 * jnp.asarray(step_size0, dtype))

    def step(carry, inp):
        qs, da = carry  # qs: (K, P); da: per-replica dual-averaging state
        log_eps, log_eps_bar, h_bar = da
        i, k = inp
        in_warmup = i < n_warmup
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))

        k_trans, k_swap = jax.random.split(k)
        t_keys = jax.random.split(k_trans, n_rep)
        qs, acc_ps = jax.vmap(transition)(qs, betas, eps, t_keys)

        # per-replica dual averaging
        m = (i + 1).astype(dtype)
        eta = 1.0 / (m + t0c)
        h_bar_n = (1.0 - eta) * h_bar + eta * (target_accept - acc_ps)
        log_eps_n = mu0 - jnp.sqrt(m) / gamma * h_bar_n
        w = m ** (-kappa)
        log_eps_bar_n = w * log_eps_n + (1.0 - w) * log_eps_bar
        da = (
            jnp.where(in_warmup, log_eps_n, log_eps),
            jnp.where(in_warmup, log_eps_bar_n, log_eps_bar),
            jnp.where(in_warmup, h_bar_n, h_bar),
        )

        # even/odd adjacent-pair swap sweep: pairs (p, p+1) with p ≡ i (mod 2)
        e_all = jax.vmap(u_full)(qs) - jax.vmap(u_ref)(qs)  # (K,)
        # log swap ratio for pair starting at slot p
        d_beta = betas[:-1] - betas[1:]  # (K-1,)
        d_e = e_all[:-1] - e_all[1:]
        log_alpha = d_beta * d_e
        us_swap = jax.random.uniform(k_swap, (n_rep - 1,), dtype=dtype)
        pair_on = (jnp.arange(n_rep - 1) % 2) == (i % 2)
        do_swap = pair_on & (jnp.log(us_swap) < log_alpha)  # (K-1,)
        # slot k receives from k+1 if do_swap[k], from k-1 if do_swap[k-1]
        take_next = jnp.concatenate([do_swap, jnp.zeros((1,), bool)])
        take_prev = jnp.concatenate([jnp.zeros((1,), bool), do_swap])
        qs = jnp.where(
            take_next[:, None],
            jnp.roll(qs, -1, axis=0),
            jnp.where(take_prev[:, None], jnp.roll(qs, 1, axis=0), qs),
        )

        swap_acc = jnp.where(pair_on, jnp.minimum(1.0, jnp.exp(log_alpha)), 0.0)
        return (qs, da), (qs[0], acc_ps, swap_acc, pair_on.astype(dtype))

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    le0 = jnp.log(jnp.asarray(step_size0, dtype))
    da0 = (le0, le0, jnp.zeros((n_rep,), dtype))
    (qs_f, da_f), (cold, acc_ps, swap_accs, pair_ons) = jax.lax.scan(
        step, (q0, da0), (jnp.arange(n_total), keys)
    )
    samples = cold[n_warmup:]
    accept_stat = jnp.mean(acc_ps[n_warmup:], axis=0)
    # each pair is proposed every other sweep; normalize by actual proposals
    n_prop = jnp.maximum(jnp.sum(pair_ons[n_warmup:], axis=0), 1.0)
    swap_accept = jnp.sum(swap_accs[n_warmup:], axis=0) / n_prop
    pots = jax.vmap(u_full)(samples)
    return samples, accept_stat, swap_accept, jnp.exp(da_f[1]), pots


def tempered_hmc_sample(
    potential_fn: Callable,
    init_position: jnp.ndarray,
    n_samples: int,
    key,
    n_replicas: int = 8,
    beta_min: float = 0.05,
    betas=None,
    step_size: float = 1e-3,
    n_leapfrog: int = 20,
    n_warmup: int = 400,
    target_accept: float = 0.75,
    mass_matrix=None,
    reference_fn: Callable | None = None,
) -> TemperedResult:
    """Replica-exchange HMC over a ``n_replicas``-rung temperature ladder.

    Same potential-over-packed-vector contract as :func:`.hmc.hmc_sample`.
    ``reference_fn`` is the beta=0 target's potential (default standard
    normal — the exact prior when sampling the whitened space, which is the
    intended pairing: ``tempered_hmc_sample(w.wrap(nlp), w.to_white(vec), …)``).
    Hot-replica step sizes are seeded ``step_size / sqrt(beta)`` and each
    rung dual-averages independently during warmup.  Returns the beta=1
    chain plus ladder diagnostics; healthy ``swap_accept`` sits in
    ~0.2–0.6 per adjacent pair — widen ``n_replicas`` or raise ``beta_min``
    if a rung's rate collapses.
    """
    q0 = jnp.asarray(init_position)
    dtype = q0.dtype
    if betas is None:
        betas_arr = geometric_ladder(int(n_replicas), float(beta_min), dtype)
    else:
        betas_arr = jnp.asarray(betas, dtype)
    n_rep = betas_arr.shape[0]
    if reference_fn is None:
        reference_fn = lambda q: 0.5 * jnp.dot(q, q)
    q0s = jnp.tile(q0[None, :], (n_rep, 1))
    eps0 = jnp.asarray(step_size, dtype) / jnp.sqrt(betas_arr)
    has_mass = mass_matrix is not None
    mass = (
        jnp.asarray(mass_matrix, dtype) if has_mass else jnp.ones((1,), dtype)
    )
    samples, accept_stat, swap_accept, eps_f, pots = _run_tempered(
        potential_fn,
        reference_fn,
        q0s,
        betas_arr,
        key,
        int(n_samples),
        eps0,
        int(n_leapfrog),
        int(n_warmup),
        float(target_accept),
        mass,
        has_mass,
    )
    return TemperedResult(
        samples=samples,
        accept_stat=accept_stat,
        swap_accept=swap_accept,
        step_sizes=eps_f,
        betas=betas_arr,
        potentials=pots,
    )
