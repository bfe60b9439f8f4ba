"""Delayed-rejection HMC, fully jitted.

The round-2/3 sampler study (inference/whiten.py docstring,
inference/tempering.py docstring) isolated the residual mixing obstruction
in these models as **step-size geometry**: a funnel neck where the locally
correct step size is orders of magnitude smaller than in the bulk.  A single
step size cannot serve both regions — adapted steps equilibrate to the bulk,
proposals launched in the neck diverge and reject, and the chain's min-ESS
pins at the noise floor no matter the metric or fixed linear
reparameterization (all measured: whitened NUTS, windowed HMC, Hessian-diag
mass, PNCP, replica exchange).

Delayed rejection is the sampler-side answer to exactly that failure: when
the stage-1 proposal (step size ``eps``) is rejected, propose again from the
same point with ``eps / reduction``, and accept with the Mira/Green
delayed-rejection ratio, which preserves detailed balance by weighing in the
*ghost* stage-1 proposal launched from the new proposal point:

    a_k(x) = min{1, [ pi(y_k) * prod_{j<k} (1 - a_j(y_k)) ]
                  / [ pi(x)   * prod_{j<k} (1 - a_j(x))   ] }

with ``y_k`` the stage-``k`` proposal (leapfrog at ``eps_k`` + momentum
flip — a deterministic involution, so no proposal-density ratio appears) and
``a_j(y_k)`` the stage-``j`` acceptance probability *computed from* ``y_k``
(the ghost trajectories).  In the bulk the chain pays one trajectory per
draw exactly like plain HMC; only rejected draws pay for retries.  This is
the construction of Modi, Barnett & Carpenter (2023), "Delayed rejection
Hamiltonian Monte Carlo"; built here from the paper's math as a fixed-shape
XLA program (no code counterpart exists in the reference, whose sampler is
an external fixed-budget HMC, ``Nonseparable_model.py:228-231``).

Measured (tests/test_drhmc.py, benchmarks/sampler_bench.py --samplers
drhmc): on Neal's funnel — where plain HMC and replica exchange are both
biased away from the neck — 3-stage DR-HMC recovers the marginal
``v ~ N(0, 9)`` mean and spread across seeds (v mean |<0.5|, std 2.7–3.3
over 16k draws; adapted plain HMC sits at mean 1.4, std 2.0).

On the GNMGP posterior at the reference's own scale (N=200, TPU, whitened)
the gain is real but bounded: min-ESS 3.0 → 3.9 at the 400-draw budget and
3.5 → 5.1 at 2400 draws, at ~2× the gradient cost.  Every composition was
measured — +Hessian-diag mass (5.3 at 400 draws but 3.3 at 2400: seed
noise, not signal), +PNCP (3.8), 40-step trajectories (3.0, longer hurts)
— and none leaves the 3–5 band.  Since DR demonstrably repairs step-size
geometry (the funnel above), the residual N=200 wall is NOT neck geometry:
per-coordinate diagnosis shows whitened-space min-ESS ~3 concentrated in
directions whose natural-space traces drift *together* — a nonlinear
collective ridge (amplitude–lengthscale trade-off) that no fixed map,
metric, retry schedule, or temperature ladder traverses at this budget.
Position-dependent metrics (RMHMC/SoftAbs) are the remaining escalation
path.  The shipping posture stays whitened multichain NUTS with surfaced
split-R̂/min-ESS (workflows `cohort_sampler="auto"`); reach for this tier
when the diagnosed obstruction is a funnel neck.

TPU shape: one ``lax.scan`` over draws; the retry stages live behind
``lax.cond`` so a single chain pays ghost-trajectory gradients only on
rejection.  (Under ``vmap`` — fleet use — ``cond`` lowers to both-branch
``select``; the fleet then always pays the worst case, which is the usual
batched-lockstep trade.)
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class DRHMCResult(NamedTuple):
    samples: jnp.ndarray  # (n_samples, P) post-warmup draws
    accept_stage: jnp.ndarray  # (n_total,) accepting stage index (1-based; 0 = all rejected)
    accept_prob1: jnp.ndarray  # (n_total,) stage-1 acceptance probabilities
    step_size: jnp.ndarray  # final (adapted) stage-1 step size
    potentials: jnp.ndarray  # (n_samples,) potential at each kept draw


def _log1m_exp(a):
    """log(1 - exp(a)) for a <= 0, stable at both ends; -inf for a >= 0."""
    a = jnp.minimum(a, 0.0)
    big = a > jnp.log(0.5)
    # where() evaluates both sides: feed each branch an argument that is
    # safe for it so no NaN leaks through the untaken side under vmap
    safe_hi = jnp.minimum(a, -1e-12)
    return jnp.where(
        big,
        jnp.log(-jnp.expm1(safe_hi)),
        jnp.log1p(-jnp.exp(a)),
    )


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn",
        "n_samples",
        "n_leapfrog",
        "n_warmup",
        "n_stages",
        "adapt_step_size",
        "has_mass",
    ),
)
def _run(
    potential_fn,
    q0,
    key,
    n_samples: int,
    step_size0,
    n_leapfrog: int,
    n_warmup: int,
    n_stages: int,
    reduction,
    adapt_step_size: bool,
    target_accept,
    mass,  # (P,) diagonal inverse-mass is 1/mass; dummy (1,) when has_mass=False
    has_mass: bool,
):
    dim = q0.shape[0]
    dtype = q0.dtype
    m_diag = jnp.asarray(mass, dtype) if has_mass else jnp.ones((dim,), dtype)
    sqrt_m = jnp.sqrt(m_diag)
    m_inv = 1.0 / m_diag
    grad_u = jax.grad(potential_fn)
    val_grad_u = jax.value_and_grad(potential_fn)
    red = jnp.asarray(reduction, dtype)

    def kinetic(p):
        return 0.5 * jnp.dot(p, m_inv * p)

    def propose(q, p, eps):
        """Leapfrog(eps, n_leapfrog) + momentum flip: H-measurable involution.

        Fused one-grad-per-step form (see hmc.py).  Returns the proposal and
        its total energy; the flip is folded into the quadratic kinetic.
        """
        g = grad_u(q)
        p = p - 0.5 * eps * g
        q = q + eps * m_inv * p

        def body(_, carry):
            q, p = carry
            p = p - eps * grad_u(q)
            q = q + eps * m_inv * p
            return (q, p)

        q, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q, p))
        u, g = val_grad_u(q)
        p = p - 0.5 * eps * g
        h = u + kinetic(p)
        return q, -p, u, h

    def ghost_alphas(q, p, h, upto, eps1):
        """log a_1(z)..log a_upto(z) starting from state ``z = (q, p)``.

        The within-point recurrence shares each already-computed a_j(z) for
        the deeper stages' denominators, so the whole tree costs exactly
        ``2**upto - 1`` trajectories.  Static Python recursion — it unrolls
        into the XLA program once per call site.
        """
        las = []
        for k in range(1, upto + 1):
            las.append(stage_alpha(k, q, p, h, tuple(las), eps1)[0])
        return tuple(las)

    def stage_alpha(stage, q, p, h, las_here, eps1):
        """log a_stage(z) given log a_1(z)..log a_{stage-1}(z) precomputed.

        Mira/Green DR ratio for involutive proposals: the numerator weighs
        the ghost rejections a_j(y_stage) launched from the proposal point.
        """
        eps_k = eps1 * red ** -(stage - 1)
        q1, p1, u1, h1 = propose(q, p, eps_k)
        num = -h1
        den = -h
        if stage > 1:
            las_ghost = ghost_alphas(q1, p1, h1, stage - 1, eps1)
            for j in range(stage - 1):
                num = num + _log1m_exp(las_ghost[j])
                den = den + _log1m_exp(las_here[j])
        ok = jnp.isfinite(h1) & jnp.isfinite(num) & jnp.isfinite(den)
        la = jnp.where(ok, jnp.minimum(0.0, num - den), -jnp.inf)
        return la, q1, u1

    def step(carry, inp):
        q, u_q, da_state, eps1 = carry
        i, k = inp
        k_mom, k_acc = jax.random.split(k)
        p = sqrt_m * jax.random.normal(k_mom, (dim,), dtype=dtype)
        h0 = u_q + kinetic(p)
        us = jax.random.uniform(k_acc, (n_stages,), dtype=dtype)

        # stage 1 always runs; las carries log a_j(x) for the stages tried
        # so far (-inf placeholders beyond), feeding deeper denominators
        la1, q1, u1 = stage_alpha(1, q, p, h0, (), eps1)
        acc1 = jnp.log(us[0]) < la1
        las0 = [la1] + [jnp.full_like(la1, -jnp.inf)] * (n_stages - 1)
        state = (
            jnp.where(acc1, q1, q),
            jnp.where(acc1, u1, u_q),
            jnp.where(acc1, 1, 0),  # accepting stage
            tuple(las0),
        )

        for s in range(2, n_stages + 1):
            def retry(args, _s=s):
                q_cur, u_cur, _stage, las = args
                la, q_s, u_s = stage_alpha(_s, q, p, h0, las[: _s - 1], eps1)
                acc = jnp.log(us[_s - 1]) < la
                las = las[: _s - 1] + (la,) + las[_s:]
                return (
                    jnp.where(acc, q_s, q_cur),
                    jnp.where(acc, u_s, u_cur),
                    jnp.where(acc, _s, _stage),
                    las,
                )

            state = jax.lax.cond(state[2] > 0, lambda a: a, retry, state)

        q_n, u_n, stage_n, _las = state
        accept_prob1 = jnp.exp(la1)

        if adapt_step_size:
            log_eps, log_eps_bar, h_bar = da_state
            in_warmup = i < n_warmup
            m = (i + 1).astype(dtype)
            eta = 1.0 / (m + t0)
            h_bar_new = (1.0 - eta) * h_bar + eta * (target_accept - accept_prob1)
            log_eps_new = mu - jnp.sqrt(m) / gamma * h_bar_new
            w = m ** (-kappa)
            log_eps_bar_new = w * log_eps_new + (1.0 - w) * log_eps_bar
            da_state = (
                jnp.where(in_warmup, log_eps_new, log_eps),
                jnp.where(in_warmup, log_eps_bar_new, log_eps_bar),
                jnp.where(in_warmup, h_bar_new, h_bar),
            )
            eps1 = jnp.where(in_warmup, jnp.exp(da_state[0]), jnp.exp(da_state[1]))

        return (q_n, u_n, da_state, eps1), (q_n, u_n, stage_n, accept_prob1)

    mu = jnp.log(10.0 * jnp.asarray(step_size0, dtype))
    gamma, t0, kappa = 0.05, 10.0, 0.75

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    zero = jnp.asarray(0.0, dtype) * q0[0]  # ties carry vma under shard_map
    le0 = jnp.log(jnp.asarray(step_size0, dtype)) + zero
    da0 = (le0, le0, zero)
    u0 = potential_fn(q0)
    init = (q0, u0, da0, jnp.asarray(step_size0, dtype) + zero)
    (_qf, _uf, _daf, epsf), (qs, pots, stages, ap1) = jax.lax.scan(
        step, init, (jnp.arange(n_total), keys)
    )
    return qs, pots, stages, ap1, epsf


def drhmc_sample(
    potential_fn: Callable,
    init_position: jnp.ndarray,
    n_samples: int,
    key,
    step_size: float = 1e-3,
    n_leapfrog: int = 20,
    n_warmup: int = 0,
    n_stages: int = 3,
    reduction: float = 4.0,
    adapt_step_size: bool = True,
    target_accept: float = 0.8,
    mass_matrix=None,
) -> DRHMCResult:
    """Delayed-rejection HMC over the packed parameter vector.

    Same potential contract as :func:`.hmc.hmc_sample`.  A draw proposes at
    ``step_size``; each rejection retries from the same point at
    ``step_size / reduction**k`` (``n_stages - 1`` retries) with the
    delayed-rejection acceptance ratio, so the chain can thread funnel necks
    that pin a single-step-size sampler while paying bulk draws the plain-HMC
    price.  Step-size adaptation dual-averages the *stage-1* acceptance
    toward ``target_accept`` during ``n_warmup`` — keep the target high
    (0.8+): stage 1 should serve the bulk and leave the neck to retries.

    Gradient cost: a stage-``k`` acceptance evaluates ghost trajectories for
    all lower stages — worst case per draw is ``(2**n_stages - 1)``
    trajectories, paid only on the (rare, post-warmup) fully rejected draws;
    ``lax.cond`` skips untaken stages for a single (unvmapped) chain.

    ``mass_matrix``: diagonal only (a (P,) vector) — compose with
    :mod:`.whiten` for the dense part, as everywhere else in this package.
    """
    q0 = jnp.asarray(init_position)
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    if mass_matrix is not None and jnp.ndim(mass_matrix) != 1:
        raise ValueError("drhmc_sample takes a diagonal (P,) mass_matrix only")
    has_mass = mass_matrix is not None
    mass = (
        jnp.asarray(mass_matrix, q0.dtype) if has_mass else jnp.ones((1,), q0.dtype)
    )
    qs, pots, stages, ap1, epsf = _run(
        potential_fn,
        q0,
        key,
        int(n_samples),
        float(step_size),
        int(n_leapfrog),
        int(n_warmup),
        int(n_stages),
        float(reduction),
        bool(adapt_step_size),
        float(target_accept),
        mass,
        has_mass,
    )
    n_warmup = int(n_warmup)
    return DRHMCResult(
        samples=qs[n_warmup:],
        accept_stage=stages,
        accept_prob1=ap1,
        step_size=epsf,
        potentials=pots[n_warmup:],
    )
