"""No-U-Turn Sampler (NUTS), fully jitted, TPU-native.

The reference's external sampler (``Hamiltonian_Monte_Carlo/HMC_Sampler``,
imported at ``Nonseparable_model.py:24-25``) is fixed-length HMC whose step
size and trajectory length must be hand-tuned per model; this module goes
beyond it with a dynamic-trajectory sampler in the Stan/numpyro family:

* **iterative tree building** — the recursive doubling of the original NUTS
  paper is re-expressed with a fixed-size *checkpoint stack*: a subtree over
  leaves ``0..2^d-1`` ends at every leaf whose trailing-one count ≥ its
  height, so sub-U-turn checks need only the ``max_depth`` left-edge momenta
  whose indices are the binary decomposition of the current leaf.  All state
  is fixed-shape — the whole chain is one ``lax.scan`` over draws with two
  nested ``lax.while_loop``s (doublings, leaves), no recursion, no host
  control flow.
* **multinomial (progressive) sampling** — each leaf replaces the running
  proposal with probability ``w_leaf / w_subtree`` (weights ``e^{-H}``),
  and completed subtrees are merged with the Stan-style biased rule
  ``min(1, w_new / w_old)``; log-weights accumulate via ``logaddexp``.
* **adaptation** — reuses the windowed warmup schedule (:mod:`.warmup`):
  dual-averaging step size toward ``target_accept`` with the per-draw
  accept statistic averaged over all trajectory leaves, and a diagonal
  inverse metric from expanding Welford windows.

Divergences (ΔH > ``max_delta_energy``) and U-turns terminate trajectory
growth; a cleanly diverged/turning subtree's proposal is discarded, matching
Stan's semantics.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .warmup import window_schedule

MAX_DELTA_ENERGY = 1000.0


class NUTSResult(NamedTuple):
    samples: jnp.ndarray  # (n_samples, P) post-warmup draws
    potentials: jnp.ndarray  # (n_samples,) potential at each kept draw
    accept_stat: jnp.ndarray  # (n_total,) mean leaf acceptance statistic
    tree_depth: jnp.ndarray  # (n_total,) doublings realized per draw
    n_leapfrog: jnp.ndarray  # (n_total,) gradient evaluations per draw
    diverging: jnp.ndarray  # (n_total,) divergence flag per draw
    step_size: jnp.ndarray  # final adapted step size
    inv_mass: jnp.ndarray  # (P,) final (possibly adapted) inverse metric


def _is_turning(m_inv, r_l, r_r, rho):
    """Generalized U-turn criterion on a (sub)trajectory.

    ``rho`` is the momentum sum over the segment; turning when either edge's
    velocity points against it (Betancourt's generalized criterion, as in
    Stan / numpyro).
    """
    v_l = m_inv * r_l
    v_r = m_inv * r_r
    return (jnp.dot(v_l, rho) <= 0.0) | (jnp.dot(v_r, rho) <= 0.0)


def _leaf_ckpt_idxs(n):
    """Checkpoint indices touched by leaf ``n`` (0-based) of a subtree.

    ``idx_max`` = popcount(n >> 1): the stack slot a left-edge leaf (even n)
    stores into, and the top of the range an odd leaf checks against.
    ``num`` = number of trailing one-bits of n = number of subtrees whose
    right edge is leaf n.
    """

    def popcount(x):
        def body(c):
            v, acc = c
            return v >> 1, acc + (v & 1)

        _, acc = lax.while_loop(lambda c: c[0] > 0, body, (x, jnp.int32(0)))
        return acc

    def trailing_ones(x):
        def body(c):
            v, acc = c
            return v >> 1, acc + 1

        _, acc = lax.while_loop(lambda c: (c[0] & 1) == 1, body, (x, jnp.int32(0)))
        return acc

    idx_max = popcount(n >> 1)
    num = trailing_ones(n)
    return idx_max - num + 1, idx_max


class _Tree(NamedTuple):
    z_l: jnp.ndarray
    r_l: jnp.ndarray
    g_l: jnp.ndarray
    z_r: jnp.ndarray
    r_r: jnp.ndarray
    g_r: jnp.ndarray
    z_prop: jnp.ndarray  # current multinomial proposal
    u_prop: jnp.ndarray  # potential at proposal
    g_prop: jnp.ndarray  # gradient at proposal
    log_w: jnp.ndarray  # log total weight of the trajectory
    rho: jnp.ndarray  # momentum sum over the trajectory
    depth: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray  # Σ min(1, e^{H0-H}) over leaves
    n_leaf: jnp.ndarray


def _transition(potential_fn, q, u_q, g_q, eps, m_inv, key, max_depth: int):
    """One NUTS draw. Returns (q', u', g', stats dict)."""
    dim = q.shape[0]
    dtype = q.dtype
    val_grad = jax.value_and_grad(potential_fn)

    k_mom, k_tree = jax.random.split(key)
    r0 = jax.random.normal(k_mom, (dim,), dtype=dtype) / jnp.sqrt(m_inv)
    h0 = u_q + 0.5 * jnp.dot(r0, m_inv * r0)

    def leapfrog(z, r, g, direction):
        e = direction * eps
        r = r - 0.5 * e * g
        z = z + e * m_inv * r
        u, g = val_grad(z)
        r = r - 0.5 * e * g
        return z, r, g, u

    def build_subtree(edge, direction, depth, key):
        """Integrate 2^depth leaves outward from ``edge``; progressive sampling
        with checkpoint-stack sub-U-turn checks."""
        z0, r0_, g0 = edge
        n_leaves = jnp.int32(1) << depth
        neg_inf = jnp.asarray(-jnp.inf, dtype)

        r_ck = jnp.zeros((max_depth, dim), dtype)
        rho_ck = jnp.zeros((max_depth, dim), dtype)

        init = dict(
            leaf=jnp.int32(0),
            z=z0,
            r=r0_,
            g=g0,
            z_prop=z0,
            u_prop=jnp.zeros((), dtype),
            g_prop=g0,
            log_w=neg_inf,
            rho=jnp.zeros((dim,), dtype),
            r_ck=r_ck,
            rho_ck=rho_ck,
            turning=jnp.asarray(False),
            diverging=jnp.asarray(False),
            sum_accept=jnp.zeros((), dtype),
        )

        def cond(s):
            return (s["leaf"] < n_leaves) & ~s["turning"] & ~s["diverging"]

        def body(s):
            z, r, g, u = leapfrog(s["z"], s["r"], s["g"], direction)
            h = u + 0.5 * jnp.dot(r, m_inv * r)
            dh = h - h0
            dh = jnp.where(jnp.isnan(dh), jnp.inf, dh)
            diverging = dh > MAX_DELTA_ENERGY
            log_w_leaf = -dh
            sum_accept = s["sum_accept"] + jnp.minimum(1.0, jnp.exp(-dh))
            # progressive multinomial within the subtree
            log_w_new = jnp.logaddexp(s["log_w"], log_w_leaf)
            k_u = jax.random.fold_in(k_sub, s["leaf"])
            take = (
                jnp.log(jax.random.uniform(k_u, dtype=dtype))
                < log_w_leaf - log_w_new
            )
            z_prop = jnp.where(take, z, s["z_prop"])
            u_prop = jnp.where(take, u, s["u_prop"])
            g_prop = jnp.where(take, g, s["g_prop"])
            rho = s["rho"] + r
            # checkpoint bookkeeping: even leaves push, odd leaves check
            leaf = s["leaf"]
            idx_min, idx_max = _leaf_ckpt_idxs(leaf)
            is_left_edge = (leaf & 1) == 0
            r_ck = jnp.where(
                is_left_edge, s["r_ck"].at[idx_max].set(r), s["r_ck"]
            )
            rho_ck = jnp.where(
                is_left_edge, s["rho_ck"].at[idx_max].set(rho - r), s["rho_ck"]
            )

            def check_turns(_):
                def tcond(c):
                    i, turning = c
                    return (i >= idx_min) & ~turning

                def tbody(c):
                    i, _ = c
                    rho_sub = rho - rho_ck[i]
                    return i - 1, _is_turning(m_inv, r_ck[i], r, rho_sub)

                _, turning = lax.while_loop(tcond, tbody, (idx_max, False))
                return turning

            turning = lax.cond(
                is_left_edge, lambda _: jnp.asarray(False), check_turns, None
            )
            return dict(
                leaf=leaf + 1,
                z=z,
                r=r,
                g=g,
                z_prop=z_prop,
                u_prop=u_prop,
                g_prop=g_prop,
                log_w=log_w_new,
                rho=rho,
                r_ck=r_ck,
                rho_ck=rho_ck,
                turning=turning,
                diverging=diverging,
                sum_accept=sum_accept,
            )

        k_sub = key
        s = lax.while_loop(cond, body, init)
        return s

    def tree_cond(t: _Tree):
        return (t.depth < max_depth) & ~t.turning & ~t.diverging

    def tree_body(t: _Tree):
        k_dir, k_sub, k_merge = jax.random.split(
            jax.random.fold_in(k_tree, t.depth), 3
        )
        go_right = jax.random.bernoulli(k_dir)
        direction = jnp.where(go_right, 1.0, -1.0).astype(dtype)
        edge = (
            jnp.where(go_right, t.z_r, t.z_l),
            jnp.where(go_right, t.r_r, t.r_l),
            jnp.where(go_right, t.g_r, t.g_l),
        )
        s = build_subtree(edge, direction, t.depth, k_sub)
        subtree_ok = ~s["turning"] & ~s["diverging"]
        # merge proposal: biased progressive, P(take new) = min(1, w_new/w_old)
        take = subtree_ok & (
            jnp.log(jax.random.uniform(k_merge, dtype=dtype))
            < s["log_w"] - t.log_w
        )
        z_prop = jnp.where(take, s["z_prop"], t.z_prop)
        u_prop = jnp.where(take, s["u_prop"], t.u_prop)
        g_prop = jnp.where(take, s["g_prop"], t.g_prop)
        log_w = jnp.where(subtree_ok, jnp.logaddexp(t.log_w, s["log_w"]), t.log_w)
        # extend the edge in the chosen direction
        z_l = jnp.where(go_right, t.z_l, s["z"])
        r_l = jnp.where(go_right, t.r_l, s["r"])
        g_l = jnp.where(go_right, t.g_l, s["g"])
        z_r = jnp.where(go_right, s["z"], t.z_r)
        r_r = jnp.where(go_right, s["r"], t.r_r)
        g_r = jnp.where(go_right, s["g"], t.g_r)
        rho = t.rho + s["rho"]
        turning = s["turning"] | (
            subtree_ok & _is_turning(m_inv, r_l, r_r, rho)
        )
        return _Tree(
            z_l,
            r_l,
            g_l,
            z_r,
            r_r,
            g_r,
            z_prop,
            u_prop,
            g_prop,
            log_w,
            rho,
            t.depth + 1,
            turning,
            s["diverging"],
            t.sum_accept + s["sum_accept"],
            t.n_leaf + s["leaf"],
        )

    t0 = _Tree(
        z_l=q,
        r_l=r0,
        g_l=g_q,
        z_r=q,
        r_r=r0,
        g_r=g_q,
        z_prop=q,
        u_prop=u_q,
        g_prop=g_q,
        log_w=jnp.zeros((), dtype),  # root leaf weight e^{-(H0-H0)} = 1
        rho=r0,
        depth=jnp.int32(0),
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.zeros((), dtype),
        n_leaf=jnp.int32(0),
    )
    t = lax.while_loop(tree_cond, tree_body, t0)
    accept_stat = t.sum_accept / jnp.maximum(t.n_leaf.astype(dtype), 1.0)
    stats = dict(
        accept_stat=accept_stat,
        depth=t.depth,
        n_leaf=t.n_leaf,
        diverging=t.diverging,
    )
    return t.z_prop, t.u_prop, t.g_prop, stats


@partial(
    jax.jit,
    static_argnames=("potential_fn", "n_samples", "n_warmup", "max_depth", "adapt_mass"),
)
def _run_nuts(
    potential_fn,
    q0,
    key,
    n_samples: int,
    step_size0,
    n_warmup: int,
    max_depth: int,
    target_accept,
    adapt_mass: bool,
    in_slow,
    window_end,
    da_step,
    m_inv0=None,
):
    dim = q0.shape[0]
    dtype = q0.dtype
    val_grad = jax.value_and_grad(potential_fn)
    gamma, t0c, kappa = 0.05, 10.0, 0.75

    def step(carry, inp):
        q, u_q, g_q, da, m_inv, wf = carry
        log_eps, log_eps_bar, h_bar, mu = da
        w_count, w_mean, w_m2 = wf
        i, k, slow_i, wend_i, m_i = inp
        in_warmup = i < n_warmup
        eps = jnp.where(in_warmup, jnp.exp(log_eps), jnp.exp(log_eps_bar))

        q, u_q, g_q, st = _transition(
            potential_fn, q, u_q, g_q, eps, m_inv, k, max_depth
        )

        # dual averaging on the mean leaf acceptance statistic
        m = m_i.astype(dtype)
        eta = 1.0 / (m + t0c)
        h_bar_n = (1.0 - eta) * h_bar + eta * (target_accept - st["accept_stat"])
        log_eps_n = mu - jnp.sqrt(m) / gamma * h_bar_n
        w = m ** (-kappa)
        log_eps_bar_n = w * log_eps_n + (1.0 - w) * log_eps_bar
        log_eps = jnp.where(in_warmup, log_eps_n, log_eps)
        log_eps_bar = jnp.where(in_warmup, log_eps_bar_n, log_eps_bar)
        h_bar = jnp.where(in_warmup, h_bar_n, h_bar)

        if adapt_mass:
            upd = slow_i.astype(dtype)
            c_n = w_count + upd
            delta = q - w_mean
            mean_n = w_mean + upd * delta / jnp.maximum(c_n, 1.0)
            m2_n = w_m2 + upd * delta * (q - mean_n)
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
        out = (q, u_q, st["accept_stat"], st["depth"], st["n_leaf"], st["diverging"])
        return carry, out

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    pad = n_samples
    in_slow_a = jnp.concatenate([jnp.asarray(in_slow, bool), jnp.zeros((pad,), bool)])
    wend_a = jnp.concatenate([jnp.asarray(window_end, bool), jnp.zeros((pad,), bool)])
    da_a = jnp.concatenate(
        [jnp.asarray(da_step, jnp.int32), jnp.ones((pad,), jnp.int32)]
    )
    zero = jnp.asarray(0.0, dtype) * q0[0]
    le0 = jnp.log(jnp.asarray(step_size0, dtype)) + zero
    da0 = (le0, le0, zero, jnp.log(10.0 * jnp.asarray(step_size0, dtype)) + zero)
    wf0 = (zero, jnp.zeros((dim,), dtype) + zero, jnp.zeros((dim,), dtype) + zero)
    u0, g0 = val_grad(q0)
    m_inv_init = (
        jnp.ones((dim,), dtype) if m_inv0 is None else jnp.asarray(m_inv0, dtype)
    ) + zero
    init = (q0, u0, g0, da0, m_inv_init, wf0)
    (qf, uf, gf, daf, m_inv_f, _), (qs, us, accs, depths, nls, divs) = lax.scan(
        step, init, (jnp.arange(n_total), keys, in_slow_a, wend_a, da_a)
    )
    return qs, us, accs, depths, nls, divs, jnp.exp(daf[1]), m_inv_f


def nuts_sample(
    potential_fn: Callable,
    init_position: jnp.ndarray,
    n_samples: int,
    key,
    step_size: float = 0.1,
    n_warmup: int = 500,
    max_depth: int = 8,
    target_accept: float = 0.8,
    adapt_mass: bool = True,
    mass_matrix=None,
) -> NUTSResult:
    """Draw ``n_samples`` NUTS samples after ``n_warmup`` adaptive-warmup draws.

    Same potential-over-packed-vector contract as :func:`.hmc.hmc_sample`;
    step size and (optionally) a diagonal inverse metric adapt during warmup
    via the Stan window schedule, so the only knob that usually matters is
    ``n_warmup``.  ``mass_matrix`` (P,): a diagonal mass seeding the metric
    (inverse metric = 1/mass); with ``adapt_mass=False`` it stays FIXED — the
    curvature-informed configuration (e.g. the clipped whitened-space
    Hessian diagonal) that beats the sample-adapted window metric on the
    GNMGP funnel (benchmarks/sampler_bench.py --mass hessian).
    """
    q0 = jnp.asarray(init_position)
    sched = window_schedule(int(n_warmup))
    qs, us, accs, depths, nls, divs, epsf, m_inv = _run_nuts(
        potential_fn,
        q0,
        key,
        int(n_samples),
        float(step_size),
        int(n_warmup),
        int(max_depth),
        float(target_accept),
        bool(adapt_mass),
        sched.in_slow,
        sched.window_end,
        sched.da_step,
        m_inv0=None if mass_matrix is None else 1.0 / jnp.asarray(mass_matrix),
    )
    n_warmup = int(n_warmup)
    return NUTSResult(
        samples=qs[n_warmup:],
        potentials=us[n_warmup:],
        accept_stat=accs,
        tree_depth=depths,
        n_leapfrog=nls,
        diverging=divs,
        step_size=epsf,
        inv_mass=m_inv,
    )


def nuts_sample_chains(
    potential_fn: Callable,
    init_positions: jnp.ndarray,
    n_samples: int,
    key,
    **kwargs,
) -> NUTSResult:
    """Several independent NUTS chains batched on-device (cf. hmc_sample_chains)."""
    keys = jax.random.split(key, init_positions.shape[0])
    return jax.vmap(
        lambda q0, k: nuts_sample(potential_fn, q0, n_samples, k, **kwargs)
    )(init_positions, keys)
