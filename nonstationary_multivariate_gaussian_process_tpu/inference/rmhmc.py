"""Riemannian-manifold HMC with the SoftAbs metric, fully jitted.

The round-3 sampler study (inference/drhmc.py docstring) ran every
fixed-geometry escalation on the GNMGP posterior at the reference scale
(N=200) — whitening, PNCP, Hessian-diag mass, windowed adaptation, NUTS,
replica exchange, delayed rejection — and none moves min-ESS out of a 3–5
band at the 400–2400-draw budgets.  The measured diagnosis: the obstruction
is a *nonlinear collective ridge* (amplitude–lengthscale trade-off between
latent blocks) that no fixed linear map or global step-size schedule
traverses.  The principled escalation is a **position-dependent metric**:
Riemannian-manifold HMC (Girolami & Calderhead 2011) with Betancourt's
SoftAbs map (2013) — the metric is a smooth SPD regularization of the local
Hessian, so the sampler re-scales itself *along* the ridge as it moves.

Built from the papers' math as fixed-shape XLA programs; the reference has
no counterpart (its sampler is an external fixed-budget HMC,
``Nonseparable_model.py:228-231``).

Two tiers:

* :func:`rmhmc_sample` — full-space SoftAbs RMHMC.  Metric
  ``G(q) = V softabs(Λ) Vᵀ`` from ``H(q) = V Λ Vᵀ`` (the potential's
  Hessian), ``softabs(λ) = λ·coth(αλ)`` (→ 1/α as λ→0, so G is always
  SPD).  The non-separable Hamiltonian ``H(q,p) = U(q) + ½ log|G(q)| +
  ½ pᵀG(q)⁻¹p`` is integrated with the generalized (implicit) leapfrog;
  the fixed-point solves run a *fixed* iteration count so the whole chain
  is one ``lax.scan``.
* :func:`rmhmc_gibbs_sample` — the practical tier at model scale.  Full-
  space RMHMC costs O(P) Hessian columns per metric eval (P≈800 at
  N=200), so instead: Metropolis-within-Gibbs alternation of (a) one plain
  fused-leapfrog HMC draw over the whole (whitened) vector and (b) one
  SoftAbs-RMHMC draw over the ``k`` worst-mixing coordinates (the measured
  ridge directions, chosen by :func:`slowest_coords` from a pilot), with
  the rest conditioned.  The subspace Hessian is k×k — ``k`` HVPs per
  metric eval — so the position-dependent tier costs a constant factor,
  not O(P).  Both component kernels leave the posterior invariant, hence
  so does the alternation.

Derivative stability: naive reverse-mode through ``eigh`` divides by
eigenvalue gaps and NaNs at (near-)degenerate spectra — Neal's funnel is
degenerate at its mode, and a structured GP Hessian can be too.  The
Hamiltonian gradients here instead use the Daleckii–Krein matrix-function
calculus from the SoftAbs paper:

    ∂q ½log|G|   = ½ tr(M ∂H/∂q),   M = V diag(f'(λ)/f(λ)) Vᵀ
    ∂q ½pᵀG⁻¹p   = tr(S ∂H/∂q),     S = −½ V (J ∘ w wᵀ) Vᵀ,  w = f(Λ)⁻¹Vᵀp
    J_ij = (f(λ_i) − f(λ_j)) / (λ_i − λ_j)   (→ f'(λ) on the diagonal)

— the divided differences are finite at λ_i = λ_j, and the only autodiff
call is the cotangent contraction ``∂q tr(C·H(q))`` with ``C`` frozen
(third-order AD through the *potential*, never through ``eigh``).
The truncated fixed point's residual non-reversibility is measured in
tests/test_rmhmc.py (round-trip error at working step sizes ≪ MH noise).

Measured (benchmarks/sampler_bench.py --samplers rmhmc): the funnel
validation and Gaussian/Gibbs exactness run on CPU (tests/test_rmhmc.py).
**On the TPU, run the Gibbs tier with ``dispatch="host"``** (workflows
and sampler_bench route it automatically off-CPU): the monolithic chain
— third-order AD through the GNMGP potential inside one ``lax.scan``
program — reproducibly trips a device fault on the current runtime at
k=12/fp=6 and at the reduced k=8/fp=4/leapfrog=4 alike (the monolithic
f64 HMC scan's failure class, CLAUDE.md), and one XLA dispatch per draw
is the same measured fix that lets SMC run there: at N=200
(k=8/fp=4/leapfrog=4, f32, whitened) the host-dispatched chain runs 100
draws in 162 s on the chip, draws bit-identical to the scan driver
(tests/test_rmhmc.py).  The *statistical* N=200 verdict is unchanged —
min-ESS at a 50-draw budget sits in the same 3-5 band as every chain
tier (the obstruction is the collective ridge, and a k-subspace metric
does not thread it either) — so the production posture at that scale
remains tempered SMC (inference/smc.py); RMHMC is the escalation for
posteriors whose *necks* DRHMC cannot thread.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

import numpy as np


class RMHMCResult(NamedTuple):
    samples: jnp.ndarray  # (n_samples, P) post-warmup draws
    accept_prob: jnp.ndarray  # (n_total,) per-draw acceptance probabilities
    accepted: jnp.ndarray  # (n_total,) accept indicator
    step_size: jnp.ndarray  # final (possibly adapted) step size
    potentials: jnp.ndarray  # (n_samples,) potential at each kept draw


class RMHMCGibbsResult(NamedTuple):
    samples: jnp.ndarray  # (n_samples, P) post-warmup draws
    accept_prob: jnp.ndarray  # (n_total,) full-space HMC stage accept prob
    rm_accept_prob: jnp.ndarray  # (n_total,) subspace RMHMC stage accept prob
    step_size: jnp.ndarray  # final HMC step size
    rm_step_size: jnp.ndarray  # final RMHMC step size
    potentials: jnp.ndarray  # (n_samples,)


def slowest_coords(samples, k: int) -> np.ndarray:
    """Indices of the ``k`` worst-mixing coordinates of a pilot chain.

    Ranks coordinates by effective sample size (diagnostics.ess) — the
    subspace where the measured ridge lives.  Host-side helper; feed the
    result to :func:`rmhmc_gibbs_sample`.
    """
    from . import diagnostics

    s = np.asarray(samples)
    if s.ndim != 2:
        raise ValueError(f"samples must be (n_draws, P), got {s.shape}")
    esses = np.array([diagnostics.ess(s[:, j]) for j in range(s.shape[1])])
    return np.sort(np.argsort(esses)[:k])


def _softabs(lam, alpha):
    """f(λ) = λ·coth(αλ): smooth |λ| with SPD floor 1/α (NaN-safe at 0)."""
    al = alpha * lam
    small = jnp.abs(al) < 1e-4
    lam_s = jnp.where(small, 1.0, lam)
    al_s = jnp.where(small, 1.0, al)
    return jnp.where(small, (1.0 + al * al / 3.0) / alpha, lam_s / jnp.tanh(al_s))


def _softabs_d(lam, alpha):
    """f'(λ) = coth(αλ) − αλ/sinh²(αλ); → (2/3)αλ near 0, ±1 at ±∞."""
    al = alpha * lam
    small = jnp.abs(al) < 1e-4
    al_s = jnp.where(small, 1.0, al)
    sh = jnp.sinh(al_s)
    val = 1.0 / jnp.tanh(al_s) - al_s / (sh * sh)
    return jnp.where(small, (2.0 / 3.0) * al, val)


def _divdiff(lam, lt, alpha):
    """Daleckii–Krein divided differences J_ij of the SoftAbs map.

    ``J_ij = (f(λ_i) − f(λ_j))/(λ_i − λ_j)`` with the diagonal / near-
    degenerate entries replaced by ``f'`` at the midpoint — finite at
    exact degeneracy (the place naive eigh autodiff NaNs).
    """
    dl = lam[:, None] - lam[None, :]
    df = lt[:, None] - lt[None, :]
    near = jnp.abs(dl) < 1e-8 * (1.0 + jnp.abs(lam[:, None]) + jnp.abs(lam[None, :]))
    mid = 0.5 * (lam[:, None] + lam[None, :])
    dl_s = jnp.where(near, 1.0, dl)
    return jnp.where(near, _softabs_d(mid, alpha), df / dl_s)


class _Geom(NamedTuple):
    """SoftAbs geometry over ``u_fn(z, *ctx)`` (ctx: conditioned state)."""

    aux: Callable  # z, *ctx -> (lam, V, softabs(lam))
    third: Callable  # z, *ctx -> T = ∂H/∂z, (k, k, k), T[..., d] = ∂H/∂z_d
    g_free: Callable  # z, aux, T, *ctx -> ∂z [U + ½log|G|]
    g_quad: Callable  # aux, T, p -> ∂z ½pᵀG⁻¹p
    ginv_mul: Callable  # aux, p -> G⁻¹p
    grad_u: Callable


def _make_geom(u_fn, alpha) -> _Geom:
    """SoftAbs geometry with the metric-derivative tensor hoisted.

    The third-derivative tensor ``T = ∂H/∂z`` ((k,k,k), one ``jacfwd`` over
    the Hessian) is computed ONCE per leapfrog step and reused by every
    fixed-point iteration — the p-dependent Hamiltonian gradient is then a
    k³ einsum with zero potential evaluations, which is what makes the
    Gibbs tier affordable at model scale (the first build re-ran
    third-order AD per iteration and was ~n_fp× more expensive).
    """
    hess = jax.hessian(u_fn, argnums=0)
    grad_u = jax.grad(u_fn, argnums=0)

    def sym_hess(z, *ctx):
        h = hess(z, *ctx)
        return 0.5 * (h + h.T)

    third = jax.jacfwd(sym_hess, argnums=0)

    def aux(z, *ctx):
        lam, v = jnp.linalg.eigh(sym_hess(z, *ctx))
        return lam, v, _softabs(lam, alpha)

    def g_free(z, a, t, *ctx):
        lam, v, lt = a
        m = (v * (_softabs_d(lam, alpha) / lt)) @ v.T
        return grad_u(z, *ctx) + 0.5 * jnp.einsum("ij,ijd->d", m, t)

    def g_quad(a, t, p):
        lam, v, lt = a
        w = (v.T @ p) / lt
        s = -0.5 * v @ (_divdiff(lam, lt, alpha) * jnp.outer(w, w)) @ v.T
        return jnp.einsum("ij,ijd->d", s, t)

    def ginv_mul(a, p):
        _, v, lt = a
        return v @ ((v.T @ p) / lt)

    return _Geom(aux, third, g_free, g_quad, ginv_mul, grad_u)


def _rm_draw(geom: _Geom, u_fn, z, u_z, eps, n_leapfrog, n_fp, key, ctx=()):
    """One SoftAbs-RMHMC Metropolis draw from ``z`` (ctx held fixed).

    Returns (z', u', accept_prob, accepted).  ``u_z`` is U(z) (not the free
    energy); the log|G| pieces are added symmetrically here.
    """
    dtype = z.dtype
    k_mom, k_acc = jax.random.split(key)

    a0 = geom.aux(z, *ctx)
    lam0, v0, lt0 = a0
    xi = jax.random.normal(k_mom, z.shape, dtype=dtype)
    p = v0 @ (jnp.sqrt(lt0) * xi)

    def kinetic(a, p):
        _, v, lt = a
        w = v.T @ p
        return 0.5 * jnp.sum(jnp.log(lt)) + 0.5 * jnp.dot(w / lt, w)

    h0 = u_z + kinetic(a0, p)

    def one_step(carry, _):
        z, p, a, t = carry
        gf = geom.g_free(z, a, t, *ctx)

        def mom_iter(ph, _):
            return p - 0.5 * eps * (gf + geom.g_quad(a, t, ph)), None

        ph, _ = jax.lax.scan(mom_iter, p, None, length=n_fp)
        half = 0.5 * eps * geom.ginv_mul(a, ph)

        def pos_iter(zn, _):
            return z + half + 0.5 * eps * geom.ginv_mul(geom.aux(zn, *ctx), ph), None

        zn, _ = jax.lax.scan(pos_iter, z, None, length=n_fp)
        an = geom.aux(zn, *ctx)
        tn = geom.third(zn, *ctx)
        pn = ph - 0.5 * eps * (geom.g_free(zn, an, tn, *ctx) + geom.g_quad(an, tn, ph))
        return (zn, pn, an, tn), None

    t0 = geom.third(z, *ctx)
    (z1, p1, a1, _t1), _ = jax.lax.scan(
        one_step, (z, p, a0, t0), None, length=n_leapfrog
    )
    u1 = u_fn(z1, *ctx)
    h1 = u1 + kinetic(a1, p1)
    log_accept = jnp.where(
        jnp.isfinite(h1) & jnp.all(jnp.isfinite(z1)),
        jnp.minimum(0.0, h0 - h1),
        -jnp.inf,
    )
    accept = jnp.log(jax.random.uniform(k_acc, dtype=dtype)) < log_accept
    z = jnp.where(accept, z1, z)
    u_z = jnp.where(accept, u1, u_z)
    return z, u_z, jnp.exp(log_accept), accept


def _dual_avg(da_state, accept_prob, i, mu, n_warmup, target_accept, dtype):
    gamma, t0, kappa = 0.05, 10.0, 0.75
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
    return da_state, eps


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn", "n_samples", "n_leapfrog", "n_fp", "n_warmup",
        "adapt_step_size",
    ),
)
def _run(
    potential_fn,
    q0,
    key,
    n_samples: int,
    step_size0,
    n_leapfrog: int,
    n_fp: int,
    alpha,
    n_warmup: int,
    adapt_step_size: bool,
    target_accept,
):
    dtype = q0.dtype
    geom = _make_geom(potential_fn, jnp.asarray(alpha, dtype))
    mu = jnp.log(10.0 * jnp.asarray(step_size0, dtype))

    def step(carry, inp):
        q, u_q, da_state, eps = carry
        i, k = inp
        q, u_q, ap, acc = _rm_draw(
            geom, potential_fn, q, u_q, eps, n_leapfrog, n_fp, k
        )
        if adapt_step_size:
            da_state, eps = _dual_avg(
                da_state, ap, i, mu, n_warmup, target_accept, dtype
            )
        return (q, u_q, da_state, eps), (q, u_q, ap, acc)

    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    zero = jnp.asarray(0.0, dtype) * q0[0]
    le0 = jnp.log(jnp.asarray(step_size0, dtype)) + zero
    init = (q0, potential_fn(q0), (le0, le0, zero),
            jnp.asarray(step_size0, dtype) + zero)
    (_qf, _uf, _daf, epsf), (qs, us, aps, accs) = jax.lax.scan(
        step, init, (jnp.arange(n_total), keys)
    )
    return qs, us, aps, accs, epsf


def rmhmc_sample(
    potential_fn: Callable,
    init_position: jnp.ndarray,
    n_samples: int,
    key,
    step_size: float = 0.1,
    n_leapfrog: int = 8,
    n_fp: int = 6,
    alpha: float = 1e3,
    n_warmup: int = 0,
    adapt_step_size: bool = True,
    target_accept: float = 0.75,
) -> RMHMCResult:
    """Full-space SoftAbs RMHMC over the packed parameter vector.

    Same potential contract as :func:`.hmc.hmc_sample`.  Each metric
    evaluation costs a full Hessian (P fwd-over-rev passes), so this tier
    is for small P (≲100): validated posteriors (Neal's funnel, where plain
    HMC is provably biased) and as the subspace stage of
    :func:`rmhmc_gibbs_sample` at model scale.

    ``alpha`` is the SoftAbs sharpness: eigenvalues below 1/alpha in
    magnitude are floored, so 1/alpha acts like the largest squared step
    the metric will ever request.  ``n_fp`` fixed-point iterations per
    implicit half-step (static).
    """
    q0 = jnp.asarray(init_position)
    qs, us, aps, accs, epsf = _run(
        potential_fn, q0, key, int(n_samples), float(step_size),
        int(n_leapfrog), int(n_fp), float(alpha), int(n_warmup),
        bool(adapt_step_size), float(target_accept),
    )
    n_warmup = int(n_warmup)
    return RMHMCResult(
        samples=qs[n_warmup:],
        accept_prob=aps,
        accepted=accs,
        step_size=epsf,
        potentials=us[n_warmup:],
    )


def _make_gibbs_step(
    potential_fn,
    idx,
    dim: int,
    dtype,
    step_size0,
    rm_step_size0,
    n_leapfrog: int,
    rm_leapfrog: int,
    n_fp: int,
    alpha,
    n_warmup: int,
    adapt_step_size: bool,
    target_accept,
):
    """Build the per-draw Gibbs ``step(carry, (i, key))`` shared by the
    scan driver and the host-dispatched loop (identical draws)."""
    grad_u = jax.grad(potential_fn)
    val_grad_u = jax.value_and_grad(potential_fn)

    # stage-B geometry: subspace potential conditioned on the full vector
    def sub_potential(z, q_full):
        return potential_fn(q_full.at[idx].set(z))

    geom = _make_geom(sub_potential, jnp.asarray(alpha, dtype))

    def hmc_leapfrog(q, p, g_q, eps):
        p = p - 0.5 * eps * g_q
        q = q + eps * p

        def body(_, carry):
            q, p = carry
            p = p - eps * grad_u(q)
            q = q + eps * p
            return (q, p)

        q, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (q, p))
        u, g = val_grad_u(q)
        p = p - 0.5 * eps * g
        return q, p, u, g

    mu_a = jnp.log(10.0 * jnp.asarray(step_size0, dtype))
    mu_b = jnp.log(10.0 * jnp.asarray(rm_step_size0, dtype))

    def step(carry, inp):
        q, u_q, g_q, da_a, eps_a, da_b, eps_b = carry
        i, k = inp
        k1, k2, k3 = jax.random.split(k, 3)

        # -- stage A: full-space HMC draw (identity metric; compose with
        # whiten for the dense prior part, as everywhere else)
        p = jax.random.normal(k1, (dim,), dtype=dtype)
        h0 = u_q + 0.5 * jnp.dot(p, p)
        q_new, p_new, u_new, g_new = hmc_leapfrog(q, p, g_q, eps_a)
        h1 = u_new + 0.5 * jnp.dot(p_new, p_new)
        la = jnp.where(jnp.isfinite(h1), jnp.minimum(0.0, h0 - h1), -jnp.inf)
        ap_a = jnp.exp(la)
        acc = jnp.log(jax.random.uniform(k2, dtype=dtype)) < la
        q = jnp.where(acc, q_new, q)
        u_q = jnp.where(acc, u_new, u_q)
        g_q = jnp.where(acc, g_new, g_q)

        # -- stage B: subspace RMHMC draw conditioned on the rest
        z, u_z, ap_b, acc_b = _rm_draw(
            geom, sub_potential, q[idx], u_q, eps_b, rm_leapfrog, n_fp, k3,
            ctx=(q,),
        )
        q = jnp.where(acc_b, q.at[idx].set(z), q)
        u_q = u_z
        # the cached full-space gradient moved with the subspace coords
        g_q = jnp.where(acc_b, grad_u(q), g_q)

        if adapt_step_size:
            da_a, eps_a = _dual_avg(da_a, ap_a, i, mu_a, n_warmup,
                                    target_accept, dtype)
            da_b, eps_b = _dual_avg(da_b, ap_b, i, mu_b, n_warmup,
                                    target_accept, dtype)

        carry = (q, u_q, g_q, da_a, eps_a, da_b, eps_b)
        return carry, (q, u_q, ap_a, ap_b)

    return step, val_grad_u


def _gibbs_init(q0, val_grad_u, step_size0, rm_step_size0, dtype):
    zero = jnp.asarray(0.0, dtype) * q0[0]
    le_a = jnp.log(jnp.asarray(step_size0, dtype)) + zero
    le_b = jnp.log(jnp.asarray(rm_step_size0, dtype)) + zero
    u0, g0 = val_grad_u(q0)
    return (
        q0, u0, g0,
        (le_a, le_a, zero), jnp.asarray(step_size0, dtype) + zero,
        (le_b, le_b, zero), jnp.asarray(rm_step_size0, dtype) + zero,
    )


@partial(
    jax.jit,
    static_argnames=(
        "potential_fn", "n_samples", "n_leapfrog", "rm_leapfrog", "n_fp",
        "n_warmup", "adapt_step_size",
    ),
)
def _run_gibbs(
    potential_fn,
    q0,
    idx,
    key,
    n_samples: int,
    step_size0,
    rm_step_size0,
    n_leapfrog: int,
    rm_leapfrog: int,
    n_fp: int,
    alpha,
    n_warmup: int,
    adapt_step_size: bool,
    target_accept,
):
    dtype = q0.dtype
    step, val_grad_u = _make_gibbs_step(
        potential_fn, idx, q0.shape[0], dtype, step_size0, rm_step_size0,
        n_leapfrog, rm_leapfrog, n_fp, alpha, n_warmup, adapt_step_size,
        target_accept,
    )
    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    init = _gibbs_init(q0, val_grad_u, step_size0, rm_step_size0, dtype)
    (qf, uf, gf, daa, epsa, dab, epsb), (qs, us, apa, apb) = jax.lax.scan(
        step, init, (jnp.arange(n_total), keys)
    )
    return qs, us, apa, apb, epsa, epsb


def _run_gibbs_host(
    potential_fn,
    q0,
    idx,
    key,
    n_samples: int,
    step_size0,
    rm_step_size0,
    n_leapfrog: int,
    rm_leapfrog: int,
    n_fp: int,
    alpha,
    n_warmup: int,
    adapt_step_size: bool,
    target_accept,
):
    """One XLA dispatch per draw: the tunneled TPU faults minutes-long
    single-program executions (the monolithic-scan failure class,
    CLAUDE.md) — the same posture that lets SMC run there.  Same step
    body, same key threading: draws are bit-identical to the scan
    (tests/test_rmhmc.py pins it)."""
    dtype = q0.dtype
    step, val_grad_u = _make_gibbs_step(
        potential_fn, idx, q0.shape[0], dtype, step_size0, rm_step_size0,
        n_leapfrog, rm_leapfrog, n_fp, alpha, n_warmup, adapt_step_size,
        target_accept,
    )
    step_j = jax.jit(step)
    n_total = n_warmup + n_samples
    keys = jax.random.split(key, n_total)
    carry = _gibbs_init(q0, val_grad_u, step_size0, rm_step_size0, dtype)
    qs_l, us_l, apa_l, apb_l = [], [], [], []
    for i in range(n_total):
        carry, (q_i, u_i, ap_a, ap_b) = step_j(
            carry, (jnp.asarray(i), keys[i])
        )
        jax.block_until_ready(q_i)
        qs_l.append(q_i)
        us_l.append(u_i)
        apa_l.append(ap_a)
        apb_l.append(ap_b)
    return (jnp.stack(qs_l), jnp.stack(us_l), jnp.stack(apa_l),
            jnp.stack(apb_l), carry[4], carry[6])


def rmhmc_gibbs_sample(
    potential_fn: Callable,
    init_position: jnp.ndarray,
    n_samples: int,
    key,
    idx,
    step_size: float = 1e-3,
    rm_step_size: float = 0.2,
    n_leapfrog: int = 20,
    rm_leapfrog: int = 8,
    n_fp: int = 6,
    alpha: float = 1e3,
    n_warmup: int = 0,
    adapt_step_size: bool = True,
    target_accept: float = 0.75,
    dispatch: str = "device",
) -> RMHMCGibbsResult:
    """RMHMC-within-Gibbs: plain HMC globally + SoftAbs RMHMC on ``idx``.

    Each draw alternates (a) one full-space fused-leapfrog HMC proposal
    (``step_size`` / ``n_leapfrog``, identity metric — compose with
    :mod:`.whiten` as everywhere else) and (b) one SoftAbs-RMHMC proposal
    over the ``idx`` coordinates with the others held fixed
    (``rm_step_size`` / ``rm_leapfrog``).  Both stages are valid
    posterior-invariant Metropolis kernels, so the composition is too.
    Pick ``idx`` with :func:`slowest_coords` on a pilot chain — the
    whitened directions whose min-ESS pins the chain (the measured
    collective ridge, inference/drhmc.py docstring).

    Both step sizes dual-average independently toward ``target_accept``
    during warmup.  Cost per draw ≈ ``n_leapfrog`` full gradients +
    ``rm_leapfrog`` subspace steps, each paying ``n_fp + 1`` subspace
    Hessian+eigh evals (the implicit position update re-evaluates the
    metric at the moving endpoint) plus ONE metric-derivative tensor
    (``k`` forward tangents through the Hessian, hoisted out of the
    momentum fixed point — those iterations are k³ einsums).
    """
    q0 = jnp.asarray(init_position)
    idx = jnp.asarray(idx, jnp.int32)
    if idx.ndim != 1 or idx.shape[0] < 1:
        raise ValueError(
            f"idx must be a non-empty 1-D index array, got shape {idx.shape}"
        )
    if dispatch not in ("device", "host"):
        raise ValueError(f"unknown dispatch {dispatch!r} "
                         "(want 'device' or 'host')")
    run = _run_gibbs if dispatch == "device" else _run_gibbs_host
    qs, us, apa, apb, epsa, epsb = run(
        potential_fn, q0, idx, key, int(n_samples), float(step_size),
        float(rm_step_size), int(n_leapfrog), int(rm_leapfrog), int(n_fp),
        float(alpha), int(n_warmup), bool(adapt_step_size),
        float(target_accept),
    )
    n_warmup = int(n_warmup)
    return RMHMCGibbsResult(
        samples=qs[n_warmup:],
        accept_prob=apa,
        rm_accept_prob=apb,
        step_size=epsa,
        rm_step_size=epsb,
        potentials=us[n_warmup:],
    )
