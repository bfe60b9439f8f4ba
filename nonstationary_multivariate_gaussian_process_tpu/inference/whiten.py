"""Whitened and partially non-centered parameterizations for the latent-GP blocks.

The dominant obstacle to MCMC mixing in these models is not the likelihood
but the **prior geometry**: the smooth RBF prior Grams over the latent
processes (tilde_l, the uL-columns, the hetero noise rows) have condition
numbers of 1e6+, so in the natural parameterization the posterior is a long
curved ridge that neither step-size adaptation nor a *diagonal* metric can
fix (measured: min-ESS pinned at the noise floor for HMC, windowed HMC and
NUTS alike, benchmarks/sampler_bench.py).

The classical fix is to sample the whitened variables ``u`` with
``block = mu + L_prior @ u``: the prior over ``u`` is (approximately)
standard normal, and only the likelihood bends the geometry.  Because the
map is a *fixed invertible linear* reparameterization its Jacobian is
constant — the transformed chain targets exactly the same posterior no
matter what ``L`` is; matching the prior factor is purely an efficiency
choice.  The reference has no equivalent (its sampler runs in the natural
space, ``Nonseparable_model.py:228-231``).

Prior whitening serves the *prior-dominated* directions.  Where the
likelihood concentrates the latents (large N, small noise), the posterior
scale in a direction shrinks far below the prior scale and the whitened
chain is again mis-scaled.  :func:`retune` implements the **partially
non-centered** refinement: with the eigen-mode whitener (``mode="eig"``,
map ``A = U diag(s)`` per block), warmup draws estimate each direction's
*posterior* standard deviation and the map scale is interpolated
``s ← s_prior^(1-interp) · s_posterior^interp``.  At ``interp=0`` this is
pure prior whitening (non-centered); at ``interp=1`` the map matches the
posterior's per-direction scales — the optimal fixed diagonal-in-the-
eigenbasis preconditioner.  Any fixed choice targets the same posterior.

Measured honestly (GNMGP, f32): ONE round of diagonal retuning helps
modestly (n=96: min-ESS 10.7 → 12.2; N=200 on TPU: 3.0 → 3.3 at a 400-draw
budget).  Stronger fixed linear maps were tried and LOSE — iterated retuning
(min-ESS 2.8: correlated-pilot scale noise compounds), a dense pilot-
covariance second stage (4.5: a P×P covariance cannot be estimated from a
few hundred correlated draws), and exact-Hessian Laplace preconditioning
(3.7: the whitened Hessian at the MAP is *indefinite*, eigenvalues
[-148, 129] at n=96 — the residual obstruction is nonlinear funnel
geometry, which no fixed linear map removes).  Use ``whiten=True`` by
default; reach for ``"pncp"`` when the posterior is strongly likelihood-
dominated and a decent pilot is affordable.

Usage::

    w = make_whitener("gnmgp", x, n, m, hyper)              # prior-whitened
    res = hmc.hmc_sample(w.wrap(nlp), w.to_white(map_vec), ...)
    samples = w.from_white_batch(res.samples)

    w0 = make_whitener("gnmgp", x, n, m, hyper, mode="eig")  # PNCP
    pilot = hmc.hmc_sample(w0.wrap(nlp), w0.to_white(map_vec), ...)
    w1 = retune(w0, w0.from_white_batch(pilot.samples))
    main = hmc.hmc_sample(w1.wrap(nlp), w1.to_white(map_vec), ...)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..models import gnmgp, gnmgp_hetero, snmgp
from ..ops import chol, transforms


class _Block(NamedTuple):
    """One latent-GP segment of the packed parameter vector.

    Chol mode (``basis is None``): the map is the triangular prior factor
    ``l``; its inverse is applied by triangular solve.  Eig mode: the map is
    ``A = basis · diag-in-layout(scale)`` with orthogonal ``basis`` — the
    inverse is the cheap ``scale⁻¹ · basisᵀ``, and ``scale`` (stored in the
    whitened layout, per direction *and* per series) is retunable.
    """

    start: int
    stop: int
    k: int  # number of independent GP series in the block
    rows: bool  # True: reshape(k, n) rows are series; False: reshape(n, k) cols
    l: jnp.ndarray | None  # (n, n) lower prior factor (chol mode)
    mu: float
    basis: jnp.ndarray | None = None  # (n, n) orthogonal eigenbasis (eig mode)
    scale: jnp.ndarray | None = None  # whitened-layout map scales (eig mode)


class Whitener(NamedTuple):
    blocks: tuple
    n_params: int
    #: optional per-coordinate scale for the coordinates *outside* the GP
    #: blocks (raw hypers); entries inside block ranges are ignored.
    raw_scale: jnp.ndarray | None = None

    def from_white(self, u: jnp.ndarray) -> jnp.ndarray:
        """Whitened vector -> natural packed parameter vector."""
        vec = u if self.raw_scale is None else u * self.raw_scale
        for b in self.blocks:
            seg = u[b.start : b.stop]
            if b.basis is not None:
                if b.rows:
                    val = b.mu + (seg.reshape(b.k, -1) * b.scale) @ b.basis.T
                else:
                    val = b.mu + b.basis @ (b.scale * seg.reshape(-1, b.k))
            elif b.rows:
                val = b.mu + seg.reshape(b.k, -1) @ b.l.T
            else:
                val = b.mu + b.l @ seg.reshape(-1, b.k)
            vec = vec.at[b.start : b.stop].set(val.reshape(-1))
        return vec

    def to_white(self, vec: jnp.ndarray) -> jnp.ndarray:
        """Natural packed vector -> whitened vector."""
        vec = jnp.asarray(vec)
        u = vec if self.raw_scale is None else vec / self.raw_scale
        for b in self.blocks:
            seg = vec[b.start : b.stop]
            if b.basis is not None:
                if b.rows:
                    sol = ((seg.reshape(b.k, -1) - b.mu) @ b.basis) / b.scale
                else:
                    sol = (b.basis.T @ (seg.reshape(-1, b.k) - b.mu)) / b.scale
            elif b.rows:
                sol = jax.scipy.linalg.solve_triangular(
                    b.l, (seg.reshape(b.k, -1) - b.mu).T, lower=True
                ).T
            else:
                sol = jax.scipy.linalg.solve_triangular(
                    b.l, seg.reshape(-1, b.k) - b.mu, lower=True
                )
            u = u.at[b.start : b.stop].set(sol.reshape(-1))
        return u

    def from_white_batch(self, us: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(self.from_white)(jnp.asarray(us))

    def to_white_batch(self, vecs: jnp.ndarray) -> jnp.ndarray:
        return jax.vmap(self.to_white)(jnp.asarray(vecs))

    def wrap(self, potential_fn: Callable) -> Callable:
        """Whitened-space potential: same posterior, benign geometry."""

        def wrapped(u):
            return potential_fn(self.from_white(u))

        return wrapped

    def logdet(self) -> jnp.ndarray:
        """log |det d(from_white)/du| — the (constant) Jacobian of the map.

        Converts whitened-space normalizing constants to natural-space ones:
        ``log \\int exp(-nlp(vec)) dvec = smc.logz + whitener.logdet()``
        (the map is affine, so the Jacobian is position-independent).
        """
        total = jnp.asarray(0.0)
        covered = np.zeros(self.n_params, dtype=bool)
        for b in self.blocks:
            covered[b.start : b.stop] = True
            if b.basis is not None:  # orthogonal basis: |det| = 1
                total = total + jnp.sum(jnp.log(jnp.abs(b.scale)))
            else:
                total = total + float(b.k) * jnp.sum(
                    jnp.log(jnp.diag(b.l))
                )
        if self.raw_scale is not None:
            total = total + jnp.sum(
                jnp.log(jnp.abs(self.raw_scale[~covered]))
            )
        return total


#: Hadamard-layout GNMGP prior defaults (models/gnmgp.nlogpos_hadamard).
_GNMGP_HADAMARD_HYPERS = {
    "mu_tilde_l": 0.0, "alpha_tilde_l": 1.0, "beta_tilde_l": 1.0,
    "mu_L": 0.0, "alpha_L": 1.0, "beta_L": 1.0,
}


def _make_block(start, stop, k, rows, x, alpha, beta, mu, mode):
    if mode == "chol":
        return _Block(start, stop, k, rows, chol.prior_rbf_cholesky(x, alpha, beta), mu)
    u, s = chol.prior_rbf_eig(x, alpha, beta)
    n = u.shape[0]
    layout = (k, n) if rows else (n, k)
    scale = jnp.broadcast_to(s if rows else s[:, None], layout)
    return _Block(start, stop, k, rows, None, mu, basis=u, scale=scale)


def make_whitener(
    model_name: str,
    x,
    n: int,
    m: int,
    hyper: dict | None = None,
    hadamard: bool = False,
    mode: str = "chol",
) -> Whitener:
    """Prior-factor whitener for a model's latent-GP blocks.

    Factors are built host-side in float64 (``ops.chol.prior_rbf_cholesky`` /
    ``prior_rbf_eig``) with the same hypers the objective uses, so the
    whitened prior is standard normal to factorization roundoff.  LMC has no
    latent processes — its whitener is the identity (no blocks).
    ``hadamard=True`` selects the Hadamard-layout prior defaults (the
    latent-block layout is identical).  ``mode="eig"`` uses the orthogonal
    eigenbasis map, required by :func:`retune` (PNCP).
    """
    if mode not in ("chol", "eig"):
        raise ValueError(f"mode must be 'chol' or 'eig', got {mode!r}")
    t = transforms.tri_size(m)
    blocks: list[_Block] = []
    if model_name == "gnmgp":
        base_hp = _GNMGP_HADAMARD_HYPERS if hadamard else gnmgp.DEFAULT_HYPERS
        hp = {**gnmgp.DEFAULT_HYPERS, **base_hp, **(hyper or {})}
        blocks = [
            _make_block(0, n, 1, False, x, hp["alpha_tilde_l"], hp["beta_tilde_l"],
                        hp["mu_tilde_l"], mode),
            _make_block(n, n + n * t, t, False, x, hp["alpha_L"], hp["beta_L"],
                        hp["mu_L"], mode),
        ]
        n_params = gnmgp.n_params(n, m)
    elif model_name == "snmgp":
        hp = {**snmgp.DEFAULT_HYPERS, **(hyper or {})}
        blocks = [
            _make_block(0, n, 1, False, x, hp["alpha_tilde_l"], hp["beta_tilde_l"],
                        hp["mu_tilde_l"], mode),
            _make_block(n, 2 * n, 1, False, x, hp["alpha_tilde_sigma"],
                        hp["beta_tilde_sigma"], hp["mu_tilde_sigma"], mode),
        ]
        n_params = snmgp.n_params(n, m)
    elif model_name == "gnmgp_hetero":
        hp = {**gnmgp_hetero.DEFAULT_HYPERS, **(hyper or {})}
        blocks = [
            _make_block(0, n, 1, False, x, hp["alpha_tilde_l"], hp["beta_tilde_l"],
                        hp["mu_tilde_l"], mode),
            _make_block(n, n + n * t, t, False, x, hp["alpha_L"], hp["beta_L"],
                        hp["mu_L"], mode),
            _make_block(n + n * t, n + n * t + n * m, m, True, x, hp["alpha_err"],
                        hp["beta_err"], hp["mu_err"], mode),
        ]
        n_params = gnmgp_hetero.n_params(n, m)
    elif model_name == "lmc":
        from ..models import lmc

        n_params = lmc.n_params(m)
    else:
        raise ValueError(f"unknown model {model_name!r}")
    return Whitener(tuple(blocks), n_params)


def retune(
    w: Whitener,
    samples,
    interp: float = 1.0,
    floor: float = 1e-3,
    raw: bool = True,
) -> Whitener:
    """Partially non-centered retuning from warmup draws.

    ``samples`` are *natural-space* draws ``(n_draws, n_params)`` (a pilot
    chain).  For every eig-mode block the draws are projected onto the prior
    eigenbasis and each (direction, series) coefficient's posterior standard
    deviation replaces the prior scale, geometrically interpolated by
    ``interp`` (0 = keep prior whitening, 1 = fully posterior-scaled) and
    floored at ``floor ×`` the prior scale (guards short, poorly mixed
    pilots).  With ``raw=True`` the non-block coordinates get a diagonal
    posterior-std scale too, so plain (identity-metric) HMC is fully
    preconditioned.  The result is a *fixed* linear map — the retuned chain
    targets exactly the same posterior.

    The reference has no counterpart; its KAISER recipe preconditions with a
    pilot covariance in the natural space (``Stationary_model_mpiKAISER.py:205``),
    which cannot fix the prior-Gram curvature this map removes.
    """
    samples = jnp.asarray(samples)
    if samples.ndim != 2 or samples.shape[1] != w.n_params:
        raise ValueError(
            f"samples must be (n_draws, {w.n_params}), got {samples.shape}"
        )
    blocks = []
    covered = jnp.zeros(w.n_params, bool)
    for b in w.blocks:
        if b.basis is None:
            raise ValueError("retune requires an eig-mode whitener "
                             "(make_whitener(..., mode='eig'))")
        seg = samples[:, b.start : b.stop]
        if b.rows:
            c = (seg.reshape(-1, b.k, b.basis.shape[0]) - b.mu) @ b.basis
        else:
            c = jnp.einsum(
                "ji,djk->dik", b.basis, seg.reshape(samples.shape[0], -1, b.k) - b.mu
            )
        sd = jnp.std(c, axis=0)
        prior = jnp.broadcast_to(
            b.scale, sd.shape
        ) if b.scale.shape != sd.shape else b.scale
        # the *current* scale may already be retuned; interpolate from the
        # prior geometry each call would need the original — use the stored
        # scale as the anchor (first retune: prior; later: previous tuning)
        new = prior ** (1.0 - interp) * jnp.maximum(sd, floor * prior) ** interp
        blocks.append(b._replace(scale=new))
        covered = covered.at[b.start : b.stop].set(True)
    raw_scale = w.raw_scale
    if raw:
        sd_all = jnp.std(samples, axis=0)
        base = jnp.ones(w.n_params, samples.dtype) if raw_scale is None else raw_scale
        tuned = jnp.maximum(sd_all, floor) ** interp * base ** (1.0 - interp)
        raw_scale = jnp.where(covered, base, tuned)
    return Whitener(tuple(blocks), w.n_params, raw_scale)
