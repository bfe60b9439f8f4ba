"""Whitened (non-centered) parameterization for the latent-GP blocks.

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

Usage::

    w = make_whitener("gnmgp", x, n, m, hyper)
    res = hmc.hmc_sample(w.wrap(nlp), w.to_white(map_vec), ...)
    samples = w.from_white_batch(res.samples)
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ..models import gnmgp, gnmgp_hetero, snmgp
from ..ops import chol, transforms


class _Block(NamedTuple):
    start: int
    stop: int
    k: int  # number of independent GP series in the block
    rows: bool  # True: reshape(k, n) rows are series; False: reshape(n, k) cols
    l: jnp.ndarray  # (n, n) lower prior factor
    mu: float


class Whitener(NamedTuple):
    blocks: tuple
    n_params: int

    def from_white(self, u: jnp.ndarray) -> jnp.ndarray:
        """Whitened vector -> natural packed parameter vector."""
        vec = u
        for b in self.blocks:
            seg = u[b.start : b.stop]
            if b.rows:
                val = b.mu + seg.reshape(b.k, -1) @ b.l.T
            else:
                val = b.mu + b.l @ seg.reshape(-1, b.k)
            vec = vec.at[b.start : b.stop].set(val.reshape(-1))
        return vec

    def to_white(self, vec: jnp.ndarray) -> jnp.ndarray:
        """Natural packed vector -> whitened vector (triangular solves)."""
        u = jnp.asarray(vec)
        for b in self.blocks:
            seg = u[b.start : b.stop]
            if b.rows:
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

    def wrap(self, potential_fn: Callable) -> Callable:
        """Whitened-space potential: same posterior, benign geometry."""

        def wrapped(u):
            return potential_fn(self.from_white(u))

        return wrapped


#: Hadamard-layout GNMGP prior defaults (models/gnmgp.nlogpos_hadamard).
_GNMGP_HADAMARD_HYPERS = {
    "mu_tilde_l": 0.0, "alpha_tilde_l": 1.0, "beta_tilde_l": 1.0,
    "mu_L": 0.0, "alpha_L": 1.0, "beta_L": 1.0,
}


def make_whitener(
    model_name: str,
    x,
    n: int,
    m: int,
    hyper: dict | None = None,
    hadamard: bool = False,
) -> Whitener:
    """Prior-factor whitener for a model's latent-GP blocks.

    Factors are built host-side in float64 (``ops.chol.prior_rbf_cholesky``)
    with the same hypers the objective uses, so the whitened prior is
    standard normal to factorization roundoff.  LMC has no latent processes —
    its whitener is the identity (no blocks).  ``hadamard=True`` selects the
    Hadamard-layout prior defaults (the latent-block layout is identical).
    """
    t = transforms.tri_size(m)
    blocks: list[_Block] = []
    if model_name == "gnmgp":
        base_hp = _GNMGP_HADAMARD_HYPERS if hadamard else gnmgp.DEFAULT_HYPERS
        hp = {**gnmgp.DEFAULT_HYPERS, **base_hp, **(hyper or {})}
        l_l = chol.prior_rbf_cholesky(x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
        l_L = chol.prior_rbf_cholesky(x, hp["alpha_L"], hp["beta_L"])
        blocks = [
            _Block(0, n, 1, False, l_l, hp["mu_tilde_l"]),
            _Block(n, n + n * t, t, False, l_L, hp["mu_L"]),
        ]
        n_params = gnmgp.n_params(n, m)
    elif model_name == "snmgp":
        hp = {**snmgp.DEFAULT_HYPERS, **(hyper or {})}
        l_l = chol.prior_rbf_cholesky(x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
        l_s = chol.prior_rbf_cholesky(x, hp["alpha_tilde_sigma"], hp["beta_tilde_sigma"])
        blocks = [
            _Block(0, n, 1, False, l_l, hp["mu_tilde_l"]),
            _Block(n, 2 * n, 1, False, l_s, hp["mu_tilde_sigma"]),
        ]
        n_params = snmgp.n_params(n, m)
    elif model_name == "gnmgp_hetero":
        hp = {**gnmgp_hetero.DEFAULT_HYPERS, **(hyper or {})}
        l_l = chol.prior_rbf_cholesky(x, hp["alpha_tilde_l"], hp["beta_tilde_l"])
        l_L = chol.prior_rbf_cholesky(x, hp["alpha_L"], hp["beta_L"])
        l_e = chol.prior_rbf_cholesky(x, hp["alpha_err"], hp["beta_err"])
        blocks = [
            _Block(0, n, 1, False, l_l, hp["mu_tilde_l"]),
            _Block(n, n + n * t, t, False, l_L, hp["mu_L"]),
            _Block(n + n * t, n + n * t + n * m, m, True, l_e, hp["mu_err"]),
        ]
        n_params = gnmgp_hetero.n_params(n, m)
    elif model_name == "lmc":
        from ..models import lmc

        n_params = lmc.n_params(m)
    else:
        raise ValueError(f"unknown model {model_name!r}")
    return Whitener(tuple(blocks), n_params)
