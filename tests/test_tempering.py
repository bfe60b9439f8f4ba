"""Replica-exchange HMC (inference/tempering.py).

Scope is pinned by measurement: replica exchange repairs *multimodality*
(mode-hopping a well-separated mixture that plain HMC cannot leave), and it
does NOT repair the nonlinear GNMGP funnel — the neck is a step-size
geometry problem, not a barrier problem, and flat-tempered replicas visit
the neck even less than the cold chain (see the tempering.py docstring and
ROADMAP's sampler study).  The tests here pin the win on its home turf,
the ladder/diagnostic contract, and determinism.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.inference import (
    hmc,
    tempering,
)


def _bimodal_potential(mu=4.0):
    def potential(q):
        a = 0.5 * jnp.sum((q - mu) ** 2)
        b = 0.5 * jnp.sum((q + mu) ** 2)
        return -jax.scipy.special.logsumexp(jnp.stack([-a, -b]))

    return potential


def test_geometric_ladder_shape():
    betas = tempering.geometric_ladder(6, 0.05)
    assert betas.shape == (6,)
    np.testing.assert_allclose(float(betas[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(betas[-1]), 0.05, rtol=1e-5)
    assert np.all(np.diff(np.asarray(betas)) < 0)  # strictly decreasing
    # degenerate single-rung ladder is just beta=1
    one = tempering.geometric_ladder(1, 0.05)
    np.testing.assert_allclose(np.asarray(one), [1.0])


def test_mode_hopping_beats_plain_hmc():
    """Started in one mode of a +-mu mixture, plain HMC never crosses;
    the tempered chain visits both modes with substantial mass."""
    potential = _bimodal_potential(mu=4.0)
    q0 = jnp.full((4,), 4.0)

    plain = hmc.hmc_sample(
        potential,
        q0,
        2000,
        jax.random.PRNGKey(0),
        step_size=0.5,
        n_leapfrog=10,
        n_warmup=300,
        adapt_step_size=True,
    )
    frac_neg_plain = float(np.mean(np.asarray(plain.samples)[:, 0] < 0))
    assert frac_neg_plain < 0.01  # the failure mode being repaired

    # 12 rungs: the swap bottleneck is the cold pairs' energy gap, so the
    # ladder must be dense near beta=1 (8 rungs hop too rarely at this mu)
    res = tempering.tempered_hmc_sample(
        potential,
        q0,
        2000,
        jax.random.PRNGKey(0),
        n_replicas=12,
        beta_min=0.05,
        step_size=0.5,
        n_leapfrog=10,
        n_warmup=300,
    )
    first = np.asarray(res.samples)[:, 0]
    assert float(np.mean(first < 0)) > 0.25  # real mass in the far mode
    assert abs(float(first.mean())) < 1.5  # vs ~4.0 for the stuck chain
    # ladder diagnostics populated and sane
    assert res.swap_accept.shape == (11,)
    assert np.all(np.asarray(res.swap_accept) >= 0)
    assert np.all(np.asarray(res.swap_accept) <= 1)
    assert float(np.asarray(res.accept_stat).min()) > 0.4
    assert np.all(np.isfinite(np.asarray(res.potentials)))


def test_deterministic_and_mass_contract():
    potential = _bimodal_potential(mu=2.0)
    q0 = jnp.zeros((3,))
    kwargs = dict(
        n_replicas=4,
        beta_min=0.1,
        step_size=0.3,
        n_leapfrog=5,
        n_warmup=50,
        mass_matrix=jnp.asarray([1.0, 2.0, 0.5]),
    )
    a = tempering.tempered_hmc_sample(
        potential, q0, 200, jax.random.PRNGKey(7), **kwargs
    )
    b = tempering.tempered_hmc_sample(
        potential, q0, 200, jax.random.PRNGKey(7), **kwargs
    )
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    assert a.samples.shape == (200, 3)
    assert a.step_sizes.shape == (4,)
    assert a.betas.shape == (4,)
    # explicit ladder overrides n_replicas/beta_min
    c = tempering.tempered_hmc_sample(
        potential,
        q0,
        50,
        jax.random.PRNGKey(7),
        betas=jnp.asarray([1.0, 0.5, 0.25]),
        step_size=0.3,
        n_leapfrog=5,
        n_warmup=20,
    )
    np.testing.assert_allclose(np.asarray(c.betas), [1.0, 0.5, 0.25])
    assert c.swap_accept.shape == (2,)


@pytest.mark.slow
def test_custom_reference_contract_on_funnel():
    """Custom ``reference_fn`` contract on Neal's funnel.  Tempering does
    NOT fix the funnel (measured: cold-chain v biased/undercovered across
    seeds — the neck is step-size geometry, not a barrier; that scope
    boundary is documented in the module docstring).  This pins only that
    a prior-matched reference runs stably: finite chain, live ladder."""
    D = 9

    def potential(q):
        v, x = q[0], q[1:]
        return v**2 / 18.0 + 0.5 * D * v + 0.5 * jnp.sum(x * x) * jnp.exp(-v)

    def reference(q):
        return q[0] ** 2 / 18.0 + 0.5 * jnp.dot(q[1:], q[1:])

    res = tempering.tempered_hmc_sample(
        potential,
        jnp.zeros(D + 1),
        1500,
        jax.random.PRNGKey(3),
        n_replicas=8,
        beta_min=0.05,
        step_size=0.1,
        n_leapfrog=20,
        n_warmup=400,
        reference_fn=reference,
    )
    v = np.asarray(res.samples)[:, 0]
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert v.std() > 0.05  # the chain moves; coverage is NOT claimed
    # hot rungs swap freely against the prior-matched reference
    assert float(np.asarray(res.swap_accept)[-1]) > 0.3
