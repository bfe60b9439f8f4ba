"""NUTS sampler (inference/nuts.py).

Correctness is pinned on analytically-known targets: a correlated Gaussian
(mean/covariance recovery, healthy acceptance, no divergences) and an
anisotropic Gaussian (the adaptive warmup must solve the geometry without
any manual tuning).  A GNMGP smoke test ties the sampler to the real
posterior surface.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu.inference import (
    diagnostics,
    nuts,
)


def test_correlated_gaussian_moments():
    cov = jnp.asarray([[2.0, 1.2, 0.0], [1.2, 1.5, 0.4], [0.0, 0.4, 0.8]])
    prec = jnp.linalg.inv(cov)

    def potential(q):
        return 0.5 * q @ prec @ q

    res = nuts.nuts_sample(
        potential,
        jnp.zeros(3),
        n_samples=1500,
        key=jax.random.PRNGKey(0),
        n_warmup=500,
    )
    samples = np.asarray(res.samples)
    # early warmup may diverge while dual averaging explores; the sampling
    # phase must not
    assert not np.asarray(res.diverging)[500:].any()
    assert float(res.accept_stat[500:].mean()) > 0.6
    np.testing.assert_allclose(samples.mean(axis=0), np.zeros(3), atol=0.25)
    np.testing.assert_allclose(np.cov(samples.T), np.asarray(cov), atol=0.45)


def test_anisotropic_no_manual_tuning():
    scales = jnp.asarray([30.0, 1.0, 0.05])

    def potential(q):
        return 0.5 * jnp.sum((q / scales) ** 2)

    # deliberately bad initial step size: adaptation must fix it
    res = nuts.nuts_sample(
        potential,
        jnp.zeros(3),
        n_samples=800,
        key=jax.random.PRNGKey(1),
        step_size=1.0,
        n_warmup=600,
    )
    sd = np.asarray(res.samples).std(axis=0)
    np.testing.assert_allclose(sd, np.asarray(scales), rtol=0.3)
    # adapted metric tracks the marginal variances
    ratio = np.asarray(res.inv_mass) / np.asarray(scales) ** 2
    assert np.all(ratio > 1 / 3) and np.all(ratio < 3), ratio


def test_fixed_and_seeded_mass_matrix():
    scales = jnp.asarray([10.0, 1.0, 0.1])

    def potential(q):
        return 0.5 * jnp.sum((q / scales) ** 2)

    mass = 1.0 / scales**2  # ideal diagonal metric: inv_mass = variances
    fixed = nuts.nuts_sample(
        potential,
        jnp.zeros(3),
        n_samples=400,
        key=jax.random.PRNGKey(4),
        n_warmup=300,
        mass_matrix=mass,
        adapt_mass=False,
    )
    # a fixed metric must come back verbatim — no window adaptation
    np.testing.assert_allclose(
        np.asarray(fixed.inv_mass), np.asarray(scales) ** 2, rtol=1e-6
    )
    sd = np.asarray(fixed.samples).std(axis=0)
    np.testing.assert_allclose(sd, np.asarray(scales), rtol=0.3)

    # the same matrix as a *seed* still adapts (ends near the truth it
    # started at, but not bit-identical)
    seeded = nuts.nuts_sample(
        potential,
        jnp.zeros(3),
        n_samples=400,
        key=jax.random.PRNGKey(4),
        n_warmup=300,
        mass_matrix=mass,
        adapt_mass=True,
    )
    ratio = np.asarray(seeded.inv_mass) / np.asarray(scales) ** 2
    assert np.all(ratio > 1 / 3) and np.all(ratio < 3), ratio
    assert not np.allclose(np.asarray(seeded.inv_mass), np.asarray(scales) ** 2)


def test_dynamic_trajectories_and_chains():
    cov = jnp.asarray([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def potential(q):
        return 0.5 * q @ prec @ q

    res = nuts.nuts_sample_chains(
        potential,
        jnp.zeros((4, 2)),
        n_samples=400,
        key=jax.random.PRNGKey(2),
        n_warmup=300,
    )
    assert res.samples.shape == (4, 400, 2)
    # trajectory lengths are data-dependent, not fixed
    depths = np.asarray(res.tree_depth)
    assert depths.max() >= 2 and len(np.unique(depths)) > 1
    rh = np.asarray(diagnostics.rhat(jnp.asarray(res.samples)))
    assert np.all(rh < 1.05), rh


def test_workflow_sampler_options(rng):
    import jax as _jax

    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    d = sim.sim_mnts(_jax.random.PRNGKey(0), n=24)
    for sampler, mass in [("nuts", "none"), ("hmc", "window")]:
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=40, do_hmc=True, n_hmc=8,
            sampler=sampler, hmc_mass=mass, hmc_step_size=5e-3, hmc_warmup=20,
            do_pred_grid=False, do_pred_test=False, do_evaluation=False,
            do_map_analysis=False,
        )
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg)
        assert res["hmc_samples"].shape[0] == 8
        assert np.all(np.isfinite(res["hmc_samples"])), (sampler, mass)


def test_gnmgp_posterior_smoke(rng):
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData

    n, m = 16, 2
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(rng.normal(size=(n, m)))
    nlp = gnmgp.make_objective(FullData(x, y))
    vec0 = jnp.asarray(rng.normal(size=gnmgp.n_params(n, m)) * 0.1)
    res = nuts.nuts_sample(
        nlp,
        vec0,
        n_samples=25,
        key=jax.random.PRNGKey(3),
        step_size=0.01,
        n_warmup=50,
        max_depth=6,
    )
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert float(np.asarray(res.diverging).mean()) < 0.5
