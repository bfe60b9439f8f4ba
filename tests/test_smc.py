"""Adaptive tempered SMC (inference/smc.py).

Scope pinned by measurement: SMC's structural win is *between-basin mass
allocation* — the exact failure the many-chain study measured at N=200
(ROADMAP: chains equilibrate at levels thousands of nats apart, pooled ESS
pins at 1/chain).  The tests pin (a) the normalizing constant and moments on
an anisotropic Gaussian (the weight/resample/mutate loop must be unbiased),
(b) exact mode-mass recovery on a bimodal target no chain sampler here gets
right, (c) the DR-mutation funnel posture, (d) the adaptive schedule and
result contract, (e) the multi-run effective-sample estimator, and (f) the
whitened-GNMGP pairing with natural-space evidence via ``Whitener.logdet``.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.inference import smc, whiten


def test_gaussian_logz_and_moments():
    """Anisotropic Gaussian (scales 0.05..20) with a known normalizer:
    logz must land within MC error and the particle cloud must carry the
    right mean/spread on every axis — the population metric has to defeat
    the 400x scale range with no hand tuning."""
    p = 8
    scales = jnp.asarray(np.geomspace(0.05, 20.0, p), jnp.float32)
    mu = jnp.asarray(np.linspace(-2.0, 2.0, p), jnp.float32)
    const = 3.7

    def potential(q):
        z = (q - mu) / scales
        return 0.5 * jnp.sum(z * z) + const

    logz_true = (
        -const + 0.5 * p * np.log(2 * np.pi) + float(jnp.sum(jnp.log(scales)))
    )
    r = smc.smc_sample(potential, p, 0, 2048)
    assert float(r.beta_final) == 1.0
    assert abs(float(r.logz) - logz_true) < 0.6
    assert float(jnp.max(jnp.abs(r.particles.mean(0) - mu) / scales)) < 0.15
    ratio = np.asarray(r.particles.std(0) / scales)
    assert np.all(ratio > 0.85) and np.all(ratio < 1.15)
    ns = int(r.n_stages)
    assert 3 < ns < 64
    # schedule monotone, accept rates tracked toward the 0.65 target
    betas = np.asarray(r.betas[:ns])
    assert np.all(np.diff(betas) > 0) and betas[-1] == 1.0
    assert 0.4 < float(np.asarray(r.accept[:ns])[-1]) <= 1.0


def test_bimodal_mass_recovery():
    """0.3/0.7 mixture with 16-sigma mode separation: chain samplers
    (including replica exchange at default ladders, tempering.py docstring)
    get the mass split wrong or stuck; tempered SMC populates modes as they
    form.  Mass must be right across independent seeds."""

    def potential(q):
        lp1 = jnp.log(0.3) - 0.5 * ((q[0] + 4.0) / 0.5) ** 2
        lp2 = jnp.log(0.7) - 0.5 * ((q[0] - 4.0) / 0.5) ** 2
        return -(jnp.logaddexp(lp1, lp2) - 0.5 * q[1] ** 2)

    for seed in (0, 1, 2):
        r = smc.smc_sample(potential, 2, seed, 4096)
        assert float(r.beta_final) == 1.0
        frac = float((r.particles[:, 0] > 0).mean())
        assert 0.62 < frac < 0.78, f"seed {seed}: mode mass {frac}"


def test_funnel_needs_dr_mutations():
    """Neal's funnel: plain mutation sweeps leave the neck underdispersed
    and the marginal biased high (measured: v mean ~ +1); DR sweeps
    (dr_reduction>0) recover the DRHMC-chain posture (mean ~ 0)."""

    def funnel(q):
        v, x = q[0], q[1:]
        return (
            0.5 * (v / 3.0) ** 2
            + 0.5 * jnp.sum(x * x) * jnp.exp(-v)
            + 0.5 * 9 * v
        )

    def stats(**kw):
        ms, ss = [], []
        for seed in (0, 1, 2):
            r = smc.smc_sample(funnel, 10, seed, 4096, n_mutations=8, **kw)
            v = np.asarray(r.particles[:, 0])
            ms.append(v.mean())
            ss.append(v.std())
        return np.mean(ms), np.mean(ss)

    m_plain, s_plain = stats()
    m_dr, s_dr = stats(dr_reduction=8.0)
    assert abs(m_dr) < 0.5
    assert s_dr > 2.3
    assert s_dr > s_plain  # the retries reach deeper into the neck


def test_multirun_ess_estimator():
    """smc_sample_runs vmaps R runs into one program; on a standard normal
    the estimator-variance N_eff should be a healthy fraction of N (mutation
    decorrelates fully), and the runs must differ (independent keys)."""
    runs = smc.smc_sample_runs(
        lambda q: 0.5 * jnp.dot(q, q), 4, 0, n_runs=4, n_particles=512
    )
    assert runs.particles.shape == (4, 512, 4)
    assert np.all(np.asarray(runs.beta_final) == 1.0)
    assert not np.allclose(
        np.asarray(runs.particles[0]), np.asarray(runs.particles[1])
    )
    est = smc.smc_ess_estimate(np.asarray(runs.particles), slots=range(4))
    assert est["n_runs"] == 4 and est["n_particles"] == 512
    # R=4 gives a noisy chi^2_{3} estimate; demand the right order only
    assert est["min_ess"] > 50.0


def test_determinism_and_contract():
    pot = lambda q: 0.5 * jnp.dot(q, q)
    r1 = smc.smc_sample(pot, 3, 7, 256, max_stages=16)
    r2 = smc.smc_sample(pot, 3, 7, 256, max_stages=16)
    assert np.array_equal(np.asarray(r1.particles), np.asarray(r2.particles))
    assert r1.betas.shape == (16,) and r1.accept.shape == (16,)
    assert r1.potentials.shape == (256,)
    assert np.all(np.isfinite(np.asarray(r1.potentials)))


def test_gnmgp_whitened_pairing():
    """The intended pairing: whitened GNMGP potential, standard-normal
    reference.  Pins that the path completes, particles land at finite
    potentials near/below the prior-mean level, and the natural-space
    evidence (logz + whitener logdet) is finite."""
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData

    d = sim.sim_mnts(jax.random.PRNGKey(0), n=24)
    data = FullData(d.x, d.y)
    nlp = gnmgp.make_objective(data)
    n, m = data.y.shape
    w = whiten.make_whitener("gnmgp", data.x, n, m)
    r = smc.smc_sample(
        w.wrap(nlp), w.n_params, 0, 256, n_mutations=4, n_leapfrog=8
    )
    assert float(r.beta_final) == 1.0
    assert np.all(np.isfinite(np.asarray(r.potentials)))
    evidence = float(r.logz + w.logdet())
    assert np.isfinite(evidence)
    # the population must have contracted from the prior toward the
    # posterior: mean potential well below the prior-draw level
    prior_u = jax.vmap(w.wrap(nlp))(
        jax.random.normal(jax.random.PRNGKey(1), (256, w.n_params))
    )
    assert float(r.potentials.mean()) < float(np.median(np.asarray(prior_u)))
