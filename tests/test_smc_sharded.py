"""Particle-sharded (multi-chip) tempered SMC vs the single-device driver.

`smc_sample_sharded` shards ONE population's particles over the mesh; the
design contract (inference/smc.py) is bit-compatibility with
``smc_sample(dispatch="host")`` at the same key — full-size randoms sliced
to local rows, cross-particle math replicated on the gathered population.
These tests pin that contract on the 8-device CPU mesh, plus basic
statistical correctness of the sharded path on a target with known
moments and evidence.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu.inference import smc


def _corr_gaussian(dim=6, rho=0.8):
    """Correlated Gaussian potential with known logz and moments."""
    c = rho ** np.abs(np.subtract.outer(np.arange(dim), np.arange(dim)))
    prec = np.linalg.inv(c)
    mu = np.linspace(-1.0, 1.0, dim)
    prec_j = jnp.asarray(prec)
    mu_j = jnp.asarray(mu)

    def pot(q):
        d = q - mu_j
        return 0.5 * d @ prec_j @ d

    logz = 0.5 * np.linalg.slogdet(2.0 * np.pi * c)[1]
    return pot, mu, c, logz


def test_sharded_matches_single_device():
    """Same key => same schedule, same particles, same logz."""
    pot, _, _, _ = _corr_gaussian()
    kwargs = dict(
        n_mutations=3, n_leapfrog=5, metric="full", n_polish=2,
        max_stages=32, target_cess=0.6,
    )
    r_ref = smc.smc_sample(
        pot, 6, jax.random.PRNGKey(0), 64, dispatch="host", **kwargs
    )
    r_sh = smc.smc_sample_sharded(
        pot, 6, jax.random.PRNGKey(0), 64, **kwargs
    )
    assert int(r_sh.n_stages) == int(r_ref.n_stages)
    assert float(r_sh.beta_final) == 1.0
    np.testing.assert_allclose(
        np.asarray(r_sh.betas), np.asarray(r_ref.betas), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        float(r_sh.logz), float(r_ref.logz), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.particles), np.asarray(r_ref.particles),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.potentials), np.asarray(r_ref.potentials),
        rtol=1e-9, atol=1e-9,
    )


def test_sharded_diag_metric_and_dr():
    """The diag metric and delayed-rejection sweeps match too."""
    pot, _, _, _ = _corr_gaussian(dim=4, rho=0.5)
    kwargs = dict(
        n_mutations=2, n_leapfrog=4, metric="diag", dr_reduction=4.0,
        max_stages=32,
    )
    r_ref = smc.smc_sample(
        pot, 4, jax.random.PRNGKey(3), 32, dispatch="host", **kwargs
    )
    r_sh = smc.smc_sample_sharded(
        pot, 4, jax.random.PRNGKey(3), 32, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(r_sh.particles), np.asarray(r_ref.particles),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(float(r_sh.logz), float(r_ref.logz), rtol=1e-9)


def test_sharded_statistics_and_rounding():
    """Moments + evidence recovered; particle count rounds up to the mesh."""
    pot, mu, c, logz_true = _corr_gaussian()
    r = smc.smc_sample_sharded(
        pot, 6, jax.random.PRNGKey(7), 250,  # 250 -> 256 on 8 devices
        n_mutations=5, n_leapfrog=8, metric="full", n_polish=3,
    )
    parts = np.asarray(r.particles)
    assert parts.shape == (256, 6)
    assert float(r.beta_final) == 1.0
    np.testing.assert_allclose(parts.mean(0), mu, atol=0.35)
    np.testing.assert_allclose(np.cov(parts.T), c, atol=0.45)
    assert abs(float(r.logz) - logz_true) < 0.5


def test_sharded_waste_free_matches_single_device():
    """Waste-free chains split over devices (chain-major union layout):
    sharded draws must match the single-device host driver exactly."""
    pot, _, _, _ = _corr_gaussian()
    kwargs = dict(waste_free=4, n_leapfrog=5, metric="full", n_polish=2,
                  max_stages=32)
    r_ref = smc.smc_sample(
        pot, 6, jax.random.PRNGKey(11), 64, dispatch="host", **kwargs
    )
    r_sh = smc.smc_sample_sharded(
        pot, 6, jax.random.PRNGKey(11), 64, **kwargs
    )
    assert int(r_sh.n_stages) == int(r_ref.n_stages)
    np.testing.assert_allclose(
        np.asarray(r_sh.particles), np.asarray(r_ref.particles),
        rtol=1e-9, atol=1e-9,
    )
    np.testing.assert_allclose(float(r_sh.logz), float(r_ref.logz), rtol=1e-9)


def test_sharded_potential_batched():
    """potential_batched reaches the sharded stage builder: a batch-native
    (B, P) -> (B,) potential must run (it crashed when the flag was
    silently dropped) and agree with the row-wise potential's run at the
    same key on schedule, evidence, and cloud statistics."""
    scales = jnp.asarray([0.3, 1.0, 3.0, 0.5, 2.0, 1.5])
    pot_row = lambda q: 0.5 * jnp.sum((q / scales) ** 2)
    pot_batch = lambda qs: 0.5 * jnp.sum((qs / scales) ** 2, axis=1)
    kwargs = dict(n_mutations=2, n_leapfrog=4, metric="full", n_polish=2)
    r_row = smc.smc_sample_sharded(
        pot_row, 6, jax.random.PRNGKey(7), 64, **kwargs
    )
    r_b = smc.smc_sample_sharded(
        pot_batch, 6, jax.random.PRNGKey(7), 64,
        potential_batched=True, **kwargs
    )
    assert int(r_b.n_stages) == int(r_row.n_stages)
    np.testing.assert_allclose(
        np.asarray(r_b.betas), np.asarray(r_row.betas), rtol=1e-6
    )
    np.testing.assert_allclose(float(r_b.logz), float(r_row.logz), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(r_b.particles).mean(0),
        np.asarray(r_row.particles).mean(0),
        atol=0.05 * float(scales.max()),
    )
