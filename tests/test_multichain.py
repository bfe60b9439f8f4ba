"""Multi-chain HMC and split-R̂ diagnostics."""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu.inference import diagnostics, hmc


class TestMultiChain:
    def test_chains_shapes_and_independence(self):
        pot = lambda q: 0.5 * jnp.sum(q * q)
        inits = jnp.zeros((4, 3)) + 0.1 * jax.random.normal(jax.random.PRNGKey(1), (4, 3))
        res = hmc.hmc_sample_chains(
            pot, inits, n_samples=200, key=jax.random.PRNGKey(0),
            step_size=0.3, n_leapfrog=5,
        )
        assert res.samples.shape == (4, 200, 3)
        assert not np.allclose(np.asarray(res.samples[0]), np.asarray(res.samples[1]))

    def test_rhat_converged_vs_not(self):
        rng = np.random.default_rng(0)
        good = rng.normal(size=(4, 500, 2))
        r = diagnostics.rhat(good)
        assert np.all(r < 1.05)
        # chains stuck at different levels → large rhat
        bad = good + np.arange(4)[:, None, None] * 5.0
        r_bad = diagnostics.rhat(bad)
        assert np.all(r_bad > 1.5)

    def test_rhat_on_real_chains(self):
        pot = lambda q: 0.5 * jnp.sum(q * q)
        inits = 0.5 * jax.random.normal(jax.random.PRNGKey(2), (4, 2))
        res = hmc.hmc_sample_chains(
            pot, inits, n_samples=600, key=jax.random.PRNGKey(3),
            step_size=0.4, n_leapfrog=6,
        )
        r = diagnostics.rhat(np.asarray(res.samples))
        assert np.all(r < 1.2)
