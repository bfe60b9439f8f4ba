"""Pallas kernel correctness in interpreter mode (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.ops import kernels
from nonstationary_multivariate_gaussian_process_tpu.ops import pallas_kernels as pk


@pytest.mark.skipif(not pk._HAS_PALLAS, reason="pallas unavailable")
class TestGibbsGramPallas:
    @pytest.mark.parametrize("n", [64, 200, 256])
    def test_matches_jnp_reference(self, rng, n):
        x = np.sort(rng.uniform(size=n))
        sigma = rng.uniform(0.5, 2.0, n)
        ell = rng.uniform(0.1, 1.0, n)
        got = pk.gibbs_gram_pallas(
            jnp.asarray(x), jnp.asarray(sigma), jnp.asarray(ell), interpret=True
        )
        want = kernels.nonstationary_rbf_cov(
            jnp.asarray(x, jnp.float32),
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(ell, jnp.float32),
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want, np.float32), rtol=2e-5, atol=1e-6)

    def test_dispatcher_cpu_falls_back(self, rng):
        x = jnp.asarray(np.sort(rng.uniform(size=32)))
        k = pk.gibbs_gram(x)
        want = kernels.nonstationary_rbf_cov(x)
        np.testing.assert_allclose(np.asarray(k), np.asarray(want), rtol=1e-10)
