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


@pytest.mark.skipif(not pk._HAS_PALLAS, reason="pallas unavailable")
class TestSVCGramFused:
    @pytest.mark.parametrize("n,m", [(100, 2), (300, 3)])
    def test_matches_einsum_input_major(self, rng, n, m):
        import jax.numpy as _jnp
        from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp

        x = _jnp.asarray(np.sort(rng.uniform(size=n)), _jnp.float32)
        ell = _jnp.asarray(rng.uniform(0.2, 1.0, n), _jnp.float32)
        ls = _jnp.asarray(
            np.tril(rng.normal(size=(n, m, m))) + np.eye(m), _jnp.float32
        )
        got = pk.svc_gram_fused(x, ell, ls, interpret=True)
        kx = kernels.nonstationary_rbf_cov(x, ell1=ell)
        want = (
            np.asarray(gnmgp.gram(kx, ls), np.float32)
            .reshape(m, n, m, n)
            .transpose(1, 0, 3, 2)
            .reshape(n * m, n * m)
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)
