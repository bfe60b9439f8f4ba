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


class TestSVCFused2D:
    """The Mosaic-compatible 2-D-block SVC Gram kernel (hardware-verified on
    TPU; exercised here in interpreter mode on CPU)."""

    def test_matches_einsum_reference(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.ops import (
            kernels,
            pallas_kernels as pk,
        )

        n, m = 100, 2
        x = jnp.asarray(np.sort(rng.uniform(size=n)), jnp.float32)
        ell = jnp.asarray(np.exp(-1 + 0.1 * rng.normal(size=n)), jnp.float32)
        ls = jnp.asarray(
            rng.normal(size=(n, m, m)) * np.tril(np.ones((m, m))), jnp.float32
        )
        got = pk.svc_gram_fused2d(x, ell, ls, tile=32, interpret=True)
        k_x = kernels.nonstationary_rbf_cov(
            jnp.asarray(x, jnp.float64), ell1=jnp.asarray(ell, jnp.float64)
        )
        ls64 = jnp.asarray(ls, jnp.float64)
        b4 = jnp.einsum("nab,pcb->napc", ls64, ls64)
        # input-major reference
        ref = (k_x[:, None, :, None] * b4).reshape(n * m, n * m)
        np.testing.assert_allclose(
            np.asarray(got, np.float64), np.asarray(ref), atol=5e-5
        )

    def test_gram_dtype_dispatch_exactness(self, rng):
        # f64 gram must use the exact broadcast form (true contraction)
        from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
        from nonstationary_multivariate_gaussian_process_tpu.ops import kernels

        n, m = 60, 2
        x = jnp.asarray(np.sort(rng.uniform(size=n)))
        ell = jnp.exp(jnp.asarray(-1 + 0.1 * rng.normal(size=n)))
        ls = jnp.asarray(rng.normal(size=(n, m, m)) * np.tril(np.ones((m, m))))
        k_x = kernels.nonstationary_rbf_cov(x, ell1=ell)
        got = gnmgp.gram(k_x, ls)
        b4 = np.einsum("nab,pcb->napc", np.asarray(ls), np.asarray(ls))
        ref = np.einsum("np,napc->ancp", np.asarray(k_x), b4).reshape(n * m, n * m)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-12)
