"""Property tests for the numerics core (ops/) against dense numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import settings
from nonstationary_multivariate_gaussian_process_tpu.ops import (
    chol,
    kernels,
    kron,
    transforms,
)


def _np_rbf(x1, x2, alpha, beta):
    d = (x1[:, None] - x2[None, :]) ** 2
    return alpha**2 * np.exp(-0.5 * d / beta**2)


def _np_gibbs(x1, s1, l1, x2, s2, l2):
    d = (x1[:, None] - x2[None, :]) ** 2
    a = l1[:, None] ** 2 + l2[None, :] ** 2
    b = l1[:, None] * l2[None, :]
    c = s1[:, None] * s2[None, :]
    return c * np.sqrt(2 * b / a) * np.exp(-d / a)


class TestKernels:
    def test_rbf_cross(self, rng):
        x1, x2 = rng.normal(size=9), rng.normal(size=7)
        got = kernels.rbf_cov(x1, x2, alpha=1.3, beta=0.7)
        np.testing.assert_allclose(got, _np_rbf(x1, x2, 1.3, 0.7), rtol=1e-12)

    def test_rbf_self_adds_jitter(self, rng):
        x = rng.normal(size=6)
        got = kernels.rbf_cov(x, alpha=2.0, beta=1.1)
        want = _np_rbf(x, x, 2.0, 1.1) + settings.jitter * np.eye(6)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_gibbs_cross(self, rng):
        x1, x2 = rng.normal(size=8), rng.normal(size=5)
        s1, s2 = rng.uniform(0.5, 2, 8), rng.uniform(0.5, 2, 5)
        l1, l2 = rng.uniform(0.2, 2, 8), rng.uniform(0.2, 2, 5)
        got = kernels.nonstationary_rbf_cov(x1, s1, l1, x2, s2, l2)
        np.testing.assert_allclose(got, _np_gibbs(x1, s1, l1, x2, s2, l2), rtol=1e-12)

    def test_gibbs_self_jitter_and_defaults(self, rng):
        x = rng.normal(size=7)
        got = kernels.nonstationary_rbf_cov(x)
        ones = np.ones(7)
        want = _np_gibbs(x, ones, ones, x, ones, ones) + settings.jitter * np.eye(7)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_gibbs_constant_equals_rbf(self, rng):
        # Gibbs kernel with constant sigma/ell degenerates to the RBF kernel.
        x = rng.normal(size=6)
        s = 1.4 * np.ones(6)
        l = 0.8 * np.ones(6)
        got = kernels.nonstationary_rbf_cov(x, s, l)
        want = kernels.rbf_cov(x, alpha=1.4, beta=0.8)
        np.testing.assert_allclose(got, want, rtol=1e-10)


class TestKron:
    def _bk(self, rng, m=3, n=5):
        lb = rng.normal(size=(m, m))
        b = lb @ lb.T + m * np.eye(m)
        lk = rng.normal(size=(n, n))
        k = lk @ lk.T + n * np.eye(n)
        return b, k

    def test_kron_mv_vs_dense(self, rng):
        b, k = self._bk(rng)
        y = rng.normal(size=b.shape[0] * k.shape[0])
        got = kron.kron_mv(jnp.asarray(b), jnp.asarray(k), jnp.asarray(y))
        np.testing.assert_allclose(got, np.kron(b, k) @ y, rtol=1e-10)

    def test_chol_logdet_quad_vs_dense(self, rng):
        b, k = self._bk(rng)
        s2 = 0.3
        y = rng.normal(size=b.shape[0] * k.shape[0])
        logdet, quad = kron.kron_chol_logdet_quad(
            jnp.asarray(b), jnp.asarray(k), s2, jnp.asarray(y)
        )
        sig = np.kron(b, k) + s2 * np.eye(len(y))
        np.testing.assert_allclose(logdet, np.linalg.slogdet(sig)[1], rtol=1e-9)
        np.testing.assert_allclose(quad, y @ np.linalg.solve(sig, y), rtol=1e-9)

    def test_kron_solve(self, rng):
        b, k = self._bk(rng)
        s2 = 0.7
        y = rng.normal(size=b.shape[0] * k.shape[0])
        got = kron.kron_solve(jnp.asarray(b), jnp.asarray(k), s2, jnp.asarray(y))
        sig = np.kron(b, k) + s2 * np.eye(len(y))
        np.testing.assert_allclose(got, np.linalg.solve(sig, y), rtol=1e-8)

    def test_kron_inv_logdet(self, rng):
        b, k = self._bk(rng, m=2, n=4)
        s2 = 0.5
        sig = np.kron(b, k) + s2 * np.eye(8)
        np.testing.assert_allclose(
            kron.kron_inv(s2, jnp.asarray(b), jnp.asarray(k)),
            np.linalg.inv(sig),
            rtol=1e-8,
            atol=1e-10,
        )
        np.testing.assert_allclose(
            kron.kron_logdet(s2, jnp.asarray(b), jnp.asarray(k)),
            np.linalg.slogdet(sig)[1],
            rtol=1e-10,
        )


class TestTransforms:
    @pytest.mark.parametrize("m", [2, 3, 4])
    def test_ulvec_roundtrip(self, rng, m):
        t = transforms.tri_size(m)
        ul = rng.normal(size=t)
        l = transforms.ulvec_to_lvec(jnp.asarray(ul), m)
        back = transforms.lvec_to_ulvec(l, m)
        np.testing.assert_allclose(back, ul, rtol=1e-12)
        # diagonal entries are exponentiated, off-diagonal passed through
        diag_idx = transforms.diag_indices_vec(m)
        np.testing.assert_allclose(np.asarray(l)[diag_idx], np.exp(ul[diag_idx]))

    def test_vec_tril_roundtrip(self, rng):
        m = 3
        v = rng.normal(size=transforms.tri_size(m))
        l = transforms.vec_to_tril(jnp.asarray(v), m)
        assert np.allclose(np.triu(np.asarray(l), 1), 0)
        np.testing.assert_allclose(transforms.tril_to_vec(l, m), v)

    def test_vec_tril_layout(self):
        # row-major lower-triangular layout, matching torch.tril_indices
        v = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        l = np.asarray(transforms.vec_to_tril(v, 3))
        want = np.array([[1, 0, 0], [2, 3, 0], [4, 5, 6]], dtype=float)
        np.testing.assert_allclose(l, want)

    def test_batched_ulvecs(self, rng):
        n, m = 5, 3
        t = transforms.tri_size(m)
        ul = rng.normal(size=n * t)
        got = transforms.ulvecs_to_lvecs(jnp.asarray(ul), n, m)
        want = np.concatenate(
            [transforms.ulvec_to_lvec(jnp.asarray(ul[i * t : (i + 1) * t]), m) for i in range(n)]
        )
        np.testing.assert_allclose(got, want)

    def test_cov2cor(self, rng):
        a = rng.normal(size=(3, 3))
        s = a @ a.T + 3 * np.eye(3)
        r = np.asarray(transforms.cov2cor(jnp.asarray(s)))
        np.testing.assert_allclose(np.diag(r), np.ones(3), rtol=1e-12)
        d = np.sqrt(np.diag(s))
        np.testing.assert_allclose(r, s / np.outer(d, d), rtol=1e-12)


class TestChol:
    def test_safe_cholesky_on_spd(self, rng):
        a = rng.normal(size=(6, 6))
        s = a @ a.T + 6 * np.eye(6)
        c = chol.safe_cholesky(jnp.asarray(s))
        np.testing.assert_allclose(np.asarray(c) @ np.asarray(c).T, s, rtol=1e-10)

    def test_safe_cholesky_escalates_on_semidefinite(self, rng):
        # rank-deficient matrix: plain Cholesky fails, ladder must recover
        a = rng.normal(size=(6, 2))
        s = a @ a.T  # rank 2
        c = np.asarray(chol.safe_cholesky(jnp.asarray(s)))
        assert np.all(np.isfinite(c))
        np.testing.assert_allclose(c @ c.T, s, atol=1e-3)

    def test_psd_logdet_quad(self, rng):
        a = rng.normal(size=(5, 5))
        s = a @ a.T + 5 * np.eye(5)
        y = rng.normal(size=5)
        logdet, quad = chol.psd_logdet_quad(jnp.asarray(s), jnp.asarray(y))
        np.testing.assert_allclose(logdet, np.linalg.slogdet(s)[1], rtol=1e-10)
        np.testing.assert_allclose(quad, y @ np.linalg.solve(s, y), rtol=1e-10)
