"""Golden parity tests: model log-posteriors vs the reference implementation.

The mounted public reference (``/root/reference/Utility/logpos.py``) is imported
as a live oracle (see conftest) and our objectives must match its values at
identical packed parameter vectors to <1e-6 rtol in float64.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp, lmc, snmgp
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms


def _data(rng, n=12, m=2):
    x = np.sort(rng.uniform(size=n))
    y = rng.normal(size=(n, m))
    return x, y


def _t(reference, a):
    torch = reference["torch"]
    return torch.as_tensor(np.asarray(a, dtype=np.float64))


class TestSNMGPParity:
    def test_nlogpos_matches_reference(self, reference, rng):
        n, m = 12, 2
        x, y = _data(rng, n, m)
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 * n + t + 1) * 0.5
        want = reference["logpos"].nlogpos_obj(_t(reference, vec), _t(reference, y), _t(reference, x))
        got = snmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_nlogpos_no_prior(self, reference, rng):
        n, m = 10, 3
        x, y = _data(rng, n, m)
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 * n + t + 1) * 0.5
        want = reference["logpos"].nlogpos_obj(
            _t(reference, vec), _t(reference, y), _t(reference, x), Prior=False
        )
        got = snmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x), prior=False)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_objective_closure_matches_parity_api(self, rng):
        n, m = 9, 2
        x, y = _data(rng, n, m)
        vec = jnp.asarray(rng.normal(size=2 * n + transforms.tri_size(m) + 1) * 0.5)
        data = snmgp.FullData(jnp.asarray(x), jnp.asarray(y))
        nlp = snmgp.make_objective(data)
        np.testing.assert_allclose(
            float(nlp(vec)), float(snmgp.nlogpos(vec, jnp.asarray(y), jnp.asarray(x))), rtol=1e-8
        )

    def test_gradient_finite(self, rng):
        n, m = 8, 2
        x, y = _data(rng, n, m)
        vec = jnp.asarray(rng.normal(size=2 * n + transforms.tri_size(m) + 1) * 0.5)
        g = jax.grad(snmgp.nlogpos)(vec, jnp.asarray(y), jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_hadamard_matches_reference(self, reference, rng):
        n, m = 11, 2
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        indx[:m] = np.arange(m)  # ensure both tasks appear
        yv = rng.normal(size=n)
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 * n + t + 1) * 0.5
        torch = reference["torch"]
        want = reference["logpos"].nlogpos_obj_hadamard(
            _t(reference, vec), _t(reference, x), torch.as_tensor(indx), _t(reference, yv)
        )
        got = snmgp.nlogpos_hadamard(
            jnp.asarray(vec), jnp.asarray(x), jnp.asarray(indx), jnp.asarray(yv), m
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


class TestGNMGPParity:
    @pytest.mark.parametrize("m", [2, 3])
    def test_nlogpos_matches_reference(self, reference, rng, m):
        n = 10
        x, y = _data(rng, n, m)
        t = transforms.tri_size(m)
        vec = rng.normal(size=n + n * t + 1) * 0.5
        want = reference["logpos"].nlogpos_obj_SVC(
            _t(reference, vec), _t(reference, y), _t(reference, x)
        )
        got = gnmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_nlogpos_custom_hypers(self, reference, rng):
        n, m = 9, 2
        x, y = _data(rng, n, m)
        t = transforms.tri_size(m)
        vec = rng.normal(size=n + n * t + 1) * 0.5
        hp = dict(mu_tilde_l=0.0, alpha_tilde_l=10.0, beta_tilde_l=1.0,
                  mu_L=0.0, alpha_L=10.0, beta_L=1.0, a=1.0, b=1.0)
        want = reference["logpos"].nlogpos_obj_SVC(
            _t(reference, vec), _t(reference, y), _t(reference, x), **hp
        )
        got = gnmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x), **hp)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_objective_closure_matches_parity_api(self, rng):
        n, m = 8, 2
        x, y = _data(rng, n, m)
        vec = jnp.asarray(rng.normal(size=n + n * transforms.tri_size(m) + 1) * 0.5)
        data = gnmgp.FullData(jnp.asarray(x), jnp.asarray(y))
        nlp = gnmgp.make_objective(data)
        # the closure factors prior Grams on the host (f64 island); tiny
        # factorization-order differences vs the in-graph path are expected
        np.testing.assert_allclose(
            float(nlp(vec)), float(gnmgp.nlogpos(vec, jnp.asarray(y), jnp.asarray(x))), rtol=1e-8
        )

    def test_gradient_finite(self, rng):
        n, m = 8, 2
        x, y = _data(rng, n, m)
        vec = jnp.asarray(rng.normal(size=n + n * transforms.tri_size(m) + 1) * 0.5)
        g = jax.grad(gnmgp.nlogpos)(vec, jnp.asarray(y), jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_hadamard_matches_reference(self, reference, rng):
        n, m = 10, 2
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        indx[:m] = np.arange(m)
        yv = rng.normal(size=n)
        t = transforms.tri_size(m)
        vec = rng.normal(size=n + n * t + 1) * 0.5
        torch = reference["torch"]
        want = reference["logpos"].nlogpos_obj_hadamard_SVC(
            _t(reference, vec), _t(reference, x), torch.as_tensor(indx), _t(reference, yv)
        )
        got = gnmgp.nlogpos_hadamard(
            jnp.asarray(vec), jnp.asarray(x), jnp.asarray(indx), jnp.asarray(yv), m
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


class TestLMCParity:
    def test_nlogpos_matches_reference(self, reference, rng):
        n, m = 14, 3
        x, y = _data(rng, n, m)
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 + t + 1) * 0.5
        want = reference["logpos"].nlogpos_obj_S(
            _t(reference, vec), _t(reference, y), _t(reference, x),
            mu_tilde_l=0.0, sigma_tilde_l=1.0,
        )
        got = lmc.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    def test_gradient_finite(self, rng):
        n, m = 10, 2
        x, y = _data(rng, n, m)
        vec = jnp.asarray(rng.normal(size=2 + transforms.tri_size(m) + 1) * 0.5)
        g = jax.grad(lmc.nlogpos)(vec, jnp.asarray(y), jnp.asarray(x))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_hadamard_matches_reference(self, reference, rng):
        n, m = 12, 2
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        indx[:m] = np.arange(m)
        yv = rng.normal(size=n)
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 + t + 1) * 0.5
        torch = reference["torch"]
        want = reference["logpos"].nlogpos_obj_hadamard_S(
            _t(reference, vec), _t(reference, x), torch.as_tensor(indx), _t(reference, yv),
            mu_tilde_l=0.0, sigma_tilde_l=1.0,
        )
        got = lmc.nlogpos_hadamard(
            jnp.asarray(vec), jnp.asarray(x), jnp.asarray(indx), jnp.asarray(yv), m
        )
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


class TestDeviance:
    def test_snmgp_deviance_is_minus_2_loglik(self, rng):
        n, m = 8, 2
        x, y = _data(rng, n, m)
        vec = jnp.asarray(rng.normal(size=2 * n + transforms.tri_size(m) + 1) * 0.5)
        dev = snmgp.deviance(vec, jnp.asarray(y), jnp.asarray(x))
        nlp_nopr = snmgp.nlogpos(vec, jnp.asarray(y), jnp.asarray(x), prior=False)
        np.testing.assert_allclose(float(dev), 2 * float(nlp_nopr), rtol=1e-10)


class TestVerboseComponents:
    def test_snmgp_component_decomposition_matches_reference(self, reference, rng):
        n, m = 10, 2
        x = np.sort(rng.uniform(size=n))
        y = rng.normal(size=(n, m))
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 * n + t + 1) * 0.5
        ref = reference["logpos"].nlogpos_obj(
            _t(reference, vec), _t(reference, y), _t(reference, x), verbose=True
        )
        got = snmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x), verbose=True)
        # (-res, loglik, lp_tilde_l, lp_tilde_sigma, lp_uL, lp_sigma2_err)
        for i, (g, r) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(float(g), float(r), rtol=1e-6,
                                       err_msg=f"component {i}")

    def test_gnmgp_component_decomposition_matches_reference(self, reference, rng):
        n, m = 9, 2
        x = np.sort(rng.uniform(size=n))
        y = rng.normal(size=(n, m))
        t = transforms.tri_size(m)
        vec = rng.normal(size=n + n * t + 1) * 0.5
        ref = reference["logpos"].nlogpos_obj_SVC(
            _t(reference, vec), _t(reference, y), _t(reference, x), verbose=True
        )
        got = gnmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x), verbose=True)
        for i, (g, r) in enumerate(zip(got, ref)):
            np.testing.assert_allclose(float(g), float(r), rtol=1e-6,
                                       err_msg=f"component {i}")


class TestLowLevelValidation:
    """VERDICT r2 #7: named shape errors at the lowest-level entry points
    (unpack / make_objective / kriging) instead of raw reshape errors."""

    def test_unpack_wrong_length_raises_named(self):
        import pytest
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            gnmgp, gnmgp_hetero, lmc, snmgp,
        )

        cases = [
            (lambda: lmc.unpack(jnp.zeros(5), 2), "lmc parameter vector"),
            (lambda: snmgp.unpack(jnp.zeros(9), 4, 2), "snmgp parameter vector"),
            (lambda: gnmgp.unpack(jnp.zeros(9), 4, 2), "gnmgp parameter vector"),
            (lambda: gnmgp_hetero.unpack(jnp.zeros(9), 4, 2),
             "gnmgp_hetero parameter vector"),
            (lambda: gnmgp.unpack(jnp.zeros((2, 17)), 4, 2), "must be 1-D"),
        ]
        for fn, match in cases:
            with pytest.raises(ValueError, match=match):
                fn()

    def test_unpack_valid_under_jit_and_vmap(self):
        from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp

        n, m = 4, 2
        p_dim = gnmgp.n_params(n, m)
        vecs = jnp.zeros((3, p_dim))
        out = jax.vmap(lambda v: gnmgp.unpack(v, n, m).tilde_l)(vecs)
        assert out.shape == (3, n)
        out2 = jax.jit(lambda v: gnmgp.unpack(v, n, m).tilde_l)(vecs[0])
        assert out2.shape == (n,)

    def test_make_objective_degenerate_data_raises(self):
        import pytest
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            FullData, gnmgp, gnmgp_hetero, lmc, snmgp,
        )

        for mod, name in ((lmc, "lmc"), (snmgp, "snmgp"), (gnmgp, "gnmgp"),
                          (gnmgp_hetero, "gnmgp_hetero")):
            with pytest.raises(ValueError, match=name):
                mod.make_objective(FullData(jnp.zeros((3, 2)), jnp.zeros((3, 2))))
            with pytest.raises(ValueError, match="disagree on N"):
                mod.make_objective(FullData(jnp.zeros(4), jnp.zeros((5, 2))))
            with pytest.raises(ValueError, match="at least"):
                mod.make_objective(FullData(jnp.zeros(1), jnp.zeros((1, 2))))

    def test_krige_rejects_2d_grid(self):
        import pytest
        from nonstationary_multivariate_gaussian_process_tpu.predict import latent

        with pytest.raises(ValueError, match="1-D"):
            latent.krige_rbf(jnp.zeros((3, 1)), jnp.zeros(4), jnp.zeros(3),
                             0.0, 1.0, 1.0)
