"""Tests for the prediction layer, including parity with the reference's
deterministic MAP-prediction routines."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import evaluate
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.models import (
    FullData,
    HadamardData,
)
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms
from nonstationary_multivariate_gaussian_process_tpu.predict import (
    gnmgp as pred_gnmgp,
    hadamard as pred_h,
    lmc as pred_lmc,
    snmgp as pred_snmgp,
)


def _t(reference, a):
    return reference["torch"].as_tensor(np.asarray(a, dtype=np.float64))


@pytest.fixture(scope="module")
def small_data():
    d = sim.sim_mnts(jax.random.PRNGKey(10), n=14)
    return d


class TestSNMGPPredictParity:
    def test_predmap_matches_reference(self, reference, small_data, rng):
        d = small_data
        n, m = d.y.shape
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 * n + t + 1) * 0.3
        grid = np.linspace(0.1, 0.9, 5)
        hp = dict(mu_tilde_l=0.0, alpha_tilde_l=1.0, beta_tilde_l=1.0,
                  mu_tilde_sigma=0.0, alpha_tilde_sigma=1.0, beta_tilde_sigma=1.0)
        got = pred_snmgp.predict_map(jnp.asarray(vec), FullData(d.x, d.y), grid)
        ref_pred = reference["prediction"].pointwise_predmap(
            _t(reference, vec[:n]), _t(reference, vec[n:2 * n]),
            _t(reference, vec[2 * n:2 * n + t]), _t(reference, vec[-1]),
            _t(reference, np.asarray(d.y)), _t(reference, np.asarray(d.x)),
            _t(reference, grid), **hp,
        )
        np.testing.assert_allclose(
            np.asarray(got.percentiles), np.asarray(ref_pred), rtol=1e-5, atol=1e-7
        )

    def test_predmap_sampling_and_sample_shapes(self, small_data):
        d = small_data
        n, m = d.y.shape
        vec = jnp.zeros(2 * n + 4)
        data = FullData(d.x, d.y)
        grid = jnp.linspace(0.1, 0.9, 6)
        sp = pred_snmgp.predict_map_sampling(jax.random.PRNGKey(0), 40, vec, data, grid)
        assert sp.quantiles.shape == (6, 2, m)
        assert sp.mean.shape == (6, m)
        hist = jnp.stack([vec + 0.01 * i for i in range(8)])
        ys = pred_snmgp.predict_sample(jax.random.PRNGKey(1), hist, data, grid)
        assert ys.shape == (6, 8, m)
        assert np.all(np.isfinite(np.asarray(ys)))


class TestGNMGPPredictParity:
    def test_predmap_matches_reference(self, reference, small_data, rng):
        d = small_data
        n, m = d.y.shape
        t = transforms.tri_size(m)
        vec = rng.normal(size=n + n * t + 1) * 0.3
        grid = np.linspace(0.15, 0.85, 4)
        hp = dict(mu_tilde_l=0.0, alpha_tilde_l=5.0, beta_tilde_l=1.0,
                  mu_L=0.0, alpha_L=5.0, beta_L=1.0)
        got = pred_gnmgp.predict_map(jnp.asarray(vec), FullData(d.x, d.y), grid)
        ref_ys, ref_lvecs = reference["prediction"].pointwise_predmap_inhomogeneous(
            _t(reference, vec[:n]), _t(reference, vec[n:-1]), _t(reference, vec[-1]),
            _t(reference, np.asarray(d.y)), _t(reference, np.asarray(d.x)),
            _t(reference, grid), **hp,
        )
        np.testing.assert_allclose(
            np.asarray(got.percentiles), np.asarray(ref_ys), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(got.l_vecs), np.asarray(ref_lvecs), rtol=1e-5, atol=1e-8
        )

    def test_latent_prediction_modes(self, small_data):
        d = small_data
        n, m = d.y.shape
        t = transforms.tri_size(m)
        vec = jnp.zeros(n + n * t + 1)
        data = FullData(d.x, d.y)
        grid = jnp.linspace(0.2, 0.8, 5)
        tl = pred_gnmgp.predict_map_sampling(
            jax.random.PRNGKey(0), 30, vec, data, grid, pred_smoothness=True
        )
        assert tl.shape == (5, 30)
        lf = pred_gnmgp.predict_map_sampling(
            jax.random.PRNGKey(0), 30, vec, data, grid, pred_cov=True
        )
        assert lf.shape == (5, 30, m, m)
        sp = pred_gnmgp.predict_map_sampling(jax.random.PRNGKey(0), 30, vec, data, grid)
        assert sp.mean.shape == (5, m)
        hist = jnp.stack([vec + 0.01 * i for i in range(6)])
        ys = pred_gnmgp.predict_sample(jax.random.PRNGKey(1), hist, data, grid)
        assert ys.shape == (5, 6, m)


class TestLMCPredictParity:
    def test_predmap_matches_reference(self, reference, small_data, rng):
        d = small_data
        n, m = d.y.shape
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 + t + 1) * 0.3
        grid = np.linspace(0.1, 0.9, 5)
        got = pred_lmc.predict_map(jnp.asarray(vec), FullData(d.x, d.y), grid)
        ref_pred = reference["prediction"].pointwise_predmap_S(
            _t(reference, vec[0]), _t(reference, vec[1]),
            _t(reference, vec[2:2 + t]), _t(reference, vec[-1]),
            _t(reference, np.asarray(d.y)), _t(reference, np.asarray(d.x)),
            _t(reference, grid),
        )
        np.testing.assert_allclose(
            np.asarray(got.percentiles), np.asarray(ref_pred), rtol=1e-5, atol=1e-7
        )

    def test_predict_sample_shape(self, small_data):
        d = small_data
        vec = jnp.zeros(2 + 3 + 1)
        hist = jnp.stack([vec + 0.05 * i for i in range(5)])
        ys = pred_lmc.predict_sample(
            jax.random.PRNGKey(0), hist, FullData(d.x, d.y), jnp.linspace(0.1, 0.9, 4)
        )
        assert ys.shape == (5, 4, 2)


class TestHadamardPredict:
    def _hdata(self, rng, n=16, m=2):
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        indx[:m] = np.arange(m)
        y = rng.normal(size=n)
        return HadamardData(jnp.asarray(x), jnp.asarray(indx, jnp.int32), jnp.asarray(y))

    def test_lmc_hadamard_matches_reference(self, reference, rng):
        data = self._hdata(rng)
        m = 2
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 + t + 1) * 0.3
        grid = np.linspace(0.2, 0.8, 4)
        got = pred_h.lmc_predict_map(jnp.asarray(vec), data, grid, m)
        torch = reference["torch"]
        ref_pred = reference["prediction"].pointwise_predmap_S_hadamard(
            _t(reference, vec[0]), _t(reference, vec[1]),
            _t(reference, vec[2:2 + t]), _t(reference, vec[-1]),
            _t(reference, np.asarray(data.x)), torch.as_tensor(np.asarray(data.indx)),
            _t(reference, np.asarray(data.y)), _t(reference, grid),
        )
        np.testing.assert_allclose(
            np.asarray(got.percentiles), np.asarray(ref_pred), rtol=1e-5, atol=1e-7
        )

    def test_lmc_hadamard_test_prediction_matches_reference(self, reference, rng):
        data = self._hdata(rng)
        m = 2
        t = transforms.tri_size(m)
        vec = rng.normal(size=2 + t + 1) * 0.3
        x_test = np.asarray([0.3, 0.6])
        i_test = np.asarray([0, 1])
        mean, std = pred_h.lmc_predict_test(
            jnp.asarray(vec), data, jnp.asarray(x_test), jnp.asarray(i_test), m
        )
        torch = reference["torch"]
        ref_mean, ref_std = reference["prediction"].test_predmap_S_hadamard(
            _t(reference, vec[0]), _t(reference, vec[1]),
            _t(reference, vec[2:2 + t]), _t(reference, vec[-1]),
            _t(reference, np.asarray(data.x)), torch.as_tensor(np.asarray(data.indx)),
            _t(reference, np.asarray(data.y)),
            _t(reference, x_test), torch.as_tensor(i_test),
        )
        np.testing.assert_allclose(np.asarray(mean), np.asarray(ref_mean), rtol=1e-5)
        # Intentional deviation: the reference's indexedpoint_predmap_S_hadamard
        # takes (A - B)[0, 0] for the predictive variance (prediction.py:1772),
        # i.e. always uses B_f[0,0] as the prior self-variance even when the
        # test point belongs to task a != 0.  We use B_f[a,a].  The two agree
        # exactly for task-0 test points.
        np.testing.assert_allclose(np.asarray(std)[0], np.asarray(ref_std)[0], rtol=1e-5)

    def test_svc_hadamard_shapes(self, rng):
        data = self._hdata(rng, n=12)
        m = 2
        n = 12
        t = transforms.tri_size(m)
        vec = jnp.asarray(rng.normal(size=n + n * t + 1) * 0.3)
        grid = jnp.linspace(0.2, 0.8, 5)
        pred = pred_h.svc_predict_map(vec, data, grid, m)
        assert pred.percentiles.shape == (5, 3, m)
        assert np.all(np.isfinite(np.asarray(pred.percentiles)))
        mean, std = pred_h.svc_predict_test(
            vec, data, grid[:2], jnp.asarray([0, 1]), m
        )
        assert mean.shape == (2,)

    def test_snmgp_hadamard_shapes(self, rng):
        data = self._hdata(rng, n=12)
        m, n = 2, 12
        t = transforms.tri_size(m)
        vec = jnp.asarray(rng.normal(size=2 * n + t + 1) * 0.3)
        grid = jnp.linspace(0.2, 0.8, 4)
        pred = pred_h.snmgp_predict_map(vec, data, grid, m)
        assert pred.percentiles.shape == (4, 3, m)
        hist = jnp.stack([vec, vec + 0.01])
        ys = pred_h.snmgp_predict_sample(jax.random.PRNGKey(0), hist, data, grid, m)
        assert ys.shape == (4, 2, m)


class TestEvaluate:
    def test_rmse_lpd(self, rng):
        y = rng.normal(size=(10, 2))
        assert evaluate.rmse(y, y) == 0.0
        v = evaluate.lpd(np.zeros(5), np.ones(5), np.zeros(5))
        np.testing.assert_allclose(v, -0.5 * np.log(2 * np.pi), rtol=1e-9)

    def test_gpd(self, rng):
        y = rng.normal(size=(6, 2))
        rep = y[:, None, :] + 0.1 * rng.normal(size=(6, 50, 2))
        scores = evaluate.gpd_scores(rep, y)
        assert scores["D"] == scores["G"] + scores["P"]
        assert scores["P"] > 0

    def test_information_criteria(self):
        from nonstationary_multivariate_gaussian_process_tpu.models import lmc

        d = sim.sim_mnts(jax.random.PRNGKey(3), n=10)
        vec = jnp.zeros(2 + 3 + 1)
        dev = lambda v: lmc.deviance(v, d.y, d.x)
        aic = evaluate.get_aic(vec, dev)
        bic = evaluate.get_bic(vec, dev, n_obs=10)
        assert np.isfinite(aic) and np.isfinite(bic)
        np.testing.assert_allclose(aic - 2 * 6, bic - np.log(10) * 6, rtol=1e-9)
        hist = jnp.stack([vec, vec + 0.02, vec - 0.02])
        dic = evaluate.get_dic(hist, dev)
        assert np.isfinite(dic)


class TestPredictiveConsistency:
    def test_map_sampling_mean_approaches_predict_map(self, small_data):
        # with many latent draws, sampling-based predictive mean should agree
        # with the plug-in predictive mean to sampling error
        d = small_data
        n, m = d.y.shape
        vec = jnp.zeros(2 * n + 4)
        data = FullData(d.x, d.y)
        grid = jnp.linspace(0.2, 0.8, 6)
        det = pred_snmgp.predict_map(vec, data, grid)
        sp = pred_snmgp.predict_map_sampling(jax.random.PRNGKey(0), 400, vec, data, grid)
        err = np.abs(np.asarray(sp.mean) - np.asarray(det.mean))
        scale = np.asarray(det.std) / np.sqrt(400) * 6  # 6-sigma of the MC error
        assert np.all(err < scale + 0.05)

    def test_gnmgp_sampling_mean_consistency(self, small_data):
        d = small_data
        n, m = d.y.shape
        t = 3
        vec = jnp.zeros(n + n * t + 1)
        data = FullData(d.x, d.y)
        grid = jnp.linspace(0.2, 0.8, 5)
        det = pred_gnmgp.predict_map(vec, data, grid)
        sp = pred_gnmgp.predict_map_sampling(jax.random.PRNGKey(1), 400, vec, data, grid)
        err = np.abs(np.asarray(sp.mean) - np.asarray(det.mean))
        assert np.all(err < 6 * np.asarray(det.std) / np.sqrt(400) + 0.1)
