"""Tests for initialization strategies and preprocessing/splits."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.data import preprocess, sim
from nonstationary_multivariate_gaussian_process_tpu.inference import empirical, init as init_mod
from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp, lmc, snmgp
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms


@pytest.fixture(scope="module")
def emp():
    d = sim.sim_mnts(jax.random.PRNGKey(0), n=30)
    est = empirical.local_estimation(np.asarray(d.x), np.asarray(d.y), window_size=8)
    return est


class TestInitStrategies:
    def test_lmc_from_empirical_layout(self, emp):
        v = init_mod.lmc_from_empirical(emp, 30, 2)
        assert v.shape == (lmc.n_params(2),)
        p = lmc.unpack(v, 2)
        assert float(p.tilde_sigma) == 0.0  # fixed for correlation
        np.testing.assert_allclose(float(p.tilde_l), np.mean(np.log(emp.est_ls)))

    def test_snmgp_strategies_layouts(self, emp):
        n, m = 30, 2
        lmc_vec = init_mod.lmc_from_empirical(emp, n, m)
        for v in [
            init_mod.snmgp_from_empirical(emp, n, m),
            init_mod.snmgp_from_stationary(lmc_vec, n, key=jax.random.PRNGKey(0)),
            init_mod.snmgp_combined(lmc_vec, emp, n, m),
        ]:
            assert v.shape == (snmgp.n_params(n, m),)
            assert np.all(np.isfinite(np.asarray(v)))
        # empirical strategy sets tilde_sigma to ones (Separable_model.py:123)
        p = snmgp.unpack(init_mod.snmgp_from_empirical(emp, n, m), n, m)
        np.testing.assert_allclose(np.asarray(p.tilde_sigma), 1.0)

    def test_gnmgp_strategies(self, emp):
        n, m = 30, 2
        v_emp = init_mod.gnmgp_from_empirical(emp, n, m)
        assert v_emp.shape == (gnmgp.n_params(n, m),)
        # empirical init reproduces the estimated covariance process
        p = gnmgp.unpack(v_emp, n, m)
        ls = gnmgp.chol_process(p.ul_vecs, n, m)
        b = np.asarray(ls @ np.swapaxes(np.asarray(ls), -1, -2))
        np.testing.assert_allclose(b, emp.est_b, rtol=1e-6, atol=1e-8)

        sn = init_mod.snmgp_from_empirical(emp, n, m)
        v_sep = init_mod.gnmgp_from_separable(sn, n, m)
        assert np.all(np.isfinite(np.asarray(v_sep)))
        v_rand = init_mod.gnmgp_random(jax.random.PRNGKey(1), n, m)
        assert np.all(np.isfinite(np.asarray(v_rand)))

    def test_hetero_warm_start(self, emp):
        from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp_hetero

        n, m = 30, 2
        gn = init_mod.gnmgp_from_empirical(emp, n, m)
        het = gnmgp_hetero.init_from_gnmgp(gn, n, m)
        assert het.shape == (gnmgp_hetero.n_params(n, m),)
        np.testing.assert_allclose(np.asarray(het[-n * m :]), float(gn[-1]))


class TestPreprocess:
    def test_orig2adj_roundtrip(self, rng):
        y = rng.normal(size=(40, 3)) * 5 + 2
        adj, trend, scale = preprocess.orig2adj(y)
        np.testing.assert_allclose(adj.mean(axis=0), 0, atol=1e-12)
        np.testing.assert_allclose(adj.std(axis=0), 1, rtol=1e-12)
        np.testing.assert_allclose(preprocess.adj2orig(adj, trend, scale), y, rtol=1e-12)

    def test_orig2adj_non_roundtrip(self, rng):
        ys = [rng.normal(size=n) * 3 + 1 for n in (10, 20)]
        adj, trends, scales = preprocess.orig2adj_non(ys)
        back = preprocess.adj2orig_non(adj, trends, scales)
        for a, b in zip(back, ys):
            np.testing.assert_allclose(a, b, rtol=1e-12)

    def test_data_split_sorted(self, rng):
        x = np.sort(rng.uniform(size=40))
        y = rng.normal(size=(40, 2))
        x_tr, x_te, y_tr, y_te = preprocess.data_split(x, y, test_size=0.25)
        assert x_tr.shape[0] == 30 and x_te.shape[0] == 10
        assert np.all(np.diff(x_tr) >= 0) and np.all(np.diff(x_te) >= 0)
        # the split partitions the data
        assert sorted(np.concatenate([x_tr, x_te]).tolist()) == sorted(x.tolist())

    def test_extrapolation_split(self, rng):
        x = np.arange(10.0)
        y = rng.normal(size=(10, 2))
        x_tr, x_te, y_tr, y_te = preprocess.data_split_extrapolation(x, y, size=3)
        np.testing.assert_array_equal(x_te, [7.0, 8.0, 9.0])

    def test_split_non_chunk(self, rng):
        n = 40
        x = np.sort(rng.uniform(size=n))
        indx = np.concatenate([np.zeros(20, int), np.ones(20, int)])
        y = rng.normal(size=n)
        xtr, xte, itr, ite, ytr, yte = preprocess.data_split_non_chunk(
            x, indx, y, chunk_size=0.2, fix=True
        )
        assert xte.shape[0] == 8  # 20% per task
        assert set(np.unique(ite)) == {0, 1}


class TestTaskCountGenerality:
    @pytest.mark.slow
    def test_pipeline_m1_and_m3(self):
        """Every model family handles single-task and 3-task subjects through
        the full pipeline (fit + grid/test prediction + scoring)."""
        import jax
        from nonstationary_multivariate_gaussian_process_tpu import workflows

        rng = np.random.default_rng(0)
        n = 16
        x = np.sort(rng.uniform(size=n))
        for m in (1, 3):
            y = rng.normal(size=(n, m)) * 0.5 + np.sin(4 * x)[:, None]
            for model in ("lmc", "snmgp", "gnmgp"):
                cfg = workflows.PipelineConfig(
                    model=model, n_opt=25, do_hmc=False,
                    do_map_analysis=False, test_size=0.2, window_size=5,
                )
                res = workflows.run_subject(x, y, cfg)
                assert np.isfinite(res["test_rmse"]), (m, model)
                pct = np.asarray(res["pred_grid"].percentiles)
                assert pct.shape[-1] == m and np.all(np.isfinite(pct)), (m, model)
