"""Tests for postprocess stats/analysis/summary, viz smoke tests, and workflows."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import viz, workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.postprocess import analysis, stats, summary
from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore


class TestStats:
    def test_t_test_null_and_shifted(self, rng):
        x0 = rng.normal(size=500)
        t0, p0 = stats.t_test(x0)
        assert p0 > 0.01
        t1, p1 = stats.t_test(x0 + 1.0)
        assert p1 < 1e-6 and t1 > 0

    def test_t_test_matches_reference_formula(self, rng):
        # population-std convention, matching LAPS2_correlation.py:18-25
        x = rng.normal(size=40)
        t, p = stats.t_test(x)
        want_t = np.mean(x) / (np.std(x) / np.sqrt(40))
        np.testing.assert_allclose(t, want_t, rtol=1e-12)

    def test_sign_and_z_tests(self, rng):
        x = rng.normal(size=300)
        assert stats.sign_test(x) > 0.01
        z, p = stats.z_test(np.abs(x) + 0.1)
        assert p < 1e-10
        assert stats.sign_test(np.abs(x) + 0.1) < 1e-10

    def test_coverage_rate(self, rng):
        x_center = rng.normal(size=(20, 200))
        left, mid, right = stats.compute_coverage_rate(x_center)
        assert mid > 0.9
        assert abs(left + mid + right - 1.0) < 1e-9
        left, mid, right = stats.compute_coverage_rate(x_center + 10)
        assert right == 1.0

    def test_paired_improvement(self):
        a = {1: 1.0, 2: 2.0, 3: 0.5}
        b = {1: 0.5, 2: 2.5, 4: 0.1}
        res = stats.paired_improvement(a, b)
        assert res["ids"] == [1, 2]
        np.testing.assert_allclose(res["improvement"], [0.5, -0.5])


class TestAnalysis:
    def test_unpack_roundtrip(self, rng):
        n, m = 6, 2
        hist = rng.normal(size=(5, 2 * n + 3 + 1))
        tl, ts, lv, s2 = analysis.unpack_hist_snmgp(hist, n, m)
        assert tl.shape == (5, n) and lv.shape == (5, 3)
        np.testing.assert_array_equal(s2, hist[:, -1])

    def test_gnmgp_latent_summary(self, rng):
        n, m = 8, 2
        hist = rng.normal(size=(20, n + n * 3 + 1)) * 0.3
        s = analysis.gnmgp_latent_summary(hist, n, m)
        assert s.tilde_l_q.shape == (3, n)
        assert s.cor_q.shape == (3, n, m, m)
        # correlations bounded, diagonal exactly 1
        np.testing.assert_allclose(s.cor_q[1, :, 0, 0], np.ones(n), rtol=1e-9)
        assert np.all(np.abs(s.cor_q) <= 1 + 1e-9)

    def test_map_latents_match_truth_structure(self):
        d = sim.sim_mnts(jax.random.PRNGKey(0), n=10)
        from nonstationary_multivariate_gaussian_process_tpu.ops import transforms

        ul = np.asarray(
            transforms.lvecs_to_ulvecs(jnp.asarray(d.l_vecs), 10, 2)
        )
        vec = np.concatenate([np.log(np.asarray(d.l)), ul, [-4.0]])
        tilde_l, b, cor, stds = analysis.gnmgp_map_latents(vec, 10, 2)
        np.testing.assert_allclose(stds, np.asarray(d.stds), rtol=1e-8)
        np.testing.assert_allclose(cor[:, 0, 1], np.asarray(d.cors), atol=1e-8)


class TestSummary:
    def test_reduce_fleet_metrics(self, tmp_path):
        store = ArtifactStore(str(tmp_path))
        for i in range(4):
            store.save(store.key("gnmgp", "sim", i, "scores"), rmse=1.0 + i, lpd=-i)
        keys = [store.key("gnmgp", "sim", i, "scores") for i in range(6)]
        out = summary.reduce_fleet_metrics(store, keys)
        assert out["n_valid"] == 4 and out["n_total"] == 6
        np.testing.assert_allclose(out["rmse"]["mean"], 2.5)

    def test_compare_models_and_band(self, rng):
        scores = {
            "lmc": [{"G": 1.0, "P": 2.0, "D": 3.0} for _ in range(5)],
            "gnmgp": [{"G": 0.5, "P": 1.0, "D": 1.5} for _ in range(5)],
        }
        table = summary.compare_models_gpd(scores)
        assert table["gnmgp"]["D"]["median"] == 1.5
        band = summary.functional_band(rng.normal(size=(30, 12)))
        assert band.shape == (3, 12)


class TestViz:
    def test_plot_smoke(self, tmp_path, rng):
        g, m, n = 12, 2, 10
        pct = np.sort(rng.normal(size=(g, 3, m)), axis=1)
        viz.plot_posterior(str(tmp_path / "post.png"), np.linspace(0, 1, g), pct,
                           x=np.linspace(0, 1, n), y=rng.normal(size=(n, m)))
        hist = rng.normal(size=(15, n + n * 3 + 1)) * 0.2
        s = analysis.gnmgp_latent_summary(hist, n, m)
        viz.plot_latent_summary(str(tmp_path / "lat"), np.linspace(0, 1, n), s)
        viz.plot_target_trace(str(tmp_path / "trace.png"), rng.normal(size=50).cumsum())
        viz.plot_chain_diagnostics(str(tmp_path / "chain"), rng.normal(size=(100, 3)))
        viz.annotated_heatmap(str(tmp_path / "hm.png"), rng.normal(size=(3, 3)),
                              ["a", "b", "c"], ["a", "b", "c"])
        assert (tmp_path / "post.png").exists()
        assert (tmp_path / "hm.png").exists()

    def test_plot_empirical_smoke(self, tmp_path):
        from nonstationary_multivariate_gaussian_process_tpu.inference import empirical

        d = sim.sim_mnts(jax.random.PRNGKey(0), n=30)
        est = empirical.local_estimation(np.asarray(d.x), np.asarray(d.y), window_size=8)
        viz.plot_empirical(str(tmp_path / "emp"), np.asarray(d.x), est)
        assert (tmp_path / "emp_log_l.png").exists()


class TestWorkflows:
    def test_run_subject_lmc_full(self, tmp_path):
        d = sim.sim_mnts(jax.random.PRNGKey(1), n=24)
        cfg = workflows.PipelineConfig(
            model="lmc", n_opt=80, lr=0.1, do_hmc=True, n_hmc=10,
            hmc_step_size=1e-3, hmc_leapfrog=3, n_grid=15, test_size=0.25,
        )
        store = ArtifactStore(str(tmp_path))
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg, store=store)
        assert np.isfinite(res["test_rmse"]) and np.isfinite(res["aic"])
        assert "dic" in res
        assert res["pred_grid"].percentiles.shape == (15, 3, 2)
        # resumable: second call loads the stored MAP
        res2 = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg, store=store)
        np.testing.assert_allclose(
            np.asarray(res2["map_vec"]), np.asarray(res["map_vec"]), rtol=1e-12
        )

    def test_run_subject_gnmgp(self):
        d = sim.sim_mnts(jax.random.PRNGKey(2), n=20)
        cfg = workflows.PipelineConfig(model="gnmgp", n_opt=60, n_grid=8, test_size=0.0)
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg)
        assert res["pred_grid"].percentiles.shape == (8, 3, 2)
        assert np.isfinite(res["deviance"])

    def test_run_sim_fleet(self):
        cfg = workflows.PipelineConfig(model="gnmgp", n_opt=40)
        out = workflows.run_sim_fleet(n_replicates=4, n=16, cfg=cfg)
        assert out["fleet"].vecs.shape[0] == 4
        assert np.isfinite(out["tilde_l_rmse"])


class TestMapAnalysisStage:
    def test_run_subject_gnmgp_latent_analysis(self):
        d = sim.sim_mnts(jax.random.PRNGKey(7), n=18)
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=40, n_grid=6, do_hmc=True, n_hmc=8,
            hmc_step_size=1e-4, hmc_leapfrog=2,
        )
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg)
        lat = res["map_latents"]
        assert lat["R"].shape == (18, 2, 2)
        np.testing.assert_allclose(np.diagonal(lat["R"], axis1=1, axis2=2), 1.0, rtol=1e-9)
        assert res["latent_summary"].cor_q.shape == (3, 18, 2, 2)


class TestBandDepthBoxplot:
    """VERDICT r2 #6: depth-based functional boxplot replacing the pointwise
    band reduction (reference res_summary.py:88-157, statsmodels fboxplot)."""

    def test_mbd_matches_bruteforce_pairs(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.postprocess import summary

        r, n = 7, 13
        curves = rng.normal(size=(r, n)).cumsum(axis=1)
        got = summary.modified_band_depth(curves)
        # brute force: proportion of (pair, grid point) combos bounding curve k
        import itertools

        want = np.zeros(r)
        pairs = list(itertools.combinations(range(r), 2))
        for k in range(r):
            tot = 0.0
            for (i, j) in pairs:
                lo = np.minimum(curves[i], curves[j])
                hi = np.maximum(curves[i], curves[j])
                tot += np.mean((curves[k] >= lo) & (curves[k] <= hi))
            want[k] = tot / len(pairs)
        np.testing.assert_allclose(got, want, rtol=1e-12)

    def test_functional_boxplot_flags_planted_outlier(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.postprocess import summary

        r, n = 12, 30
        x = np.linspace(0, 1, n)
        curves = np.sin(2 * np.pi * x)[None, :] + 0.1 * rng.normal(size=(r, n))
        curves[4] += 5.0  # far outside any fence
        fb = summary.functional_boxplot(curves)
        assert 4 in fb["outlier_idx"]
        assert fb["median_idx"] != 4
        assert np.all(fb["env_hi"] >= fb["env_lo"])
        # the median curve is one of the actual curves
        assert any(np.allclose(fb["median_curve"], curves[i]) for i in range(r))
        # depth-ranked median differs from the planted outlier's depth
        assert fb["depths"][fb["median_idx"]] > fb["depths"][4]


class TestPopulationAnalyses:
    """VERDICT r2 #6: data-size and waiting-time-vs-correlation analyses
    (reference LAPS2_correlation.py:66-233), data-agnostic."""

    def test_datasize_analysis_skips_missing(self):
        from nonstationary_multivariate_gaussian_process_tpu.postprocess import stats

        n_records = {"a": 10, "b": 0, "c": 25}
        waiting = {"a": 48.0, "b": 72.0, "c": 300.0}
        groups = {"g1": ["a", "b", "missing"], "g2": ["c"]}
        out = stats.datasize_analysis(n_records, waiting, groups)
        assert out["groups"]["g1"]["ids"] == ["a", "b"]
        assert out["groups"]["g1"]["n_subjects"] == 2
        # zero-record subject contributes waiting time 0 (reference :84-87)
        np.testing.assert_allclose(out["groups"]["g1"]["waiting_time"], [48.0, 0.0])
        assert out["records_range"] == (0, 25)

    def test_waitingtime_vs_correlation_cumulative(self):
        from nonstationary_multivariate_gaussian_process_tpu.postprocess import stats

        corr = {"a": 0.2, "b": 0.4, "c": 0.9}
        waiting = {"a": 24.0 * 6, "b": 24.0 * 8, "c": 24.0 * 12}
        out = stats.waitingtime_vs_correlation(
            corr, waiting, {"g": ["a", "b", "c"]}, min_day=5
        )["g"]
        # days 5..11; at day 7 only 'a' is below 7*24
        assert out["days"][0] == 5
        i7 = list(out["days"]).index(7)
        assert out["n"][i7] == 1
        np.testing.assert_allclose(out["mean"][i7], 0.2)
        i9 = list(out["days"]).index(9)
        assert out["n"][i9] == 2
        np.testing.assert_allclose(out["mean"][i9], 0.3)
