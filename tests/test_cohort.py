"""Tests for ragged-cohort bucketing, the cohort workflow, data IO, debug utils,
and the legacy GP-draw generators."""

import pickle

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import io as data_io, sim
from nonstationary_multivariate_gaussian_process_tpu.parallel import buckets
from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore, debug


class TestBuckets:
    def test_assign_buckets_partition(self, rng):
        lengths = rng.integers(10, 100, size=37)
        b = buckets.assign_buckets(lengths, n_buckets=4)
        all_idx = sorted(i for idxs in b.values() for i in idxs)
        assert all_idx == list(range(37))

    def test_stage_truncate_and_pad(self, rng):
        xs = [np.sort(rng.uniform(size=n)) for n in (10, 12, 15)]
        ys = [rng.normal(size=(n, 2)) for n in (10, 12, 15)]
        x, y, lens, mask = buckets.stage_bucket(xs, ys, [0, 1, 2], mode="truncate")
        assert x.shape == (3, 10) and y.shape == (3, 10, 2)
        assert mask.all()
        x, y, lens, mask = buckets.stage_bucket(xs, ys, [0, 1, 2], mode="pad")
        assert x.shape == (3, 15)
        np.testing.assert_array_equal(lens, [10, 12, 15])
        # padded x extension is strictly increasing; mask marks real entries
        assert np.all(np.diff(x[0]) > 0)
        np.testing.assert_array_equal(mask[0], [True] * 10 + [False] * 5)
        np.testing.assert_allclose(y[0, 10:], 0.0)

    def test_run_bucketed_merges(self, rng):
        xs = [np.sort(rng.uniform(size=n)) for n in (8, 9, 16, 17)]
        ys = [rng.normal(size=(n, 2)) for n in (8, 9, 16, 17)]

        def fit(x, y, idxs):
            return {"score": np.asarray([x.shape[1]] * x.shape[0])}

        out = buckets.run_bucketed(xs, ys, fit, n_buckets=2)
        assert set(out) == {0, 1, 2, 3}
        assert out[3]["true_length"] == 17


class TestCohortWorkflow:
    def test_run_cohort_ragged(self, tmp_path):
        keys = jax.random.split(jax.random.PRNGKey(0), 5)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [18, 18, 20, 22, 22])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(model="gnmgp", n_opt=30, window_size=6)
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(
            subjects, cfg, store=store, n_buckets=2, extrapolation_size=3
        )
        assert len(out["subjects"]) == 5
        for sid, rec in out["subjects"].items():
            assert np.isfinite(rec["final_nlp"])
            assert "test_rmse" in rec and np.isfinite(rec["test_rmse"])
        assert out["reduction"]["n_valid"] == 5
        assert np.isfinite(out["reduction"]["rmse"]["mean"])

    def test_run_cohort_whitened_hmc_stage(self, tmp_path):
        """Cohort posterior sampling: exact masked + whitened fleet chains
        per bucket (the KAISER drivers' per-rank HMC stage)."""
        from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp

        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [14, 16, 16])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=30, window_size=5, do_hmc=True, n_hmc=5,
            whiten=True, hmc_step_size=1e-3, do_pred_test=False,
            cohort_sampler="config", n_chains=1, do_loo=True, loo_draws=4,
        )
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(subjects, cfg, store=store, n_buckets=2)
        for sid, rec in out["subjects"].items():
            s = rec["hmc_samples"]
            assert s.shape[0] == 5 and np.all(np.isfinite(s))
            # per-subject WAIC/PSIS-LOO from the pooled draws (padded fits
            # crop their latent slots before the LOO conditionals)
            assert np.isfinite(rec["loo"]["elpd_loo"])
        assert store.exists(ArtifactStore.key("gnmgp", "cohort", "id0", "loo"))
        # bucket-padded layout: ragged subjects carry the padded param count
        assert out["subjects"]["id0"]["hmc_samples"].shape[1] >= gnmgp.n_params(14, 2)
        assert store.exists(ArtifactStore.key("gnmgp", "cohort", "id0", "hmc"))

        # adaptive cohort chains route through the masked NUTS fleet
        import dataclasses

        out_n = workflows.run_cohort(
            subjects, dataclasses.replace(cfg, sampler="nuts", hmc_warmup=12),
            n_buckets=2,
        )
        for rec in out_n["subjects"].values():
            assert rec["hmc_samples"].shape[0] == 5
            assert np.all(np.isfinite(rec["hmc_samples"]))
        # misconfigurations raise instead of silently degrading
        import pytest

        with pytest.raises(ValueError, match="pncp"):
            workflows.run_cohort(
                subjects, dataclasses.replace(cfg, whiten="pncp"), n_buckets=2
            )


class TestDataIO:
    def test_sim_pickle_roundtrip(self, tmp_path):
        d = sim.sim_mnts(jax.random.PRNGKey(0), n=12)
        p = tmp_path / "sim_MNTS_0.pickle"
        with open(p, "wb") as f:
            pickle.dump(
                [np.asarray(d.x), np.asarray(d.l), np.asarray(d.l_vecs),
                 d.sigma2_err, np.asarray(d.y)], f,
            )
        loaded = data_io.load_sim_pickle(str(p))
        np.testing.assert_allclose(loaded["x"], np.asarray(d.x))
        np.testing.assert_allclose(loaded["y"], np.asarray(d.y))
        assert loaded["sigma2_err"] == pytest.approx(1e-2)

    def test_map_dat_and_kaiser(self, tmp_path, rng):
        vec = rng.normal(size=10)
        with open(tmp_path / "MAP.dat", "wb") as f:
            pickle.dump(vec, f)
        np.testing.assert_array_equal(data_io.load_map_dat(str(tmp_path / "MAP.dat")), vec)
        cohort = {1: (rng.uniform(size=5), rng.normal(size=(5, 2)))}
        with open(tmp_path / "kd.pickle", "wb") as f:
            pickle.dump(cohort, f)
        loaded = data_io.load_kaiser_distributed(str(tmp_path / "kd.pickle"))
        assert 1 in loaded and loaded[1][1].shape == (5, 2)


class TestDebug:
    def test_checked_objective_passthrough(self):
        fn = debug.checked_objective(lambda x: jnp.sum(x * x), "sq")
        assert float(jax.jit(fn)(jnp.ones(3))) == 3.0
        bad = debug.checked_objective(lambda x: jnp.log(x[0]), "log")
        out = jax.jit(bad)(jnp.asarray([-1.0]))
        assert np.isnan(float(out))  # reported but propagated unchanged

    def test_grad_finite_fraction(self):
        tree = {"a": jnp.asarray([1.0, jnp.nan]), "b": jnp.ones(2)}
        assert debug.grad_finite_fraction(tree) == 0.75


class TestLegacySims:
    def test_msdata_shapes(self):
        x = np.linspace(0, 5, 20)
        y, k_m, k_n = sim.sim_msdata(jax.random.PRNGKey(0), 3, 20, x)
        assert y.shape == (20, 3) and k_m.shape == (3, 3)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_mndata_blocked(self):
        x = np.linspace(0, 5, 16)
        y, k_m, k_n = sim.sim_mndata(jax.random.PRNGKey(1), 2, 16, x, percentage=0.5)
        k_n = np.asarray(k_n)
        # off-diagonal blocks are exactly zero in the blocked construction
        np.testing.assert_allclose(k_n[:8, 8:], 0.0, atol=1e-12)
        assert y.shape == (16, 2)

    def test_univariate(self):
        x = np.linspace(0, 5, 12)
        y, k = sim.sim_usdata(jax.random.PRNGKey(2), 12, x)
        assert y.shape == (12,)
        y, k = sim.sim_undata(jax.random.PRNGKey(3), 12, x)
        assert np.all(np.isfinite(np.asarray(y)))


class TestShardedCohortRouting:
    @pytest.mark.slow
    def test_oversized_subject_routes_through_model_parallel(self, tmp_path):
        """Subjects above sharded_threshold fit through the matrix-free
        model-parallel objective on the same mesh; scores land in the same
        reduction as the fleet-fitted subjects."""
        keys = jax.random.split(jax.random.PRNGKey(2), 3)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [14, 16, 40])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=25, window_size=5, do_hmc=True, n_hmc=4,
            whiten=True, hmc_step_size=1e-3, cohort_sampler="config",
            n_chains=1,
        )
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(
            subjects, cfg, store=store, n_buckets=1, extrapolation_size=3,
            sharded_threshold=30,
        )
        assert out["subjects"]["id2"].get("sharded") is True
        assert "sharded" not in out["subjects"]["id0"]
        for sid, rec in out["subjects"].items():
            assert np.isfinite(rec["final_nlp"]), sid
            assert np.isfinite(rec["test_rmse"]), sid
            # sharded subjects get the same posterior-sampling stage as the
            # fleet subjects (whitened chains through the sharded objective)
            assert rec["hmc_samples"].shape[0] == 4, sid
            assert np.all(np.isfinite(rec["hmc_samples"])), sid
        assert out["reduction"]["n_valid"] == 3
        assert out["ids"] == ["id0", "id1", "id2"]
        assert store.exists(ArtifactStore.key("gnmgp", "cohort", "id2", "hmc"))


class TestTrustworthyCohortSampling:
    """VERDICT r2 #2: run_cohort(do_hmc=True)'s default sampling posture is
    whitened adaptive NUTS with multiple jittered chains, and per-subject
    min-ESS / split-R̂ are surfaced in the result dict and artifact store so
    silent non-mixing is impossible."""

    def test_auto_posture_multichain_diagnostics(self, tmp_path):
        keys = jax.random.split(jax.random.PRNGKey(4), 2)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [14, 16])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=25, window_size=5, do_hmc=True, n_hmc=6,
            hmc_warmup=20, do_pred_test=False,
            escalate_rhat=0.0,  # pin the chain tier: the default R-hat
            #                     escalation (1.2) would swap in SMC draws
        )  # note: sampler/whiten left at their defaults — 'auto' overrides
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(subjects, cfg, store=store, n_buckets=1)
        for sid, rec in out["subjects"].items():
            # 2 chains x 6 draws pooled
            assert rec["hmc_samples"].shape[0] == 12, sid
            assert np.all(np.isfinite(rec["hmc_samples"])), sid
            samp = rec["sampling"]
            assert samp["n_chains"] == 2
            assert np.isfinite(samp["min_ess"]) and samp["min_ess"] > 0
            assert np.isfinite(samp["max_rhat"])
            # a 6-draw budget cannot mix: the warning must fire
            assert "warning" in samp, samp
            assert store.exists(
                ArtifactStore.key("gnmgp", "cohort", sid, "sampling")
            )
        loaded = store.load(ArtifactStore.key("gnmgp", "cohort", "id0", "sampling"))
        assert float(loaded["min_ess"]) > 0

    def test_posture_resolution(self):
        cfg = workflows.PipelineConfig()
        assert workflows._cohort_sampling_posture(cfg) == ("nuts", True)
        cfg2 = workflows.PipelineConfig(cohort_sampler="config", sampler="hmc",
                                        whiten=False)
        assert workflows._cohort_sampling_posture(cfg2) == ("hmc", False)
        with pytest.raises(ValueError, match="cohort_sampler"):
            workflows._cohort_sampling_posture(
                workflows.PipelineConfig(cohort_sampler="bogus")
            )


class TestShardedCohortSMC:
    @pytest.mark.slow
    def test_oversized_subject_smc_evidence(self, tmp_path):
        """sampler='smc' reaches the oversized tier too: the big subject
        samples by tempered SMC over the sharded potential (batched sweeps)
        and surfaces evidence instead of chain diagnostics — driver symmetry
        with the fleet SMC tier."""
        keys = jax.random.split(jax.random.PRNGKey(6), 2)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [14, 36])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=25, window_size=5, do_hmc=True, n_hmc=4,
            sampler="smc", smc_particles=8, smc_mutations=1,
            smc_leapfrog=2, cohort_sampler="config",
        )
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(
            subjects, cfg, store=store, n_buckets=1, extrapolation_size=3,
            sharded_threshold=30,
        )
        big = out["subjects"]["id1"]
        assert big.get("sharded") is True
        assert big["sampling"]["sampler"] == "smc"
        assert np.isfinite(big["sampling"]["log_evidence"])
        assert big["sampling"]["beta_final"] == 1.0
        assert big["hmc_samples"].shape[0] == 4
        assert np.all(np.isfinite(big["hmc_samples"]))
        loaded = store.load(
            ArtifactStore.key("gnmgp", "cohort", "id1", "sampling")
        )
        assert np.isfinite(float(loaded["log_evidence"]))
        # the fleet-tier subject also went through SMC
        small = out["subjects"]["id0"]
        assert small["sampling"]["sampler"] == "smc"


def test_stale_map_resume_refits(tmp_path):
    """A stored MAP whose length disagrees with the current data (stale
    artifact from a different N or split) must be ignored with a warning
    and refit, not crash downstream stages (workflows.run_subject resume)."""
    store = ArtifactStore(str(tmp_path))
    d = sim.sim_mnts(jax.random.PRNGKey(0), n=20)
    cfg = workflows.PipelineConfig(model="gnmgp", n_opt=30, do_hmc=False,
                                   test_size=0.0)
    # poison the store with a MAP fit at a different size
    key = ArtifactStore.key("gnmgp", "sim", "s0", "map")
    store.save(key, vec=np.zeros(5))
    with pytest.warns(UserWarning, match="ignoring stored MAP"):
        res = workflows.run_subject(d.x, d.y, cfg, store=store,
                                    dataset="sim", subject="s0")
    assert res["map_vec"].shape == (20 + 20 * 3 + 1,)
    # the store now holds the refit vector; a clean rerun resumes silently
    res2 = workflows.run_subject(d.x, d.y, cfg, store=store,
                                 dataset="sim", subject="s0")
    np.testing.assert_allclose(np.asarray(res2["map_vec"]),
                               np.asarray(res["map_vec"]))


def test_measured_better_defaults_on():
    """Round-4 defaults: the measured-better configurations ship ON —
    L-BFGS MAP (deeper optimum at 1/4 wall, 5.6x better predictive G/P/D)
    and R-hat-gated SMC escalation (the trustworthy posture at the
    reference scale where chains never reconcile)."""
    cfg = workflows.PipelineConfig()
    assert cfg.map_method == "lbfgs"
    assert cfg.escalate_rhat == 1.2


class TestSingleChipChainPosture:
    """On a single non-CPU chip, cohort_sampler="auto" at the reference
    scale resolves to whitened fixed-trajectory HMC ("hmc_auto") instead of
    NUTS — NUTS's depth-8 trees × tiled chains are a minutes-long single
    program, the tunneled-TPU device-fault class (observed kernel fault,
    benchmarks/cohort_tpu_run.py).  Chains' production role there is the
    R-hat diagnostic feeding the SMC escalation, which fixed trajectories
    serve equally (every chain tier measures identically non-mixed at
    N=200, ROADMAP)."""

    def test_posture_resolution(self, monkeypatch):
        from nonstationary_multivariate_gaussian_process_tpu.parallel import (
            fleet,
        )

        cfg = workflows.PipelineConfig()
        # CPU mesh: auto stays NUTS at every scale
        assert workflows._cohort_sampling_posture(
            cfg, n_bucket=200, mesh=None) == ("nuts", True)
        # single real chip: hmc_auto at/above the threshold, NUTS below
        monkeypatch.setattr(fleet, "resolve_smc_dispatch",
                            lambda d, m: "host")
        assert workflows._cohort_sampling_posture(
            cfg, n_bucket=200, mesh=None) == ("hmc_auto", True)
        assert workflows._cohort_sampling_posture(
            cfg, n_bucket=64, mesh=None) == ("nuts", True)
        # explicit config is never overridden
        cfg2 = workflows.PipelineConfig(cohort_sampler="config",
                                        sampler="nuts")
        assert workflows._cohort_sampling_posture(
            cfg2, n_bucket=200, mesh=None)[0] == "nuts"

    def test_hmc_auto_end_to_end(self, monkeypatch):
        """The hmc_auto branch runs the full cohort chain + escalation path
        (threshold lowered so small CPU subjects exercise it)."""
        from nonstationary_multivariate_gaussian_process_tpu.parallel import (
            fleet,
        )

        monkeypatch.setattr(fleet, "resolve_smc_dispatch",
                            lambda d, m: "host")
        monkeypatch.setattr(workflows, "SINGLE_CHIP_NUTS_N", 8)
        keys = jax.random.split(jax.random.PRNGKey(3), 2)
        subjects = {}
        for i in range(2):
            d = sim.sim_mnts(keys[i], n=14)
            subjects[f"s{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=40, do_hmc=True, n_hmc=8, hmc_warmup=10,
            n_chains=2, escalate_rhat=1.0001,  # force the escalation too
            smc_particles=32, smc_mutations=2, smc_leapfrog=4,
        )
        res = workflows.run_cohort(subjects, cfg=cfg, n_buckets=1)
        for rec in res["subjects"].values():
            assert np.isfinite(np.asarray(rec["hmc_samples"])).all()
            samp = rec["sampling"]
            # tiny budgets cannot mix: the escalation swapped in SMC draws
            assert samp["sampler"] == "smc"
            assert samp["escalated_from_rhat"] > 1.0001
