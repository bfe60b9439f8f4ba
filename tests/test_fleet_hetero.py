"""Heteroscedastic GNMGP in the subject-parallel fleet tier (VERDICT r2 #1).

The reference's extended model is itself a per-patient *fleet* driver
(``Nonseparable_model_mpiKAISER_extended.py:452``, rank-indexed subject
selection); these tests pin the framework's model x driver symmetry: the
hetero model must be reachable from fit_fleet_map / hmc_fleet / nuts_fleet /
run_cohort / run_sim_fleet with exact masked (padded-ragged) likelihoods.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.models import (
    FullData,
    gnmgp_hetero,
)
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms
from nonstationary_multivariate_gaussian_process_tpu.parallel import fleet
from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore


def _padded_problem(rng, n_real, pad, m):
    x_real = np.sort(rng.uniform(size=n_real))
    y_real = rng.normal(size=(n_real, m))
    dx = np.mean(np.diff(x_real))
    x_pad = np.concatenate([x_real, x_real[-1] + dx * np.arange(1, pad + 1)])
    y_pad = np.concatenate([y_real, np.zeros((pad, m))])
    mask = np.concatenate([np.ones(n_real, bool), np.zeros(pad, bool)])
    return x_real, y_real, x_pad, y_pad, mask


class TestMaskedHetero:
    def test_masked_equals_unpadded(self, rng):
        n_real, pad, m = 10, 4, 2
        n = n_real + pad
        x_r, y_r, x_p, y_p, mask = _padded_problem(rng, n_real, pad, m)
        vec_real = rng.normal(size=gnmgp_hetero.n_params(n_real, m)) * 0.4
        vec_pad = np.asarray(
            workflows._pad_vec("gnmgp_hetero", jnp.asarray(vec_real), n_real, n, m)
        )
        ll_real = float(
            gnmgp_hetero.log_lik(
                gnmgp_hetero.unpack(jnp.asarray(vec_real), n_real, m),
                FullData(jnp.asarray(x_r), jnp.asarray(y_r)),
            )
        )
        ll_masked = float(
            gnmgp_hetero.log_lik(
                gnmgp_hetero.unpack(jnp.asarray(vec_pad), n, m),
                FullData(jnp.asarray(x_p), jnp.asarray(y_p)),
                mask=jnp.asarray(mask),
            )
        )
        np.testing.assert_allclose(ll_masked, ll_real, rtol=1e-10)

    def test_pad_crop_roundtrip(self, rng):
        n_real, n, m = 6, 9, 2
        vec = jnp.asarray(rng.normal(size=gnmgp_hetero.n_params(n_real, m)))
        padded = workflows._pad_vec("gnmgp_hetero", vec, n_real, n, m)
        assert padded.shape[0] == gnmgp_hetero.n_params(n, m)
        cropped = workflows._crop_vec("gnmgp_hetero", padded, n, n_real, m)
        np.testing.assert_allclose(np.asarray(cropped), np.asarray(vec))


class TestHeteroFleet:
    def test_fleet_map_matches_single_objective(self, rng):
        n, m, s = 12, 2, 2
        xs = np.stack([np.sort(rng.uniform(size=n)) for _ in range(s)])
        ys = rng.normal(size=(s, n, m))
        p_dim = gnmgp_hetero.n_params(n, m)
        inits = jnp.asarray(rng.normal(size=(s, p_dim)) * 0.2)
        res = fleet.fit_fleet_map(
            "gnmgp_hetero", jnp.asarray(xs), jnp.asarray(ys), inits,
            n_iters=20, lr=0.1,
        )
        assert res.vecs.shape == (s, p_dim)
        for i in range(s):
            nlp = gnmgp_hetero.make_objective(
                FullData(jnp.asarray(xs[i]), jnp.asarray(ys[i]))
            )
            np.testing.assert_allclose(
                float(res.final_nlp[i]), float(nlp(res.vecs[i])), rtol=1e-6
            )

    def test_fleet_whiten_roundtrip(self, rng):
        n, m = 10, 2
        hp = dict(gnmgp_hetero.DEFAULT_HYPERS)
        x = jnp.asarray(np.sort(rng.uniform(size=n)))
        pc1, pc2, pc3 = fleet._prior_chols("gnmgp_hetero", x, hp)
        fw, tw = fleet._fleet_whiten_fns("gnmgp_hetero", n, m, hp)
        vec = jnp.asarray(rng.normal(size=gnmgp_hetero.n_params(n, m)))
        u = tw(vec, pc1, pc2, pc3)
        back = fw(u, pc1, pc2, pc3)
        np.testing.assert_allclose(np.asarray(back), np.asarray(vec), rtol=1e-8,
                                   atol=1e-10)
        # consistent with the single-subject whitener (inference/whiten.py)
        from nonstationary_multivariate_gaussian_process_tpu.inference import whiten

        w = whiten.make_whitener("gnmgp_hetero", x, n, m, {})
        np.testing.assert_allclose(
            np.asarray(w.to_white(vec)), np.asarray(u), rtol=1e-7, atol=1e-9
        )

    def test_hmc_and_nuts_fleet_smoke(self, rng):
        n, m, s = 10, 2, 2
        xs = np.stack([np.sort(rng.uniform(size=n)) for _ in range(s)])
        ys = rng.normal(size=(s, n, m))
        masks = np.ones((s, n), bool)
        masks[1, -2:] = False
        p_dim = gnmgp_hetero.n_params(n, m)
        vecs = jnp.asarray(rng.normal(size=(s, p_dim)) * 0.1)
        samples = fleet.hmc_fleet(
            "gnmgp_hetero", jnp.asarray(xs), jnp.asarray(ys), vecs,
            jax.random.PRNGKey(0), n_samples=4, step_size=1e-3, n_leapfrog=3,
            whiten=True, masks=jnp.asarray(masks),
        )
        assert samples.shape == (s, 4, p_dim)
        assert np.all(np.isfinite(np.asarray(samples)))
        nuts_s, accept = fleet.nuts_fleet(
            "gnmgp_hetero", jnp.asarray(xs), jnp.asarray(ys), vecs,
            jax.random.PRNGKey(1), n_samples=4, n_warmup=10,
            whiten=True, masks=jnp.asarray(masks),
        )
        assert nuts_s.shape == (s, 4, p_dim)
        assert np.all(np.isfinite(np.asarray(nuts_s)))

    def test_hessian_mass_fleet(self, rng):
        n, m, s = 8, 2, 1
        xs = np.stack([np.sort(rng.uniform(size=n)) for _ in range(s)])
        ys = rng.normal(size=(s, n, m))
        vecs = jnp.asarray(rng.normal(size=(s, gnmgp_hetero.n_params(n, m))) * 0.1)
        masses = fleet.hessian_mass_fleet("gnmgp_hetero", xs, ys, vecs)
        assert masses.shape == vecs.shape
        assert np.all(np.asarray(masses) > 0)


class TestHeteroDrivers:
    def test_run_cohort_hetero_pad(self, tmp_path):
        keys = jax.random.split(jax.random.PRNGKey(3), 3)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [14, 16, 18])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(
            model="gnmgp_hetero", n_opt=20, window_size=5, do_hmc=True,
            n_hmc=4, hmc_step_size=1e-3, hmc_leapfrog=3, whiten=True,
            cohort_sampler="config", n_chains=1,
        )
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(
            subjects, cfg, store=store, n_buckets=1, extrapolation_size=3,
        )
        assert len(out["subjects"]) == 3
        for rec in out["subjects"].values():
            assert np.isfinite(rec["final_nlp"])
            assert np.isfinite(rec["test_rmse"])
            assert np.all(np.isfinite(rec["hmc_samples"]))
        assert out["reduction"]["n_valid"] == 3

    def test_run_sim_fleet_hetero(self):
        cfg = workflows.PipelineConfig(
            model="gnmgp_hetero", n_opt=15, window_size=5,
        )
        out = workflows.run_sim_fleet(n_replicates=2, n=14, cfg=cfg)
        assert np.isfinite(out["fleet_metrics"]["mean_final_nlp"])
        assert "tilde_l_rmse" in out
        assert len(out["gpd"]) == 2

    def test_hadamard_fleet_rejects_hetero(self, rng):
        import pytest

        n, m, s = 8, 2, 1
        xs = jnp.asarray(np.stack([np.sort(rng.uniform(size=n))] * s))
        indxs = jnp.zeros((s, n), jnp.int32)
        ys = jnp.asarray(rng.normal(size=(s, n)))
        with pytest.raises(ValueError, match="Hadamard"):
            fleet.fit_fleet_map_hadamard(
                "gnmgp_hetero", xs, indxs, ys, m,
                jnp.zeros((s, gnmgp_hetero.n_params(n, m))),
            )
