"""Masked (padded) GNMGP likelihood: exactness and cohort pad-mode."""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.models import FullData, gnmgp
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms
from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore


class TestMaskedLikelihood:
    def test_masked_equals_unpadded(self, rng):
        n_real, pad, m = 10, 4, 2
        n = n_real + pad
        x_real = np.sort(rng.uniform(size=n_real))
        y_real = rng.normal(size=(n_real, m))
        dx = np.mean(np.diff(x_real))
        x_pad = np.concatenate([x_real, x_real[-1] + dx * np.arange(1, pad + 1)])
        y_pad = np.concatenate([y_real, np.zeros((pad, m))])
        mask = np.concatenate([np.ones(n_real, bool), np.zeros(pad, bool)])

        t = transforms.tri_size(m)
        vec_real = rng.normal(size=n_real + n_real * t + 1) * 0.4
        vec_pad = np.asarray(
            workflows._pad_gnmgp_vec(jnp.asarray(vec_real), n_real, n, m)
        )

        ll_real = float(
            gnmgp.log_lik(
                gnmgp.unpack(jnp.asarray(vec_real), n_real, m),
                FullData(jnp.asarray(x_real), jnp.asarray(y_real)),
            )
        )
        ll_masked = float(
            gnmgp.log_lik(
                gnmgp.unpack(jnp.asarray(vec_pad), n, m),
                FullData(jnp.asarray(x_pad), jnp.asarray(y_pad)),
                mask=jnp.asarray(mask),
            )
        )
        np.testing.assert_allclose(ll_masked, ll_real, rtol=1e-10)

    def test_pad_crop_roundtrip(self, rng):
        n_real, n, m = 6, 9, 2
        t = transforms.tri_size(m)
        vec = jnp.asarray(rng.normal(size=n_real + n_real * t + 1))
        padded = workflows._pad_gnmgp_vec(vec, n_real, n, m)
        assert padded.shape[0] == n + n * t + 1
        cropped = workflows._crop_gnmgp_vec(padded, n, n_real, m)
        np.testing.assert_allclose(np.asarray(cropped), np.asarray(vec))


class TestCohortPadMode:
    def test_run_cohort_pad(self, tmp_path):
        keys = jax.random.split(jax.random.PRNGKey(0), 4)
        subjects = {}
        for i, (k, n) in enumerate(zip(keys, [16, 18, 20, 22])):
            d = sim.sim_mnts(k, n=n)
            subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))
        cfg = workflows.PipelineConfig(model="gnmgp", n_opt=25, window_size=5)
        store = ArtifactStore(str(tmp_path))
        out = workflows.run_cohort(
            subjects, cfg, store=store, n_buckets=2,
            extrapolation_size=3, mode="pad",
        )
        assert len(out["subjects"]) == 4
        for rec in out["subjects"].values():
            assert np.isfinite(rec["final_nlp"])
            assert np.isfinite(rec["test_rmse"])
        assert out["reduction"]["n_valid"] == 4


class TestMaskedKron:
    def test_snmgp_masked_equals_unpadded(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.models import snmgp

        n_real, pad, m = 9, 3, 2
        n = n_real + pad
        x_real = np.sort(rng.uniform(size=n_real))
        y_real = rng.normal(size=(n_real, m))
        dx = np.mean(np.diff(x_real))
        x_pad = np.concatenate([x_real, x_real[-1] + dx * np.arange(1, pad + 1)])
        y_pad = np.concatenate([y_real, np.zeros((pad, m))])
        mask = np.concatenate([np.ones(n_real, bool), np.zeros(pad, bool)])

        t = transforms.tri_size(m)
        vec_real = rng.normal(size=2 * n_real + t + 1) * 0.4
        # pad latent slots by repeating edges
        tl = np.concatenate([vec_real[:n_real], [vec_real[n_real - 1]] * pad])
        ts = np.concatenate([vec_real[n_real:2 * n_real], [vec_real[2 * n_real - 1]] * pad])
        vec_pad = np.concatenate([tl, ts, vec_real[2 * n_real:]])

        ll_real = float(
            snmgp.log_lik(
                snmgp.unpack(jnp.asarray(vec_real), n_real, m),
                FullData(jnp.asarray(x_real), jnp.asarray(y_real)),
            )
        )
        ll_masked = float(
            snmgp.log_lik(
                snmgp.unpack(jnp.asarray(vec_pad), n, m),
                FullData(jnp.asarray(x_pad), jnp.asarray(y_pad)),
                mask=jnp.asarray(mask),
            )
        )
        np.testing.assert_allclose(ll_masked, ll_real, rtol=1e-9)

    def test_lmc_masked_equals_unpadded(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.models import lmc

        n_real, pad, m = 10, 4, 2
        x_real = np.sort(rng.uniform(size=n_real))
        y_real = rng.normal(size=(n_real, m))
        dx = np.mean(np.diff(x_real))
        x_pad = np.concatenate([x_real, x_real[-1] + dx * np.arange(1, pad + 1)])
        y_pad = np.concatenate([y_real, np.zeros((pad, m))])
        mask = np.concatenate([np.ones(n_real, bool), np.zeros(pad, bool)])
        vec = rng.normal(size=2 + 3 + 1) * 0.4
        p = lmc.unpack(jnp.asarray(vec), m)
        ll_real = float(lmc.log_lik(p, FullData(jnp.asarray(x_real), jnp.asarray(y_real))))
        ll_masked = float(
            lmc.log_lik(p, FullData(jnp.asarray(x_pad), jnp.asarray(y_pad)),
                        mask=jnp.asarray(mask))
        )
        np.testing.assert_allclose(ll_masked, ll_real, rtol=1e-9)
