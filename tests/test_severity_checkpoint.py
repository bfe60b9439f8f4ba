"""Tests for severity post-processing and orbax checkpointing."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.postprocess import severity
from nonstationary_multivariate_gaussian_process_tpu.utils import checkpoint


class TestSeverity:
    def test_correlation_draws_from_lf(self, rng):
        g, s, m = 5, 20, 2
        lf = np.tril(rng.normal(size=(g, s, m, m))) + 2 * np.eye(m)
        cor = severity.correlation_draws_from_lf(lf)
        assert cor.shape == (g, s)
        assert np.all(np.abs(cor) <= 1 + 1e-9)

    def test_align_to_severity(self):
        grid = np.linspace(0, 1, 11)
        vals = np.arange(11.0)
        aligned = severity.align_to_severity(grid, vals, np.asarray([0.0, 0.52, 1.0]))
        np.testing.assert_array_equal(aligned, [0.0, 5.0, 10.0])

    def test_population_tests(self, rng):
        shifted = rng.normal(size=100) + 0.8
        res = severity.population_tests(shifted)
        assert res["t_p"] < 1e-6 and res["z_p"] < 1e-6 and res["sign_p"] < 1e-6
        noise = rng.normal(size=100) * 0.5
        two = severity.population_tests(shifted + noise, shifted)
        assert two["t_p"] > 0.01  # same-mean groups → no detected difference

    def test_pairwise_matrix(self, rng):
        cors = rng.normal(size=(50, 3, 3)) * 0.1
        cors[:, 0, 1] += 0.9
        stat, pval = severity.pairwise_test_matrix(cors, test="z")
        assert np.isnan(stat[0, 0])
        assert pval[0, 1] < 1e-6

    def test_subject_summary(self, rng):
        s = severity.subject_summary(rng.normal(size=(7, 30)))
        assert s["mean_per_time"].shape == (7,)
        assert s["q2.5"] < s["q97.5"]


class TestCheckpoint:
    def test_save_load_roundtrip(self, tmp_path):
        import optax

        params = jnp.arange(5.0)
        opt = optax.adam(0.1)
        opt_state = opt.init(params)
        key = jax.random.PRNGKey(3)
        path = str(tmp_path / "ckpt")
        checkpoint.save_train_state(path, 42, params, opt_state, key)
        state = checkpoint.load_train_state(path)
        assert int(state["step"]) == 42
        np.testing.assert_array_equal(np.asarray(state["params"]), np.arange(5.0))

    def test_resume_or_init(self, tmp_path):
        path = str(tmp_path / "none")
        step, params, _, _ = checkpoint.resume_or_init(path, jnp.zeros(3))
        assert step == 0
        checkpoint.save_train_state(path, 7, jnp.ones(3))
        step, params, _, _ = checkpoint.resume_or_init(path, jnp.zeros(3))
        assert step == 7
        np.testing.assert_array_equal(np.asarray(params), np.ones(3))
