"""WAIC / PSIS-LOO for the joint-MVN likelihoods (evaluate.py additions).

The pointwise terms are the exact leave-one-out conditionals from the
precision matrix (the GP-LOO identity) — validated here against brute-force
partitioned-Gaussian conditionals, the models' own ``log_lik``, and an
analytic conjugate LOO truth.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import dists, evaluate
from nonstationary_multivariate_gaussian_process_tpu.models import (
    FullData,
    gnmgp,
    gnmgp_hetero,
    lmc,
    snmgp,
)
from nonstationary_multivariate_gaussian_process_tpu.models.base import task_major


def _random_spd(rng, n):
    a = rng.normal(size=(n, n))
    return a @ a.T + n * np.eye(n)


def _normal_logpdf(y, mu, var):
    return -0.5 * np.log(2 * np.pi * var) - 0.5 * (y - mu) ** 2 / var


class TestConditional:
    def test_matches_bruteforce_partitioned_gaussian(self, rng):
        n = 7
        cov = _random_spd(rng, n)
        y = rng.normal(size=n)
        got = np.asarray(
            evaluate.pointwise_conditional_loglik(jnp.asarray(cov), jnp.asarray(y))
        )
        for i in range(n):
            rest = [j for j in range(n) if j != i]
            k_oo = cov[np.ix_(rest, rest)]
            k_io = cov[i, rest]
            mu = k_io @ np.linalg.solve(k_oo, y[rest])
            var = cov[i, i] - k_io @ np.linalg.solve(k_oo, k_io)
            np.testing.assert_allclose(got[i], _normal_logpdf(y[i], mu, var), rtol=1e-9)

    def test_diagonal_cov_reduces_to_marginals(self, rng):
        n = 5
        var = 0.5 + rng.uniform(size=n)
        y = rng.normal(size=n)
        got = np.asarray(
            evaluate.pointwise_conditional_loglik(jnp.diag(jnp.asarray(var)), jnp.asarray(y))
        )
        np.testing.assert_allclose(got, _normal_logpdf(y, 0.0, var), rtol=1e-10)

    def test_mask_projects_out_padded_slots(self, rng):
        n, m = 6, 2
        x = np.sort(rng.uniform(size=n))
        vec = 0.1 * rng.normal(size=gnmgp.n_params(n, m))
        cov = evaluate.observation_cov("gnmgp", vec, x, n, m)
        y = rng.normal(size=(n, m))
        mask = np.array([True] * 4 + [False] * 2)
        mask_tm = np.tile(mask, m)
        got = np.asarray(
            evaluate.pointwise_conditional_loglik(
                cov, task_major(jnp.asarray(y)), mask_tm
            )
        )
        assert np.all(got[~mask_tm] == 0.0)
        # real slots must equal the unpadded subproblem's conditionals
        cov_sub = evaluate.observation_cov("gnmgp", _subvec(vec, n, m, 4), x[:4], 4, m)
        want = np.asarray(
            evaluate.pointwise_conditional_loglik(
                cov_sub, task_major(jnp.asarray(y[:4]))
            )
        )
        np.testing.assert_allclose(got[mask_tm], want, rtol=1e-8)


def _subvec(vec, n, m, k):
    """Restrict a packed gnmgp vec to the first k inputs."""
    t = m * (m + 1) // 2
    tilde_l = vec[:n][:k]
    ul = vec[n : n + n * t].reshape(n, t)[:k].reshape(-1)
    return np.concatenate([tilde_l, ul, vec[-1:]])


class TestObservationCov:
    @pytest.mark.parametrize("model", ["gnmgp", "gnmgp_hetero", "snmgp", "lmc"])
    def test_matches_model_loglik(self, rng, model):
        n, m = 8, 2
        x = np.sort(rng.uniform(size=n))
        y = rng.normal(size=(n, m))
        mod = {"gnmgp": gnmgp, "gnmgp_hetero": gnmgp_hetero, "snmgp": snmgp, "lmc": lmc}[model]
        n_params = mod.n_params(m) if model == "lmc" else mod.n_params(n, m)
        vec = jnp.asarray(0.1 * rng.normal(size=n_params))
        cov = evaluate.observation_cov(model, vec, x, n, m)
        got = dists.mvn_logpdf_dense_unnorm(
            task_major(jnp.asarray(y)), 0.0, cov
        )
        p = mod.unpack(vec, m) if model == "lmc" else mod.unpack(vec, n, m)
        want = mod.log_lik(p, FullData(jnp.asarray(x), jnp.asarray(y)))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-8)


class TestHadamard:
    @pytest.mark.parametrize("model", ["gnmgp", "snmgp", "lmc"])
    def test_observation_cov_hadamard_matches_loglik(self, rng, model):
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            base as mbase,
        )

        n, m = 10, 2
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        y = rng.normal(size=n)
        mod = {"gnmgp": gnmgp, "snmgp": snmgp, "lmc": lmc}[model]
        n_params = mod.n_params(m) if model == "lmc" else mod.n_params(n, m)
        vec = jnp.asarray(0.1 * rng.normal(size=n_params))
        cov = evaluate.observation_cov_hadamard(model, vec, x, indx, m)
        got = dists.mvn_logpdf_dense_unnorm(jnp.asarray(y), 0.0, cov)
        p = mod.unpack(vec, m) if model == "lmc" else mod.unpack(vec, n, m)
        data = mbase.HadamardData(
            jnp.asarray(x), jnp.asarray(indx, jnp.int32), jnp.asarray(y)
        )
        want = mod.log_posterior_hadamard(p, data, m, prior=False)[0]
        np.testing.assert_allclose(float(got), float(want), rtol=1e-8)

    def test_run_subject_hadamard_do_loo(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu import workflows

        n, m = 18, 2
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        y = rng.normal(size=n)
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=30, do_hmc=True, do_loo=True, n_hmc=6,
            loo_draws=4, hmc_step_size=1e-4, hmc_leapfrog=2,
            do_pred_grid=False, do_empirical=False,
        )
        res = workflows.run_subject_hadamard(x, indx, y, m, cfg=cfg)
        assert np.isfinite(res["loo"]["elpd_loo"])
        assert np.isfinite(res["loo"]["elpd_waic"])


class TestComparison:
    def test_loo_compare_paired_se(self, rng):
        a = rng.normal(size=50)
        d = 0.3 + 0.1 * rng.normal(size=50)
        res = evaluate.loo_compare(a, a + d)
        np.testing.assert_allclose(res["elpd_diff"], d.sum(), rtol=1e-12)
        np.testing.assert_allclose(
            res["se_diff"], np.sqrt(50 * d.var(ddof=1)), rtol=1e-12
        )
        with pytest.raises(ValueError, match="identical observations"):
            evaluate.loo_compare(a, a[:10])

    def test_stacking_dominant_model_takes_all(self, rng):
        n = 200
        good = _normal_logpdf(rng.normal(size=n), 0.0, 1.0)
        bad = good - 3.0  # uniformly 3 nats worse per point
        w = evaluate.stacking_weights([bad, good])
        assert w.shape == (2,)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-12)
        assert w[1] > 0.99

    def test_stacking_complementary_models_mix(self, rng):
        # model A predicts the first half well, model B the second half:
        # the optimal stack is an interior mixture
        n = 400
        a = np.where(np.arange(n) < n // 2, -0.5, -5.0)
        b = np.where(np.arange(n) < n // 2, -5.0, -0.5)
        w = evaluate.stacking_weights([a, b])
        assert 0.4 < w[0] < 0.6 and 0.4 < w[1] < 0.6
        # and the stacked objective beats either endpoint
        def obj(w):
            return np.sum(np.log(w[0] * np.exp(a) + w[1] * np.exp(b)))
        assert obj(w) > max(obj([1.0, 0.0]), obj([0.0, 1.0]))


class TestChainCriteria:
    def test_chain_conditional_loglik_shape_and_chunking(self, rng):
        n, m, s = 6, 2, 5
        x = np.sort(rng.uniform(size=n))
        y = rng.normal(size=(n, m))
        hist = 0.1 * rng.normal(size=(s, gnmgp.n_params(n, m)))
        ll2 = evaluate.chain_conditional_loglik("gnmgp", hist, x, y, chunk=2)
        ll5 = evaluate.chain_conditional_loglik("gnmgp", hist, x, y, chunk=5)
        assert ll2.shape == (s, n * m)
        np.testing.assert_allclose(ll2, ll5, rtol=1e-10)
        assert np.all(np.isfinite(ll2))

    def test_psis_loo_matches_conjugate_truth(self, rng):
        # factorized conjugate model: y_i ~ N(mu, 1), mu ~ N(0, 10^2).
        # Exact LOO predictive p(y_i | y_{-i}) is closed form; the PSIS-LOO
        # estimate from posterior draws must agree within MC error.
        n, s = 24, 4000
        y = rng.normal(loc=0.7, size=n)
        tau2 = 100.0
        post_var = 1.0 / (n + 1.0 / tau2)
        post_mean = post_var * y.sum()
        draws = post_mean + np.sqrt(post_var) * rng.normal(size=s)
        cond_ll = _normal_logpdf(y[None, :], draws[:, None], 1.0)

        res = evaluate.psis_loo(cond_ll)
        truth = 0.0
        for i in range(n):
            rest = np.delete(y, i)
            v = 1.0 / (n - 1 + 1.0 / tau2)
            truth += _normal_logpdf(y[i], v * rest.sum(), 1.0 + v)
        assert res["n_bad_k"] == 0
        assert abs(res["elpd_loo"] - truth) < 0.05 * n
        # WAIC agrees with LOO on a well-behaved factorized model
        res_w = evaluate.waic(cond_ll)
        assert abs(res_w["elpd_waic"] - res["elpd_loo"]) < 0.02 * n
        assert 0.0 < res_w["p_waic"] < 3.0

    def test_run_subject_do_loo(self):
        # pipeline wiring: do_loo lands WAIC + PSIS-LOO in result["loo"]
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.data import sim

        d = sim.sim_mnts(jax.random.PRNGKey(3), n=16)
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=40, do_hmc=True, do_loo=True, n_hmc=8, loo_draws=6,
            hmc_step_size=1e-4, hmc_leapfrog=2, do_pred_grid=False,
            do_map_analysis=False,
        )
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg)
        assert {"elpd_loo", "p_loo", "elpd_waic", "n_bad_k", "k_hat_max"} <= set(
            res["loo"]
        )
        assert np.isfinite(res["loo"]["elpd_loo"])

    def test_loo_on_gnmgp_chain(self, rng):
        # end-to-end on the flagship model: finite, sane magnitudes, and the
        # in-sample lppd upper-bounds elpd_loo (optimism is non-negative)
        n, m, s = 8, 2, 40
        x = np.sort(rng.uniform(size=n))
        y = rng.normal(size=(n, m))
        center = 0.1 * rng.normal(size=gnmgp.n_params(n, m))
        hist = center[None, :] + 0.05 * rng.normal(size=(s, center.size))
        cond_ll = evaluate.chain_conditional_loglik("gnmgp", hist, x, y)
        res = evaluate.psis_loo(cond_ll)
        lppd = float(np.sum(evaluate._logsumexp(cond_ll, axis=0) - np.log(s)))
        assert np.isfinite(res["elpd_loo"])
        assert res["elpd_loo"] <= lppd + 1e-9
        assert res["k_hat"].shape == (n * m,)
