"""Simulation-based calibration (inference/sbc.py).

The harness is validated on a conjugate model where the exact posterior is
known (uniform ranks) and where a deliberately biased sampler must be caught;
the model-specific prior samplers and likelihood simulator are validated by
moment-matching against the exact prior factors / observation covariance.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import evaluate
from nonstationary_multivariate_gaussian_process_tpu.inference import sbc
from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
from nonstationary_multivariate_gaussian_process_tpu.ops import kernels


class TestPriorSamplers:
    def test_gnmgp_prior_moments(self, rng):
        n, m, r = 6, 2, 4000
        x = np.sort(rng.uniform(size=n))
        hyper = {"a": 3.0, "b": 2.0}  # finite-variance noise prior
        prior_fn = sbc.make_prior_sampler("gnmgp", x, m, hyper)
        draws = jax.vmap(prior_fn)(jax.random.split(jax.random.PRNGKey(0), r))
        draws = np.asarray(draws)
        assert draws.shape == (r, gnmgp.n_params(n, m))
        # tilde_l block: zero mean, rbf_cov(alpha=5, beta=1) covariance
        tl = draws[:, :n]
        want = np.asarray(kernels.rbf_cov(jnp.asarray(x), alpha=5.0, beta=1.0))
        got = np.cov(tl.T)
        assert np.abs(tl.mean()) < 3 * 5.0 / np.sqrt(r)
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 0.1
        # noise slot: sigma2 ~ InvGamma(3, 2), E = b/(a-1) = 1
        s2 = np.exp(draws[:, -1])
        assert abs(s2.mean() - 1.0) < 0.1
        # L-entry processes share the alpha_L prior marginal variance
        ul = draws[:, n : n + n * 3].reshape(r, n, 3)
        assert abs(ul.var() - 25.0) / 25.0 < 0.1

    def test_snmgp_and_lmc_layouts(self, rng):
        n, m = 5, 2
        x = np.sort(rng.uniform(size=n))
        v_s = np.asarray(sbc.make_prior_sampler("snmgp", x, m)(jax.random.PRNGKey(1)))
        assert v_s.shape == (2 * n + 3 + 1,)
        v_l = np.asarray(sbc.make_prior_sampler("lmc", x, m)(jax.random.PRNGKey(2)))
        assert v_l.shape == (3 + 3,)
        assert v_l[1] == 0.0  # tilde_sigma pinned (no prior in the model)

    def test_hetero_prior_layout(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            gnmgp_hetero,
        )

        n, m = 5, 2
        x = np.sort(rng.uniform(size=n))
        v = np.asarray(
            sbc.make_prior_sampler("gnmgp_hetero", x, m)(jax.random.PRNGKey(3))
        )
        assert v.shape == (gnmgp_hetero.n_params(n, m),)
        assert np.all(np.isfinite(v))


class TestSimulator:
    def test_simulated_cov_matches_observation_cov(self, rng):
        n, m, r = 5, 2, 6000
        x = np.sort(rng.uniform(size=n))
        vec = jnp.asarray(0.1 * rng.normal(size=gnmgp.n_params(n, m)))
        sim_fn = sbc.make_simulator("gnmgp", x, m)
        ys = jax.vmap(lambda k: sim_fn(k, vec))(
            jax.random.split(jax.random.PRNGKey(4), r)
        )
        ys_tm = np.asarray(ys).transpose(0, 2, 1).reshape(r, n * m)
        want = np.asarray(evaluate.observation_cov("gnmgp", vec, x, n, m))
        got = np.cov(ys_tm.T)
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 0.1


class TestHarness:
    """Conjugate 1-D model: prior N(0,1), y ~ N(theta, 1), posterior
    N(y/2, 1/2) — the exact sampler must pass, a biased one must fail."""

    def _run(self, post_std_factor, key, r=300, s=63):
        prior_fn = lambda k: jax.random.normal(k, (1,))
        sim_fn = lambda k, th: th[0] + jax.random.normal(k, ())

        def posterior_fn(k, theta_true, y):
            mu, std = y / 2.0, np.sqrt(0.5) * post_std_factor
            return mu + std * jax.random.normal(k, (s, 1))

        return sbc.sbc_ranks(prior_fn, sim_fn, posterior_fn, key, r)

    def test_exact_posterior_is_uniform(self):
        res = self._run(1.0, jax.random.PRNGKey(5))
        p = sbc.uniformity_pvalues(res)
        assert res.ranks.shape == (300, 1)
        assert res.ranks.min() >= 0 and res.ranks.max() <= res.n_draws
        assert p[0] > 0.01

    def test_overconfident_posterior_is_caught(self):
        res = self._run(0.4, jax.random.PRNGKey(6))
        p = sbc.uniformity_pvalues(res)
        assert p[0] < 1e-6  # ranks pile at the extremes

    def test_shifted_posterior_is_caught(self):
        # systematic bias (e.g. a step-size-biased chain): mean off by 0.5 sd
        def posterior_fn(k, theta_true, y):
            return (y / 2.0 + 0.5) + np.sqrt(0.5) * jax.random.normal(k, (63, 1))

        prior_fn = lambda k: jax.random.normal(k, (1,))
        sim_fn = lambda k, th: th[0] + jax.random.normal(k, ())
        res = sbc.sbc_ranks(prior_fn, sim_fn, posterior_fn, jax.random.PRNGKey(7), 300)
        assert sbc.uniformity_pvalues(res)[0] < 1e-6


@pytest.mark.slow
class TestEndToEnd:
    def test_gnmgp_smc_sbc_smoke(self):
        """Integration: SMC posterior draws on the flagship model pass a
        (low-power) uniformity check at tiny scale — a gross mis-calibration
        (wrong prior factor / likelihood scaling) fails this decisively."""
        from nonstationary_multivariate_gaussian_process_tpu.inference import (
            smc, whiten,
        )
        from nonstationary_multivariate_gaussian_process_tpu.models import FullData

        n, m, r = 8, 2, 24
        x = np.sort(np.random.default_rng(8).uniform(size=n))
        prior_fn = sbc.make_prior_sampler("gnmgp", x, m)
        sim_fn = sbc.make_simulator("gnmgp", x, m)
        w = whiten.make_whitener("gnmgp", jnp.asarray(x), n, m)

        def posterior_fn(k, theta_true, y):
            nlp = gnmgp.make_objective(FullData(jnp.asarray(x), jnp.asarray(y)))
            res = smc.smc_sample(
                w.wrap(nlp), w.n_params, k, 64, n_mutations=3, n_leapfrog=8,
                metric="full", n_polish=5,
            )
            return w.from_white_batch(res.particles[::4])  # thin: 16 draws

        res = sbc.sbc_ranks(
            prior_fn, sim_fn, posterior_fn, jax.random.PRNGKey(9), r
        )
        p = sbc.uniformity_pvalues(res, n_bins=4)
        # low power at R=24 — this is a smoke bar, not a precision claim
        assert np.isfinite(p).all()
        assert np.median(p) > 1e-3
        assert res.ranks.max() > 0 and res.ranks.min() < res.n_draws


@pytest.mark.slow
def test_sbc_driver_writes_artifact(tmp_path):
    """examples/run_sbc.py (the shipping-posture certification driver,
    VERDICT r4 #4) runs end-to-end and writes the rank/uniformity artifact;
    the reference-scale artifact itself is checked in at
    benchmarks/sbc_gnmgp_n100_r05.json (captured on the TPU)."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    out = tmp_path / "sbc.json"
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "run_sbc.py"),
         "--n", "16", "--replicates", "6", "--particles", "32",
         "--polish", "2", "--out", str(out)],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu",
             "PALLAS_AXON_POOL_IPS": ""},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    art = json.loads(out.read_text())
    assert art["replicates"] == 6
    assert 0.0 <= art["frac_p_below_05"] <= 1.0
    assert len(art["rank_hist_pooled"]) == 8
