"""Sparse (inducing-point) GNMGP tier.

* Woodbury identity: the O(N(mM)^2) likelihood equals a dense MVN over the
  explicitly assembled Q + diag(Lambda) covariance.
* Exact limit: with Z = X, FITC reproduces the exact GNMGP likelihood at the
  same (kriged) latent fields.
* Titsias bound: the VFE likelihood lower-bounds the exact one.
* Mask exactness: a padded subject scores identically to the unpadded one.
* End-to-end: MAP on simulated truth recovers the latent processes and
  predicts held-out data at N far beyond the exact tier's budget.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonstationary_multivariate_gaussian_process_tpu import dists
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.inference.map import fit_map
from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp_sparse as sp
from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData, task_major
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms
from nonstationary_multivariate_gaussian_process_tpu.predict import gnmgp_sparse as sp_pred


M = 2
T = transforms.tri_size(M)


def _data(n=24, key=0):
    d = sim.sim_mnts(jax.random.PRNGKey(key), n=n, m=M)
    return FullData(d.x, d.y)


def _rand_vec(m_z, key=1, scale=0.3):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    tl = -1.0 + scale * jax.random.normal(k1, (m_z,))
    ul = scale * jax.random.normal(k2, (m_z * T,))
    s2 = jnp.asarray([-3.0]) + scale * jax.random.normal(k3, (1,))
    return jnp.concatenate([tl, ul, s2])


def _dense_cov_from_woodbury(w):
    """Reassemble Q + diag(Lambda) from the factor set."""
    b = w.a * jnp.sqrt(w.lam)[None, :]  # C^{-1} K_mn
    return b.T @ b + jnp.diag(w.lam)


class TestWoodbury:
    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_matches_dense_mvn(self, approx):
        data = _data(n=24)
        z = sp.choose_inducing(data.x, 8)
        ops = sp.make_ops(data.x, z)
        m_z = z.shape[0]
        vec = _rand_vec(m_z)
        p = sp.unpack(vec, m_z, M)
        w = sp._woodbury(p, data, ops, M, approx)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(task_major(data.y), 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr) / jnp.exp(p.tilde_sigma2_err)
        got = sp.log_lik(p, data, ops, approx=approx)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-8)

    def test_fitc_exact_limit_z_equals_x(self):
        data = _data(n=24)
        ops = sp.make_ops(data.x, data.x)
        vec = _rand_vec(data.x.shape[0], key=2)
        p = sp.unpack(vec, data.x.shape[0], M)
        tl_x, ul_x = sp.latents_at_data(p, ops, M)
        dense_p = gnmgp.Params(
            tilde_l=tl_x, ul_vecs=ul_x.reshape(-1),
            tilde_sigma2_err=p.tilde_sigma2_err,
        )
        want = gnmgp.log_lik(dense_p, data)
        got = sp.log_lik(p, data, ops, approx="fitc")
        # only the prior nugget (1e-6) separates Q from K here
        np.testing.assert_allclose(float(got), float(want), rtol=1e-3, atol=0.05)

    def test_vfe_lower_bounds_exact(self):
        data = _data(n=24)
        z = sp.choose_inducing(data.x, 8)
        ops = sp.make_ops(data.x, z)
        m_z = z.shape[0]
        vec = _rand_vec(m_z, key=3)
        p = sp.unpack(vec, m_z, M)
        tl_x, ul_x = sp.latents_at_data(p, ops, M)
        dense_p = gnmgp.Params(
            tilde_l=tl_x, ul_vecs=ul_x.reshape(-1),
            tilde_sigma2_err=p.tilde_sigma2_err,
        )
        exact = float(gnmgp.log_lik(dense_p, data))
        vfe = float(sp.log_lik(p, data, ops, approx="vfe"))
        assert vfe <= exact + 1e-6


class TestObjective:
    def test_mask_pad_exact(self):
        data = _data(n=20)
        n_pad = 26
        x_pad = jnp.concatenate([data.x, jnp.full((n_pad - 20,), data.x[-1])])
        y_pad = jnp.concatenate([data.y, jnp.zeros((n_pad - 20, M), data.y.dtype)])
        mask = jnp.arange(n_pad) < 20
        z = sp.choose_inducing(data.x, 7)
        nlp_real, _ = sp.make_objective(data, z=z)
        nlp_pad, _ = sp.make_objective(FullData(x_pad, y_pad), z=z, mask=mask)
        vec = _rand_vec(z.shape[0], key=4)
        np.testing.assert_allclose(
            float(nlp_pad(vec)), float(nlp_real(vec)), rtol=1e-9
        )

    def test_grad_finite_and_jittable(self):
        data = _data(n=32)
        nlp, ops = sp.make_objective(data, n_inducing=10)
        vec = _rand_vec(ops.z.shape[0], key=5)
        val, g = jax.jit(jax.value_and_grad(nlp))(vec)
        assert jnp.isfinite(val)
        assert jnp.all(jnp.isfinite(g))

    def test_unpack_named_error(self):
        with pytest.raises(ValueError, match="gnmgp_sparse"):
            sp.unpack(jnp.zeros(11), 8, M)

    def test_bad_approx_named_error(self):
        data = _data(n=16)
        with pytest.raises(ValueError, match="approx"):
            sp.make_objective(data, n_inducing=6, approx="dtc")

    def test_init_from_empirical_layout(self):
        data = _data(n=32)
        z = sp.choose_inducing(data.x, 8)
        dense_vec = jnp.arange(gnmgp.n_params(32, M), dtype=jnp.float64)
        v = sp.init_from_empirical(dense_vec, 32, z.shape[0], M, data.x, z)
        assert v.shape == (sp.n_params(z.shape[0], M),)
        # slot 0 of tilde_l_z should equal tilde_l at the nearest input (x[0])
        np.testing.assert_allclose(float(v[0]), 0.0)


class TestEndToEnd:
    def test_map_recovery_and_prediction(self):
        """N=160 subject, m_z=24: MAP recovers the latent lengthscale trend
        and predicts interleaved held-out points better than the data scale."""
        d = sim.sim_mnts(jax.random.PRNGKey(7), n=200, m=M)
        test_idx = np.arange(2, 200, 5)
        train_idx = np.setdiff1d(np.arange(200), test_idx)
        train = FullData(d.x[train_idx], d.y[train_idx])
        x_test, y_test = d.x[test_idx], d.y[test_idx]

        nlp, ops = sp.make_objective(train, n_inducing=24, approx="fitc")
        m_z = ops.z.shape[0]
        init = jnp.concatenate([
            jnp.full((m_z,), -1.0),
            jnp.tile(jnp.asarray([0.3, 0.0, 0.3]), m_z),
            jnp.asarray([-3.0]),
        ])
        res = fit_map(nlp, init, n_iters=400, method="lbfgs")
        assert float(nlp(res.vec)) < float(nlp(init)) - 50.0

        mu, s2 = sp_pred.predict_test(res.vec, train, ops, x_test)
        assert mu.shape == (40, M) and s2.shape == (40, M)
        rmse = float(jnp.sqrt(jnp.mean((mu - y_test) ** 2)))
        base = float(jnp.sqrt(jnp.mean(y_test**2)))
        assert rmse < 0.5 * base  # interpolation beats the zero predictor

        grid = jnp.linspace(float(train.x[0]), float(train.x[-1]), 50)
        gp = sp_pred.predict_map(res.vec, train, ops, grid)
        assert gp.mean.shape == (50, M)
        assert bool(jnp.all(jnp.isfinite(gp.percentiles)))
        # interpolation error well under the data scale
        mu_tr, _ = sp_pred.predict_test(res.vec, train, ops, train.x)
        rmse_tr = float(jnp.sqrt(jnp.mean((mu_tr - train.y) ** 2)))
        base_tr = float(jnp.sqrt(jnp.mean(train.y**2)))
        assert rmse_tr < 0.5 * base_tr

    def test_chain_sample_prediction_shapes(self):
        data = _data(n=32)
        nlp, ops = sp.make_objective(data, n_inducing=8)
        vecs = jnp.stack([_rand_vec(ops.z.shape[0], key=k) for k in (1, 2, 3)])
        grid = jnp.linspace(0.1, 0.9, 11)
        ys = sp_pred.predict_sample(jax.random.PRNGKey(0), vecs, data, ops, grid)
        assert ys.shape == (11, 3, M)
        assert bool(jnp.all(jnp.isfinite(ys)))


class TestWorkflow:
    @pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
    def test_run_subject_sparse_end_to_end(self, tmp_path):
        """model="gnmgp_sparse" through the full pipeline: empirical init,
        MAP, whitened HMC, grid/test prediction, IC + sparse PSIS-LOO."""
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.utils.artifacts import (
            ArtifactStore,
        )

        d = sim.sim_mnts(jax.random.PRNGKey(3), n=96, m=M)
        cfg = workflows.PipelineConfig(
            model="gnmgp_sparse", n_inducing=16, n_opt=150,
            map_method="lbfgs", do_hmc=True, n_hmc=12, whiten=True,
            do_loo=True, loo_draws=8, test_size=0.2, n_grid=31, seed=0,
        )
        store = ArtifactStore(tmp_path)
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y),
                                    cfg, store=store)
        assert res["n_inducing"] == 16
        p_len = sp.n_params(16, M)
        assert res["map_vec"].shape == (p_len,)
        assert res["hmc_samples"].shape[1] == p_len
        assert res["pred_grid"].mean.shape == (31, M)
        assert np.isfinite(res["test_rmse"]) and np.isfinite(res["test_lpd"])
        assert np.isfinite(res["aic"]) and np.isfinite(res["dic"])
        assert np.isfinite(res["loo"]["elpd_loo"])
        assert res["loo"]["pointwise"].shape == (res["n"] * M,)
        # latent analysis lives at the inducing inputs
        assert res["map_latents"]["tilde_l"].shape == (16,)
        # resumable: second run loads the stored MAP and reproduces scores
        res2 = workflows.run_subject(np.asarray(d.x), np.asarray(d.y),
                                     dataclasses_replace_nohmc(cfg), store=store)
        np.testing.assert_allclose(res2["test_rmse"], res["test_rmse"], rtol=1e-6)


def dataclasses_replace_nohmc(cfg):
    import dataclasses

    return dataclasses.replace(cfg, do_hmc=False, do_loo=False)


class TestHadamard:
    def _hdata(self, n=30, key=0):
        from nonstationary_multivariate_gaussian_process_tpu.models.base import (
            HadamardData,
        )

        d = sim.sim_mnts(jax.random.PRNGKey(key), n=n, m=M)
        indx = jnp.asarray(np.arange(n) % M, jnp.int32)
        y = d.y[jnp.arange(n), indx]
        return HadamardData(d.x, indx, y)

    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_woodbury_matches_dense(self, approx):
        data = self._hdata(n=30)
        z = sp.choose_inducing(data.x, 9)
        ops = sp.make_ops_hadamard(data.x, z)
        m_z = z.shape[0]
        vec = _rand_vec(m_z, key=6)
        p = sp.unpack(vec, m_z, M)
        w = sp._woodbury_hadamard(p, data, ops, M, approx)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(data.y, 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr) / jnp.exp(p.tilde_sigma2_err)
        got = sp.log_lik_hadamard(p, data, ops, M, approx=approx)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-8)

    def test_exact_limit_z_equals_x(self):
        data = self._hdata(n=24)
        ops = sp.make_ops_hadamard(data.x, data.x)
        vec = _rand_vec(24, key=7)
        p = sp.unpack(vec, 24, M)
        # dense Hadamard loglik at the same kriged latent fields (raw L_vecs)
        hp = dict(sp.HADAMARD_DEFAULT_HYPERS)
        tl_x, l_x = sp.latents_at_data(p, ops, M, hp)
        dense_p = gnmgp.Params(tilde_l=tl_x, ul_vecs=l_x.reshape(-1),
                               tilde_sigma2_err=p.tilde_sigma2_err)
        _, comps = gnmgp.log_posterior_hadamard(dense_p, data, M, prior=False)
        got = sp.log_lik_hadamard(p, data, ops, M, approx="fitc")
        np.testing.assert_allclose(float(got), float(comps["loglik"]),
                                   rtol=1e-3, atol=0.05)

    def test_mask_pad_exact(self):
        from nonstationary_multivariate_gaussian_process_tpu.models.base import (
            HadamardData,
        )

        data = self._hdata(n=26)
        n_pad = 32
        x_pad = jnp.concatenate([data.x, jnp.full((n_pad - 26,), data.x[-1])])
        i_pad = jnp.concatenate([data.indx, jnp.zeros((n_pad - 26,), jnp.int32)])
        y_pad = jnp.concatenate([data.y, jnp.zeros((n_pad - 26,), data.y.dtype)])
        mask = jnp.arange(n_pad) < 26
        z = sp.choose_inducing(data.x, 8)
        nlp_real, _ = sp.make_objective_hadamard(data, M, z=z)
        nlp_pad, _ = sp.make_objective_hadamard(
            HadamardData(x_pad, i_pad, y_pad), M, z=z, mask=mask)
        vec = _rand_vec(z.shape[0], key=8)
        np.testing.assert_allclose(float(nlp_pad(vec)), float(nlp_real(vec)),
                                   rtol=1e-9)

    def test_map_and_prediction(self):
        from nonstationary_multivariate_gaussian_process_tpu.models.base import (
            HadamardData,
        )

        d = sim.sim_mnts(jax.random.PRNGKey(9), n=240, m=M)
        indx = np.arange(240) % M
        y = np.asarray(d.y)[np.arange(240), indx]
        test_idx = np.arange(1, 240, 6)
        train_idx = np.setdiff1d(np.arange(240), test_idx)
        data = HadamardData(d.x[train_idx], jnp.asarray(indx[train_idx]),
                            jnp.asarray(y[train_idx]))
        nlp, ops = sp.make_objective_hadamard(data, M, n_inducing=24)
        m_z = ops.z.shape[0]
        init = jnp.concatenate([
            jnp.full((m_z,), -1.0),
            jnp.tile(jnp.asarray([1.0, 0.0, 1.0]), m_z),  # raw L_vecs
            jnp.asarray([-3.0]),
        ])
        res = fit_map(nlp, init, n_iters=300, method="lbfgs")
        assert float(nlp(res.vec)) < float(nlp(init)) - 20.0

        mu, s2 = sp_pred.predict_test_hadamard(
            res.vec, data, ops, M, d.x[test_idx], jnp.asarray(indx[test_idx]))
        assert mu.shape == (len(test_idx),)
        rmse = float(jnp.sqrt(jnp.mean((mu - y[test_idx]) ** 2)))
        base = float(jnp.sqrt(jnp.mean(y[test_idx] ** 2)))
        # single-observation-per-input interleaved prediction is intrinsically
        # hard: the EXACT Hadamard GNMGP scores ratio 0.953 on this split
        # (measured); the sparse tier's 0.893 beats it — pin "beats the zero
        # predictor and the exact tier's measured score"
        assert rmse < 0.95 * base

        gp = sp_pred.predict_map_hadamard(
            res.vec, data, ops, M, jnp.linspace(0.05, 0.95, 21))
        assert gp.mean.shape == (21, M)
        assert bool(jnp.all(jnp.isfinite(gp.percentiles)))

        # chain-sample indexed prediction (the KAISER scoring path): the
        # MC draw means track the analytic indexed means, the draw spread
        # is at least the analytic one (sampled latents only add variance),
        # and the draws are key-deterministic
        xt = jnp.asarray(d.x[test_idx])
        it = jnp.asarray(indx[test_idx])
        hist = jnp.tile(res.vec[None], (300, 1))
        k = jax.random.PRNGKey(3)
        draws = sp_pred.predict_test_hadamard_sample(
            k, hist, data, ops, M, xt, it)
        assert draws.shape == (len(test_idx), 300)
        assert bool(jnp.all(jnp.isfinite(draws)))
        mu_t, s2_t = sp_pred.predict_test_hadamard(
            res.vec, data, ops, M, xt, it)
        dm = np.asarray(draws).mean(axis=1)
        corr = np.corrcoef(dm, np.asarray(mu_t))[0, 1]
        assert corr > 0.9, corr
        ds = np.asarray(draws).std(axis=1)
        assert np.all(ds > 0.7 * np.sqrt(np.asarray(s2_t))), (
            ds / np.sqrt(np.asarray(s2_t))
        )
        draws2 = sp_pred.predict_test_hadamard_sample(
            k, hist, data, ops, M, xt, it)
        np.testing.assert_array_equal(np.asarray(draws), np.asarray(draws2))


class TestWorkflowHadamard:
    @pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
    def test_run_subject_hadamard_sparse(self):
        from nonstationary_multivariate_gaussian_process_tpu import workflows

        d = sim.sim_mnts(jax.random.PRNGKey(5), n=120, m=M)
        indx = np.arange(120) % M
        y = np.asarray(d.y)[np.arange(120), indx]
        cfg = workflows.PipelineConfig(
            model="gnmgp_sparse", n_inducing=16, n_opt=120,
            map_method="lbfgs", do_hmc=True, n_hmc=10, whiten=True,
            do_loo=True, loo_draws=6, test_size=0.2, n_grid=21,
        )
        res = workflows.run_subject_hadamard(np.asarray(d.x), indx, y, M, cfg)
        p_len = sp.n_params(16, M)
        assert res["map_vec"].shape == (p_len,)
        assert res["hmc_samples"].shape[1] == p_len
        assert res["pred_grid"].mean.shape == (21, M)
        assert np.isfinite(res["test_rmse"]) and np.isfinite(res["test_lpd"])
        # sample-based indexed scoring now covers the sparse tier too
        assert np.isfinite(res["test_sample_rmse"])
        assert np.isfinite(res["test_sample_lpd"])
        assert np.isfinite(res["loo"]["elpd_loo"])


class TestHetero:
    def _rand_hvec(self, m_z, key=1, scale=0.3):
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
        tl = -1.0 + scale * jax.random.normal(k1, (m_z,))
        ul = scale * jax.random.normal(k2, (m_z * T,))
        s2 = -3.0 + scale * jax.random.normal(k3, (m_z * M,))
        return jnp.concatenate([tl, ul, s2])

    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_woodbury_matches_dense(self, approx):
        data = _data(n=24)
        z = sp.choose_inducing(data.x, 8)
        ops_h = sp.make_ops_hetero(data.x, z)
        m_z = z.shape[0]
        vec = self._rand_hvec(m_z, key=2)
        p = sp.unpack_hetero(vec, m_z, M)
        noise = jnp.exp(sp.noise_at_data(p, ops_h, M))
        sp_p = sp.SparseParams(p.tilde_l, p.ul_vecs, jnp.zeros(()))
        w = sp._woodbury_noise(sp_p, data, ops_h.base, M, approx, noise)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(task_major(data.y), 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr / noise)
        got = sp.log_lik_hetero(p, data, ops_h, approx=approx)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-8)

    def test_exact_limit_z_equals_x(self):
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            gnmgp_hetero,
        )

        data = _data(n=24)
        ops_h = sp.make_ops_hetero(data.x, data.x)
        vec = self._rand_hvec(24, key=3)
        p = sp.unpack_hetero(vec, 24, M)
        sp_p = sp.SparseParams(p.tilde_l, p.ul_vecs, jnp.zeros(()))
        tl_x, ul_x = sp.latents_at_data(sp_p, ops_h.base, M,
                                        sp.HETERO_DEFAULT_HYPERS)
        noise_x = sp.noise_at_data(p, ops_h, M)
        dense_p = gnmgp_hetero.Params(tilde_l=tl_x, ul_vecs=ul_x.reshape(-1),
                                      tilde_sigma2_err=noise_x)
        want = gnmgp_hetero.log_lik(dense_p, data)
        got = sp.log_lik_hetero(p, data, ops_h, approx="fitc")
        np.testing.assert_allclose(float(got), float(want), rtol=1e-3, atol=0.05)

    def test_mask_pad_exact(self):
        data = _data(n=20)
        n_pad = 26
        x_pad = jnp.concatenate([data.x, jnp.full((n_pad - 20,), data.x[-1])])
        y_pad = jnp.concatenate([data.y, jnp.zeros((n_pad - 20, M), data.y.dtype)])
        mask = jnp.arange(n_pad) < 20
        z = sp.choose_inducing(data.x, 7)
        nlp_real, _ = sp.make_objective_hetero(data, z=z)
        from nonstationary_multivariate_gaussian_process_tpu.models.base import (
            FullData as FD,
        )
        nlp_pad, _ = sp.make_objective_hetero(FD(x_pad, y_pad), z=z, mask=mask)
        vec = self._rand_hvec(z.shape[0], key=4)
        np.testing.assert_allclose(float(nlp_pad(vec)), float(nlp_real(vec)),
                                   rtol=1e-9)

    def test_map_recovers_noise_trend(self):
        """Simulated hetero subject: the MAP's kriged noise field tracks the
        truth's rising noise scale, and prediction stays calibrated."""
        d = sim.sim_mnts_hetero(jax.random.PRNGKey(2), n=160, m=M)
        data = FullData(d.x, d.y)
        nlp, ops_h = sp.make_objective_hetero(data, n_inducing=20)
        m_z = ops_h.base.z.shape[0]
        init = jnp.concatenate([
            jnp.full((m_z,), -1.0),
            jnp.tile(jnp.asarray([0.3, 0.0, 0.3]), m_z),
            jnp.full((m_z * M,), -3.0),
        ])
        res = fit_map(nlp, init, n_iters=300, method="lbfgs")
        assert float(nlp(res.vec)) < float(nlp(init)) - 20.0
        p = sp.unpack_hetero(res.vec, m_z, M)
        noise_x = np.asarray(sp.noise_at_data(p, ops_h, M))  # (N*M,) log
        truth = np.asarray(d.tilde_sigma2_err)  # (N*M,) true log noise
        # recovered log-noise correlates with the true log-noise profile
        corr = np.corrcoef(truth, noise_x)[0, 1]
        assert corr > 0.3
        mu, s2 = sp_pred.predict_test_hetero(res.vec, data, ops_h, data.x)
        assert mu.shape == (160, M) and bool(jnp.all(s2 > 0))


class TestWorkflowHeteroSparse:
    @pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
    def test_run_subject_hetero_sparse(self):
        from nonstationary_multivariate_gaussian_process_tpu import workflows

        d = sim.sim_mnts_hetero(jax.random.PRNGKey(4), n=96, m=M)
        cfg = workflows.PipelineConfig(
            model="gnmgp_hetero_sparse", n_inducing=12, n_opt=120,
            map_method="lbfgs", do_hmc=True, n_hmc=8, whiten=True,
            do_loo=True, loo_draws=4, test_size=0.2, n_grid=17,
        )
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg)
        p_len = sp.n_params_hetero(12, M)
        assert res["map_vec"].shape == (p_len,)
        assert res["hmc_samples"].shape[1] == p_len
        assert res["pred_grid"].mean.shape == (17, M)
        assert np.isfinite(res["test_rmse"]) and np.isfinite(res["test_lpd"])
        assert np.isfinite(res["aic"]) and np.isfinite(res["loo"]["elpd_loo"])


class TestServingSparse:
    @pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
    def test_engine_serves_sparse_subject(self, tmp_path):
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.serving.engine import (
            PredictEngine,
        )
        from nonstationary_multivariate_gaussian_process_tpu.utils.artifacts import (
            ArtifactStore,
        )

        d = sim.sim_mnts(jax.random.PRNGKey(8), n=80, m=M)
        cfg = workflows.PipelineConfig(
            model="gnmgp_sparse", n_inducing=12, n_opt=100,
            map_method="lbfgs", do_hmc=True, n_hmc=6,
            do_pred_grid=False, do_pred_test=False, do_evaluation=False,
        )
        store = ArtifactStore(tmp_path)
        workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg,
                              store=store, dataset="sim", subject=0)
        eng = PredictEngine(tmp_path, model="gnmgp_sparse", dataset="sim")
        assert eng.subject_ids() == ["0"]
        out = eng.predict("0", np.linspace(0.1, 0.9, 7))
        assert out["mean"].shape == (7, M)
        assert np.all(np.isfinite(out["mean"])) and np.all(out["std"] > 0)
        outs = eng.predict("0", np.linspace(0.1, 0.9, 7), mode="sample",
                           n_sample=4)
        assert outs["mean"].shape == (7, M)
        info = eng.info("0")
        assert info["n"] == 80 and info["has_chain"]
