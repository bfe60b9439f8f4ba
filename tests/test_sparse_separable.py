"""Sparse (inducing-point) tiers for the separable models: SNMGP + LMC.

Mirrors tests/test_sparse.py's contract for the GNMGP tier:

* Woodbury identity: the O(N M (m_z M)^2) likelihood equals a dense MVN over
  the explicitly assembled Q + diag(Lambda) covariance.
* Exact limit: with Z = X, FITC reproduces the exact (Kronecker-solver)
  likelihood at the same latent fields.
* Titsias bound: the VFE likelihood lower-bounds the exact one.
* Mask exactness: a padded subject scores identically to the unpadded one.
* End-to-end: MAP recovers structure and predicts held-out data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonstationary_multivariate_gaussian_process_tpu import dists
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.inference.map import fit_map
from nonstationary_multivariate_gaussian_process_tpu.models import lmc, snmgp
from nonstationary_multivariate_gaussian_process_tpu.models import lmc_sparse as lsp
from nonstationary_multivariate_gaussian_process_tpu.models import snmgp_sparse as ssp
from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData, task_major
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms
from nonstationary_multivariate_gaussian_process_tpu.predict import lmc_sparse as lsp_pred
from nonstationary_multivariate_gaussian_process_tpu.predict import snmgp_sparse as ssp_pred


M = 2
T = transforms.tri_size(M)


def _data(n=24, key=0):
    d = sim.sim_mnts(jax.random.PRNGKey(key), n=n, m=M)
    return FullData(d.x, d.y)


def _snmgp_vec(m_z, key=1, scale=0.3):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(key), 4)
    tl = -1.0 + scale * jax.random.normal(k1, (m_z,))
    ts = scale * jax.random.normal(k2, (m_z,))
    ul = scale * jax.random.normal(k3, (T,))
    s2 = jnp.asarray([-3.0]) + scale * jax.random.normal(k4, (1,))
    return jnp.concatenate([tl, ts, ul, s2])


def _lmc_vec(key=1, scale=0.3):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    head = scale * jax.random.normal(k1, (2,))
    ul = scale * jax.random.normal(k2, (T,))
    s2 = jnp.asarray([-3.0]) + scale * jax.random.normal(k3, (1,))
    return jnp.concatenate([head, ul, s2])


def _dense_cov_from_woodbury(w):
    """Reassemble Q + diag(Lambda) from the factor set."""
    b = w.a * jnp.sqrt(w.lam)[None, :]  # C^{-1} K_mn
    return b.T @ b + jnp.diag(w.lam)


class TestSnmgpSparse:
    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_matches_dense_mvn(self, approx):
        data = _data(n=24)
        z = ssp.choose_inducing(data.x, 8)
        ops = ssp.make_ops(data.x, z)
        m_z = z.shape[0]
        vec = _snmgp_vec(m_z)
        p = ssp.unpack(vec, m_z, M)
        w = ssp._woodbury(p, data, ops, M, approx)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(task_major(data.y), 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr) / jnp.exp(p.tilde_sigma2_err)
        got = ssp.log_lik(p, data, ops, approx=approx)
        # rtol 5e-7: the structured hot path factors chol(B)⊗chol(K) with
        # per-factor ridges; the dense comparator regularizes the assembled
        # product — measured differences reach ~3.5e-7 relative (the ridge
        # difference amplified by cond(K_mm)), still below the 1e-6 parity
        # bar (TestStructuredSeparable pins the two paths directly)
        np.testing.assert_allclose(float(got), float(want), rtol=5e-7)

    def test_fitc_exact_limit_z_equals_x(self):
        data = _data(n=24)
        ops = ssp.make_ops(data.x, data.x)
        n = data.x.shape[0]
        vec = _snmgp_vec(n, key=2)
        p = ssp.unpack(vec, n, M)
        tl_x, ts_x = ssp.latents_at_data(p, ops)
        dense_p = snmgp.Params(tilde_l=tl_x, tilde_sigma=ts_x,
                               ul_vec=p.ul_vec,
                               tilde_sigma2_err=p.tilde_sigma2_err)
        want = snmgp.log_lik(dense_p, data)
        got = ssp.log_lik(p, data, ops, approx="fitc")
        # only the prior nugget separates Q from K here
        np.testing.assert_allclose(float(got), float(want), rtol=1e-3, atol=0.05)

    def test_vfe_lower_bounds_exact(self):
        data = _data(n=24)
        z = ssp.choose_inducing(data.x, 8)
        ops = ssp.make_ops(data.x, z)
        vec = _snmgp_vec(z.shape[0], key=3)
        p = ssp.unpack(vec, z.shape[0], M)
        tl_x, ts_x = ssp.latents_at_data(p, ops)
        dense_p = snmgp.Params(tilde_l=tl_x, tilde_sigma=ts_x,
                               ul_vec=p.ul_vec,
                               tilde_sigma2_err=p.tilde_sigma2_err)
        exact = float(snmgp.log_lik(dense_p, data))
        vfe = float(ssp.log_lik(p, data, ops, approx="vfe"))
        assert vfe <= exact + 1e-6

    def test_mask_pad_exact(self):
        data = _data(n=20)
        n_pad = 26
        x_pad = jnp.concatenate([data.x, jnp.full((n_pad - 20,), data.x[-1])])
        y_pad = jnp.concatenate([data.y, jnp.zeros((n_pad - 20, M), data.y.dtype)])
        mask = jnp.arange(n_pad) < 20
        z = ssp.choose_inducing(data.x, 7)
        nlp_real, _ = ssp.make_objective(data, z=z)
        nlp_pad, _ = ssp.make_objective(FullData(x_pad, y_pad), z=z, mask=mask)
        vec = _snmgp_vec(z.shape[0], key=4)
        np.testing.assert_allclose(float(nlp_pad(vec)), float(nlp_real(vec)),
                                   rtol=1e-9)

    def test_grad_finite_and_jittable(self):
        data = _data(n=32)
        nlp, ops = ssp.make_objective(data, n_inducing=10)
        vec = _snmgp_vec(ops.z.shape[0], key=5)
        val, g = jax.jit(jax.value_and_grad(nlp))(vec)
        assert jnp.isfinite(val)
        assert jnp.all(jnp.isfinite(g))

    def test_unpack_named_error(self):
        with pytest.raises(ValueError, match="snmgp_sparse"):
            ssp.unpack(jnp.zeros(11), 8, M)

    def test_init_from_empirical_layout(self):
        data = _data(n=32)
        z = ssp.choose_inducing(data.x, 8)
        dense_vec = jnp.arange(snmgp.n_params(32, M), dtype=jnp.float64)
        v = ssp.init_from_empirical(dense_vec, 32, z.shape[0], M, data.x, z)
        assert v.shape == (ssp.n_params(z.shape[0], M),)
        # slot 0 of tilde_l_z = tilde_l at the nearest input (x[0]); the
        # global tail (uL_vec + noise) passes through unchanged
        np.testing.assert_allclose(float(v[0]), 0.0)
        np.testing.assert_allclose(
            np.asarray(v[-(T + 1):]), np.asarray(dense_vec[-(T + 1):]))

    def test_map_and_prediction(self):
        # separable truth (stationary correlation) — measured: m_z=16 reaches
        # rmse ratio ~0.56 here (the nonseparable sim_mnts truth is
        # model-mismatched for SNMGP and plateaus near the data scale)
        d = sim.sim_mnts_s(jax.random.PRNGKey(7), n=96, m=M)
        test_idx = np.arange(2, 96, 5)
        train_idx = np.setdiff1d(np.arange(96), test_idx)
        train = FullData(d.x[train_idx], d.y[train_idx])
        x_test, y_test = d.x[test_idx], d.y[test_idx]

        nlp, ops = ssp.make_objective(train, n_inducing=16, approx="fitc")
        m_z = ops.z.shape[0]
        init = jnp.concatenate([
            jnp.full((m_z,), -1.0), jnp.zeros((m_z,)),
            jnp.asarray([0.3, 0.0, 0.3]), jnp.asarray([-3.0]),
        ])
        res = fit_map(nlp, init, n_iters=300, method="lbfgs")
        assert float(nlp(res.vec)) < float(nlp(init)) - 20.0

        mu, s2 = ssp_pred.predict_test(res.vec, train, ops, x_test)
        assert mu.shape == (len(test_idx), M) and s2.shape == mu.shape
        rmse = float(jnp.sqrt(jnp.mean((mu - y_test) ** 2)))
        base = float(jnp.sqrt(jnp.mean(y_test ** 2)))
        assert rmse < 0.7 * base

        grid = jnp.linspace(float(train.x[0]), float(train.x[-1]), 40)
        gp = ssp_pred.predict_map(res.vec, train, ops, grid)
        assert gp.mean.shape == (40, M)
        assert bool(jnp.all(jnp.isfinite(gp.percentiles)))

    def test_chain_sample_prediction_shapes(self):
        data = _data(n=32)
        nlp, ops = ssp.make_objective(data, n_inducing=8)
        vecs = jnp.stack([_snmgp_vec(ops.z.shape[0], key=k) for k in (1, 2, 3)])
        grid = jnp.linspace(0.1, 0.9, 11)
        ys = ssp_pred.predict_sample(jax.random.PRNGKey(0), vecs, data, ops, grid)
        assert ys.shape == (11, 3, M)
        assert bool(jnp.all(jnp.isfinite(ys)))


class TestLmcSparse:
    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_matches_dense_mvn(self, approx):
        data = _data(n=24)
        z = lsp.choose_inducing(data.x, 8)
        ops = lsp.make_ops(data.x, z)
        vec = _lmc_vec()
        p = lsp.unpack(vec, M)
        w = lsp._woodbury(p, data, ops, M, approx)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(task_major(data.y), 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr) / jnp.exp(p.tilde_sigma2_err)
        got = lsp.log_lik(p, data, ops, approx=approx)
        # rtol 5e-7: the structured hot path factors chol(B)⊗chol(K) with
        # per-factor ridges; the dense comparator regularizes the assembled
        # product — measured differences reach ~3.5e-7 relative (the ridge
        # difference amplified by cond(K_mm)), still below the 1e-6 parity
        # bar (TestStructuredSeparable pins the two paths directly)
        np.testing.assert_allclose(float(got), float(want), rtol=5e-7)

    def test_fitc_exact_limit_z_equals_x(self):
        data = _data(n=24)
        ops = lsp.make_ops(data.x, data.x)
        vec = _lmc_vec(key=2)
        p = lsp.unpack(vec, M)
        want = lmc.log_lik(p, data)
        got = lsp.log_lik(p, data, ops, approx="fitc")
        np.testing.assert_allclose(float(got), float(want), rtol=1e-3, atol=0.05)

    def test_vfe_lower_bounds_exact(self):
        data = _data(n=24)
        z = lsp.choose_inducing(data.x, 8)
        ops = lsp.make_ops(data.x, z)
        vec = _lmc_vec(key=3)
        p = lsp.unpack(vec, M)
        exact = float(lmc.log_lik(p, data))
        vfe = float(lsp.log_lik(p, data, ops, approx="vfe"))
        assert vfe <= exact + 1e-6

    def test_mask_pad_exact(self):
        data = _data(n=20)
        n_pad = 26
        x_pad = jnp.concatenate([data.x, jnp.full((n_pad - 20,), data.x[-1])])
        y_pad = jnp.concatenate([data.y, jnp.zeros((n_pad - 20, M), data.y.dtype)])
        mask = jnp.arange(n_pad) < 20
        z = lsp.choose_inducing(data.x, 7)
        nlp_real, _ = lsp.make_objective(data, z=z)
        nlp_pad, _ = lsp.make_objective(FullData(x_pad, y_pad), z=z, mask=mask)
        vec = _lmc_vec(key=4)
        np.testing.assert_allclose(float(nlp_pad(vec)), float(nlp_real(vec)),
                                   rtol=1e-9)

    def test_map_and_prediction(self):
        d = sim.sim_mnts_s(jax.random.PRNGKey(9), n=100, m=M)
        test_idx = np.arange(2, 100, 5)
        train_idx = np.setdiff1d(np.arange(100), test_idx)
        train = FullData(d.x[train_idx], d.y[train_idx])
        x_test, y_test = d.x[test_idx], d.y[test_idx]

        nlp, ops = lsp.make_objective(train, n_inducing=24)
        init = jnp.concatenate([
            jnp.asarray([-1.0, 0.0]), jnp.asarray([0.3, 0.0, 0.3]),
            jnp.asarray([-3.0]),
        ])
        res = fit_map(nlp, init, n_iters=300, method="lbfgs")
        assert float(nlp(res.vec)) < float(nlp(init)) - 5.0

        mu, s2 = lsp_pred.predict_test(res.vec, train, ops, x_test)
        assert mu.shape == (len(test_idx), M)
        rmse = float(jnp.sqrt(jnp.mean((mu - y_test) ** 2)))
        base = float(jnp.sqrt(jnp.mean(y_test ** 2)))
        assert rmse < 0.8 * base

        grid = jnp.linspace(float(train.x[0]), float(train.x[-1]), 30)
        gp = lsp_pred.predict_map(res.vec, train, ops, grid)
        assert gp.mean.shape == (30, M)
        ys = lsp_pred.predict_sample(
            jax.random.PRNGKey(0), jnp.stack([res.vec] * 3), train, ops, grid)
        assert ys.shape == (30, 3, M)
        assert bool(jnp.all(jnp.isfinite(ys)))


def _hadamard_data(n=28, key=0):
    d = sim.sim_mnts_s(jax.random.PRNGKey(key), n=n, m=M)
    indx = jax.random.randint(jax.random.PRNGKey(key + 100), (n,), 0, M)
    y = d.y[jnp.arange(n), indx]
    from nonstationary_multivariate_gaussian_process_tpu.models.base import (
        HadamardData,
    )

    return HadamardData(d.x, indx.astype(jnp.int32), y)


class TestHadamardSparseSeparable:
    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_snmgp_matches_dense_mvn(self, approx):
        data = _hadamard_data(n=28)
        z = ssp.choose_inducing(data.x, 8)
        ops = ssp.make_ops(data.x, z)
        m_z = z.shape[0]
        vec = _snmgp_vec(m_z, key=11)
        p = ssp.unpack(vec, m_z, M)
        w = ssp._woodbury_hadamard(p, data, ops, M, approx)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(data.y, 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr) / jnp.exp(p.tilde_sigma2_err)
        got = ssp.log_lik_hadamard(p, data, ops, M, approx=approx)
        # rtol 5e-7: the structured hot path factors chol(B)⊗chol(K) with
        # per-factor ridges; the dense comparator regularizes the assembled
        # product — measured differences reach ~3.5e-7 relative (the ridge
        # difference amplified by cond(K_mm)), still below the 1e-6 parity
        # bar (TestStructuredSeparable pins the two paths directly)
        np.testing.assert_allclose(float(got), float(want), rtol=5e-7)

    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_lmc_matches_dense_mvn(self, approx):
        data = _hadamard_data(n=28, key=1)
        z = lsp.choose_inducing(data.x, 8)
        ops = lsp.make_ops(data.x, z)
        vec = _lmc_vec(key=12)
        p = lsp.unpack(vec, M)
        w = lsp._woodbury_hadamard(p, data, ops, M, approx)
        cov = _dense_cov_from_woodbury(w)
        want = dists.mvn_logpdf_dense_unnorm(data.y, 0.0, cov)
        if approx == "vfe":
            want = want - 0.5 * jnp.sum(w.corr) / jnp.exp(p.tilde_sigma2_err)
        got = lsp.log_lik_hadamard(p, data, ops, M, approx=approx)
        # rtol 5e-7: the structured hot path factors chol(B)⊗chol(K) with
        # per-factor ridges; the dense comparator regularizes the assembled
        # product — measured differences reach ~3.5e-7 relative (the ridge
        # difference amplified by cond(K_mm)), still below the 1e-6 parity
        # bar (TestStructuredSeparable pins the two paths directly)
        np.testing.assert_allclose(float(got), float(want), rtol=5e-7)

    def test_mask_pad_exact(self):
        from nonstationary_multivariate_gaussian_process_tpu.models.base import (
            HadamardData,
        )

        data = _hadamard_data(n=24, key=2)
        n_pad = 30
        x_p = jnp.concatenate([data.x, jnp.full((n_pad - 24,), data.x[-1])])
        i_p = jnp.concatenate([data.indx, jnp.zeros((n_pad - 24,), jnp.int32)])
        y_p = jnp.concatenate([data.y, jnp.zeros((n_pad - 24,), data.y.dtype)])
        mask = jnp.arange(n_pad) < 24
        z = ssp.choose_inducing(data.x, 7)
        for mod, vec in ((ssp, _snmgp_vec(z.shape[0], key=13)),
                         (lsp, _lmc_vec(key=13))):
            nlp_r, _ = mod.make_objective_hadamard(data, M, z=z)
            nlp_p, _ = mod.make_objective_hadamard(
                HadamardData(x_p, i_p, y_p), M, z=z, mask=mask)
            np.testing.assert_allclose(float(nlp_p(vec)), float(nlp_r(vec)),
                                       rtol=1e-9)

    @pytest.mark.slow  # demoted r5: heavy routing/e2e duplicative of a
    #   faster default-tier witness (VERDICT r4 #7 suite-wall budget)
    @pytest.mark.parametrize("model", ["snmgp_sparse", "lmc_sparse"])
    def test_run_subject_hadamard_sparse(self, model):
        """Hadamard pipeline end-to-end: MAP, whitened chain, LOO, indexed
        test scoring incl. the chain-sample path."""
        from nonstationary_multivariate_gaussian_process_tpu import workflows

        rng = np.random.default_rng(5)
        d = sim.sim_mnts_s(jax.random.PRNGKey(5), n=72, m=M)
        indx = rng.integers(0, M, 72)
        y = np.asarray(d.y)[np.arange(72), indx]
        cfg = workflows.PipelineConfig(
            model=model, n_inducing=12, n_opt=100, map_method="lbfgs",
            do_hmc=True, n_hmc=6, hmc_warmup=6, whiten=True, test_size=0.25,
            do_loo=True, loo_draws=4, n_grid=12,
        )
        out = workflows.run_subject_hadamard(
            np.asarray(d.x), indx, y, M, cfg=cfg)
        assert np.isfinite(out["test_rmse"])
        assert np.isfinite(out["loo"]["elpd_loo"])
        assert out["pred_grid"].mean.shape == (12, M)
        assert np.isfinite(out["test_sample_rmse"])
        assert np.isfinite(out["test_sample_lpd"])


class TestWorkflow:
    @pytest.mark.parametrize("model", ["snmgp_sparse", "lmc_sparse"])
    def test_run_subject_sparse_separable(self, model):
        """model="snmgp_sparse"/"lmc_sparse" through the full pipeline:
        empirical init, MAP, whitened HMC, grid/test prediction, IC +
        Woodbury PSIS-LOO (measured: rmse ~0.35/0.37 at this posture)."""
        from nonstationary_multivariate_gaussian_process_tpu import workflows

        d = sim.sim_mnts_s(jax.random.PRNGKey(3), n=80, m=M)
        cfg = workflows.PipelineConfig(
            model=model, n_inducing=16, n_opt=120, map_method="lbfgs",
            do_hmc=True, n_hmc=8, hmc_warmup=8, whiten=True, test_size=0.2,
            do_loo=True, loo_draws=4, n_grid=15,
        )
        r = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg=cfg)
        assert r["n_inducing"] == 16
        assert r["sparse_approx"] == "fitc"
        assert np.isfinite(r["test_rmse"]) and r["test_rmse"] < 1.0
        assert np.isfinite(r["aic"]) and np.isfinite(r["dic"])
        assert np.isfinite(r["loo"]["elpd_loo"])
        assert r["hmc_samples"].shape[0] == 8
        assert r["pred_grid"].mean.shape == (15, M)

    @pytest.mark.parametrize("model", ["snmgp_sparse", "lmc_sparse"])
    def test_engine_serves_sparse_separable(self, model, tmp_path):
        """The serving engine stands the separable sparse tiers up from
        artifacts (inducing Z stored with the MAP, ops rebuilt on load)."""
        from nonstationary_multivariate_gaussian_process_tpu import workflows
        from nonstationary_multivariate_gaussian_process_tpu.serving.engine import (
            PredictEngine,
        )
        from nonstationary_multivariate_gaussian_process_tpu.utils.artifacts import (
            ArtifactStore,
        )

        d = sim.sim_mnts_s(jax.random.PRNGKey(8), n=64, m=M)
        cfg = workflows.PipelineConfig(
            model=model, n_inducing=10, n_opt=80, map_method="lbfgs",
            do_hmc=True, n_hmc=5, hmc_warmup=5,
            do_pred_grid=False, do_pred_test=False, do_evaluation=False,
        )
        store = ArtifactStore(tmp_path)
        workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg,
                              store=store, dataset="sim", subject=0)
        eng = PredictEngine(tmp_path, model=model, dataset="sim")
        assert eng.subject_ids() == ["0"]
        out = eng.predict("0", np.linspace(0.1, 0.9, 7))
        assert out["mean"].shape == (7, M)
        assert np.all(np.isfinite(out["mean"])) and np.all(out["std"] > 0)
        outs = eng.predict("0", np.linspace(0.1, 0.9, 7), mode="sample",
                           n_sample=3)
        assert outs["mean"].shape == (7, M)


class TestStructuredSeparable:
    """The Kronecker-factored hot path (gnmgp_sparse._loglik_separable /
    _loglik_separable_hadamard — chol(B⊗K) = chol(B)⊗chol(K), the identity
    the reference exploits in distributions.py:26-52) must agree with the
    materialized assembly dispatched through _loglik_pieces.  Differences
    are at the per-factor-vs-product ridge scale (measured ~1e-7
    relative), below the 1e-6 parity bar."""

    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    @pytest.mark.parametrize("masked", [False, True])
    def test_snmgp_full(self, approx, masked):
        from nonstationary_multivariate_gaussian_process_tpu.models.gnmgp_sparse import (
            _loglik_pieces,
        )

        data = _data(n=24, key=5)
        mask = None
        if masked:
            mask = np.ones(24, bool)
            mask[20:] = False
        nlp, ops = ssp.make_objective(data, n_inducing=8, approx=approx,
                                      mask=mask)
        vec = _snmgp_vec(8, key=7)
        p = ssp.unpack(vec, 8, M)
        structured = ssp.log_lik(p, data, ops, approx=approx, mask=mask)
        pieces = ssp._assemble(p, data, ops, M, None, mask)
        dense = _loglik_pieces(pieces, jnp.exp(p.tilde_sigma2_err), approx)
        np.testing.assert_allclose(float(structured), float(dense),
                                   rtol=1e-6)

    @pytest.mark.parametrize("approx", ["fitc", "vfe"])
    def test_lmc_full(self, approx):
        from nonstationary_multivariate_gaussian_process_tpu.models.gnmgp_sparse import (
            _loglik_pieces,
        )

        data = _data(n=20, key=6)
        nlp, ops = lsp.make_objective(data, n_inducing=6, approx=approx)
        vec = _lmc_vec(key=3)
        p = lsp.unpack(vec, M)
        structured = lsp.log_lik(p, data, ops, approx=approx)
        pieces = lsp._assemble(p, data, ops, M, None)
        dense = _loglik_pieces(pieces, jnp.exp(p.tilde_sigma2_err), approx)
        np.testing.assert_allclose(float(structured), float(dense),
                                   rtol=1e-6)

    @pytest.mark.parametrize("mod,vec_fn", [("snmgp", None), ("lmc", None)])
    def test_hadamard(self, mod, vec_fn):
        from nonstationary_multivariate_gaussian_process_tpu.models.gnmgp_sparse import (
            _loglik_pieces,
        )
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            HadamardData,
        )

        rng = np.random.default_rng(11)
        n = 30
        x = jnp.asarray(np.sort(rng.uniform(size=n)))
        indx = jnp.asarray(rng.integers(0, M, size=n), jnp.int32)
        y = jnp.asarray(rng.normal(size=n))
        data = HadamardData(x, indx, y)
        mask = np.ones(n, bool)
        mask[26:] = False
        if mod == "snmgp":
            nlp, ops = ssp.make_objective_hadamard(data, M, n_inducing=7,
                                                   mask=mask)
            vec = _snmgp_vec(7, key=9)
            p = ssp.unpack(vec, 7, M)
            structured = ssp.log_lik_hadamard(p, (x, indx, y), ops, M,
                                              mask=mask)
            pieces = ssp._assemble_hadamard(p, (x, indx, y), ops, M, None,
                                            mask)
        else:
            nlp, ops = lsp.make_objective_hadamard(data, M, n_inducing=7,
                                                   mask=mask)
            vec = _lmc_vec(key=9)
            p = lsp.unpack(vec, M)
            structured = lsp.log_lik_hadamard(p, (x, indx, y), ops, M,
                                              mask=mask)
            pieces = lsp._assemble_hadamard(p, (x, indx, y), ops, M, mask)
        dense = _loglik_pieces(pieces, jnp.exp(p.tilde_sigma2_err), "fitc")
        np.testing.assert_allclose(float(structured), float(dense),
                                   rtol=1e-6)

    def test_gradients_match(self):
        """jax.grad through the structured path equals grad through the
        materialized path (same algebra, different association order)."""
        from nonstationary_multivariate_gaussian_process_tpu.models.gnmgp_sparse import (
            _loglik_pieces,
        )

        data = _data(n=12, key=8)
        nlp, ops = ssp.make_objective(data, n_inducing=4)
        vec = _snmgp_vec(4, key=2)

        def f_structured(v):
            p = ssp.unpack(v, 4, M)
            return ssp.log_lik(p, data, ops)

        def f_dense(v):
            p = ssp.unpack(v, 4, M)
            pieces = ssp._assemble(p, data, ops, M, None, None)
            return _loglik_pieces(pieces, jnp.exp(p.tilde_sigma2_err),
                                  "fitc")

        g_s = jax.grad(f_structured)(vec)
        g_d = jax.grad(f_dense)(vec)
        np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                                   rtol=1e-4, atol=1e-5)
