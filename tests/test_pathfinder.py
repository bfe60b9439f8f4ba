"""Pathfinder variational tier (inference/pathfinder.py).

Pins (a) the low-rank inverse-Hessian Gaussian machinery on a correlated
Gaussian target — ELBO approaches the true log normalizer, draws recover
mean/scales, exact ``log q`` — (b) the PSIS smoother's GPD fit and
diagnostic, (c) multipath pooling + Gumbel-top-k resampling contracts,
(d) the workflow tier (``sampler="pathfinder"``), and (e) the SMC
reference seeding (``smc_ref="pathfinder"``): same evidence as the
prior-reference telescope, since the reference is a normalized Gaussian
either way.
"""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.inference import (
    pathfinder as pf,
)


def _corr_gauss(dim=10, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(dim, dim)) / np.sqrt(dim)
    cov = a @ a.T + 0.3 * np.eye(dim)
    prec = jnp.asarray(np.linalg.inv(cov))
    mu = jnp.asarray(np.linspace(-2.0, 2.0, dim))

    def pot(q):
        d = q - mu
        return 0.5 * d @ prec @ d

    logz = 0.5 * dim * math.log(2 * math.pi) + 0.5 * float(
        np.linalg.slogdet(cov)[1]
    )
    return pot, mu, cov, logz


def test_gaussian_elbo_and_moments():
    pot, mu, cov, logz = _corr_gauss()
    dim = mu.shape[0]
    r = pf.pathfinder(pot, jnp.zeros(dim) + 5.0, 0, max_iters=60,
                      n_draws=1500)
    # ELBO == logz exactly iff q == posterior; the rank-2m approximation
    # lands within a nat on a 10-dim correlated Gaussian
    assert abs(float(jnp.max(r.elbo)) - logz) < 1.0
    assert int(r.best_iter) >= 1
    d = np.asarray(r.draws)
    assert np.all(np.isfinite(d))
    assert float(np.max(np.abs(d.mean(0) - np.asarray(mu)))) < 0.25
    sd_ratio = d.std(0) / np.sqrt(np.diag(cov))
    assert np.all(sd_ratio > 0.6) and np.all(sd_ratio < 1.5)
    # exact log q: reconstruct the density of the returned draws via the
    # importance identity at the target: log_w = -U - log_q
    lw = np.asarray(r.log_w)
    pots = np.asarray(jax.vmap(pot)(r.draws))
    np.testing.assert_allclose(lw, -pots - np.asarray(r.log_q), rtol=1e-5,
                               atol=1e-5)
    # the trajectory must contain more than one distinct iterate
    assert float(jnp.max(jnp.abs(r.trajectory[-1] - r.trajectory[0]))) > 0.1


def test_sweep_chunk_equality():
    """Chunked ELBO/draw sweeps (lax.map blocks, the HBM-bounding path
    that survives N=200 on the chip) match the flat vmap bit-for-bit —
    chunking only re-batches dispatch, never the values."""
    pot, mu, cov, logz = _corr_gauss(dim=6, seed=5)
    kw = dict(max_iters=40, n_elbo=8, n_draws=64)
    r_flat = pf.pathfinder(pot, jnp.zeros(6) + 4.0, 7, sweep_chunk=0, **kw)
    r_chnk = pf.pathfinder(pot, jnp.zeros(6) + 4.0, 7, sweep_chunk=16, **kw)
    for field in ("draws", "log_w", "elbo", "mu"):
        a = np.asarray(getattr(r_flat, field))
        b = np.asarray(getattr(r_chnk, field))
        assert (np.isfinite(a) == np.isfinite(b)).all(), field
        fin = np.isfinite(a)
        np.testing.assert_allclose(a[fin], b[fin], rtol=1e-6, atol=1e-6)
    m_flat = pf.multipathfinder(pot, jnp.zeros(6) + 4.0, 3, n_paths=3,
                                max_iters=30, n_draws=50, n_out=40,
                                sweep_chunk=0)
    m_chnk = pf.multipathfinder(pot, jnp.zeros(6) + 4.0, 3, n_paths=3,
                                max_iters=30, n_draws=50, n_out=40,
                                sweep_chunk=16)
    np.testing.assert_allclose(np.asarray(m_flat.draws),
                               np.asarray(m_chnk.draws), rtol=1e-5,
                               atol=1e-6)


def test_psis_degenerate_tail_spread():
    """A weight tail spreading past exp range (one draw dominating by
    >e^700) is flagged k_hat=inf outright instead of overflowing the
    GPD fit."""
    rng = np.random.default_rng(3)
    lw = np.concatenate([rng.normal(size=395), [200.0, 400, 600, 800, 1000]])
    sm, k = pf.psis_smooth(lw)
    assert k == np.inf
    np.testing.assert_array_equal(sm, lw)


def test_psis_smoother():
    rng = np.random.default_rng(1)
    # well-behaved weights: smoothing is ~identity, k_hat small
    lw = rng.normal(size=400) * 0.3
    sm, k = pf.psis_smooth(lw)
    assert k < 0.7
    assert np.max(np.abs(sm - lw)) < 2.0
    # heavy-tailed weights: k_hat flags it and the max weight never grows
    lw_bad = np.concatenate([rng.normal(size=390), [20, 25, 30, 35, 40]])
    sm_b, k_b = pf.psis_smooth(lw_bad)
    assert k_b > 0.5
    assert np.max(sm_b) <= np.max(lw_bad) + 1e-9
    # non-finite entries survive without poisoning the fit
    lw_nan = lw.copy()
    lw_nan[:5] = -np.inf
    sm_n, k_n = pf.psis_smooth(lw_nan)
    assert np.isfinite(sm_n[5:]).all()


def test_multipathfinder_contract():
    pot, mu, cov, logz = _corr_gauss(dim=8, seed=2)
    r = pf.multipathfinder(pot, jnp.zeros(8) + 4.0, 3, n_paths=4,
                           max_iters=50, n_draws=300, n_out=200)
    assert r.draws.shape == (200, 8)
    assert np.all(np.isfinite(np.asarray(r.draws)))
    assert r.elbos.shape == (4,)
    # a Gaussian target is the easy case: proposal matches, k_hat low and
    # the IS evidence lands within a nat
    assert r.k_hat < 0.7
    assert abs(float(r.log_evidence) - logz) < 1.0
    assert float(np.max(np.abs(np.asarray(r.ref_mean) - np.asarray(mu)))) < 0.3
    ratio = np.asarray(r.ref_scale) / np.sqrt(np.diag(cov))
    assert np.all(ratio > 0.5) and np.all(ratio < 1.6)
    # explicit (n_paths, P) starts are accepted verbatim
    starts = jnp.stack([jnp.zeros(8) + 3.0, jnp.ones(8) * 5.0])
    r2 = pf.multipathfinder(pot, starts, 4, max_iters=40, n_draws=100,
                            n_out=50)
    assert r2.paths.draws.shape[0] == 2


def test_workflow_pathfinder_tier():
    """sampler="pathfinder": seconds-scale approximate posterior through
    run_subject, draws usable by chain-sample prediction, k_hat surfaced."""
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    d = sim.sim_mnts(jax.random.PRNGKey(0), n=20)
    res = workflows.run_subject(
        d.x, d.y,
        workflows.PipelineConfig(
            model="gnmgp", n_opt=60, do_hmc=True, n_hmc=24,
            sampler="pathfinder", pf_paths=3, pf_iters=40, pf_draws=100,
            whiten=True,
        ),
    )
    assert res["hmc_samples"].shape[0] == 24
    assert np.all(np.isfinite(res["hmc_samples"]))
    s = res["sampling"]
    assert s["sampler"] == "pathfinder"
    assert np.isfinite(s["k_hat"]) and np.isfinite(s["elbo_best"])
    assert "log_evidence_is" in s


@pytest.mark.slow  # demoted r5: heavy routing/e2e duplicative of a
#   faster default-tier witness (VERDICT r4 #7 suite-wall budget)
def test_pathfinder_fleet_cohort():
    """Fleet tier: per-subject vmapped multipath pathfinder sharded over
    the mesh (parallel/fleet.pathfinder_fleet), reachable from run_cohort
    (cohort_sampler="config", sampler="pathfinder") with k_hat + IS
    evidence surfaced per subject and persisted."""
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.parallel import (
        fleet as fleet_mod,
    )
    from nonstationary_multivariate_gaussian_process_tpu.utils import (
        ArtifactStore,
    )

    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    subjects = {}
    for i, (k, n) in enumerate(zip(keys, [14, 16, 16])):
        d = sim.sim_mnts(k, n=n)
        subjects[f"id{i}"] = (np.asarray(d.x), np.asarray(d.y))

    # library surface: ragged subjects via masks, contract shapes
    xs = np.stack([np.pad(x, (0, 16 - len(x)), mode="edge")
                   for x, _ in subjects.values()])
    ys = np.stack([np.pad(y, ((0, 16 - len(y)), (0, 0)), mode="edge")
                   for _, y in subjects.values()])
    masks = np.arange(16)[None, :] < np.array([14, 16, 16])[:, None]
    r = fleet_mod.pathfinder_fleet(
        "gnmgp", xs, ys, jax.random.PRNGKey(0), n_paths=2, max_iters=25,
        n_draws=60, n_out=10, masks=masks,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp

    assert r.draws.shape == (3, 10, gnmgp.n_params(16, 2))
    assert np.all(np.isfinite(np.asarray(r.draws)))
    assert r.k_hat.shape == (3,) and r.elbo.shape == (3,)
    assert np.all(np.isfinite(r.log_evidence))

    # driver surface
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        cfg = workflows.PipelineConfig(
            model="gnmgp", n_opt=30, window_size=5, do_hmc=True, n_hmc=6,
            whiten=True, do_pred_test=False, cohort_sampler="config",
            sampler="pathfinder", pf_paths=2, pf_iters=25, pf_draws=60,
        )
        store = ArtifactStore(td)
        out = workflows.run_cohort(subjects, cfg, store=store, n_buckets=2)
        for sid, rec in out["subjects"].items():
            assert rec["hmc_samples"].shape[0] == 6
            assert np.all(np.isfinite(rec["hmc_samples"]))
            assert rec["sampling"]["sampler"] == "pathfinder"
            assert np.isfinite(rec["sampling"]["k_hat"])
            assert "log_evidence_is" in rec["sampling"]
        assert store.exists(
            ArtifactStore.key("gnmgp", "cohort", "id0", "sampling")
        )


@pytest.mark.slow  # demoted r5: heavy routing/e2e duplicative of a
#   faster default-tier witness (VERDICT r4 #7 suite-wall budget)
def test_cohort_hadamard_pathfinder_routing():
    """run_cohort_hadamard with sampler="pathfinder": the Hadamard fleet
    tier (pathfinder_fleet_hadamard) — k_hat + IS evidence surfaced,
    PSIS-resampled draws as the sample matrix."""
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    rng = np.random.default_rng(0)
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    subjects = {}
    for i, (k, n) in enumerate(zip(keys, [20, 24, 24])):
        d = sim.sim_mnts(k, n=n)
        indx = rng.integers(0, 2, size=n)
        y = np.asarray(d.y)[np.arange(n), indx]
        subjects[f"s{i}"] = (np.asarray(d.x), indx, y)
    cfg = workflows.PipelineConfig(
        model="gnmgp", n_opt=25, do_hmc=True, n_hmc=8, whiten=True,
        do_pred_test=False, cohort_sampler="config", sampler="pathfinder",
        pf_paths=2, pf_iters=25, pf_draws=60,
    )
    out = workflows.run_cohort_hadamard(subjects, m=2, cfg=cfg, n_buckets=2)
    for rec in out["subjects"].values():
        assert rec["hmc_samples"].shape[0] == 8
        assert np.all(np.isfinite(rec["hmc_samples"]))
        s = rec["sampling"]
        assert s["sampler"] == "pathfinder"
        assert np.isfinite(s["k_hat"]) and "log_evidence_is" in s


@pytest.mark.slow  # demoted r5: heavy routing/e2e duplicative of a
#   faster default-tier witness (VERDICT r4 #7 suite-wall budget)
def test_sim_fleet_pathfinder_routing():
    """run_sim_fleet(sampler="pathfinder"): replicate-fleet variational
    draws via pathfinder_fleet, centered at the fleet MAPs; per-replicate
    k_hat and IS evidence come back."""
    from nonstationary_multivariate_gaussian_process_tpu import workflows

    out = workflows.run_sim_fleet(
        n_replicates=3, n=14,
        cfg=workflows.PipelineConfig(
            model="gnmgp", n_opt=30, do_hmc=True, n_hmc=8,
            sampler="pathfinder", pf_paths=2, pf_iters=25, pf_draws=60,
            do_evaluation=False,
        ),
    )
    assert out["hmc_samples"].shape[:2] == (3, 8)
    assert np.all(np.isfinite(out["hmc_samples"]))
    assert out["pf_k_hat"].shape == (3,)
    assert np.all(np.isfinite(out["log_evidence_is"]))


def test_smc_pathfinder_reference_gaussian_estimand():
    """The pathfinder-seeded SMC reference leaves the evidence estimand
    unchanged: on a correlated Gaussian (analytic logz), the telescope over
    ``N(ref_mean, ref_scale)`` from multipathfinder moments lands on the
    true log normalizer, like the N(0, I) default does — the reference is
    a normalized Gaussian either way, only the path length changes."""
    from nonstationary_multivariate_gaussian_process_tpu.inference import smc

    pot, mu, cov, logz = _corr_gauss(dim=6, seed=5)
    mpf = pf.multipathfinder(pot, jnp.zeros(6) + 3.0, 11, n_paths=3,
                             max_iters=50, n_draws=200, n_out=100)
    r_pf = smc.smc_sample(
        pot, 6, jax.random.PRNGKey(2), 512, n_mutations=3, n_leapfrog=8,
        ref_mean=mpf.ref_mean,
        ref_scale=jnp.clip(1.25 * mpf.ref_scale, 0.05, 10.0),
    )
    r_prior = smc.smc_sample(pot, 6, jax.random.PRNGKey(2), 512,
                             n_mutations=3, n_leapfrog=8)
    assert abs(float(r_pf.logz) - logz) < 1.0
    assert abs(float(r_prior.logz) - logz) < 1.0
    # posterior-shaped reference = no longer a tempering path
    assert int(r_pf.n_stages) <= int(r_prior.n_stages)


@pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
def test_smc_pathfinder_reference_workflow():
    """smc_ref="pathfinder" routing through the workflow SMC stage: the
    sampling record says which reference ran, carries the PSIS k_hat, the
    telescope completes (beta = 1) and the natural-space evidence is
    finite.  (Estimand equality is pinned analytically above — at this
    smoke budget the two GNMGP runs' MC bands are tens of nats wide.)"""
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.inference import (
        map as map_mod,
        whiten,
    )

    d = sim.sim_mnts(jax.random.PRNGKey(0), n=24)
    n, m = d.y.shape
    nlp = gnmgp.make_objective(gnmgp.FullData(x=d.x, y=d.y))
    w = whiten.make_whitener("gnmgp", d.x, n, m)
    res = map_mod.fit_map(nlp, jnp.zeros(w.n_params), n_iters=150,
                          method="lbfgs")
    cfg = workflows.PipelineConfig(
        model="gnmgp", n_hmc=16, smc_particles=192, smc_mutations=3,
        smc_leapfrog=6, smc_polish=2, pf_paths=3, pf_iters=40,
        pf_draws=150, smc_ref="pathfinder",
    )
    key = jax.random.PRNGKey(7)
    samples, _, s_pf = workflows._run_chain_smc(nlp, res.vec, cfg, key,
                                                whitener=w)
    assert samples.shape[0] == 16
    assert np.all(np.isfinite(np.asarray(samples)))
    assert s_pf["smc_ref"] == "pathfinder"
    assert np.isfinite(s_pf["pf_k_hat"])
    assert s_pf["pf_ref_used"] in (True, False)
    assert s_pf["beta_final"] == 1.0
    assert np.isfinite(s_pf["log_evidence"])

    # the k_hat gate: an unreliable proposal (pf_khat_max below any real
    # k_hat) forfeits the seed — prior reference, pf_ref_used=False — and
    # the run still completes; a permissive gate uses the seed
    cfg_gate = dataclasses.replace(cfg, pf_khat_max=-1.0)
    _, _, s_gated = workflows._run_chain_smc(nlp, res.vec, cfg_gate,
                                             key, whitener=w)
    assert s_gated["pf_ref_used"] is False
    assert s_gated["beta_final"] == 1.0
    cfg_open = dataclasses.replace(cfg, pf_khat_max=np.inf)
    _, _, s_open = workflows._run_chain_smc(nlp, res.vec, cfg_open,
                                            key, whitener=w)
    assert s_open["pf_ref_used"] is True

    with pytest.raises(ValueError, match="smc_ref"):
        bad = workflows.PipelineConfig(**{**cfg.__dict__, "smc_ref": "x"})
        workflows._run_chain_smc(nlp, res.vec, bad, key, whitener=w)


def test_multipathfinder_all_paths_diverged():
    """Every pooled weight non-finite (NaN potential): the designed
    degenerate result is k_hat=inf + -inf evidence with full-shape draws —
    not an empty-array crash in the moment computation."""

    def pot(q):
        return jnp.nan * jnp.sum(q ** 2)

    r = pf.multipathfinder(
        pot, jnp.zeros(4), jax.random.PRNGKey(0),
        n_paths=2, max_iters=6, n_draws=8, n_out=8,
    )
    assert not np.isfinite(r.k_hat)
    assert float(r.log_evidence) == -np.inf
    assert r.draws.shape == (8, 4)
    assert r.ref_scale.shape == (4,)


def test_multipathfinder_n_out_exceeds_pool():
    """n_out larger than the pooled draw count (paths x draws) cycles the
    ranked indices to the requested width instead of crashing or silently
    shrinking."""
    pot, mu, cov, logz = _corr_gauss(dim=4)
    r = pf.multipathfinder(
        pot, jnp.zeros(4), jax.random.PRNGKey(1),
        n_paths=2, max_iters=20, n_draws=8, n_out=40,
    )
    assert r.draws.shape == (40, 4)
    assert np.all(np.isfinite(np.asarray(r.draws)))


def test_gauss_factors_logdet_small_dim():
    """P < 2*memory: reduced QR keeps k = min(P, 2m) eigen-directions, so
    log|H| must count the alpha-only complement as p - k, not p - 2m
    (the fixed count misstates the logdet whenever alpha != 1)."""
    p, m = 3, 6
    scales = jnp.asarray([0.5, 1.0, 2.0])
    pot = lambda q: 0.5 * jnp.sum((q / scales) ** 2)
    thetas, grads, _ = pf._lbfgs_trajectory(pot, jnp.ones(p), 12, m)
    l_last = thetas.shape[0] - 1
    _, alpha, qu, lam, logdet = pf._gauss_factors(
        thetas, grads, l_last, m, thetas.dtype
    )
    assert abs(float(alpha) - 1.0) > 1e-3  # the case the count matters for
    h = alpha * jnp.eye(p) + qu @ jnp.diag(lam) @ qu.T
    sign, ld_true = jnp.linalg.slogdet(h)
    assert float(sign) > 0
    np.testing.assert_allclose(float(logdet), float(ld_true), rtol=1e-4)
