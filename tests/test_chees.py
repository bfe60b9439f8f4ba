"""ChEES-HMC (inference/chees.py).

The many-chain cross-chain-adaptation tier — the TPU-native posture for the
measured N=200 sampling wall (one chain is latency-bound; K lockstep chains
fill the MXU and the ChEES criterion *requires* them).  Pinned here:

(a) exactness on a correlated, badly scaled Gaussian — lockstep leapfrog +
    per-chain MH must preserve the target, and the pooled cross-chain
    metric must recover the marginal variances;
(b) trajectory-length adaptation actually moves — the tuned T leaves the
    (deliberately tiny) warm start and the shared leapfrog counts follow
    the Halton jitter;
(c) contracts — shapes, determinism under a fixed key, (K, P) explicit
    starts, validation errors;
(d) workflow routing — ``PipelineConfig(sampler="chees")`` runs the tier
    end-to-end and surfaces pooled diagnostics.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.inference import (
    chees,
    diagnostics,
)


def _gauss_potential(rng, d, cond=8.0):
    a = rng.normal(size=(d, d))
    cov = a @ a.T / d + np.eye(d)
    scales = np.linspace(1.0, cond, d)
    cov = np.diag(scales) @ cov @ np.diag(scales)
    prec = jnp.asarray(np.linalg.inv(cov))

    def potential(q):
        return 0.5 * q @ prec @ q

    return potential, cov


def test_gaussian_exactness_and_metric(rng):
    potential, cov = _gauss_potential(rng, 5)
    r = chees.chees_sample(
        potential, jnp.zeros(5), 1500, jax.random.PRNGKey(0),
        n_chains=16, step_size=0.5, n_warmup=800,
    )
    s = np.asarray(r.samples)  # (16, 1500, 5)
    assert s.shape == (16, 1500, 5)
    flat = s.reshape(-1, 5)
    np.testing.assert_allclose(flat.mean(axis=0), 0.0, atol=0.35)
    np.testing.assert_allclose(np.cov(flat.T), cov, rtol=0.35, atol=0.5)
    # pooled chains must agree (split-Rhat) and mix
    assert float(np.max(diagnostics.rhat(s))) < 1.05
    ess = min(diagnostics.ess_multichain(s[:, :, j]) for j in range(5))
    assert ess > 1000.0
    # the pooled warmup metric should recover the marginal variances
    np.testing.assert_allclose(
        np.asarray(r.inv_mass), np.diag(cov), rtol=0.5
    )


def test_trajectory_adaptation_moves(rng):
    potential, _ = _gauss_potential(rng, 4)
    eps = 0.4
    r = chees.chees_sample(
        potential, jnp.zeros(4), 200, jax.random.PRNGKey(1),
        n_chains=8, step_size=eps, trajectory_length=1.5 * eps,
        n_warmup=600, max_leapfrog=128,
    )
    # warm start is ~1.5 steps; a correlated 4-d Gaussian needs more
    assert float(r.trajectory_length) > 3.0 * eps
    n_steps = np.asarray(r.n_leapfrog)
    assert n_steps.min() >= 1 and n_steps.max() <= 128
    assert len(np.unique(n_steps)) > 3  # Halton jitter stratifies lengths


def test_contracts_and_determinism(rng):
    potential, _ = _gauss_potential(rng, 3)
    kw = dict(n_chains=4, step_size=0.4, n_warmup=50)
    r1 = chees.chees_sample(
        potential, jnp.zeros(3), 40, jax.random.PRNGKey(2), **kw
    )
    r2 = chees.chees_sample(
        potential, jnp.zeros(3), 40, jax.random.PRNGKey(2), **kw
    )
    np.testing.assert_array_equal(
        np.asarray(r1.samples), np.asarray(r2.samples)
    )
    assert r1.samples.shape == (4, 40, 3)
    assert r1.accept_prob.shape == (90, 4)
    assert r1.n_leapfrog.shape == (90,)
    assert r1.potentials.shape == (4, 40)
    # explicit (K, P) starts override n_chains
    q0 = jnp.zeros((6, 3))
    r3 = chees.chees_sample(
        potential, q0, 10, jax.random.PRNGKey(3), step_size=0.4, n_warmup=20
    )
    assert r3.samples.shape == (6, 10, 3)

    with pytest.raises(ValueError, match="2 chains"):
        chees.chees_sample(
            potential, jnp.zeros(3), 10, jax.random.PRNGKey(0), n_chains=1
        )
    with pytest.raises(ValueError, match="n_samples"):
        chees.chees_sample(
            potential, jnp.zeros(3), 0, jax.random.PRNGKey(0)
        )
    with pytest.raises(ValueError, match="inv_mass"):
        chees.chees_sample(
            potential, jnp.zeros(3), 10, jax.random.PRNGKey(0),
            inv_mass=jnp.ones(5),
        )
    with pytest.raises(ValueError, match="q0"):
        chees.chees_sample(
            potential, jnp.zeros((2, 2, 2)), 10, jax.random.PRNGKey(0)
        )


def test_fixed_mass_respected(rng):
    potential, cov = _gauss_potential(rng, 3)
    inv_mass = jnp.asarray(np.diag(cov))
    r = chees.chees_sample(
        potential, jnp.zeros(3), 100, jax.random.PRNGKey(4),
        n_chains=4, step_size=0.3, n_warmup=100, inv_mass=inv_mass,
    )
    # a supplied metric is frozen — adaptation must not touch it
    np.testing.assert_array_equal(np.asarray(r.inv_mass), np.asarray(inv_mass))


def test_chees_fleet_whitened():
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.parallel import fleet

    S, n = 2, 12
    ds = [sim.sim_mnts(k, n=n) for k in jax.random.split(jax.random.PRNGKey(0), S)]
    xs = jnp.stack([d.x for d in ds])
    ys = jnp.stack([d.y for d in ds])
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp

    res = fleet.fit_fleet_map(
        "gnmgp", xs, ys,
        jnp.zeros((S, gnmgp.n_params(n, 2)), ys.dtype), n_iters=150, lr=0.1,
    )
    samples, accept, traj = fleet.chees_fleet(
        "gnmgp", xs, ys, res.vecs, jax.random.PRNGKey(2),
        n_samples=10, n_chains=4, n_warmup=30, step_size=1e-2,
        max_leapfrog=32, whiten=True,
    )
    p = res.vecs.shape[1]
    assert samples.shape == (S, 4, 10, p)
    assert np.all(np.isfinite(np.asarray(samples)))
    a = np.asarray(accept)
    assert a.shape == (S,) and np.all((a >= 0.0) & (a <= 1.0)), a
    t = np.asarray(traj)
    assert t.shape == (S,) and np.all(t > 0), t


def test_cohort_chees_routing(tmp_path):
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    rng_keys = jax.random.split(jax.random.PRNGKey(3), 3)
    subjects = {}
    for i, k in enumerate(rng_keys):
        d = sim.sim_mnts(k, n=10 + 2 * i)
        subjects[f"s{i}"] = (np.asarray(d.x), np.asarray(d.y))
    cfg = workflows.PipelineConfig(
        model="gnmgp", n_opt=30, do_hmc=True, n_hmc=8, hmc_warmup=16,
        n_chains=2, cohort_sampler="config", sampler="chees", whiten=True,
        do_evaluation=False,
        escalate_rhat=0.0,  # this test pins the CHAIN tier; the default
        #                     R-hat escalation would swap in SMC draws
    )
    out = workflows.run_cohort(subjects, cfg, n_buckets=1)
    assert len(out["subjects"]) == 3
    for sid, rec in out["subjects"].items():
        # pooled chain-major draws: 2 chains x 8 draws
        assert rec["hmc_samples"].shape[0] == 16
        assert np.all(np.isfinite(rec["hmc_samples"]))
        assert "sampling" in rec and np.isfinite(rec["sampling"]["max_rhat"])
        assert rec["sampling"]["n_chains"] == 2


def test_workflow_sampler_routing(tmp_path):
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    d = sim.sim_mnts(jax.random.PRNGKey(0), n=12)
    cfg = workflows.PipelineConfig(
        model="gnmgp",
        n_opt=30,
        do_hmc=True,
        sampler="chees",
        n_chains=4,
        n_hmc=20,
        hmc_warmup=20,
        whiten=True,
    )
    res = workflows.run_subject(d.x, d.y, cfg)
    # pooled chain-major draws: 4 chains x 20 draws
    assert res["hmc_samples"].shape[0] == 80
    s = res["sampling"]
    assert s["sampler"] == "chees" and s["chains"] == 4
    assert np.isfinite(s["min_ess"]) and np.isfinite(s["max_rhat"])
    assert s["trajectory_length"] > 0 and s["mean_leapfrog"] >= 1


def test_stranded_start_pullback(rng):
    """A chain stranded far above the typical set (10*dim nats over the best
    chain) is pulled back to chain 0's start before sampling, so the shared
    adaptation cannot death-spiral (the measured eps->1e-6 collapse)."""
    potential, _ = _gauss_potential(rng, 4)
    starts = jnp.stack([
        jnp.zeros(4),
        0.3 * jnp.ones(4),
        1e3 * jnp.ones(4),  # potential ~1e6 nats: stranded
    ])
    r = chees.chees_sample(
        potential, starts, 100, jax.random.PRNGKey(0),
        step_size=0.3, n_warmup=200,
    )
    s = np.asarray(r.samples)
    # the stranded chain sampled from the target, not from 1e3-land
    assert np.abs(s[2]).max() < 100.0
    assert float(r.step_size) > 1e-3  # adaptation survived


def test_multichain_starts_descend(rng):
    """Jittered starts descend into the typical set; chain 0 stays put."""
    from nonstationary_multivariate_gaussian_process_tpu.inference import init

    potential, _ = _gauss_potential(rng, 6)
    center = jnp.zeros(6)
    raw = init.multichain_starts(
        potential, center, 5, jax.random.PRNGKey(3),
        jitter=20.0, descent_iters=0,
    )
    desc = init.multichain_starts(
        potential, center, 5, jax.random.PRNGKey(3),
        jitter=20.0, descent_iters=400,
    )
    u_raw = np.asarray(jax.vmap(potential)(raw))
    u_desc = np.asarray(jax.vmap(potential)(desc))
    np.testing.assert_allclose(np.asarray(desc[0]), 0.0, atol=1e-12)
    assert (u_desc[1:] < u_raw[1:] / 5.0).all()
    # still distinct starts, not all collapsed onto the center
    assert np.abs(np.asarray(desc[1:])).max() > 1e-3


def test_fleet_descend_starts():
    """descend_starts lowers every jittered unit's posterior; keep= rows and
    non-finite descents are untouched."""
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData
    from nonstationary_multivariate_gaussian_process_tpu.parallel import fleet

    d = sim.sim_mnts(jax.random.PRNGKey(0), n=12)
    x, y = jnp.asarray(d.x), jnp.asarray(d.y)
    n, m = y.shape
    p = gnmgp.n_params(n, m)
    xs = jnp.stack([x, x, x])
    ys = jnp.stack([y, y, y])
    key = jax.random.PRNGKey(5)
    vecs = jnp.stack([
        jnp.zeros(p),
        1.5 * jax.random.normal(key, (p,)),
        2.5 * jax.random.normal(jax.random.fold_in(key, 1), (p,)),
    ])
    out = fleet.descend_starts(
        "gnmgp", xs, ys, vecs, iters=150,
        keep=jnp.array([True, False, False]),
    )
    nlp = gnmgp.make_objective(FullData(x, y))
    u_before = np.asarray(jax.vmap(nlp)(vecs))
    u_after = np.asarray(jax.vmap(nlp)(out))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(vecs[0]))
    assert u_after[1] < u_before[1] / 100.0
    assert u_after[2] < u_before[2] / 100.0
