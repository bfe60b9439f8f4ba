"""Delayed-rejection HMC (inference/drhmc.py).

Scope pinned by measurement (the inverse of tempering's): DR repairs the
*step-size geometry* failure — Neal's funnel, the measured residual
obstruction of the GNMGP posterior (whiten.py docstring) — which replica
exchange does NOT, while multimodality remains tempering's turf.  The tests
pin (a) exactness on a correlated Gaussian (the DR acceptance ratio must
preserve the target), (b) the funnel win vs plain HMC, (c) the result
contract and determinism.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.inference import (
    diagnostics,
    drhmc,
    hmc,
)


def _gauss_potential(d=5, rho=0.5):
    prec = jnp.eye(d) + rho * jnp.ones((d, d))

    def potential(q):
        return 0.5 * q @ prec @ q

    return potential, np.linalg.inv(np.asarray(prec))


def test_gaussian_exactness():
    """The DR ratio with ghost trajectories must leave the target invariant:
    retries at reduced step size are NOT plain resubmissions (those would
    bias the chain); moments of a correlated Gaussian pin the kernel."""
    potential, cov = _gauss_potential()
    r = drhmc.drhmc_sample(
        potential,
        jnp.zeros(5),
        4000,
        jax.random.PRNGKey(0),
        step_size=0.3,
        n_leapfrog=10,
        n_warmup=500,
        n_stages=3,
    )
    s = np.asarray(r.samples)
    assert np.abs(s.mean(axis=0)).max() < 0.15
    assert np.abs(np.cov(s.T) - cov).max() < 0.15
    st = np.asarray(r.accept_stage)
    # retries really happen and really accept sometimes
    assert (st >= 2).sum() > 10
    assert float(np.mean(st == 1)) > 0.5


def test_funnel_neck_vs_plain_hmc():
    """Neal's funnel, the measured GNMGP obstruction in miniature: plain
    (adapted) HMC equilibrates its step size to the bulk and cannot enter
    the neck — v biased high, spread collapsed.  DR-HMC threads it."""
    D = 9

    def funnel(q):
        v, x = q[0], q[1:]
        return v**2 / 18.0 + 0.5 * D * v + 0.5 * jnp.sum(x * x) * jnp.exp(-v)

    plain = hmc.hmc_sample(
        funnel,
        jnp.zeros(D + 1),
        4000,
        jax.random.PRNGKey(1),
        step_size=0.1,
        n_leapfrog=20,
        n_warmup=1000,
        adapt_step_size=True,
    )
    vp = np.asarray(plain.samples)[:, 0]
    assert vp.mean() > 0.7  # the failure mode being repaired (truth: 0)
    assert vp.std() < 2.4  # collapsed spread (truth: 3)

    dr = drhmc.drhmc_sample(
        funnel,
        jnp.zeros(D + 1),
        4000,
        jax.random.PRNGKey(1),
        step_size=0.1,
        n_leapfrog=20,
        n_warmup=1000,
        n_stages=3,
        reduction=4.0,
    )
    vd = np.asarray(dr.samples)[:, 0]
    assert vd.mean() < vp.mean() - 1.0  # decisively less biased
    assert vd.std() > vp.std() + 0.3  # decisively wider
    assert np.all(np.isfinite(np.asarray(dr.samples)))


@pytest.mark.slow
def test_funnel_marginal_recovered():
    """With a real budget the funnel's v-marginal (N(0, 9)) is recovered
    across seeds — the quantitative claim behind the module's scope note."""
    D = 9

    def funnel(q):
        v, x = q[0], q[1:]
        return v**2 / 18.0 + 0.5 * D * v + 0.5 * jnp.sum(x * x) * jnp.exp(-v)

    for seed in (0, 2):
        dr = drhmc.drhmc_sample(
            funnel,
            jnp.zeros(D + 1),
            16000,
            jax.random.PRNGKey(seed),
            step_size=0.1,
            n_leapfrog=20,
            n_warmup=1000,
            n_stages=3,
            reduction=4.0,
        )
        v = np.asarray(dr.samples)[:, 0]
        assert abs(v.mean()) < 0.8, f"seed {seed}: mean {v.mean():.2f}"
        assert 2.4 < v.std() < 3.6, f"seed {seed}: std {v.std():.2f}"
        assert diagnostics.ess(v) > 30


def test_workflow_sampler_routing():
    """PipelineConfig(sampler="drhmc") runs the full single-subject stage
    (whitened, like the other samplers) and lands chain artifacts."""
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim

    d = sim.sim_mnts(jax.random.PRNGKey(0), n=24)
    res = workflows.run_subject(
        d.x,
        d.y,
        workflows.PipelineConfig(
            model="gnmgp",
            n_opt=60,
            do_hmc=True,
            n_hmc=10,
            hmc_warmup=10,
            sampler="drhmc",
            dr_stages=2,
            whiten=True,
            hmc_step_size=1e-2,
            do_pred_grid=False,
            do_pred_test=False,
            do_evaluation=False,
        ),
    )
    assert res["hmc_samples"].shape[0] == 10
    assert np.all(np.isfinite(res["hmc_samples"]))


def test_drhmc_fleet_whitened():
    """drhmc_fleet shards whitened per-subject DR chains over the mesh and
    run_sim_fleet routes sampler='drhmc' through it."""
    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.parallel import fleet

    xs, ys = [], []
    for i in range(2):
        d = sim.sim_mnts(jax.random.PRNGKey(i), n=12)
        xs.append(d.x)
        ys.append(d.y)
    xs, ys = jnp.stack(xs), jnp.stack(ys)
    vecs = jnp.zeros((2, gnmgp.n_params(12, 2)))
    samples, stages = fleet.drhmc_fleet(
        "gnmgp", xs, ys, vecs, jax.random.PRNGKey(4), n_samples=15,
        step_size=1e-2, n_leapfrog=5, n_warmup=20, n_stages=2, whiten=True,
    )
    assert samples.shape == (2, 15, vecs.shape[1])
    assert np.all(np.isfinite(np.asarray(samples)))
    st = np.asarray(stages)
    assert st.shape == (2, 35) and np.all((st >= 0) & (st <= 2))

    out = workflows.run_sim_fleet(
        n_replicates=2,
        n=12,
        cfg=workflows.PipelineConfig(
            model="gnmgp", n_opt=30, do_hmc=True, n_hmc=5, sampler="drhmc",
            dr_stages=2, whiten=True, hmc_step_size=1e-3, hmc_warmup=10,
            do_evaluation=False,
        ),
    )
    s = out["hmc_samples"]
    assert s.shape == (2, 5, gnmgp.n_params(12, 2))
    assert np.all(np.isfinite(s))
    assert out["hmc_accept"].shape == (2,)


def test_contract_and_determinism():
    potential, _ = _gauss_potential(d=3, rho=0.2)
    kwargs = dict(
        step_size=0.3,
        n_leapfrog=5,
        n_warmup=50,
        n_stages=2,
        reduction=3.0,
        mass_matrix=jnp.asarray([1.0, 2.0, 0.5]),
    )
    a = drhmc.drhmc_sample(
        potential, jnp.zeros(3), 200, jax.random.PRNGKey(7), **kwargs
    )
    b = drhmc.drhmc_sample(
        potential, jnp.zeros(3), 200, jax.random.PRNGKey(7), **kwargs
    )
    np.testing.assert_array_equal(np.asarray(a.samples), np.asarray(b.samples))
    assert a.samples.shape == (200, 3)
    assert a.accept_stage.shape == (250,)
    assert a.accept_prob1.shape == (250,)
    assert a.potentials.shape == (200,)
    assert set(np.unique(np.asarray(a.accept_stage))) <= {0, 1, 2}
    assert float(a.step_size) > 0

    # n_stages=1 degenerates to plain (adapted) HMC and still runs
    c = drhmc.drhmc_sample(
        potential, jnp.zeros(3), 100, jax.random.PRNGKey(3),
        step_size=0.3, n_leapfrog=5, n_warmup=50, n_stages=1,
    )
    assert np.all(np.asarray(c.accept_stage) <= 1)

    with pytest.raises(ValueError, match="n_stages"):
        drhmc.drhmc_sample(
            potential, jnp.zeros(3), 10, jax.random.PRNGKey(0), n_stages=0
        )
    with pytest.raises(ValueError, match="diagonal"):
        drhmc.drhmc_sample(
            potential,
            jnp.zeros(3),
            10,
            jax.random.PRNGKey(0),
            mass_matrix=jnp.eye(3),
        )
