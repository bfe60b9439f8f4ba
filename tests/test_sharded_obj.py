"""Mesh-sharded GNMGP objective (parallel/sharded_obj.py).

The matrix-free sharded likelihood must equal the single-device objective
(same Gram, same jitter semantics) to factorization-roundoff, including
padding (MN not divisible by D*block), the full posterior, and gradients —
the sharded path serves MAP/HMC, not just evaluation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData
from nonstationary_multivariate_gaussian_process_tpu.ops import chol
from nonstationary_multivariate_gaussian_process_tpu.parallel import (
    make_mesh,
    sharded_obj,
)


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T / n + 2.0 * np.eye(n))


def _problem(rng, n=30, m=2):
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(rng.normal(size=(n, m)))
    vec = jnp.asarray(rng.normal(size=gnmgp.n_params(n, m)) * 0.3)
    return x, y, vec


def test_sweep_matches_psd_logdet_quad(rng):
    mesh = make_mesh(8)
    n = 200  # pads to 256 with block=8: exercises the identity tail
    a = _spd(rng, n)
    b = jnp.asarray(rng.normal(size=n))
    logdet, quad = sharded_obj.sharded_logdet_quad(a, b, mesh=mesh, block=8)
    ld_ref, q_ref = chol.psd_logdet_quad(a, b)
    np.testing.assert_allclose(float(logdet), float(ld_ref), rtol=1e-11)
    np.testing.assert_allclose(float(quad), float(q_ref), rtol=1e-9)


@pytest.mark.parametrize("n,m", [(30, 2), (32, 3)])
def test_loglik_matches_single_device(rng, n, m):
    mesh = make_mesh(8)
    x, y, vec = _problem(rng, n, m)
    ll_sharded = sharded_obj.loglik_sharded(vec, y, x, mesh=mesh, block=8)
    p = gnmgp.unpack(vec, n, m)
    ll_ref = gnmgp.log_lik(p, FullData(x, y))
    np.testing.assert_allclose(float(ll_sharded), float(ll_ref), rtol=1e-9)


def test_posterior_and_grad_match(rng):
    mesh = make_mesh(8)
    n, m = 24, 2
    x, y, vec = _problem(rng, n, m)
    data = FullData(x, y)
    nlp_sharded = sharded_obj.make_objective_sharded(data, mesh=mesh, block=8)
    nlp_ref = gnmgp.make_objective(data)
    np.testing.assert_allclose(
        float(nlp_sharded(vec)), float(nlp_ref(vec)), rtol=1e-9
    )
    g_sharded = jax.grad(nlp_sharded)(vec)
    g_ref = jax.grad(nlp_ref)(vec)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_ref), rtol=2e-6, atol=1e-8
    )


def test_hetero_posterior_and_grad_match(rng):
    """Sharded heteroscedastic objective: vector noise diagonal + noise-GP
    prior must equal models.gnmgp_hetero.make_objective, value and grad."""
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp_hetero

    mesh = make_mesh(8)
    n, m = 24, 2
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(rng.normal(size=(n, m)))
    vec = jnp.asarray(rng.normal(size=gnmgp_hetero.n_params(n, m)) * 0.3)
    data = FullData(x, y)
    nlp_sharded = sharded_obj.make_objective_sharded(
        data, mesh=mesh, block=8, model="gnmgp_hetero"
    )
    nlp_ref = gnmgp_hetero.make_objective(data)
    np.testing.assert_allclose(
        float(nlp_sharded(vec)), float(nlp_ref(vec)), rtol=1e-9
    )
    g_sharded = jax.grad(nlp_sharded)(vec)
    g_ref = jax.grad(nlp_ref)(vec)
    np.testing.assert_allclose(
        np.asarray(g_sharded), np.asarray(g_ref), rtol=2e-6, atol=1e-8
    )


def test_hetero_loglik_matches_single_device(rng):
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp_hetero

    mesh = make_mesh(8)
    n, m = 30, 2
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(rng.normal(size=(n, m)))
    vec = jnp.asarray(rng.normal(size=gnmgp_hetero.n_params(n, m)) * 0.3)
    ll_sharded = sharded_obj.loglik_sharded(
        vec, y, x, mesh=mesh, block=8, model="gnmgp_hetero"
    )
    ll_ref = gnmgp_hetero.log_lik(gnmgp_hetero.unpack(vec, n, m), FullData(x, y))
    np.testing.assert_allclose(float(ll_sharded), float(ll_ref), rtol=1e-9)


def test_predict_map_sharded_matches_single_device(rng):
    """Sharded MAP prediction (multi-RHS sweep) vs predict.gnmgp.predict_map."""
    from nonstationary_multivariate_gaussian_process_tpu.predict import (
        gnmgp as pred_gnmgp,
    )

    mesh = make_mesh(8)
    n, m = 24, 2
    x, y, vec = _problem(rng, n, m)
    data = FullData(x, y)
    grid = jnp.linspace(0.05, 0.95, 17)
    sp = sharded_obj.predict_map_sharded(vec, data, grid, mesh=mesh, block=4)
    ref = pred_gnmgp.predict_map(vec, data, grid)
    np.testing.assert_allclose(
        np.asarray(sp.mean), np.asarray(ref.mean), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sp.std), np.asarray(ref.std), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sp.l_vecs), np.asarray(ref.l_vecs), rtol=1e-9
    )


def test_predict_map_sharded_hetero_matches_single_device(rng):
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp_hetero
    from nonstationary_multivariate_gaussian_process_tpu.predict import (
        gnmgp_hetero as pred_hetero,
    )

    mesh = make_mesh(8)
    n, m = 24, 2
    x = jnp.asarray(np.sort(rng.uniform(size=n)))
    y = jnp.asarray(rng.normal(size=(n, m)))
    vec = jnp.asarray(rng.normal(size=gnmgp_hetero.n_params(n, m)) * 0.3)
    data = FullData(x, y)
    grid = jnp.linspace(0.05, 0.95, 13)
    sp = sharded_obj.predict_map_sharded(
        vec, data, grid, mesh=mesh, block=4, model="gnmgp_hetero"
    )
    ref = pred_hetero.predict_map(vec, data, grid)
    np.testing.assert_allclose(
        np.asarray(sp.mean), np.asarray(ref.mean), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sp.std), np.asarray(ref.std), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(sp.noise_var), np.asarray(ref.noise_var), rtol=1e-9
    )


def test_predict_sample_sharded_matches_single_device(rng):
    """Chain-sample prediction through the sweep: identical keys must give
    identical draws to predict.gnmgp.predict_sample — sharding is invisible."""
    from nonstationary_multivariate_gaussian_process_tpu.predict import (
        gnmgp as pred_gnmgp,
    )

    mesh = make_mesh(8)
    n, m = 20, 2
    x, y, vec = _problem(rng, n, m)
    data = FullData(x, y)
    grid = jnp.linspace(0.1, 0.9, 9)
    hist = jnp.stack([vec, vec + 0.05, vec - 0.05])
    key = jax.random.PRNGKey(7)
    sp = sharded_obj.predict_sample_sharded(key, hist, data, grid, mesh=mesh, block=4)
    ref = pred_gnmgp.predict_sample(key, hist, data, grid)
    assert sp.shape == (9, 3, 2)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(ref), rtol=1e-6, atol=1e-8)


class TestBatchedPotential:
    """Sharded-potential SMC plumbing: the batched likelihood/objective must
    equal the per-vector sharded path (one shard_map program for B vectors
    instead of B dispatches), including gradients through the ones-vector
    VJP that smc's potential_batched mode uses."""

    def test_loglik_batch_matches_per_row(self, rng):
        mesh = make_mesh()
        x, y, _ = _problem(rng, n=22, m=2)
        vecs = jnp.asarray(
            rng.normal(size=(4, gnmgp.n_params(22, 2))) * 0.3
        )
        llb = sharded_obj.loglik_sharded_batch(vecs, y, x, mesh=mesh, block=4)
        lls = jnp.stack([
            sharded_obj.loglik_sharded(v, y, x, mesh=mesh, block=4)
            for v in vecs
        ])
        np.testing.assert_allclose(
            np.asarray(llb), np.asarray(lls), rtol=1e-10
        )

    @pytest.mark.slow  # heavy routing/e2e tier (r4 suite-wall policy)
    def test_objective_batch_and_grads(self, rng):
        mesh = make_mesh()
        x, y, _ = _problem(rng, n=18, m=2)
        data = FullData(x, y)
        vecs = jnp.asarray(
            rng.normal(size=(3, gnmgp.n_params(18, 2))) * 0.3
        )
        nlpb = sharded_obj.make_objective_sharded_batch(data, mesh=mesh, block=4)
        nlps = sharded_obj.make_objective_sharded(data, mesh=mesh, block=4)
        np.testing.assert_allclose(
            np.asarray(nlpb(vecs)),
            np.asarray(jnp.stack([nlps(v) for v in vecs])),
            rtol=1e-10,
        )
        # ones-vector VJP == per-row gradients (rows are independent)
        gb = jax.grad(lambda v: jnp.sum(nlpb(v)))(vecs)
        gs = jnp.stack([jax.grad(nlps)(v) for v in vecs])
        np.testing.assert_allclose(
            np.asarray(gb), np.asarray(gs), rtol=1e-7, atol=1e-8
        )

    def test_hetero_batch_matches_per_row(self, rng):
        from nonstationary_multivariate_gaussian_process_tpu.models import (
            gnmgp_hetero,
        )

        mesh = make_mesh()
        x, y, _ = _problem(rng, n=16, m=2)
        vecs = jnp.asarray(
            rng.normal(size=(3, gnmgp_hetero.n_params(16, 2))) * 0.2
        )
        llb = sharded_obj.loglik_sharded_batch(
            vecs, y, x, mesh=mesh, block=4, model="gnmgp_hetero"
        )
        lls = jnp.stack([
            sharded_obj.loglik_sharded(
                v, y, x, mesh=mesh, block=4, model="gnmgp_hetero"
            )
            for v in vecs
        ])
        np.testing.assert_allclose(
            np.asarray(llb), np.asarray(lls), rtol=1e-10
        )

    @pytest.mark.slow
    def test_smc_sharded_potential_end_to_end(self, rng):
        """Tempered SMC over the sharded posterior: completes the path,
        returns finite natural-space particles and evidence."""
        from nonstationary_multivariate_gaussian_process_tpu.data import sim

        d = sim.sim_mnts(jax.random.PRNGKey(0), n=20)
        data = FullData(d.x, d.y)
        r, parts = sharded_obj.smc_sample_sharded_potential(
            data, jax.random.PRNGKey(5), mesh=make_mesh(), block=4,
            n_particles=16, n_mutations=1, n_leapfrog=2, max_stages=12,
        )
        assert parts.shape == (16, gnmgp.n_params(20, 2))
        assert float(r.beta_final) == 1.0
        assert np.isfinite(float(r.logz))
        assert np.all(np.isfinite(np.asarray(parts)))
