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
