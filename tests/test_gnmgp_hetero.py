"""Tests for the heteroscedastic-noise GNMGP extension."""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.inference import map as map_mod
from nonstationary_multivariate_gaussian_process_tpu.models import (
    FullData,
    gnmgp,
    gnmgp_hetero,
)
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms


class TestHetero:
    def test_pack_unpack(self, rng):
        n, m = 7, 2
        vec = jnp.asarray(rng.normal(size=gnmgp_hetero.n_params(n, m)))
        p = gnmgp_hetero.unpack(vec, n, m)
        assert p.tilde_sigma2_err.shape == (n * m,)
        np.testing.assert_array_equal(np.asarray(gnmgp_hetero.pack(p)), np.asarray(vec))

    def test_constant_noise_matches_gnmgp_loglik(self, rng):
        # with equal per-entry noise, the likelihood equals the homoscedastic model's
        n, m = 9, 2
        x = np.sort(rng.uniform(size=n))
        y = rng.normal(size=(n, m))
        t = transforms.tri_size(m)
        base_vec = rng.normal(size=n + n * t + 1) * 0.4
        het_vec = np.asarray(gnmgp_hetero.init_from_gnmgp(jnp.asarray(base_vec), n, m))
        ll_base = -float(gnmgp.nlogpos(jnp.asarray(base_vec), jnp.asarray(y), jnp.asarray(x), prior=False))
        ll_het = -float(gnmgp_hetero.nlogpos(jnp.asarray(het_vec), jnp.asarray(y), jnp.asarray(x), prior=False))
        np.testing.assert_allclose(ll_het, ll_base, rtol=1e-10)

    def test_map_fit_runs_and_improves(self):
        d = sim.sim_mnts(jax.random.PRNGKey(0), n=16)
        data = FullData(d.x, d.y)
        nlp = gnmgp_hetero.make_objective(data)
        n, m = 16, 2
        t = transforms.tri_size(m)
        v0 = gnmgp_hetero.init_from_gnmgp(
            jnp.concatenate([jnp.full((n,), -1.0), jnp.zeros((n * t,)), jnp.asarray([-4.0])]),
            n, m,
        )
        res = map_mod.fit_map(nlp, v0, n_iters=80, lr=0.1)
        assert float(nlp(res.vec)) < float(nlp(v0))
        g = jax.grad(nlp)(res.vec)
        assert np.all(np.isfinite(np.asarray(g)))
