"""Mesh-sharded dense Cholesky (parallel/sharded_chol.py).

SURVEY §7 "hard parts": factoring Grams beyond one chip.  Correctness is
pinned against the single-device factorization on the 8-device CPU mesh,
including the identity-tail padding path (sizes not divisible by D*block).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.parallel import (
    make_mesh,
    sharded_chol,
)


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T / n + 2.0 * np.eye(n))


@pytest.mark.parametrize("n,block", [(520, 64), (1024, 128)])
def test_matches_single_device(rng, n, block):
    mesh = make_mesh(8)
    spd = _spd(rng, n)
    l = sharded_chol.sharded_cholesky(spd, mesh=mesh, block=block)
    l_ref = jnp.linalg.cholesky(spd)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref), atol=1e-11)


def test_solves_match(rng):
    # end use: logdet + solve of a Gram too big for one device
    mesh = make_mesh(8)
    n = 640
    spd = _spd(rng, n)
    y = jnp.asarray(rng.normal(size=n))
    l = sharded_chol.sharded_cholesky(spd, mesh=mesh, block=64)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(l)))
    z = jax.scipy.linalg.cho_solve((l, True), y)
    l_ref = jnp.linalg.cholesky(spd)
    np.testing.assert_allclose(
        float(logdet), float(2.0 * jnp.sum(jnp.log(jnp.diag(l_ref)))), rtol=1e-12
    )
    np.testing.assert_allclose(np.asarray(spd @ z), np.asarray(y), atol=1e-9)
