"""Blocked matmul-based Cholesky / triangular solves (ops/blocked.py).

These are the building blocks for the mesh-sharded factorization tier; on a
single device they must be numerically identical (f64 roundoff) to the XLA
primitives, including through reverse-mode AD (custom VJPs).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu.ops import blocked


def _spd(rng, n):
    a = rng.normal(size=(n, n))
    return jnp.asarray(a @ a.T / n + 2.0 * np.eye(n))


@pytest.mark.parametrize("n", [100, 256, 300])
def test_cholesky_matches_xla(rng, n):
    spd = _spd(rng, n)
    l = blocked.blocked_cholesky(spd, 128)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(jnp.linalg.cholesky(spd)), atol=1e-12
    )


@pytest.mark.parametrize("trans", [False, True])
def test_trsm_matches_xla(rng, trans):
    n = 300
    l = jnp.linalg.cholesky(_spd(rng, n))
    b = jnp.asarray(rng.normal(size=(n, 5)))
    got = blocked.blocked_trsm(l, b, trans, 128)
    want = jax.scipy.linalg.solve_triangular(l, b, lower=True, trans=1 if trans else 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-12)
    # vector RHS round-trips the squeeze
    gv = blocked.blocked_trsm(l, b[:, 0], trans, 128)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(want[:, 0]), atol=1e-12)


def test_chol_solve(rng):
    n = 260
    spd = _spd(rng, n)
    b = jnp.asarray(rng.normal(size=n))
    l = blocked.blocked_cholesky(spd, 128)
    x = blocked.blocked_chol_solve(l, b, 128)
    np.testing.assert_allclose(np.asarray(spd @ x), np.asarray(b), atol=1e-10)


def test_logdet_quad_gradients_match_xla(rng):
    n = 200
    spd = _spd(rng, n)
    y = jnp.asarray(rng.normal(size=n))

    def f_ref(a):
        l = jnp.linalg.cholesky(a)
        z = jax.scipy.linalg.solve_triangular(l, y, lower=True)
        return 2.0 * jnp.sum(jnp.log(jnp.diag(l))) + jnp.sum(z * z)

    def f_blk(a):
        l = blocked.blocked_cholesky(a, 64)
        z = blocked.blocked_trsm(l, y, False, 64)
        return 2.0 * jnp.sum(jnp.log(jnp.diag(l))) + jnp.sum(z * z)

    np.testing.assert_allclose(float(f_blk(spd)), float(f_ref(spd)), rtol=1e-13)
    g_ref = jax.grad(f_ref)(spd)
    g_blk = jax.jit(jax.grad(f_blk))(spd)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref), atol=1e-12)


@pytest.mark.parametrize("trans", [False, True])
def test_trsm_gradients_both_args(rng, trans):
    n = 150
    l0 = jnp.linalg.cholesky(_spd(rng, n))
    b = jnp.asarray(rng.normal(size=(n, 3)))

    def f(lm, bm):
        return jnp.sum(jnp.sin(blocked.blocked_trsm(jnp.tril(lm), bm, trans, 64)))

    def f_ref(lm, bm):
        return jnp.sum(
            jnp.sin(
                jax.scipy.linalg.solve_triangular(
                    jnp.tril(lm), bm, lower=True, trans=1 if trans else 0
                )
            )
        )

    gl, gb = jax.grad(f, (0, 1))(l0, b)
    gl_r, gb_r = jax.grad(f_ref, (0, 1))(l0, b)
    np.testing.assert_allclose(np.asarray(gl), np.asarray(gl_r), atol=1e-12)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_r), atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 3, 7, 16, 128, 130])
def test_unrolled_cholesky_matches_xla(rng, n):
    """The loop-free recursive small-factor kernel: same f64 arithmetic as
    the XLA factor in recursive-blocked order, any n."""
    spd = _spd(rng, n)
    l = jax.jit(blocked.unrolled_cholesky)(spd)
    np.testing.assert_allclose(
        np.asarray(l), np.asarray(jnp.linalg.cholesky(spd)), atol=1e-12
    )
    w = jax.jit(blocked.unrolled_tri_inv)(l)
    np.testing.assert_allclose(
        np.asarray(w @ l), np.eye(n), atol=1e-10
    )


def test_unrolled_cholesky_gradients(rng):
    """Custom VJP (explicit-inverse Cholesky pullback) matches autodiff
    through the XLA factor, through a logdet+quad composite."""
    n = 48
    spd = _spd(rng, n)
    y = jnp.asarray(rng.normal(size=n))

    def f(a, kern):
        l = kern(a)
        z = jax.scipy.linalg.solve_triangular(l, y, lower=True)
        return 2.0 * jnp.sum(jnp.log(jnp.diag(l))) + jnp.sum(z * z)

    f_un = lambda a: f(a, blocked.unrolled_cholesky)
    f_ref = lambda a: f(a, jnp.linalg.cholesky)
    np.testing.assert_allclose(float(f_un(spd)), float(f_ref(spd)), rtol=1e-13)
    g_un = jax.jit(jax.grad(f_un))(spd)
    g_ref = jax.grad(f_ref)(spd)
    np.testing.assert_allclose(np.asarray(g_un), np.asarray(g_ref), atol=1e-11)


def test_unrolled_safe_ladder_escalates():
    """safe_cholesky_unrolled: the deterministic jitter ladder recovers a
    finite factor on a rank-deficient Gram, like safe_cholesky."""
    from nonstationary_multivariate_gaussian_process_tpu.ops import chol

    v = jnp.asarray(np.linspace(0.0, 1.0, 12))[:, None]
    low_rank = jnp.asarray(v @ v.T)  # rank 1, plain factor produces NaN
    l = jax.jit(chol.safe_cholesky_unrolled)(low_rank)
    assert np.isfinite(np.asarray(l)).all()
    spd = _spd(np.random.default_rng(3), 12)
    np.testing.assert_allclose(
        np.asarray(jax.jit(chol.safe_cholesky_unrolled)(spd)),
        np.asarray(jnp.linalg.cholesky(spd)), atol=1e-12,
    )
