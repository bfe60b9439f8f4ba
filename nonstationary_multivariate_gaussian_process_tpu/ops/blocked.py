"""Blocked dense Cholesky / triangular solves built from matmuls.

Why this exists: the reference runs everything in float64
(``/root/reference/Utility/settings.py:3``), and the parity target is a 1e-6
rtol log-posterior match *at that precision*.  On TPU float64 is emulated in
float32 pairs; measured on this chip (N=2048):

* f64 matmul:          17 ms  — only ~2.3x the f32 matmul (rides the MXU)
* f64 ``cholesky``:   148 ms  — ~24x the f32 one (scalarized emulation)
* f64 trsm (N rhs):    40 ms  — ~6x

So the way to make the *parity dtype* fast is to re-express the O(n^3)
factorization/solve work as f64 **matmuls** plus small-block factorizations:
a right-looking blocked Cholesky and block-substitution triangular solves.
This is the classic LAPACK blocking, chosen here not for cache reasons but
because on TPU the f64 GEMM emulation is the only fast f64 primitive.

All entry points carry custom VJPs (the standard Cholesky pullback and
triangular-solve adjoints, themselves expressed with blocked solves), so
reverse-mode AD through MAP/HMC never differentiates the panel scan and costs
only matmul-class work.

Replaces the reference's ``torch.inverse`` + ``torch.logdet`` pair on the
MN x MN GNMGP Gram (``Utility/logpos.py:352-353``) at the parity precision.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

#: Panel width. MXU-friendly (multiple of 128); 256 balances the number of
#: sequential small-block factorizations against matmul size.
BLOCK = 256


def _pad_spd(a: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Pad an SPD matrix to size nb with an identity tail (chol-neutral)."""
    n = a.shape[-1]
    if n == nb:
        return a
    pad = nb - n
    a = jnp.pad(a, ((0, pad), (0, pad)))
    idx = jnp.arange(n, nb)
    return a.at[idx, idx].set(1.0)


def _pad_tril(l: jnp.ndarray, nb: int) -> jnp.ndarray:
    """Pad a lower-triangular factor to size nb with an identity tail."""
    return _pad_spd(l, nb)


def _ceil_to(n: int, b: int) -> int:
    return -(-n // b) * b


# ---------------------------------------------------------------------------
# Blocked Cholesky.
# ---------------------------------------------------------------------------


def _cholesky_scan(a: jnp.ndarray, block: int) -> jnp.ndarray:
    """Right-looking blocked Cholesky; ``a`` must be (nb, nb), nb % block == 0.

    Per panel: factor the block x block diagonal tile (small XLA chol), form
    the column panel with a small trsm, and rank-``block`` downdate the
    trailing matrix with one (nb, block) @ (block, nb) matmul.  The downdate
    is applied full-size: the panel is masked to rows strictly below the
    diagonal tile, so the outer product is exactly zero outside the trailing
    block and finalized columns are untouched.
    """
    nb = a.shape[-1]
    n_panels = nb // block
    rows = jnp.arange(nb)

    def step(a, j):
        o = j * block
        dkk = lax.dynamic_slice(a, (o, o), (block, block))
        lkk = jnp.linalg.cholesky(dkk)
        strip = lax.dynamic_slice(a, (0, o), (nb, block))  # full column strip
        # panel = strip @ lkk^{-T}, valid on rows > o+block
        panel = jax.scipy.linalg.solve_triangular(
            lkk, strip.T, lower=True
        ).T
        below = (rows >= o + block)[:, None]
        panel_m = jnp.where(below, panel, 0.0)
        # final L column strip: zeros above, lkk on the diagonal tile, panel below
        new_strip = lax.dynamic_update_slice(panel_m, lkk, (o, 0))
        a = lax.dynamic_update_slice(a, new_strip, (0, o))
        # trailing (Schur) downdate — nonzero only on rows/cols >= o+block
        a = a - panel_m @ panel_m.T
        return a, None

    a, _ = lax.scan(step, a, jnp.arange(n_panels))
    return jnp.tril(a)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def blocked_cholesky(a: jnp.ndarray, block: int = BLOCK) -> jnp.ndarray:
    """Cholesky factor of SPD ``a`` via matmul-dominated panel updates.

    Numerically equivalent to ``jnp.linalg.cholesky`` (same f64 arithmetic,
    blocked order); ~6x faster on TPU-emulated float64 at n=2048.
    """
    n = a.shape[-1]
    nb = _ceil_to(n, block)
    l = _cholesky_scan(_pad_spd(a, nb), block)
    return l[:n, :n]


def _blocked_cholesky_fwd(a, block):
    l = blocked_cholesky(a, block)
    return l, l


def _phi(x):
    """tril with halved diagonal — the Cholesky pullback projector."""
    return jnp.tril(x) - 0.5 * jnp.diag(jnp.diagonal(x))


def _blocked_cholesky_bwd(block, l, lbar):
    # Standard Cholesky pullback (Murray 2016), with the two full-RHS
    # triangular solves expressed as blocked substitutions (matmul class).
    p = _phi(l.T @ lbar)
    u = blocked_trsm(l, p, trans=True, block=block)  # L^{-T} P
    v = blocked_trsm(l, u.T, trans=True, block=block).T  # L^{-T} P L^{-1}
    abar = 0.5 * (v + v.T)
    return (abar,)


blocked_cholesky.defvjp(_blocked_cholesky_fwd, _blocked_cholesky_bwd)


# ---------------------------------------------------------------------------
# Blocked triangular solve (lower factor; optional transpose).
# ---------------------------------------------------------------------------


def _trsm_scan(l: jnp.ndarray, b: jnp.ndarray, trans: bool, block: int):
    """Block substitution; shapes (nb, nb) and (nb, r), nb % block == 0.

    Forward (``L x = b``) walks panels top-down; transposed (``L^T x = b``)
    bottom-up.  Each step is one (block, nb) @ (nb, r) matmul against the
    already-solved part (unsolved rows of x are still zero, so no masking is
    needed) plus a small block x block triangular solve.
    """
    nb = l.shape[-1]
    n_panels = nb // block
    x0 = jnp.zeros_like(b)

    def step(x, j):
        o = j * block
        if trans:
            # rows of L^T = columns of L
            l_rows = lax.dynamic_slice(l, (0, o), (nb, block)).T  # (block, nb)
        else:
            l_rows = lax.dynamic_slice(l, (o, 0), (block, nb))
        lkk = lax.dynamic_slice(l, (o, o), (block, block))
        bj = lax.dynamic_slice(b, (o, 0), (block, b.shape[-1]))
        rhs = bj - l_rows @ x
        xj = jax.scipy.linalg.solve_triangular(
            lkk, rhs, lower=True, trans=1 if trans else 0
        )
        return lax.dynamic_update_slice(x, xj, (o, 0)), None

    order = jnp.arange(n_panels)
    if trans:
        order = order[::-1]
    x, _ = lax.scan(step, x0, order)
    return x


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def blocked_trsm(
    l: jnp.ndarray, b: jnp.ndarray, trans: bool = False, block: int = BLOCK
) -> jnp.ndarray:
    """Solve ``L x = b`` (or ``L^T x = b`` when ``trans``) by block substitution.

    ``l``: (n, n) lower-triangular, ``b``: (n,) or (n, r).
    """
    vec = b.ndim == 1
    if vec:
        b = b[:, None]
    n = l.shape[-1]
    nb = _ceil_to(n, block)
    lp = _pad_tril(l, nb)
    bp = jnp.pad(b, ((0, nb - n), (0, 0)))
    x = _trsm_scan(lp, bp, trans, block)[:n]
    return x[:, 0] if vec else x


def _blocked_trsm_fwd(l, b, trans, block):
    x = blocked_trsm(l, b, trans, block)
    return x, (l, x)


def _blocked_trsm_bwd(trans, block, res, xbar):
    l, x = res
    vec = x.ndim == 1
    if vec:
        x = x[:, None]
        xbar = xbar[:, None]
    # adjoint of the solve: bbar solves the transposed system
    bbar = blocked_trsm(l, xbar, not trans, block)
    if trans:
        lbar = -jnp.tril(x @ bbar.T)
    else:
        lbar = -jnp.tril(bbar @ x.T)
    if vec:
        bbar = bbar[:, 0]
    return lbar, bbar


blocked_trsm.defvjp(_blocked_trsm_fwd, _blocked_trsm_bwd)


def blocked_chol_solve(l: jnp.ndarray, b: jnp.ndarray, block: int = BLOCK):
    """Solve ``A x = b`` given ``L = chol(A)`` with blocked substitutions."""
    return blocked_trsm(l, blocked_trsm(l, b, False, block), True, block)


# ---------------------------------------------------------------------------
# Fully-unrolled recursive Cholesky / triangular inverse for SMALL factors.
#
# The blocked scan above still pays the emulated-f64 per-column latency
# inside its diagonal-tile ``jnp.linalg.cholesky`` (the measured reason it
# loses at n ~ 2048, chol.py header).  For the *small* f64 Grams the sparse
# tier factors every evaluation — K_mm at (m_z·M) ~ 128 — that latency IS
# the cost: ~64 us/column (chol.py) = ~8 ms for a 128x128 factor whose
# arithmetic is microseconds.  The kernels below contain no loop at all:
# straight-line recursive 2x2 block algebra (Strassen-style splitting, the
# classic recursive Cholesky), so XLA schedules pure matmul/sqrt dataflow
# with no While-iteration overhead.  Graph size is O(n log n) nodes —
# compile-cheap, and cheaper than lowering XLA's f64 Cholesky expander.
# ---------------------------------------------------------------------------

#: Recursion floor: below this, closed-form scalar algebra.
_UNROLL_BASE = 2


def _chol_rec(a: jnp.ndarray) -> jnp.ndarray:
    n = a.shape[-1]
    if n == 1:
        return jnp.sqrt(a)
    if n == 2:
        l11 = jnp.sqrt(a[0, 0])
        l21 = a[1, 0] / l11
        l22 = jnp.sqrt(a[1, 1] - l21 * l21)
        z = jnp.zeros((), a.dtype)
        return jnp.stack([jnp.stack([l11, z]), jnp.stack([l21, l22])])
    h = n // 2
    l11 = _chol_rec(a[:h, :h])
    # L21 = A21 L11^{-T} via the explicit small inverse (one GEMM, no
    # substitution loop); f64 eps keeps the inverse's cond-amplified error
    # far below the 1e-6 parity bar for cond(K_mm) ~ 1e8.
    w11 = _tri_inv_rec(l11)
    l21 = a[h:, :h] @ w11.T
    l22 = _chol_rec(a[h:, h:] - l21 @ l21.T)
    z = jnp.zeros((h, n - h), a.dtype)
    return jnp.block([[l11, z], [l21, l22]])


def _tri_inv_rec(l: jnp.ndarray) -> jnp.ndarray:
    n = l.shape[-1]
    if n == 1:
        return 1.0 / l
    if n == 2:
        w11 = 1.0 / l[0, 0]
        w22 = 1.0 / l[1, 1]
        w21 = -l[1, 0] * w11 * w22
        z = jnp.zeros((), l.dtype)
        return jnp.stack([jnp.stack([w11, z]), jnp.stack([w21, w22])])
    h = n // 2
    w11 = _tri_inv_rec(l[:h, :h])
    w22 = _tri_inv_rec(l[h:, h:])
    w21 = -w22 @ (l[h:, :h] @ w11)
    z = jnp.zeros((h, n - h), l.dtype)
    return jnp.block([[w11, z], [w21, w22]])


@jax.custom_vjp
def unrolled_cholesky(a: jnp.ndarray) -> jnp.ndarray:
    """Cholesky of a small SPD matrix as straight-line recursive dataflow.

    Numerically the same f64 arithmetic as ``jnp.linalg.cholesky`` in a
    different (recursive-blocked) order; built for the sparse tier's
    per-evaluation K_mm factor, where XLA's expander pays ~64 us of
    sequential-column latency per column on TPU-emulated f64
    (models/gnmgp_sparse._half_woodbury).  Use for n ≲ 512; the custom VJP
    is the standard Cholesky pullback with the two triangular solves as
    explicit-inverse GEMMs.
    """
    return _chol_rec(a)


def _unrolled_cholesky_fwd(a):
    l = unrolled_cholesky(a)
    return l, l


def _unrolled_cholesky_bwd(l, lbar):
    w = _tri_inv_rec(l)
    p = _phi(l.T @ lbar)
    v = w.T @ p @ w  # L^{-T} Φ L^{-1}
    return (0.5 * (v + v.T),)


unrolled_cholesky.defvjp(_unrolled_cholesky_fwd, _unrolled_cholesky_bwd)


@jax.custom_vjp
def unrolled_tri_inv(l: jnp.ndarray) -> jnp.ndarray:
    """Explicit inverse of a small lower-triangular factor (recursive,
    loop-free).  Pairs with :func:`unrolled_cholesky` so the downstream
    m-solve ``L^{-1} K_mn`` becomes ONE f64 GEMM riding the MXU instead of
    a substitution scan.  Custom VJP: from ``W L = I``,
    ``L̄ = tril(−Wᵀ W̄ Wᵀ)`` — two small GEMMs instead of autodiff through
    the O(n log n)-node recursion (measured: the recursion's backward
    graph of tiny per-op dispatches was a real cost in the sparse hot
    path, benchmarks/kmm_probe.py --breakdown)."""
    return _tri_inv_rec(l)


def _unrolled_tri_inv_fwd(l):
    w = _tri_inv_rec(l)
    return w, w


def _unrolled_tri_inv_bwd(w, wbar):
    return (-jnp.tril(w.T @ wbar @ w.T),)


unrolled_tri_inv.defvjp(_unrolled_tri_inv_fwd, _unrolled_tri_inv_bwd)
