"""bf16-below-mixed probe (ROADMAP "bf16 experiments below the mixed tier").

Question: can the mixed-precision solve (`ops/mixed.py` — f32-preconditioned,
f64-corrected, the NMGP_PRECISION=mixed parity configuration) go faster by
running its O(n^3) GEMMs on the MXU's native bf16 path?

Constraints discovered up front:
- XLA has no bf16 Cholesky (``Unsupported dtype bfloat16``) — the factor
  stays f32; only the preconditioner GEMMs (W^T W, G E, X X) and the IR
  matvecs can drop to bf16.
- The one f64-accumulated GEMM (the factorization residual E) is the
  parity anchor and cannot move.

The probe times two variants of the logdet+quad kernel on the live
device at the reference scale (n = M*N = 400) and at n = 2048, and checks
values against a float64 ground truth computed on CPU:

  f32   — ops.mixed.mixed_logdet_quad as shipped
  bf16  — same algorithm, preconditioner GEMMs + IR matvecs in bfloat16

Run:  python benchmarks/bf16_probe.py  (honors the ambient TPU pin)

MEASURED VERDICT (TPU, 20-rep timing; see ROADMAP "bf16 experiments"):
bf16 is a decisive negative on both axes.  n=400/cond=1e4: 6.09 ms vs
f32's 3.60 ms (IR takes 13 sweeps vs ~5 — contraction ~eps_bf16*cond, and
the extra f64 residual matvecs outcost the cheaper GEMMs); n=2048: 46.7
vs 26.9 ms; cond=1e6: the bf16-preconditioned IR stalls at relq 4.8e-3
and |dlogdet| 2.6e-5 — parity broken.  The mixed kernel's f32 GEMMs
already ride the MXU; f32 preconditioning stays.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_HI = jax.lax.Precision.HIGHEST


def _spd(n: int, cond: float, seed: int = 0) -> np.ndarray:
    """SPD f64 test matrix with log-spaced spectrum [1/cond, 1]."""
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(-np.log10(cond), 0.0, n)
    return (q * lam) @ q.T


def _fwd_bf16(a64, y64, ir_sweeps: int = 20):
    """ops.mixed._fwd_core with the preconditioner arithmetic in bfloat16."""
    n = a64.shape[-1]
    l32 = jnp.linalg.cholesky(a64.astype(jnp.float32))
    w16 = jax.scipy.linalg.solve_triangular(
        l32, jnp.eye(n, dtype=jnp.float32), lower=True
    ).astype(jnp.bfloat16)
    g16 = jax.lax.dot(w16.T, w16, precision=_HI)

    l64 = l32.astype(jnp.float64)
    e64 = a64 - jax.lax.dot(l64, l64.T, precision=_HI)

    e16 = e64.astype(jnp.bfloat16)
    x16 = jax.lax.dot(g16, e16, precision=_HI)
    x2 = jax.lax.dot(x16, x16, precision=_HI)
    tr1 = jnp.sum(g16.astype(jnp.float64) * e64)
    tr2 = jnp.sum(x16.astype(jnp.float64) * x16.T.astype(jnp.float64))
    tr3 = jnp.sum(x2.astype(jnp.float64) * x16.T.astype(jnp.float64))
    logdet = (
        2.0 * jnp.sum(jnp.log(jnp.diagonal(l64)))
        + tr1 - 0.5 * tr2 + tr3 / 3.0
    )

    def prec(r64):
        r16 = r64.astype(jnp.bfloat16)
        return (w16.T @ (w16 @ r16)).astype(jnp.float64)

    z0 = prec(y64)
    tol2 = (1e-26) * jnp.sum(y64 * y64)
    inf = jnp.asarray(jnp.inf, jnp.float64)

    def cond_fn(state):
        _, r2_last, r2_prev, it = state
        contracting = jnp.logical_or(it < 2, r2_last < 0.5 * r2_prev)
        return (it < ir_sweeps) & (r2_last > tol2) & contracting

    def body(state):
        z, r2_last, _, it = state
        r = y64 - a64 @ z
        return z + prec(r), jnp.sum(r * r), r2_last, it + 1

    z, r2, _, sweeps = lax.while_loop(cond_fn, body, (z0, inf, inf, 0))
    return logdet, jnp.sum(y64 * z), r2, sweeps


def main():
    from nonstationary_multivariate_gaussian_process_tpu.ops import mixed

    dev = jax.devices()[0]
    print(f"# device: {dev.platform}", flush=True)
    for n, cond in ((400, 1e4), (400, 1e6), (2048, 1e4)):
        a = _spd(n, cond)
        y = np.random.default_rng(1).standard_normal(n)
        sign, ld_true = np.linalg.slogdet(a)
        q_true = float(y @ np.linalg.solve(a, y))

        a64 = jnp.asarray(a, jnp.float64)
        y64 = jnp.asarray(y, jnp.float64)

        f32 = jax.jit(lambda A, Y: mixed.mixed_logdet_quad(A, Y))
        b16 = jax.jit(lambda A, Y: _fwd_bf16(A, Y))

        for name, fn in (("f32", f32), ("bf16", b16)):
            out = jax.tree.map(lambda t: t.block_until_ready(), fn(a64, y64))
            t0 = time.perf_counter()
            reps = 20
            for _ in range(reps):
                out = fn(a64, y64)
            out = jax.tree.map(lambda t: t.block_until_ready(), out)
            dt = (time.perf_counter() - t0) / reps
            ld, q = float(out[0]), float(out[1])
            extra = ""
            if name == "bf16":
                extra = f" ir_sweeps={int(out[3])} r2={float(out[2]):.3e}"
            print(
                f"n={n} cond={cond:.0e} {name:5s}: {dt*1e3:8.2f} ms  "
                f"|dlogdet|={abs(ld-ld_true):.3e}  "
                f"relq={abs(q-q_true)/abs(q_true):.3e}{extra}",
                flush=True,
            )


if __name__ == "__main__":
    main()
