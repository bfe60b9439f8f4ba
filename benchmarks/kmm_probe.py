"""K_mm small-f64 factor probe: XLA Cholesky vs the unrolled recursive kernel.

The mixed sparse objective's measured residual cost is the f64 K_mm factor
(~64 us/column of sequential latency on TPU-emulated f64 — ops/chol.py) plus
the f64 substitution solve against K_nm (ROADMAP "shave the f64 K_mm factor
latency").  This probe measures, on the current backend at the bench's sparse
shape (m_z*M = 128, NM = 4000):

1. forward factor wall: ``jnp.linalg.cholesky`` vs ``blocked.unrolled_cholesky``
2. value+grad wall through a logdet+quad composite of each factor
3. the m-solve: ``triangular_solve(L, K_nm.T)`` vs ``unrolled_tri_inv(L) @ K_nm.T``
4. end-to-end: gnmgp_sparse mixed grad rate at N=2000 with the unrolled path
   on vs off (set NMGP_UNROLLED_CHOL in the env; this script reports the one
   configuration it was launched with)

Run solo on the TPU (exclusive tunnel):
    python benchmarks/kmm_probe.py                     # micro probes
    NMGP_UNROLLED_CHOL=0 python benchmarks/kmm_probe.py --e2e
    NMGP_UNROLLED_CHOL=1 python benchmarks/kmm_probe.py --e2e
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _best(fn, reps=5):
    fn()  # compile / warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def micro():
    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.ops import blocked

    n, n_rhs = 128, 4000
    rng = np.random.default_rng(0)
    a = rng.normal(size=(n, n))
    spd = jnp.asarray(a @ a.T / n + 2.0 * np.eye(n), jnp.float64)
    rhs = jnp.asarray(rng.normal(size=(n, n_rhs)), jnp.float64)
    y = jnp.asarray(rng.normal(size=n), jnp.float64)

    f_xla = jax.jit(jnp.linalg.cholesky)
    f_un = jax.jit(blocked.unrolled_cholesky)
    t_xla = _best(lambda: jax.block_until_ready(f_xla(spd)))
    t_un = _best(lambda: jax.block_until_ready(f_un(spd)))
    print(f"forward factor n={n}: xla {1e3*t_xla:.2f} ms, "
          f"unrolled {1e3*t_un:.2f} ms ({t_xla/t_un:.1f}x)")
    np.testing.assert_allclose(np.asarray(f_un(spd)), np.asarray(f_xla(spd)),
                               atol=1e-10)

    def ldq(kern):
        def f(m):
            l = kern(m)
            z = jax.scipy.linalg.solve_triangular(l, y, lower=True)
            return 2.0 * jnp.sum(jnp.log(jnp.diag(l))) + jnp.sum(z * z)
        return jax.jit(jax.value_and_grad(f))

    g_xla, g_un = ldq(jnp.linalg.cholesky), ldq(blocked.unrolled_cholesky)
    t_gx = _best(lambda: jax.block_until_ready(g_xla(spd)[1]))
    t_gu = _best(lambda: jax.block_until_ready(g_un(spd)[1]))
    print(f"value+grad logdet+quad: xla {1e3*t_gx:.2f} ms, "
          f"unrolled {1e3*t_gu:.2f} ms ({t_gx/t_gu:.1f}x)")
    np.testing.assert_allclose(np.asarray(g_un(spd)[1]),
                               np.asarray(g_xla(spd)[1]), atol=1e-9)

    l = f_xla(spd)
    s_sub = jax.jit(lambda lm, b: jax.scipy.linalg.solve_triangular(
        lm, b, lower=True))
    s_inv = jax.jit(lambda lm, b: blocked.unrolled_tri_inv(lm) @ b)
    t_sub = _best(lambda: jax.block_until_ready(s_sub(l, rhs)))
    t_inv = _best(lambda: jax.block_until_ready(s_inv(l, rhs)))
    print(f"m-solve ({n},{n_rhs}): substitution {1e3*t_sub:.2f} ms, "
          f"tri_inv GEMM {1e3*t_inv:.2f} ms ({t_sub/t_inv:.1f}x)")
    np.testing.assert_allclose(np.asarray(s_inv(l, rhs)),
                               np.asarray(s_sub(l, rhs)), atol=1e-8)


def e2e():
    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu import settings
    from nonstationary_multivariate_gaussian_process_tpu.models import (
        FullData, gnmgp_sparse,
    )
    from nonstationary_multivariate_gaussian_process_tpu.ops import chol

    m = 2
    t = m * (m + 1) // 2
    rng = np.random.default_rng(4)
    n = int(os.environ.get("NMGP_BENCH_SPARSE_N", "2000"))
    mz_req = int(os.environ.get("NMGP_BENCH_SPARSE_MZ", "64"))
    xs = jnp.asarray(np.sort(rng.uniform(size=n)), settings.dtype)
    ys = jnp.asarray(rng.normal(size=(n, m)), settings.dtype)
    snlp, ops = gnmgp_sparse.make_objective(FullData(xs, ys),
                                            n_inducing=mz_req)
    mz = int(ops.z.shape[0])
    v = jnp.asarray(np.concatenate([
        -1.0 + 0.1 * rng.normal(size=mz), 0.3 * rng.normal(size=mz * t),
        [-4.0],
    ]), settings.dtype)

    n_evals = 40

    def scan(v):
        def body(c, _):
            val, g = jax.value_and_grad(snlp)(c)
            return c + 0.0 * g, val
        return jax.lax.scan(body, v, None, length=n_evals)[1][-1]

    fn = jax.jit(scan)
    t0 = time.perf_counter()
    val = float(fn(v))
    print(f"compile+first {time.perf_counter()-t0:.1f}s  value {val:.6f}")
    rate = max(n_evals / _best(lambda: float(fn(v)), reps=3)
               for _ in range(1))
    print(f"unrolled={'on' if chol.use_unrolled(jnp.zeros((mz*m, mz*m), jnp.float64)) else 'off'} "
          f"precision={settings.precision_mode} "
          f"sparse grad evals/sec: {rate:.1f}")


def breakdown():
    """Segment timing of the mixed sparse objective: where do the 21 ms/eval
    actually go?  Times nested prefixes of the computation (assembly →
    half-Woodbury → full likelihood → likelihood+prior), each as a scan of
    value_and_grad, so successive differences attribute the wall."""
    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu import settings
    from nonstationary_multivariate_gaussian_process_tpu.models import (
        FullData, gnmgp_sparse as gsp,
    )

    m = 2
    t = m * (m + 1) // 2
    rng = np.random.default_rng(4)
    n = int(os.environ.get("NMGP_BENCH_SPARSE_N", "2000"))
    mz_req = int(os.environ.get("NMGP_BENCH_SPARSE_MZ", "64"))
    xs = jnp.asarray(np.sort(rng.uniform(size=n)), settings.dtype)
    ys = jnp.asarray(rng.normal(size=(n, m)), settings.dtype)
    data = FullData(xs, ys)
    snlp, ops = gsp.make_objective(data, n_inducing=mz_req)
    mz = int(ops.z.shape[0])
    v = jnp.asarray(np.concatenate([
        -1.0 + 0.1 * rng.normal(size=mz), 0.3 * rng.normal(size=mz * t),
        [-4.0],
    ]), settings.dtype)

    def f_latents(vec):
        p = gsp.unpack(vec, mz, m)
        tl_x, ul_x = gsp.latents_at_data(p, ops, m, None)
        return jnp.sum(tl_x) + jnp.sum(ul_x) + jnp.sum(p.tilde_sigma2_err)

    def f_assemble(vec):
        p = gsp.unpack(vec, mz, m)
        k_mm, k_nm, k_diag, y_flat, mv = gsp._assemble_full(
            p, data, ops, m, None, None)
        return jnp.sum(k_mm) + jnp.sum(k_nm) + jnp.sum(k_diag)

    def f_half(vec):
        p = gsp.unpack(vec, mz, m)
        k_mm, k_nm, k_diag, y_flat, mv = gsp._assemble_full(
            p, data, ops, m, None, None)
        a, lam, d, corr, c_mm = gsp._half_woodbury(
            k_mm, k_nm, k_diag, y_flat, jnp.exp(p.tilde_sigma2_err),
            "fitc", mv)
        return jnp.sum(a * a) + jnp.sum(d * d) + jnp.sum(jnp.log(lam))

    def f_loglik(vec):
        p = gsp.unpack(vec, mz, m)
        return gsp.log_lik(p, data, ops)

    n_evals = 30

    def rate_of(f, label):
        def scan(v):
            def body(c, _):
                val, g = jax.value_and_grad(f)(c)
                return c + 0.0 * g, val
            return jax.lax.scan(body, v, None, length=n_evals)[1][-1]
        fn = jax.jit(scan)
        t0 = time.perf_counter()
        float(fn(v))
        print(f"  [{label}] compile {time.perf_counter()-t0:.1f}s",
              flush=True)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            float(fn(v))
            r = n_evals / (time.perf_counter() - t0)
            best = r if best is None else max(best, r)
        ms = 1e3 / best
        print(f"  [{label}] {best:.1f} evals/s = {ms:.2f} ms/eval",
              flush=True)
        return ms

    ms_lat = rate_of(f_latents, "latents-only")
    ms_asm = rate_of(f_assemble, "assembly")
    ms_half = rate_of(f_half, "half-woodbury")
    ms_lik = rate_of(f_loglik, "full loglik")
    ms_full = rate_of(snlp, "loglik+prior")
    print(f"attribution (ms/eval): latents {ms_lat:.2f}, "
          f"+assembly {ms_asm-ms_lat:.2f}, +factor/solve {ms_half-ms_asm:.2f}, "
          f"+inner/logdet {ms_lik-ms_half:.2f}, +prior {ms_full-ms_lik:.2f}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--breakdown", action="store_true")
    args = ap.parse_args()
    if args.breakdown:
        breakdown()
    elif args.e2e:
        e2e()
    else:
        micro()
