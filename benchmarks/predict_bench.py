"""Prediction-layer benchmark: batched grid prediction vs the reference's
per-grid-point refactorization loop.

The reference's hottest code (SURVEY §3.4) is GNMGP grid prediction: for each
of G grid points (× each posterior draw) it rebuilds and eigendecomposes the
MN×MN Gram (``Utility/prediction.py:1148-1160``).  This framework factorizes
once and serves every grid point with one batched triangular solve.

Measures, on the current backend:

* ours: full `predict.gnmgp.predict_map` wall-clock for (N, G),
* reference-style cost: one torch-CPU (eigh + per-point solve) iteration,
  multiplied by G (the loop is embarrassingly sequential in the reference).

    python benchmarks/predict_bench.py [--n 1000] [--grid 201]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("NMGP_ROBUST_CHOL", "0")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--grid", type=int, default=201)
    ap.add_argument("--skip-torch", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu import settings
    from nonstationary_multivariate_gaussian_process_tpu.models import FullData
    from nonstationary_multivariate_gaussian_process_tpu.predict import gnmgp as pred

    n, m, g = args.n, args.m, args.grid
    t = m * (m + 1) // 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(size=n)), settings.dtype)
    y = jnp.asarray(rng.normal(size=(n, m)), settings.dtype)
    vec = jnp.asarray(
        np.concatenate([-1 + 0.1 * rng.normal(size=n), 0.3 * rng.normal(size=n * t), [-4.0]]),
        settings.dtype,
    )
    grid = jnp.linspace(0.01, 0.99, g)
    data = FullData(x, y)

    fn = jax.jit(lambda v: pred.predict_map(v, data, grid))
    out = fn(vec)
    out.mean.block_until_ready()
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(vec)
    out.mean.block_until_ready()
    ours_s = (time.perf_counter() - t0) / reps
    print(f"[predict-bench] ours: full {g}-point grid in {ours_s*1e3:.1f} ms", file=sys.stderr)

    ref_s = None
    if not args.skip_torch:
        import torch

        torch.set_default_dtype(torch.float64)
        mn = n * m
        a = torch.randn(mn, 8)
        cov = a @ a.T / 8 + 2.0 * torch.eye(mn)
        yv = torch.randn(mn)
        t0 = time.perf_counter()
        # one iteration of the reference's per-grid-point inner loop:
        # symeig of the MN x MN Gram + inverse application (prediction.py:1158-1160)
        w, v = torch.linalg.eigh(cov)
        inv = (v * (1.0 / (w + 0.01))) @ v.T
        _ = inv @ yv
        per_point = time.perf_counter() - t0
        ref_s = per_point * g
        print(
            f"[predict-bench] reference-style: {per_point*1e3:.1f} ms/point x {g} points"
            f" = {ref_s:.1f} s",
            file=sys.stderr,
        )

    print(
        json.dumps(
            {
                "metric": f"gnmgp_predict_map_n{n}_g{g}_ms",
                "value": round(ours_s * 1e3, 2),
                "unit": "ms",
                "vs_baseline": round(ref_s / ours_s, 1) if ref_s else None,
                "reference_loop_estimate_s": round(ref_s, 2) if ref_s else None,
                "dtype": "float64" if os.environ.get("NMGP_X64", "1") != "0" else "float32",
            }
        )
    )


if __name__ == "__main__":
    main()
