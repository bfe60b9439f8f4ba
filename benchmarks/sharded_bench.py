"""Sharded GNMGP likelihood on hardware: sweep overhead vs the monolith.

On one chip (D=1) the mesh-sharded factor+solve sweep buys no memory — this
bench quantifies the staging overhead it pays for the ability to exceed one
chip's HBM (the memory claim itself is validated on the 8-device CPU mesh,
tests/test_sharded_obj.py).  Prints one JSON object.

Run: ``python benchmarks/sharded_bench.py [--n 2048] [--block 512]``.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("NMGP_X64", "0")

import numpy as np


def log(msg):
    print(f"[sharded_bench] {msg}", file=sys.stderr, flush=True)


def timeit(fn, reps=5):
    fn()  # compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    return (time.time() - t0) / reps, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2048)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData
    from nonstationary_multivariate_gaussian_process_tpu.parallel import (
        make_mesh,
        sharded_obj,
    )

    dev = jax.devices()[0]
    log(f"platform={dev.platform} devices={jax.device_count()} "
        f"MN={args.n * args.m} block={args.block}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.sort(rng.uniform(size=args.n)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(args.n, args.m)), jnp.float32)
    vec = jnp.asarray(
        rng.normal(size=gnmgp.n_params(args.n, args.m)) * 0.1, jnp.float32
    )
    mesh = make_mesh()

    mono = jax.jit(
        lambda v: gnmgp.log_lik(gnmgp.unpack(v, args.n, args.m), FullData(x, y))
    )
    t_mono, ll_mono = timeit(lambda: jax.block_until_ready(mono(vec)))
    log(f"monolithic log_lik: {t_mono * 1e3:.1f} ms ({float(ll_mono):.3f})")

    t_sweep, ll_sweep = timeit(
        lambda: jax.block_until_ready(
            sharded_obj.loglik_sharded(vec, y, x, mesh=mesh, block=args.block)
        )
    )
    log(f"sharded sweep (D={mesh.devices.size}): {t_sweep * 1e3:.1f} ms "
        f"({float(ll_sweep):.3f})")

    rel = abs(float(ll_sweep) - float(ll_mono)) / abs(float(ll_mono))
    print(json.dumps({
        "platform": dev.platform,
        "devices": int(jax.device_count()),
        "mn": args.n * args.m,
        "block": args.block,
        "monolithic_ms": round(t_mono * 1e3, 2),
        "sharded_ms": round(t_sweep * 1e3, 2),
        "overhead_x": round(t_sweep / t_mono, 2),
        "rel_err": float(f"{rel:.2e}"),
    }))


if __name__ == "__main__":
    main()
