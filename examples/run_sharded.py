"""Model-parallel GNMGP fit: one subject's Gram sharded across the mesh.

The subject-parallel fleet (examples/run_fleet.py) shards *subjects*; this
driver shards *one subject's likelihood* — the matrix-free row-band objective
(parallel/sharded_obj.py) lets MN grow past a single chip's HBM.  MAP runs
through the ordinary engine (the sharded closure drops into fit_map), and a
short whitened HMC chain demonstrates sampling through the same path.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/run_sharded.py --n 256 --block 32 --check

``--check`` also evaluates the single-device objective at the fitted point
and reports the relative difference (only at sizes one device can hold).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--model", default="gnmgp",
                    choices=["gnmgp", "gnmgp_hetero"],
                    help="dense-Gram model family to shard")
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--n-opt", type=int, default=100)
    ap.add_argument("--map-method", default="adam", choices=["adam", "lbfgs"],
                    help="lbfgs: each linesearch probe is one sharded sweep")
    ap.add_argument("--n-hmc", type=int, default=0, help="whitened HMC draws (0 = skip)")
    ap.add_argument("--n-grid", type=int, default=0,
                    help="grid points for sharded MAP prediction (0 = skip)")
    ap.add_argument("--check", action="store_true",
                    help="compare against the single-device objective")
    ap.add_argument("--out", default=None,
                    help="artifact root: per-stage npz + manifest, with "
                         "idempotent resume (a stored MAP skips refitting)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.inference import (
        hmc, map as map_mod, whiten,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models import (
        gnmgp, gnmgp_hetero,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData
    from nonstationary_multivariate_gaussian_process_tpu.parallel import (
        make_mesh, sharded_obj,
    )

    mesh = make_mesh()
    model = gnmgp_hetero if args.model == "gnmgp_hetero" else gnmgp
    gen = sim.sim_mnts_hetero if args.model == "gnmgp_hetero" else sim.sim_mnts
    d = gen(jax.random.PRNGKey(0), n=args.n)
    data = FullData(jnp.asarray(d.x), jnp.asarray(d.y))
    n, m = data.y.shape
    out = {"model": args.model, "n": n, "m": m, "mn": n * m,
           "devices": int(mesh.devices.size), "block": args.block}

    store = None
    # the key carries every input that shapes the fit, so changing --n-opt
    # (or the size) invalidates the stored MAP instead of resuming stale work
    dataset = f"sharded_n{n}_opt{args.n_opt}_b{args.block}"
    map_key = None
    if args.out:
        from nonstationary_multivariate_gaussian_process_tpu.utils import (
            ArtifactStore,
        )

        store = ArtifactStore(args.out)
        map_key = ArtifactStore.key(args.model, dataset, 0, "map")
        # the data stage makes the fit servable: serving.PredictEngine(root,
        # model=..., dataset=...) stands up straight from this store
        store.save(ArtifactStore.key(args.model, dataset, 0, "data"),
                   x=np.asarray(data.x), y=np.asarray(data.y))

    nlp = sharded_obj.make_objective_sharded(data, mesh=mesh,
                                             block=args.block, model=args.model)
    if store is not None and store.exists(map_key):
        vec = jnp.asarray(store.load(map_key)["vec"])
        out["map_seconds"] = 0.0
        out["map_resumed"] = True

        class _Res:  # minimal stand-in for the fit result
            pass

        res = _Res()
        res.vec = vec
    else:
        t0 = time.time()
        res = map_mod.fit_map(nlp, jnp.zeros(model.n_params(n, m)),
                              n_iters=args.n_opt, lr=0.1,
                              method=args.map_method)
        out["map_seconds"] = round(time.time() - t0, 2)
        if store is not None:
            store.save(map_key, vec=np.asarray(res.vec))
    out["final_nlp"] = float(nlp(res.vec))
    assert np.isfinite(out["final_nlp"])

    if args.check:
        nlp_single = model.make_objective(data)
        ref = float(nlp_single(res.vec))
        out["single_device_nlp"] = ref
        out["rel_diff"] = abs(out["final_nlp"] - ref) / max(1.0, abs(ref))

    if args.n_grid > 0:
        t0 = time.time()
        grid = jnp.linspace(float(data.x.min()), float(data.x.max()), args.n_grid)
        gp = sharded_obj.predict_map_sharded(
            res.vec, data, grid, mesh=mesh, block=args.block, model=args.model
        )
        out["pred_seconds"] = round(time.time() - t0, 2)
        out["pred_mean_shape"] = list(np.asarray(gp.mean).shape)
        assert np.all(np.isfinite(np.asarray(gp.mean)))
        assert np.all(np.isfinite(np.asarray(gp.std)))
        if store is not None:
            store.save(ArtifactStore.key(args.model, dataset, 0, "pred_grid"),
                       percentiles=np.asarray(gp.percentiles),
                       grid=np.asarray(grid))

    if args.n_hmc > 0:
        w = whiten.make_whitener(args.model, data.x, n, m)
        t0 = time.time()
        chain = hmc.hmc_sample(
            w.wrap(nlp), w.to_white(res.vec), args.n_hmc, jax.random.PRNGKey(1),
            step_size=1e-2, n_leapfrog=10, n_warmup=args.n_hmc, adapt_step_size=True,
        )
        out["hmc_seconds"] = round(time.time() - t0, 2)
        out["hmc_accept"] = float(np.mean(np.asarray(chain.accept_prob)))
        samples = np.asarray(w.from_white_batch(chain.samples))
        assert np.all(np.isfinite(samples))
        if store is not None:
            store.save(ArtifactStore.key(args.model, dataset, 0, "hmc"),
                       samples=samples)
        if args.n_grid > 0 and args.model == "gnmgp":
            # chain-sample prediction through the sharded sweep (one
            # factorization per retained draw — the honest per-draw cost)
            t0 = time.time()
            ys = sharded_obj.predict_sample_sharded(
                jax.random.PRNGKey(2), jnp.asarray(samples), data, grid,
                mesh=mesh, block=args.block, n_sample=min(8, args.n_hmc),
            )
            out["pred_sample_seconds"] = round(time.time() - t0, 2)
            out["pred_sample_shape"] = list(np.asarray(ys).shape)
            assert np.all(np.isfinite(np.asarray(ys)))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
