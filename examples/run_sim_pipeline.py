"""Single-subject synthetic pipeline driver.

Equivalent of the reference's base drivers (``Nonseparable_model.py``
``__main__``, ``Separable_model.py``, ``Stationary_model.py``): generate (or
load) one synthetic subject, run empirical init → MAP (→ HMC) → grid/test
prediction → scores, and write figures + artifacts.

    python examples/run_sim_pipeline.py --model gnmgp --n 200 --n-opt 1000 \
        --out res/sim_nonseparable
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from nonstationary_multivariate_gaussian_process_tpu import viz, workflows
from nonstationary_multivariate_gaussian_process_tpu.data import io as data_io, sim
from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gnmgp",
                    choices=["lmc", "snmgp", "gnmgp", "gnmgp_hetero",
                             "gnmgp_sparse", "gnmgp_hetero_sparse",
                             "snmgp_sparse", "lmc_sparse"])
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--n-inducing", type=int, default=64,
                    help="gnmgp_sparse: inducing-input count (the large-N "
                         "tier: O(N M (mM)^2) likelihood)")
    ap.add_argument("--sparse-approx", default="fitc",
                    choices=["fitc", "vfe"])
    ap.add_argument("--n-opt", type=int, default=1000)
    ap.add_argument("--map-method", default="lbfgs",
                    choices=["lbfgs", "adam"],
                    help="MAP engine (lbfgs default: deeper optima in ~10x "
                         "fewer iterations, measured in ROADMAP; adam = the "
                         "reference contract)")
    ap.add_argument("--n-hmc", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--sampler", default="hmc",
                    choices=["hmc", "nuts", "drhmc", "rmhmc", "chees", "smc",
                             "pathfinder"])
    ap.add_argument("--smc-ref", default="prior",
                    choices=["prior", "pathfinder"],
                    help="SMC reference distribution (sampler=smc): prior "
                         "N(0,I) or multipathfinder posterior moments "
                         "(shorter tempering path)")
    ap.add_argument("--whiten", default="off",
                    choices=["off", "prior", "pncp"],
                    help="sampling reparameterization: prior-whitened latent "
                         "blocks, or partially non-centered (pilot-retuned)")
    ap.add_argument("--hmc-step-size", type=float, default=1e-4)
    ap.add_argument("--test-size", type=float, default=0.25)
    ap.add_argument("--data", default=None, help="optional sim_MNTS pickle to load")
    ap.add_argument("--out", default="res/sim")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.data:
        loaded = data_io.load_sim_pickle(args.data)
        x, y = loaded["x"], loaded["y"]
    else:
        gen = (sim.sim_mnts_hetero
               if args.model in ("gnmgp_hetero", "gnmgp_hetero_sparse")
               else sim.sim_mnts)
        d = gen(jax.random.PRNGKey(args.seed), n=args.n)
        x, y = np.asarray(d.x), np.asarray(d.y)

    hyper = (
        {"alpha_tilde_l": 10.0, "beta_tilde_l": 1.0, "alpha_L": 10.0, "beta_L": 1.0}
        if args.model in ("gnmgp", "gnmgp_sparse")
        else {}
    )
    cfg = workflows.PipelineConfig(
        model=args.model, n_opt=args.n_opt, do_hmc=args.n_hmc > 0,
        map_method=args.map_method,
        n_hmc=max(args.n_hmc, 1), test_size=args.test_size, hyper=hyper,
        seed=args.seed, sampler=args.sampler, smc_ref=args.smc_ref,
        whiten=False if args.whiten == "off" else args.whiten,
        hmc_step_size=args.hmc_step_size,
        n_inducing=args.n_inducing, sparse_approx=args.sparse_approx,
    )
    store = ArtifactStore(args.out)
    res = workflows.run_subject(x, y, cfg, store=store, dataset="sim", subject=args.seed)

    viz.plot_posterior(
        os.path.join(args.out, "posterior.png"), res["grid"],
        np.asarray(res["pred_grid"].percentiles), x=x[: res["n"]], y=y[: res["n"]],
    )
    if "target_hist" in res:
        viz.plot_target_trace(os.path.join(args.out, "target_trace.png"),
                              res["target_hist"])
    summary = {
        k: float(v) for k, v in res.items()
        if isinstance(v, (int, float)) and np.isfinite(v)
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
