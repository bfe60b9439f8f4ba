"""Replicate-fleet driver: the reference's ``srun -n 1000 *_mpisim.py`` +
``SIM_code/res_summary.py`` as one mesh-sharded program.

    python examples/run_fleet.py --model gnmgp --replicates 100 --n 200
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


from nonstationary_multivariate_gaussian_process_tpu import workflows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gnmgp",
                    choices=["lmc", "snmgp", "gnmgp", "gnmgp_hetero"])
    ap.add_argument("--replicates", type=int, default=8)
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--n-opt", type=int, default=500)
    ap.add_argument("--map-method", default="lbfgs",
                    choices=["lbfgs", "adam"])
    ap.add_argument("--n-hmc", type=int, default=0,
                    help="fleet HMC draws per replicate (0 = skip)")
    ap.add_argument("--whiten", action="store_true",
                    help="prior-whitened fleet chains (parallel.fleet)")
    ap.add_argument("--hmc-step-size", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    cfg = workflows.PipelineConfig(
        model=args.model, n_opt=args.n_opt, seed=args.seed,
        map_method=args.map_method,
        do_hmc=args.n_hmc > 0, n_hmc=max(args.n_hmc, 1), whiten=args.whiten,
        hmc_step_size=args.hmc_step_size, hmc_adapt=args.n_hmc > 0,
        hmc_warmup=max(args.n_hmc // 4, 10) if args.n_hmc else 0,
    )
    out = workflows.run_sim_fleet(n_replicates=args.replicates, n=args.n, cfg=cfg)
    report = dict(out["fleet_metrics"])
    if "hmc_samples" in out:
        report["hmc_samples_shape"] = list(out["hmc_samples"].shape)
    for k in ("tilde_l_rmse", "tilde_l_corr_mean"):
        if k in out:
            report[k] = float(out[k])
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
