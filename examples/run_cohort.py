"""Ragged-cohort driver: the reference's KAISER fleet scripts
(``*_mpiKAISER``, ``*_distributed``) as one bucketed mesh program.

Accepts the reference's ``kaiser_distributed.pickle`` format ({ID: (x, Y)}),
or generates a synthetic ragged cohort for demonstration.

    python examples/run_cohort.py --model gnmgp --data kaiser_distributed.pickle \
        --extrapolation 5 --out res/cohort
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import io as data_io, sim
from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore


def synthetic_cohort(n_subjects, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n_subjects)
    rng = np.random.default_rng(seed)
    out = {}
    for i, k in enumerate(keys):
        n = int(rng.integers(40, 80))
        d = sim.sim_mnts(k, n=n)
        out[f"id{i:04d}"] = (np.asarray(d.x), np.asarray(d.y))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gnmgp",
                    choices=["lmc", "snmgp", "gnmgp", "gnmgp_hetero",
                             "gnmgp_sparse", "gnmgp_hetero_sparse",
                             "snmgp_sparse", "lmc_sparse"])
    ap.add_argument("--n-inducing", type=int, default=64,
                    help="*_sparse models: inducing-input count per bucket "
                         "(the large-N tier)")
    ap.add_argument("--data", default=None, help="kaiser_distributed.pickle path")
    ap.add_argument("--subjects", type=int, default=8)
    ap.add_argument("--n-opt", type=int, default=300)
    ap.add_argument("--map-method", default="lbfgs",
                    choices=["lbfgs", "adam"],
                    help="MAP engine (lbfgs default — measured better; "
                         "adam = the reference contract)")
    ap.add_argument("--n-hmc", type=int, default=0,
                    help="posterior draws per subject (0 = MAP only); the "
                         "default posture is whitened adaptive NUTS with "
                         "--chains jittered chains, and per-subject min-ESS/"
                         "split-R-hat are reported")
    ap.add_argument("--chains", type=int, default=2)
    ap.add_argument("--loo", action="store_true",
                    help="with --n-hmc: per-subject WAIC + PSIS-LOO from "
                         "the draws (exact joint-MVN LOO conditionals)")
    ap.add_argument("--extrapolation", type=int, default=5)
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--sharded-threshold", type=int, default=None,
                    help="subjects above this N fit through the "
                         "model-parallel sharded objective")
    ap.add_argument("--out", default="res/cohort")
    args = ap.parse_args()

    subjects = (
        data_io.load_kaiser_distributed(args.data)
        if args.data
        else synthetic_cohort(args.subjects)
    )
    cfg = workflows.PipelineConfig(
        model=args.model, n_opt=args.n_opt, map_method=args.map_method,
        n_inducing=args.n_inducing,
        do_hmc=args.n_hmc > 0, n_hmc=max(args.n_hmc, 1),
        n_chains=args.chains, do_loo=args.loo and args.n_hmc > 0,
    )
    store = ArtifactStore(args.out)
    out = workflows.run_cohort(
        subjects, cfg, store=store, n_buckets=args.buckets,
        extrapolation_size=args.extrapolation,
        sharded_threshold=args.sharded_threshold,
    )
    report = dict(out["reduction"])
    if args.n_hmc > 0:
        samp = [rec["sampling"] for rec in out["subjects"].values()
                if "sampling" in rec]
        report["sampling"] = {
            "min_ess_worst": min(s["min_ess"] for s in samp),
            "max_rhat_worst": max(s["max_rhat"] for s in samp),
            "n_warned": sum("warning" in s for s in samp),
        }
    loos = [rec["loo"] for rec in out["subjects"].values() if "loo" in rec]
    if loos:
        report["loo"] = {
            "elpd_loo_sum": sum(l["elpd_loo"] for l in loos),
            "elpd_waic_sum": sum(l["elpd_waic"] for l in loos),
            "n_bad_k_total": sum(l["n_bad_k"] for l in loos),
            "per_subject_elpd_loo": {
                sid: rec["loo"]["elpd_loo"]
                for sid, rec in out["subjects"].items() if "loo" in rec
            },
        }
    print(json.dumps(report, indent=1, default=str))


if __name__ == "__main__":
    main()
