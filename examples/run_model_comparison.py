"""Model-family comparison on one dataset: LMC vs SNMGP vs GNMGP.

The reference compares families across replicates with G/P/D + PMSE boxplots
(``SIM_code/res_summary.py:38-86,209-263``) and paired per-ID RMSE scores
(``Post_Process/past/model_comparison.py``); this driver runs the same
comparison on one subject (or several seeds) as one command: identical
train/test splits per seed, all three families fitted, information criteria
and held-out scores tabulated, pairwise improvements reported.

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
        python examples/run_model_comparison.py --n 64 --seeds 2 --n-opt 200
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MODELS = ("lmc", "snmgp", "gnmgp")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of independent replicates")
    ap.add_argument("--n-opt", type=int, default=400)
    ap.add_argument("--n-hmc", type=int, default=0,
                    help="HMC draws for DIC (0 = AIC/BIC only)")
    ap.add_argument("--evidence", action="store_true",
                    help="also estimate each family's log marginal "
                         "likelihood by tempered SMC (inference/smc.py) and "
                         "report pairwise log Bayes factors -- exact model "
                         "comparison where AIC/BIC/DIC are asymptotic "
                         "approximations (lmc is skipped: no latent-GP "
                         "blocks to whiten, so no tractable reference)")
    ap.add_argument("--smc-particles", type=int, default=512)
    ap.add_argument("--loo", action="store_true",
                    help="with --n-hmc: also report WAIC and PSIS-LOO from "
                         "the chain (exact joint-MVN LOO conditionals, "
                         "evaluate.psis_loo) -- the modern fully-Bayesian "
                         "criteria beyond the reference's AIC/BIC/DIC")
    ap.add_argument("--test-size", type=float, default=0.25)
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args()

    import jax

    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.postprocess import (
        stats, summary,
    )

    import dataclasses

    per_model_scores = {m: [] for m in MODELS}
    evidence_by_model = {m: [] for m in MODELS}
    rmse_by_model = {m: {} for m in MODELS}
    loo_pointwise = {m: [] for m in MODELS}
    for seed in range(args.seeds):
        d = sim.sim_mnts(jax.random.PRNGKey(seed), n=args.n)
        x, y = np.asarray(d.x), np.asarray(d.y)
        for model in MODELS:
            cfg = workflows.PipelineConfig(
                model=model, n_opt=args.n_opt, test_size=args.test_size,
                do_hmc=args.n_hmc > 0, n_hmc=max(args.n_hmc, 1),
                whiten=args.n_hmc > 0 and model != "lmc",
                do_pred_grid=False, do_map_analysis=False, seed=seed,
                do_loo=args.loo and args.n_hmc > 0,
            )
            if args.evidence and model != "lmc":
                cfg = dataclasses.replace(
                    cfg, do_hmc=True, sampler="smc", whiten=True,
                    n_hmc=max(args.n_hmc, 64),
                    smc_particles=args.smc_particles,
                )
            res = workflows.run_subject(x, y, cfg)
            scores = {
                k: float(res[k])
                for k in ("deviance", "aic", "bic", "dic", "test_rmse",
                          "test_lpd", "test_pmse")
                if k in res
            }
            if "loo" in res:
                scores.update({
                    k: float(v) for k, v in res["loo"].items()
                    if np.ndim(v) == 0
                })
                loo_pointwise[model].append(np.asarray(res["loo"]["pointwise"]))
            if args.evidence and "sampling" in res \
                    and "log_evidence" in res["sampling"]:
                scores["log_evidence"] = res["sampling"]["log_evidence"]
                evidence_by_model[model].append(scores["log_evidence"])
            per_model_scores[model].append(scores)
            rmse_by_model[model][seed] = scores.get("test_rmse", float("nan"))
            print(f"[compare] seed={seed} {model}: " + json.dumps(scores),
                  file=sys.stderr)

    table = summary.compare_models_gpd(per_model_scores)
    report = {
        m: {k: {"median": v["median"], "mean": v["mean"]} for k, v in t.items()}
        for m, t in table.items()
    }
    pairs = {}
    for a, b in (("lmc", "snmgp"), ("lmc", "gnmgp"), ("snmgp", "gnmgp")):
        imp = stats.paired_improvement(rmse_by_model[a], rmse_by_model[b])
        pairs[f"{b}_vs_{a}"] = {
            "mean_rmse_improvement": imp["mean"],
            "frac_improved": imp["frac_improved"],
        }
    out = {"n": args.n, "seeds": args.seeds, "scores": report,
           "paired_rmse": pairs}
    done_loo = [m for m in MODELS if len(loo_pointwise[m]) == args.seeds]
    if len(done_loo) >= 2:
        from nonstationary_multivariate_gaussian_process_tpu import evaluate

        # identical splits per seed => pointwise elpds pair across models;
        # concatenating seeds gives one paired comparison over all points
        cat = {m: np.concatenate(loo_pointwise[m]) for m in done_loo}
        out["loo_compare"] = {
            f"{b}_vs_{a}": evaluate.loo_compare(cat[a], cat[b])
            for i, a in enumerate(done_loo) for b in done_loo[i + 1:]
        }
        w = evaluate.stacking_weights([cat[m] for m in done_loo])
        out["stacking_weights"] = {m: float(wk) for m, wk in zip(done_loo, w)}
    if args.evidence:
        # mean log Bayes factor per pair (positive favors the second family)
        bf = {}
        for a, b in (("snmgp", "gnmgp"),):
            if evidence_by_model[a] and evidence_by_model[b]:
                diffs = [zb - za for za, zb in
                         zip(evidence_by_model[a], evidence_by_model[b])]
                bf[f"{b}_vs_{a}"] = {
                    "mean_log_bayes_factor": float(np.mean(diffs)),
                    "per_seed": [float(v) for v in diffs],
                }
        out["log_evidence"] = {
            m: [float(v) for v in vs] for m, vs in evidence_by_model.items() if vs
        }
        out["bayes_factors"] = bf
    text = json.dumps(out, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
    print(text)


if __name__ == "__main__":
    main()
