"""Recovery-summary driver: fit all three model families to a replicate fleet
and summarize recovery of the known latent processes.

Equivalent of ``SIM_code/res_summary.py``: G/P/D + PMSE comparison across
LMC/SNMGP/GNMGP plus functional bands of the recovered log-lengthscale and
correlation processes overlaid on the truth.

    python examples/run_recovery_summary.py --replicates 16 --n 64 --out res/summary
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.postprocess import analysis, summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=8)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--n-opt", type=int, default=300)
    ap.add_argument("--out", default="res/summary")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    results = {}
    batch = None
    for model in ["lmc", "snmgp", "gnmgp"]:
        cfg = workflows.PipelineConfig(model=model, n_opt=args.n_opt)
        out = workflows.run_sim_fleet(
            n_replicates=args.replicates, n=args.n, cfg=cfg,
            key=jax.random.PRNGKey(0),
        )
        results[model] = out
        batch = out["batch"]

    # fleet objective comparison
    table = {
        model: out["fleet_metrics"] for model, out in results.items()
    }

    # GNMGP latent recovery: depth-based functional boxplots of log-l and
    # correlation vs truth (res_summary.py:88-157's statsmodels fboxplot
    # panels — the band-depth median and outlier replicates, not just a
    # pointwise percentile band)
    from nonstationary_multivariate_gaussian_process_tpu import viz

    gn = results["gnmgp"]["fleet"]
    n = args.n
    est_tilde_l = np.asarray(gn.vecs[:, :n])  # (S, N)
    x0 = np.asarray(batch.x[0])
    true_tl = np.log(np.asarray(batch.l[0]))
    fbox_l = summary.functional_boxplot(est_tilde_l)
    viz.functional_boxplot_figure(
        os.path.join(args.out, "recovery_log_l.png"), x0, fbox_l,
        curves=est_tilde_l, truth=true_tl,
        title="log lengthscale recovery (GNMGP)",
    )

    # correlation-process recovery
    cors = []
    for s in range(est_tilde_l.shape[0]):
        _, _, cor, _ = analysis.gnmgp_map_latents(np.asarray(gn.vecs[s]), n, 2)
        cors.append(cor[:, 0, 1])
    cors = np.stack(cors)
    fbox_c = summary.functional_boxplot(cors)
    viz.functional_boxplot_figure(
        os.path.join(args.out, "recovery_correlation.png"), x0, fbox_c,
        curves=cors, truth=np.asarray(batch.cors[0]),
        title="correlation-process recovery (GNMGP)",
    )

    table["recovery_outliers"] = {
        "log_l_outlier_replicates": fbox_l["outlier_idx"].tolist(),
        "correlation_outlier_replicates": fbox_c["outlier_idx"].tolist(),
        "log_l_median_replicate": fbox_l["median_idx"],
    }
    print(json.dumps(table, indent=1))


if __name__ == "__main__":
    main()
