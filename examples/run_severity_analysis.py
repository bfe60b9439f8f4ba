"""Correlation-vs-severity population analysis driver.

End-to-end equivalent of the reference's scientific post-processing
(``Post_Process/extract_individual_results.py`` + ``LAPS2_correlation.py`` +
``z_value_plot.py``): fit GNMGP per subject, predict the covariance process
at severity timestamps, summarize each subject's correlation posterior, run
population t/z/sign tests between two groups, and emit the annotated
statistic heatmap plus per-subject PDF pages.

Runs on synthetic data (the reference's severity CSV is private); pass real
per-subject series + severity times through the same functions.

    python examples/run_severity_analysis.py --subjects 6 --out res/severity
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu import viz, workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.models import FullData
from nonstationary_multivariate_gaussian_process_tpu.postprocess import (
    severity,
    stats as pop_stats,
)
from nonstationary_multivariate_gaussian_process_tpu.predict import gnmgp as pred_gnmgp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=6)
    ap.add_argument("--n", type=int, default=48)
    ap.add_argument("--n-opt", type=int, default=200)
    ap.add_argument("--n-sample", type=int, default=60)
    ap.add_argument("--out", default="res/severity")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    keys = jax.random.split(jax.random.PRNGKey(0), args.subjects)
    cfg = workflows.PipelineConfig(model="gnmgp", n_opt=args.n_opt, test_size=0.0)

    per_subject_mean = []
    pdf_pages = {}
    n_records = {}
    waiting_time = {}
    for i, k in enumerate(keys):
        # ragged record counts, as a real cohort would have
        n_i = args.n - 4 * (i % 3)
        d = sim.sim_mnts(k, n=n_i)
        n_records[f"id{i}"] = n_i
        # stay length in hours: map the unit observation window to 5-20 days
        waiting_time[f"id{i}"] = 24.0 * (5.0 + 15.0 * (i + 1) / args.subjects)
        res = workflows.run_subject(np.asarray(d.x), np.asarray(d.y), cfg, subject=i)
        # severity timestamps: an irregular subset of the observation window
        sev_times = np.sort(
            np.random.default_rng(i).uniform(float(d.x.min()), float(d.x.max()), 10)
        )
        data = FullData(d.x, d.y)
        grid = jnp.linspace(float(d.x.min()), float(d.x.max()), 60)
        lf = pred_gnmgp.predict_map_sampling(
            jax.random.fold_in(jax.random.PRNGKey(1), i), args.n_sample,
            res["map_vec"], data, grid, pred_cov=True,
        )  # (G, S, M, M)
        cor = severity.correlation_draws_from_lf(np.asarray(lf))  # (G, S)
        aligned = severity.align_to_severity(np.asarray(grid), cor, sev_times)  # (T, S)
        summ = severity.subject_summary(aligned)
        per_subject_mean.append(summ["mean"])
        q = np.percentile(cor, [2.5, 50, 97.5], axis=1)
        pdf_pages[f"id{i}"] = {"x": np.asarray(grid), "cor_q": q}

    per_subject_mean = np.asarray(per_subject_mean)
    half = len(per_subject_mean) // 2
    tests = severity.population_tests(per_subject_mean[:half], per_subject_mean[half:])
    one_group = severity.population_tests(per_subject_mean)

    viz.correlation_pdf_pages(os.path.join(args.out, "correlation_processes.pdf"), pdf_pages)
    viz.annotated_heatmap(
        os.path.join(args.out, "z_values.png"),
        np.asarray([[np.nan, one_group["z_value"]], [one_group["z_value"], np.nan]]),
        ["Dim 1", "Dim 2"], ["Dim 1", "Dim 2"],
    )

    # population analyses over the cohort's record counts and stay lengths
    # (LAPS2_correlation.py:66-233, data-agnostic: the reference's KAISER
    # pickles become the n_records/waiting_time/groups dicts)
    groups = {
        "group_a": [f"id{i}" for i in range(half)],
        "group_b": [f"id{i}" for i in range(half, len(per_subject_mean))],
    }
    ds = pop_stats.datasize_analysis(n_records, waiting_time, groups)
    viz.group_histograms(
        os.path.join(args.out, "record_counts.png"),
        {g: rec["n_records"] for g, rec in ds["groups"].items()}, bins=10,
    )
    corr_by_id = {f"id{i}": float(m) for i, m in enumerate(per_subject_mean)}
    wt = pop_stats.waitingtime_vs_correlation(corr_by_id, waiting_time, groups)
    viz.waiting_time_figure(os.path.join(args.out, "corr_vs_waiting.png"), wt)

    print(json.dumps({
        "group_difference": tests,
        "vs_zero": one_group,
        "datasize": {
            "records_range": ds["records_range"],
            **{g: {"n_subjects": rec["n_subjects"],
                   "median_records": rec["median_records"]}
               for g, rec in ds["groups"].items()},
        },
        "waiting_time_days": {g: wt[g]["days"].tolist() for g in wt},
    }, indent=1))


if __name__ == "__main__":
    main()
