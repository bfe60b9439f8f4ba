"""Correlation-process vs severity-score analysis.

Data-agnostic re-design of the reference's KAISER-specific post-processing
(``Post_Process/extract_individual_results.py`` — align each patient's
posterior correlation process with LAPS2 severity timestamps — and the
population analyses of ``Post_Process/LAPS2_correlation.py:66-509``).  The
reference hardcodes the LAPS2 CSV loader from an external private repo; here
the severity series is an input.

Pipeline: per subject, evaluate the posterior correlation-process draws at the
severity timestamps (the GNMGP latent-prediction path provides draws of
L_f(x*) → R_f(x*)), then run population tests over per-subject summaries.
"""

from __future__ import annotations

import numpy as np

from . import stats as stats_mod


def correlation_draws_from_lf(lf_draws: np.ndarray, i: int = 0, j: int = 1) -> np.ndarray:
    """(G, S, M, M) L_f(x*) draws → (G, S) correlation-process draws R_ij."""
    lf = np.asarray(lf_draws)
    b = lf @ np.swapaxes(lf, -1, -2)
    d = np.sqrt(np.diagonal(b, axis1=-2, axis2=-1))
    return b[..., i, j] / (d[..., i] * d[..., j])


def align_to_severity(grid: np.ndarray, values: np.ndarray, severity_times: np.ndarray):
    """Nearest-grid-point alignment of per-grid posterior values to severity
    timestamps.  ``values``: (G, ...) → (T, ...)."""
    grid = np.asarray(grid)
    idx = np.abs(grid[None, :] - np.asarray(severity_times)[:, None]).argmin(axis=1)
    return np.asarray(values)[idx]


def subject_summary(cor_draws: np.ndarray):
    """Per-subject summary of aligned correlation draws (T, S)."""
    c = np.asarray(cor_draws)
    return {
        "mean": float(c.mean()),
        "mean_per_time": c.mean(axis=1),
        "q2.5": float(np.percentile(c, 2.5)),
        "q97.5": float(np.percentile(c, 97.5)),
    }


def population_tests(group_a: np.ndarray, group_b: np.ndarray | None = None):
    """Population tests on per-subject correlation summaries.

    With one group: t/z/sign tests of mean correlation = 0
    (LAPS2_correlation.py sepsis-vs-zero analysis).  With two groups: the same
    tests on the difference of matched-length samples.
    """
    x = np.asarray(group_a, float)
    if group_b is not None:
        b = np.asarray(group_b, float)
        k = min(len(x), len(b))
        x = x[:k] - b[:k]
    t_val, t_p = stats_mod.t_test(x)
    z_val, z_p = stats_mod.z_test(x)
    return {
        "t_value": t_val,
        "t_p": t_p,
        "z_value": z_val,
        "z_p": z_p,
        "sign_p": stats_mod.sign_test(x),
        "n": int(len(x)),
    }


def pairwise_test_matrix(per_subject_cors: np.ndarray, test: str = "z"):
    """Per-task-pair test statistics for the annotated heatmaps
    (``Post_Process/z_value_plot.py``).

    ``per_subject_cors``: (n_subjects, M, M) posterior-mean correlation per
    subject.  Returns (M, M) statistic and p-value matrices (NaN diagonal).
    """
    c = np.asarray(per_subject_cors)
    m = c.shape[-1]
    stat = np.full((m, m), np.nan)
    pval = np.full((m, m), np.nan)
    for i in range(m):
        for j in range(m):
            if i == j:
                continue
            x = c[:, i, j]
            if test == "z":
                stat[i, j], pval[i, j] = stats_mod.z_test(x)
            else:
                stat[i, j], pval[i, j] = stats_mod.t_test(x)
    return stat, pval
