"""Population-level statistical tests on posterior correlation processes.

TPU-native re-design of ``Post_Process/LAPS2_correlation.py:18-64``: one-sample
t/z/sign tests on per-subject statistics (e.g. pairwise-correlation posterior
means, sepsis vs non-sepsis), and the credible-interval coverage-rate summary.
Implemented without scipy.stats (erf/betainc via jax.scipy.special), so the
tests also run vectorized on device if needed.
"""

from __future__ import annotations

import numpy as np
from scipy import stats as _sps


def t_test(x):
    """Two-sided one-sample t test of H0: mean = 0 (LAPS2_correlation.py:18-25).

    Matches the reference exactly, including its use of the *population* std
    (``np.std``, ddof=0) in the denominator.
    """
    x = np.asarray(x, float)
    n = x.shape[0]
    t_value = np.mean(x) / (np.std(x) / np.sqrt(n))
    p_value = 2.0 * (1.0 - _sps.t.cdf(np.abs(t_value), df=n - 1))
    return float(t_value), float(p_value)


def sign_test(x):
    """Two-sided sign test of H0: median = 0 (LAPS2_correlation.py:28-35)."""
    x = np.asarray(x, float)
    pos = int(np.sum(x > 0))
    neg = int(np.sum(x < 0))
    p_value = 2.0 * _sps.binom.cdf(min(pos, neg), pos + neg, 0.5)
    return float(p_value)


def z_test(x):
    """Two-sided z test of H0: P(x>0) = 1/2 (LAPS2_correlation.py:38-44)."""
    x = np.asarray(x, float)
    n = x.shape[0]
    hat_p = np.sum(x > 0) / n
    z_value = (hat_p - 0.5) / np.sqrt(0.25 / n)
    p_value = 2.0 * (1.0 - _sps.norm.cdf(np.abs(z_value)))
    return float(z_value), float(p_value)


def compute_coverage_rate(samples, credible_quantile: float = 0.95):
    """Fraction of per-subject credible intervals left of / covering / right of 0.

    ``samples``: (n_subjects, n_draws).  Mirrors LAPS2_correlation.py:47-64 but
    vectorized (one percentile call instead of a Python loop).
    """
    x = np.asarray(samples, float)
    lo_q = (1.0 - credible_quantile) / 2.0 * 100.0
    hi_q = (1.0 + credible_quantile) / 2.0 * 100.0
    c_min = np.percentile(x, lo_q, axis=1)
    c_max = np.percentile(x, hi_q, axis=1)
    n = x.shape[0]
    left = float(np.sum(c_max < 0)) / n
    mid = float(np.sum((c_min < 0) & (c_max > 0))) / n
    right = float(np.sum(c_min > 0)) / n
    return left, mid, right


def datasize_analysis(n_records: dict, waiting_time: dict, groups: dict):
    """Per-group record-count and waiting-time population analysis.

    Data-agnostic form of ``Post_Process/LAPS2_correlation.py:66-133``
    (``analysis_datasize``): the reference reads KAISER pickles keyed by
    patient ID; here the caller supplies

    * ``n_records``: {ID: number of complete records},
    * ``waiting_time``: {ID: max timestamp (hours)} — the stay length,
    * ``groups``: {group_name: iterable of IDs} (e.g. sepsis / nonsepsis).

    IDs missing from ``n_records`` are skipped per group exactly as the
    reference's try/except does.  Returns per-group arrays plus the pooled
    record-count range, ready for the histogram figures
    (:func:`..viz.group_histograms`).
    """
    out = {"groups": {}}
    pooled = []
    for name, ids in groups.items():
        counts, waits, kept = [], [], []
        for i in ids:
            if i not in n_records:
                continue
            counts.append(n_records[i])
            # zero-record subjects have no timestamps (reference :84-87)
            waits.append(waiting_time.get(i, 0.0) if n_records[i] > 0 else 0.0)
            kept.append(i)
        counts = np.asarray(counts)
        pooled.append(counts)
        out["groups"][name] = {
            "ids": kept,
            "n_subjects": len(kept),
            "n_records": counts,
            "waiting_time": np.asarray(waits, float),
            "median_records": float(np.median(counts)) if counts.size else float("nan"),
        }
    allc = np.concatenate(pooled) if pooled else np.zeros(0)
    out["records_range"] = (
        (int(allc.min()), int(allc.max())) if allc.size else (0, 0)
    )
    return out


def waitingtime_vs_correlation(corr: dict, waiting_time: dict, groups: dict,
                               min_day: int = 5):
    """Correlation statistic vs stay length, cumulated by day, per group.

    Data-agnostic form of ``LAPS2_correlation.py:136-186``
    (``analysis_waitingtime_vs_corr``): for each group and each day d in
    ``[min_day, floor(max(waiting)/24))`` it reports the mean and std of the
    per-subject correlation statistic over subjects whose waiting time is
    below ``d*24`` hours — the reference's cumulative-inclusion curves.

    * ``corr``: {ID: scalar correlation statistic} (e.g. posterior-mean
      pairwise correlation from :func:`..postprocess.severity`),
    * ``waiting_time``: {ID: hours}, ``groups``: {name: IDs}.

    Returns {group: {"days", "mean", "std", "n"}} for the band figure
    (:func:`..viz.waiting_time_figure`).
    """
    out = {}
    for name, ids in groups.items():
        ids = [i for i in ids if i in corr and i in waiting_time]
        c = np.asarray([corr[i] for i in ids], float)
        w = np.asarray([waiting_time[i] for i in ids], float)
        if len(ids) == 0:
            out[name] = {"days": np.zeros(0, int), "mean": np.zeros(0),
                         "std": np.zeros(0), "n": np.zeros(0, int)}
            continue
        days = np.arange(min_day, max(min_day + 1, int(np.floor(w.max() / 24.0))))
        mean, std, count = [], [], []
        for d in days:
            sel = w < d * 24.0
            count.append(int(sel.sum()))
            mean.append(float(np.mean(c[sel])) if sel.any() else float("nan"))
            std.append(float(np.std(c[sel])) if sel.any() else float("nan"))
        out[name] = {
            "days": days,
            "mean": np.asarray(mean),
            "std": np.asarray(std),
            "n": np.asarray(count, int),
        }
    return out


def paired_improvement(rmse_a: dict, rmse_b: dict):
    """Per-subject paired RMSE improvement of model B over A
    (Post_Process/past/model_comparison.py): returns the common-ID improvement
    array and its summary."""
    ids = sorted(set(rmse_a) & set(rmse_b))
    diff = np.array([rmse_a[i] - rmse_b[i] for i in ids])
    return {
        "ids": ids,
        "improvement": diff,
        "mean": float(diff.mean()) if len(diff) else float("nan"),
        "frac_improved": float(np.mean(diff > 0)) if len(diff) else float("nan"),
    }
