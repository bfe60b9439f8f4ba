"""Fleet-result aggregation and recovery summaries.

TPU-native re-design of:

* ``SIM_code/res_summary.py`` — aggregate G/P/D + PMSE across simulation
  replicates and compare model families; functional summaries of recovered
  latent processes vs the truth,
* ``Post_Process/past/reduce_distributed_results.py`` — the reference's
  filesystem "allreduce": gather per-subject RMSE/LPD, report median/mean/std,
  record valid IDs.
"""

from __future__ import annotations

import numpy as np

from ..utils.artifacts import ArtifactStore


def reduce_fleet_metrics(store: ArtifactStore, keys, metric_names=("rmse", "lpd")):
    """Gather per-subject scalar metrics from the artifact store.

    Mirrors ``reduce_distributed_results.py:53-77``: skip missing/failed
    subjects, summarize the rest, return the valid key list.
    """
    valid = []
    values = {m: [] for m in metric_names}
    for k in keys:
        if not store.exists(k):
            continue
        arrays = store.load(k)
        if not all(m in arrays for m in metric_names):
            continue
        valid.append(k)
        for m in metric_names:
            values[m].append(float(arrays[m]))
    out = {"valid_keys": valid, "n_valid": len(valid), "n_total": len(list(keys))}
    for m in metric_names:
        v = np.asarray(values[m])
        out[m] = {
            "median": float(np.median(v)) if v.size else float("nan"),
            "mean": float(np.mean(v)) if v.size else float("nan"),
            "std": float(np.std(v)) if v.size else float("nan"),
        }
    return out


def compare_models_gpd(scores_by_model: dict):
    """Tabulate per-replicate G/P/D (+PMSE) scores across model families.

    ``scores_by_model``: {model_name: list of score dicts per replicate}.
    Mirrors ``res_summary.py:38-86``'s boxplot input preparation; returns the
    arrays for plotting plus summary statistics.
    """
    table = {}
    for model, score_list in scores_by_model.items():
        keys = sorted({k for s in score_list for k in s})
        arrs = {k: np.asarray([s[k] for s in score_list if k in s]) for k in keys}
        table[model] = {
            k: {"values": v, "median": float(np.median(v)), "mean": float(np.mean(v))}
            for k, v in arrs.items()
        }
    return table


def functional_band(curves: np.ndarray, percentiles=(2.5, 50.0, 97.5)):
    """Pointwise band of replicate-recovered latent curves.

    ``curves``: (n_replicates, N).  The statsmodels functional-boxplot figures
    of ``res_summary.py:88-157`` reduce to these pointwise bands plus the
    truth overlay (plotting lives in ``viz``).
    """
    return np.percentile(np.asarray(curves), list(percentiles), axis=0)
