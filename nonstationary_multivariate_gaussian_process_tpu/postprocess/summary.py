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

    ``curves``: (n_replicates, N).  A cheap reduction of the functional
    boxplot; for the depth-based summary the reference actually draws
    (statsmodels ``fboxplot``) use :func:`functional_boxplot`.
    """
    return np.percentile(np.asarray(curves), list(percentiles), axis=0)


def modified_band_depth(curves: np.ndarray) -> np.ndarray:
    """Modified band depth (López-Pintado & Romo 2009, J=2) of each curve.

    ``curves``: (R, N).  For every pair of curves the band is their pointwise
    envelope; a curve's depth is the average (over pairs and grid points)
    proportion of time it lies inside the band.  Computed in closed form from
    pointwise ranks — O(R·N·logR), no pair enumeration: at grid point t a
    curve with (0-based) rank r lies inside ``r · (R-1-r)`` of the
    ``C(R,2)`` pairs' bands, plus the ``R-1`` pairs it belongs to.
    This is the depth statsmodels' ``fboxplot`` ranks curves by
    (``res_summary.py:88-157``).
    """
    c = np.asarray(curves, float)
    r, n = c.shape
    if r < 2:
        return np.ones(r)
    # ordinal ranks (ties broken by replicate order; real-valued curves
    # almost surely have none)
    order = c.argsort(axis=0, kind="stable")
    rank = np.empty_like(order)
    np.put_along_axis(rank, order, np.arange(r)[:, None], axis=0)
    n_pairs = r * (r - 1) / 2.0
    inside = rank * (r - 1 - rank) + (r - 1)
    return (inside.mean(axis=1)) / n_pairs


def functional_boxplot(curves: np.ndarray, factor: float = 1.5) -> dict:
    """Depth-based functional boxplot (statsmodels ``fboxplot`` semantics).

    Replaces the pointwise reduction of :func:`functional_band` with the real
    thing the reference draws for the recovery-evidence figures
    (``SIM_code/res_summary.py:88-157``): curves are ranked by modified band
    depth; the deepest curve is the functional median; the deepest half spans
    the 50% central envelope; fences extend the envelope by ``factor`` times
    its height; any curve escaping the fences anywhere is an outlier
    replicate (information the pointwise band destroys).

    Returns ``{"depths", "median_idx", "median_curve", "env_lo", "env_hi",
    "fence_lo", "fence_hi", "outlier_idx"}``.
    """
    c = np.asarray(curves, float)
    r, n = c.shape
    depths = modified_band_depth(c)
    order = np.argsort(depths)[::-1]  # deepest first
    median_idx = int(order[0])
    central = c[order[: max(1, r // 2)]]
    env_lo = central.min(axis=0)
    env_hi = central.max(axis=0)
    height = env_hi - env_lo
    fence_lo = env_lo - factor * height
    fence_hi = env_hi + factor * height
    outliers = np.where(
        np.any((c < fence_lo[None, :]) | (c > fence_hi[None, :]), axis=1)
    )[0]
    return {
        "depths": depths,
        "median_idx": median_idx,
        "median_curve": c[median_idx],
        "env_lo": env_lo,
        "env_hi": env_hi,
        "fence_lo": fence_lo,
        "fence_hi": fence_hi,
        "outlier_idx": outliers,
    }
