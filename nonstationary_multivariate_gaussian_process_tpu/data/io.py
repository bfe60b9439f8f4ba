"""Migration loaders for the reference's on-disk data formats.

Users of the reference keep data in pickles with fixed layouts; these loaders
accept those files so existing datasets drop in unchanged:

* ``load_sim_pickle``   — ``[x, l, L_vecs, sigma2_err, Y]``
  (written by ``SIM_code/sim.py:273-274``),
* ``load_empirical_pickle`` — ``[log est_ls, log smooth_ls, est_L_vecs,
  est_tilde_sigma2_err]`` (``Utility/empirical_estimation.py:184-190``),
* ``load_map_dat``      — a packed parameter vector (``MAP.dat``),
* ``load_hmc_pickle``   — an (S, P) chain (``HMC_sample.pickle``),
* ``load_kaiser_distributed`` — the per-ID dict of per-subject series
  (``Separable_model_personalized.py:207-208`` access pattern:
  ``data[ID] -> (x, Y)`` tuples or dicts).

Only numpy arrays come out — no torch objects are needed to read any of them.
"""

from __future__ import annotations

import pickle

import numpy as np


def _np(a):
    try:  # torch tensors unpickle with .numpy(); plain arrays pass through
        import torch

        if isinstance(a, torch.Tensor):
            return a.detach().cpu().numpy()
    except Exception:
        pass
    return np.asarray(a)


def load_sim_pickle(path: str) -> dict:
    with open(path, "rb") as f:
        x, l, l_vecs, sigma2_err, y = pickle.load(f)
    return {
        "x": _np(x),
        "l": _np(l),
        "l_vecs": _np(l_vecs),
        "sigma2_err": float(sigma2_err),
        "y": _np(y),
    }


def load_empirical_pickle(path: str) -> dict:
    with open(path, "rb") as f:
        log_ls, log_smooth_ls, l_vecs, tilde_s2 = pickle.load(f)
    return {
        "log_est_ls": _np(log_ls),
        "log_smooth_ls": _np(log_smooth_ls),
        "est_l_vecs": _np(l_vecs),
        "est_tilde_sigma2_err": float(tilde_s2),
    }


def load_map_dat(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return _np(pickle.load(f))


def load_hmc_pickle(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        return _np(pickle.load(f))


def load_long_csv(
    path: str,
    time_col: str = "time",
    task_col: str = "task",
    value_col: str = "value",
    subject_col: str | None = None,
    task_order: list | None = None,
) -> dict:
    """Long-format clinical CSV → Hadamard triples ``(x, indx, y)``.

    One row per observation — the universal interchange layout for
    irregularly sampled multivariate clinical series (MIMIC-style vitals
    exports, the shape of the private KAISER tables the reference's
    ``Post_Process/severity`` scripts consume).  Tasks are mapped to integer
    indices (``task_order`` pins the mapping; default: sorted unique labels),
    rows are sorted by time within each subject, and duplicated
    (subject, time, task) cells raise.

    Returns ``{"tasks": [...], "subjects": {id: (x, indx, y)}}``; without
    ``subject_col`` there is a single subject keyed ``0``.  When a subject's
    layout is *complete* (every (time, task) pair observed exactly once) its
    entry also satisfies ``x``/``y`` reshaping to the full (N, M) layout —
    use :func:`hadamard_to_full` to recover it.

    Parsing runs through the **native C++ tokenizer** when available
    (``native/csv_loader.cpp``: one pass, strtod numerics, string interning —
    the Python csv path allocates a dict per row); quoted files and build
    failures fall back to the exact csv-module path automatically.  Only the
    standard library is needed (no pandas).
    """
    import csv

    path = str(path)
    with open(path, newline="") as f:
        header = next(csv.reader(f), [])
    for c in (time_col, task_col, value_col) + (
        (subject_col,) if subject_col else ()
    ):
        if c not in header:
            raise ValueError(f"column {c!r} not in CSV header {header}")

    parsed = None
    try:
        from .. import native

        parsed = native.parse_long_csv(
            path, header.index(time_col), header.index(task_col),
            header.index(value_col),
            header.index(subject_col) if subject_col else -1,
        )
    except Exception:
        parsed = None  # native tier unavailable/unsuited: exact path below

    if parsed is not None:
        times, values, raw_tcodes, raw_scodes, task_table, subj_table = parsed
    else:
        times_l, values_l, tasks_l, subjs_l = [], [], [], []
        with open(path, newline="") as f:
            reader = csv.DictReader(f)
            for r in reader:
                # reader.line_num tracks physical lines (quoted embedded
                # newlines included), so errors point at the real row
                try:
                    t = float(r[time_col])
                    v = float(r[value_col])
                except (TypeError, ValueError) as e:
                    raise ValueError(
                        f"{path} line {reader.line_num}: cannot parse "
                        f"{time_col}={r[time_col]!r} / "
                        f"{value_col}={r[value_col]!r} "
                        f"({e}); clean or drop the row"
                    ) from None
                if not (np.isfinite(t) and np.isfinite(v)):
                    raise ValueError(
                        f"{path} line {reader.line_num}: non-finite "
                        f"{time_col}={r[time_col]!r} / {value_col}={r[value_col]!r}"
                    )
                times_l.append(t)
                values_l.append(v)
                tasks_l.append(r[task_col])
                subjs_l.append(r[subject_col] if subject_col else 0)
        times = np.asarray(times_l, float)
        values = np.asarray(values_l, float)
        if times.shape[0]:
            uniq_t, raw_tcodes = np.unique(
                np.asarray(tasks_l, object), return_inverse=True
            )
            uniq_s, raw_scodes = np.unique(
                np.asarray(subjs_l, object), return_inverse=True
            )
            task_table = uniq_t.tolist()
            subj_table = uniq_s.tolist()

    # shared mapping/validation for both parse branches, operating on
    # (label table, per-row codes) pairs
    if times.shape[0] == 0:
        raise ValueError(f"{path} contains no data rows")
    tasks = list(task_order) if task_order is not None else sorted(task_table)
    t2i = {t: i for i, t in enumerate(tasks)}
    unknown = set(task_table) - set(t2i)
    if unknown:
        raise ValueError(f"tasks {sorted(unknown)} not in task_order {tasks}")
    tcodes = np.asarray([t2i[t] for t in task_table])[raw_tcodes]
    order_s = sorted(range(len(subj_table)), key=lambda i: str(subj_table[i]))
    rank = np.empty(len(subj_table), np.int64)
    rank[order_s] = np.arange(len(subj_table))
    subj_inv = rank[raw_scodes]
    uniq_subj = np.asarray(subj_table, object)[order_s]

    order = np.lexsort((tcodes, times, subj_inv))
    s_s, t_s, k_s, v_s = subj_inv[order], times[order], tcodes[order], values[order]
    dup = np.flatnonzero(
        (s_s[1:] == s_s[:-1]) & (t_s[1:] == t_s[:-1]) & (k_s[1:] == k_s[:-1])
    )
    if dup.size:
        i = int(dup[0]) + 1
        raise ValueError(
            f"duplicate observation for subject {uniq_subj[s_s[i]]!r} at "
            f"(time={t_s[i]}, task={tasks[int(k_s[i])]})"
        )
    out = {}
    bounds = np.concatenate(
        [[0], np.flatnonzero(np.diff(s_s)) + 1, [s_s.shape[0]]]
    )
    for b0, b1 in zip(bounds[:-1], bounds[1:]):
        sid = uniq_subj[s_s[b0]]
        out[sid] = (t_s[b0:b1].copy(), k_s[b0:b1].astype(int), v_s[b0:b1].copy())
    return {"tasks": tasks, "subjects": out}


def hadamard_to_full(x, indx, y, m: int):
    """Recover the dense (N, M) layout from a *complete* Hadamard triple.

    Raises if any (time, task) cell is missing — incomplete subjects must
    stay in the Hadamard layout (``run_subject_hadamard`` handles them).
    """
    x = np.asarray(x, float)
    indx = np.asarray(indx, int)
    y = np.asarray(y, float)
    times = np.unique(x)
    n = times.shape[0]
    if x.shape[0] != n * m:
        raise ValueError(
            f"incomplete layout: {x.shape[0]} obs != {n} times x {m} tasks"
        )
    yy = np.full((n, m), np.nan)
    pos = {t: i for i, t in enumerate(times)}
    for xi, ki, yi in zip(x, indx, y):
        yy[pos[xi], ki] = yi
    if np.any(np.isnan(yy)):
        raise ValueError("incomplete layout: some (time, task) cells missing")
    return times, yy


def load_kaiser_distributed(path: str) -> dict:
    """Per-subject dict {ID: (x, Y)} with arrays converted to numpy."""
    with open(path, "rb") as f:
        raw = pickle.load(f)
    out = {}
    for k, v in raw.items():
        if isinstance(v, (tuple, list)) and len(v) >= 2:
            out[k] = (_np(v[0]), _np(v[1]))
        else:
            out[k] = v
    return out
