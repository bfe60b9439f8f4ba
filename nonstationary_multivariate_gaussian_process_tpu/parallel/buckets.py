"""Ragged-cohort support: bucket subjects by length, run one fleet per bucket.

KAISER-style cohorts have a different number of observations per patient
(SURVEY §7 "ragged subjects").  XLA needs static shapes, so subjects are
grouped into size buckets; within a bucket every subject is right-padded to
the bucket length by *repeating its last observation* and the padded tail is
then **truncated before scoring**.  For the likelihood itself padding must
not bias the fit: the default ``mode="pad"`` pairs padded inputs with a
boolean mask that the model likelihoods honor *exactly* (masked entries
contribute nothing to logdet or the quadratic form — all three models), so no
observation is ever dropped.  ``mode="truncate"`` (crop every subject to the
bucket minimum) remains as a cheaper approximation that does lose data.

The reference sidesteps this entirely by giving every subject its own MPI
process; bucketing is the price of batched SPMD, paid once at staging time.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Sequence

import numpy as np


def assign_buckets(lengths: Sequence[int], n_buckets: int = 4) -> dict[int, list[int]]:
    """Group subject indices into ``n_buckets`` quantile buckets by length."""
    lengths = np.asarray(lengths)
    edges = np.quantile(lengths, np.linspace(0, 1, n_buckets + 1))
    buckets: dict[int, list[int]] = defaultdict(list)
    for i, L in enumerate(lengths):
        b = int(np.searchsorted(edges[1:-1], L, side="right"))
        buckets[b].append(i)
    return dict(buckets)


def stage_bucket(xs: list, ys: list, idxs: list[int], mode: str = "pad"):
    """Stack a bucket's subjects into dense (S, N) / (S, N, M) arrays.

    ``mode="pad"`` (default): right-pad to the bucket maximum (strictly
    increasing x extension, zero y, mask marking real rows); callers crop
    per-subject outputs back via the returned ``true_lengths``.
    ``mode="truncate"``: crop every subject to the bucket minimum length.
    """
    lens = [xs[i].shape[0] for i in idxs]
    if mode == "truncate":
        n = min(lens)
        x = np.stack([np.asarray(xs[i])[:n] for i in idxs])
        y = np.stack([np.asarray(ys[i])[:n] for i in idxs])
        mask = np.ones((len(idxs), n), dtype=bool)
    else:
        n = max(lens)
        x_list, y_list, mask_list = [], [], []
        for i in idxs:
            xi, yi = np.asarray(xs[i]), np.asarray(ys[i])
            pad = n - xi.shape[0]
            # pad x with a strictly increasing extension so kernel matrices on
            # the padded inputs stay well-conditioned (duplicated inputs would
            # be singular); the mask keeps padded slots out of the likelihood
            dx = float(np.mean(np.diff(xi))) if xi.shape[0] > 1 else 1.0
            ext = xi[-1] + dx * np.arange(1, pad + 1)
            x_list.append(np.concatenate([xi, ext]))
            y_list.append(np.concatenate([yi, np.zeros((pad,) + yi.shape[1:])]))
            mask_list.append(np.concatenate([np.ones(xi.shape[0], bool), np.zeros(pad, bool)]))
        x, y, mask = np.stack(x_list), np.stack(y_list), np.stack(mask_list)
    return x, y, np.asarray(lens), mask


def run_bucketed(xs: list, ys: list, fit_bucket, n_buckets: int = 4,
                 mode: str = "pad") -> dict[int, dict]:
    """Bucket a ragged cohort and run ``fit_bucket(x, y, subject_idxs, mask)``
    per bucket.

    Returns {subject_index: per-subject result} merged across buckets;
    ``fit_bucket`` must return a dict of arrays with a leading subject axis.
    In ``mode="pad"`` the mask marks real observations per subject.
    """
    import inspect

    buckets = assign_buckets([x.shape[0] for x in xs], n_buckets)
    takes_mask = len(inspect.signature(fit_bucket).parameters) >= 4
    out: dict[int, dict] = {}
    for b, idxs in sorted(buckets.items()):
        x, y, lens, mask = stage_bucket(xs, ys, idxs, mode)
        res = fit_bucket(x, y, idxs, mask) if takes_mask else fit_bucket(x, y, idxs)
        for j, subj in enumerate(idxs):
            out[subj] = {k: v[j] for k, v in res.items()}
            out[subj]["true_length"] = int(lens[j])
    return out
