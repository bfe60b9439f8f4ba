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
