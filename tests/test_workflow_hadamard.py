"""Hadamard-layout subject workflow."""

import numpy as np
import jax
import pytest

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim


def _hadamard_from_sim(n=40, seed=0):
    d = sim.sim_mnts(jax.random.PRNGKey(seed), n=n)
    rng = np.random.default_rng(seed)
    x = np.asarray(d.x)
    y2 = np.asarray(d.y)
    indx = rng.integers(0, 2, size=n)
    y = y2[np.arange(n), indx]
    return x, indx, y


@pytest.mark.parametrize("model", ["lmc", "snmgp", "gnmgp"])
def test_run_subject_hadamard(model):
    x, indx, y = _hadamard_from_sim(36)
    cfg = workflows.PipelineConfig(model=model, n_opt=60, lr=0.1, n_grid=7,
                                   test_size=0.2)
    res = workflows.run_subject_hadamard(x, indx, y, m=2, cfg=cfg)
    assert res["pred_grid"].percentiles.shape == (7, 3, 2)
    assert np.isfinite(res["test_rmse"])
    assert np.isfinite(res["test_lpd"])
    assert np.all(np.isfinite(np.asarray(res["map_vec"])))
