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


class TestValidation:
    def test_degenerate_inputs_raise_named_errors(self):
        import pytest as _pytest

        cfg = workflows.PipelineConfig(model="lmc", n_opt=5)
        with _pytest.raises(ValueError, match="at least 4"):
            workflows.run_subject(np.zeros(0), np.zeros((0, 2)), cfg)
        with _pytest.raises(ValueError, match="disagree on N"):
            workflows.run_subject(np.linspace(0, 1, 5), np.zeros((6, 2)), cfg)
        with _pytest.raises(ValueError, match="non-finite"):
            y = np.zeros((6, 2))
            y[0, 0] = np.nan
            workflows.run_subject(np.linspace(0, 1, 6), y, cfg)
        with _pytest.raises(ValueError, match="must be 2-D"):
            workflows.run_subject(np.linspace(0, 1, 6), np.zeros(6), cfg)
