"""Driver-surface uniformity (VERDICT r4 #5).

The example CLIs source their ``--model`` choices from the workflows
registries (``MODEL_CHOICES`` / ``HADAMARD_MODEL_CHOICES``) so the script
surface can never lag the library — the reference instead hardcodes one
model per driver script (e.g. ``Separable_model_personalized.py`` serves
only its own model).  Pins: the registries match the library routing
tables, ``run_sim_fleet`` serves every registry model (including the
sparse tier the reference lacks), and the CLIs accept/reject models by
the registry.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from nonstationary_multivariate_gaussian_process_tpu import workflows

REPO = os.path.join(os.path.dirname(__file__), "..")
CPU_ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def test_model_registries_match_library():
    assert set(workflows.MODEL_CHOICES) == set(workflows._MODELS)
    assert set(workflows.MODEL_CHOICES) == set(workflows._PREDICT)
    # Hadamard: every model with a one-obs-per-pair objective, nothing else
    assert set(workflows.HADAMARD_MODEL_CHOICES) == set(
        workflows.MODEL_CHOICES
    ) - {"gnmgp_hetero", "gnmgp_hetero_sparse"}


def test_run_sim_fleet_rejects_unknown_model():
    with pytest.raises(ValueError, match="unknown model"):
        workflows.run_sim_fleet(
            n_replicates=2, n=8,
            cfg=workflows.PipelineConfig(model="gnmgp_spars"),
        )


def test_run_sim_fleet_sparse_routing():
    """The replicate fleet serves the sparse tier: stacked-SparseOps MAP,
    G/P/D from the sparse plug-in moments (lmc_sparse — the cheapest
    routing witness; the full sparse matrix is covered by the slow-tier
    driver smokes and tests/test_fleet_sparse*.py)."""
    cfg = workflows.PipelineConfig(model="lmc_sparse", n_inducing=6,
                                   n_opt=25)
    out = workflows.run_sim_fleet(n_replicates=2, n=16, cfg=cfg)
    assert out["m_z"] == 6
    assert out["fleet"].vecs.shape[0] == 2
    assert np.isfinite(np.asarray(out["fleet"].final_nlp)).all()
    assert np.isfinite(out["gpd_median_D"])
    assert len(out["gpd"]) == 2


@pytest.mark.slow
def test_run_sim_fleet_sparse_full_matrix():
    """Every sparse model rides run_sim_fleet: MAP + sampling + G/P/D, and
    the GNMGP family additionally scores lengthscale recovery at Z."""
    for model, do_hmc in (("gnmgp_sparse", True), ("snmgp_sparse", False),
                          ("gnmgp_hetero_sparse", False)):
        cfg = workflows.PipelineConfig(
            model=model, n_inducing=8, n_opt=30, do_hmc=do_hmc, n_hmc=6,
            hmc_warmup=10, escalate_rhat=0,
        )
        out = workflows.run_sim_fleet(n_replicates=2, n=20, cfg=cfg)
        assert np.isfinite(out["gpd_median_D"])
        if model.startswith("gnmgp"):
            assert np.isfinite(out["tilde_l_rmse"])
        if do_hmc:
            assert out["hmc_samples"].shape[0] == 2
            assert np.isfinite(out["hmc_samples"]).all()


@pytest.mark.slow
def test_fleet_pod_driver_serves_sparse(tmp_path):
    """run_fleet_pod.py accepts the full registry (here: a sparse model on
    the local CPU mesh — the single-host degradation path)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_fleet_pod.py"),
         "--replicates", "2", "--n", "16", "--n-opt", "20",
         "--model", "snmgp_sparse", "--n-inducing", "6",
         "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    report = json.loads(r.stdout)
    assert np.isfinite(report["mean_final_nlp"])
    assert report["n_devices"] == 8


def test_fleet_pod_driver_rejects_unknown_model():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_fleet_pod.py"),
         "--model", "nope"],
        capture_output=True, text=True, timeout=300, env=CPU_ENV,
    )
    assert r.returncode != 0
    assert "gnmgp_hetero_sparse" in r.stderr  # the registry is the message


@pytest.mark.slow
def test_clinical_driver_serves_sparse(tmp_path):
    """run_clinical_csv.py accepts every Hadamard-capable model (here: the
    sparse tier — the posture real clinical record counts need)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "run_clinical_csv.py"),
         "--subjects", "3", "--n-opt", "25", "--model", "gnmgp_sparse",
         "--n-inducing", "8", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=CPU_ENV,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout)
    assert out["n_valid"] == 3
    assert np.isfinite(out["rmse"]["median"])
