"""Serving layer (serving/engine.py + serving/server.py).

A fitted artifact store must stand up a predict engine whose MAP endpoint
matches the library's predict_map exactly (padding to grid buckets must be
invisible), and the HTTP wrapper must round-trip JSON including the
posterior-sample mode and error paths.
"""

import json
import threading
import urllib.request

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nonstationary_multivariate_gaussian_process_tpu import workflows
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData
from nonstationary_multivariate_gaussian_process_tpu.predict import gnmgp as pred_gnmgp
from nonstationary_multivariate_gaussian_process_tpu.serving import PredictEngine, serve
from nonstationary_multivariate_gaussian_process_tpu.utils.artifacts import ArtifactStore


@pytest.fixture(scope="module")
def fitted_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    d = sim.sim_mnts(jax.random.PRNGKey(0), n=24)
    cfg = workflows.PipelineConfig(
        model="gnmgp", n_opt=60, do_hmc=True, n_hmc=12, hmc_step_size=5e-3,
        do_pred_grid=False, do_pred_test=False, do_evaluation=False,
        do_map_analysis=False,
    )
    workflows.run_subject(
        np.asarray(d.x), np.asarray(d.y), cfg, store=ArtifactStore(root),
        subject=0, dataset="sim",
    )
    return root


def test_engine_matches_library(fitted_root):
    eng = PredictEngine(fitted_root)
    assert eng.subject_ids() == ["0"]
    xs = np.linspace(0.05, 0.95, 7)  # pads 7 -> 32 bucket internally
    out = eng.predict("0", xs)
    rec = eng._load("0")
    gp = pred_gnmgp.predict_map(
        rec["vec"], FullData(rec["x"], rec["y"]), jnp.asarray(xs)
    )
    np.testing.assert_allclose(out["mean"], np.asarray(gp.mean), rtol=1e-8)
    np.testing.assert_allclose(out["std"], np.asarray(gp.std), rtol=1e-6)
    assert out["mean"].shape == (7, 2)


def test_engine_sample_mode_and_errors(fitted_root):
    eng = PredictEngine(fitted_root)
    out = eng.predict("0", [0.2, 0.8], mode="sample", n_sample=10)
    assert out["mean"].shape == (2, 2)
    assert np.all(out["upper"] >= out["lower"])
    with pytest.raises(KeyError):
        eng.predict("nope", [0.5])
    with pytest.raises(ValueError):
        eng.predict("0", [[0.5, 0.1]])


def test_http_roundtrip(fitted_root):
    httpd = serve(fitted_root, port=0, warm=False)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_port}"
    try:
        health = json.load(urllib.request.urlopen(f"{base}/health"))
        assert health["status"] == "ok" and health["subjects"] == 1
        subs = json.load(urllib.request.urlopen(f"{base}/subjects"))
        assert subs["subjects"] == ["0"]
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"subject": "0", "x": [0.1, 0.5, 0.9]}).encode(),
            method="POST",
        )
        out = json.load(urllib.request.urlopen(req))
        assert np.asarray(out["mean"]).shape == (3, 2)
        assert np.all(np.isfinite(out["mean"]))
        # error path: unknown subject -> 404 with a JSON error body
        bad = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"subject": "42", "x": [0.5]}).encode(),
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad)
        assert ei.value.code == 404
    finally:
        httpd.shutdown()


def test_info_endpoint_surfaces_evidence(tmp_path):
    """run_subject(sampler='smc') persists its sampling record; the engine's
    info endpoint (and GET /subjects/<id>) surfaces the log evidence."""
    import json
    import urllib.request

    root = str(tmp_path)
    d = sim.sim_mnts(jax.random.PRNGKey(1), n=16)
    cfg = workflows.PipelineConfig(
        model="gnmgp", n_opt=40, do_hmc=True, n_hmc=8, sampler="smc",
        smc_particles=16, smc_mutations=1, smc_leapfrog=2,
        do_pred_grid=False, do_pred_test=False, do_evaluation=False,
        do_map_analysis=False,
    )
    workflows.run_subject(
        np.asarray(d.x), np.asarray(d.y), cfg, store=ArtifactStore(root),
        subject=0, dataset="sim",
    )
    eng = PredictEngine(root, model="gnmgp", dataset="sim")
    info = eng.info("0")
    assert info["n"] == 16 and info["m"] == 2 and info["has_chain"]
    assert info["sampling"]["sampler"] == "smc"
    assert np.isfinite(info["sampling"]["log_evidence"])

    httpd = serve(root, port=0, warm=False)
    try:
        import threading

        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        url = f"http://127.0.0.1:{httpd.server_port}"
        got = json.loads(urllib.request.urlopen(f"{url}/subjects/0").read())
        assert got["sampling"]["sampler"] == "smc"
        assert np.isfinite(got["sampling"]["log_evidence"])
        code = urllib.request.urlopen(f"{url}/subjects").status
        assert code == 200
        try:
            urllib.request.urlopen(f"{url}/subjects/nope")
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
