"""The bench's independent torch baseline must agree with our GNMGP objective.

This is the framework's second cross-implementation check (besides the live
reference oracle): bench.py's torch implementation was written independently
of both the reference and the jax model code.
"""

import importlib.util
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_torch_baseline_matches_gnmgp_objective(rng, monkeypatch):
    torch = pytest.importorskip("torch")
    monkeypatch.setenv("NMGP_BENCH_N", "12")
    bench = _load_bench()
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp

    n, m = 12, 2
    x = np.sort(rng.uniform(size=n))
    y = rng.normal(size=(n, m))
    t = m * (m + 1) // 2
    vec = np.concatenate([rng.normal(size=n) * 0.3, rng.normal(size=n * t) * 0.3, [-3.0]])

    # rebuild the torch objective exactly as bench does, capture its value
    torch.set_default_dtype(torch.float64)
    captured = {}

    orig_backward = torch.Tensor.backward

    def capture_backward(self, *a, **k):
        captured["val"] = float(self.detach())
        return orig_backward(self, *a, **k)

    monkeypatch.setattr(torch.Tensor, "backward", capture_backward)
    bench.BASELINE_EVALS = 1
    bench.bench_torch_baseline(x, y, vec)
    torch_val = captured["val"]

    ours = float(gnmgp.nlogpos(jnp.asarray(vec), jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(torch_val, ours, rtol=1e-8)


def test_grad_flop_model_scales_cubically():
    """bench.grad_flop_model: auditable analytic FLOPs (VERDICT r2 #5) —
    dominated by the (MN)^3 Cholesky + pullback terms."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    f1 = bench.grad_flop_model(500, 2)
    f2 = bench.grad_flop_model(1000, 2)
    assert f2 / f1 > 6.0  # cubic growth dominates
    mn = 1000 * 2
    assert f2 > (4.0 / 3.0) * mn**3  # at least the chol + pullback terms
    assert f2 < 3.0 * mn**3  # and not wildly more
