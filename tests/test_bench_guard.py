"""bench.py guard logic (VERDICT r3 #1/#2): the round-3 artifact shipped a
nonphysical fleet-sweep point (3.8M evals/s ~ 334 TFLOP/s, past chip peak)
and a timeout forfeited every row — the budget/physicality machinery is now
unit-tested so the bench cannot silently regress again.

Pure host-side tests: no TPU, no jax device work (the timed paths are
exercised on hardware by the bench itself).
"""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "bench", Path(__file__).resolve().parent.parent / "bench.py")
bench = importlib.util.module_from_spec(_SPEC)
sys.modules.setdefault("bench", bench)
_SPEC.loader.exec_module(bench)


class TestFlopModel:
    def test_monotone_in_n(self):
        vals = [bench.grad_flop_model(n, 2) for n in (100, 200, 400, 800)]
        assert all(b > a for a, b in zip(vals, vals[1:]))

    def test_cubic_dominates_at_scale(self):
        # doubling N multiplies the mn^3 terms by 8; the total should grow
        # by >4x once the cubic dominates
        assert bench.grad_flop_model(2000, 2) > 4 * bench.grad_flop_model(1000, 2)


class TestPhysicalityGuard:
    def test_rejects_the_r3_anomaly(self):
        # the captured r3 figure: S=64 sweep at 3.8M evals/s with N=200, M=2
        assert not bench._physical(3_795_460.3, 200, 2)

    def test_accepts_the_r4_capture(self):
        # the healthy r4 sweep points (S=8..64 at N=200)
        for rate in (2585.5, 3503.6, 4122.0, 4220.5):
            assert bench._physical(rate, 200, 2)

    def test_boundary_tracks_peak_and_slack(self):
        flops = bench.grad_flop_model(200, 2)
        edge = bench.PEAK_TFLOPS * bench.GUARD_SLACK * 1e12 / flops
        assert bench._physical(edge * 0.99, 200, 2)
        assert not bench._physical(edge * 1.01, 200, 2)

    def test_rejects_nonfinite(self):
        assert not bench._physical(float("nan"), 200, 2)
        assert not bench._physical(float("inf"), 200, 2)
        assert not bench._physical(None, 200, 2)


class TestBudget:
    def test_probe_skipped_when_budget_exhausted(self, monkeypatch, capsys):
        monkeypatch.setattr(bench, "BUDGET_S", 0.0)
        assert bench._run_probe("core", "f32") is None
        assert "SKIP core/f32" in capsys.readouterr().err

    def test_stage_floors_cover_every_stage(self):
        for stage, mode in (("core", "f32"), ("core", "mixed"),
                            ("core", "f64"), ("sweep", "f32"),
                            ("sparse", "f32"), ("sparse", "mixed"),
                            ("smc", "f32")):
            assert bench._STAGE_FLOOR[(stage, mode)] > 0


class TestEmission:
    def test_emit_is_valid_json_with_partial_state(self, capsys):
        """A driver timeout after ANY stage must still leave a parseable
        row: _emit with only the baseline present produces one JSON line
        with the full schema (null-valued where nothing ran)."""
        state = {"done": ["baseline"], "opt": {}, "base_eps": 0.5,
                 "reimpl_eps": 0.6}
        bench._emit(state)
        out = capsys.readouterr().out.strip().splitlines()
        row = json.loads(out[-1])
        assert row["metric"].startswith("gnmgp_n")
        assert row["value"] is None  # no device stage ran
        assert row["reference_cpu_f64_baseline_evals_per_sec"] == 0.5
        assert row["stages_done"] == ["baseline"]

    def test_emit_enriches_with_stages(self, capsys):
        state = {
            "done": ["baseline", "core/f32"], "opt": {
                "sparse_grad_evals_per_sec": 994.7, "sparse_n": 2000,
                "sparse_m_z": 64,
            },
            "base_eps": 0.527, "reimpl_eps": 0.68,
            "f32": {"grad_evals_per_sec": 298.99, "hmc_iters_per_sec": 17.4,
                    "hmc_estimated": False, "cholesky_ms": 5.4,
                    "fleet_grad_evals_per_sec": 2640.0, "fleet_size": 8,
                    "fleet_n": 200, "model_flops_per_grad": 1.07e10,
                    "achieved_tflops": 3.2, "mfu_fraction": 0.016},
        }
        bench._emit(state)
        row = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert row["value"] == pytest.approx(298.99)
        assert row["vs_baseline"] == pytest.approx(298.99 / 0.527, rel=1e-3)
        assert row["sparse_grad_evals_per_sec_f32"] == pytest.approx(994.7)
        np.testing.assert_allclose(row["mfu_peak_tflops_assumed"],
                                   bench.PEAK_TFLOPS)
