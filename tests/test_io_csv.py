"""Long-format clinical CSV connector (data/io.load_long_csv).

The universal interchange layout for irregular multivariate clinical series
(one row per observation).  Checks: task-index mapping, per-subject grouping
and time-sorting, duplicate detection, complete-layout recovery, and the
worked-example driver end-to-end.
"""

import csv
import subprocess
import sys
import os

import numpy as np
import pytest

from nonstationary_multivariate_gaussian_process_tpu.data import io as data_io


def _write(path, rows, header=("subject_id", "time", "task", "value")):
    with open(path, "w", newline="") as f:
        wr = csv.writer(f)
        wr.writerow(header)
        wr.writerows(rows)


def test_load_long_csv_groups_and_sorts(tmp_path):
    p = tmp_path / "t.csv"
    _write(p, [
        ("a", 2.0, "hr", 10.0),
        ("a", 1.0, "bp", 20.0),
        ("b", 0.5, "hr", 30.0),
        ("a", 1.0, "hr", 40.0),
    ])
    out = data_io.load_long_csv(p, subject_col="subject_id")
    assert out["tasks"] == ["bp", "hr"]
    x, indx, y = out["subjects"]["a"]
    np.testing.assert_allclose(x, [1.0, 1.0, 2.0])
    np.testing.assert_array_equal(indx, [0, 1, 1])  # bp then hr at t=1
    np.testing.assert_allclose(y, [20.0, 40.0, 10.0])
    assert len(out["subjects"]["b"][0]) == 1


def test_load_long_csv_single_subject_and_task_order(tmp_path):
    p = tmp_path / "t.csv"
    _write(p, [("s", 0.1, "hr", 1.0), ("s", 0.2, "bp", 2.0)])
    out = data_io.load_long_csv(p, subject_col=None, task_order=["hr", "bp"])
    (x, indx, y) = out["subjects"][0]
    np.testing.assert_array_equal(indx, [0, 1])
    with pytest.raises(ValueError, match="not in task_order"):
        data_io.load_long_csv(p, task_order=["hr"])


def test_load_long_csv_errors(tmp_path):
    p = tmp_path / "t.csv"
    _write(p, [("s", 1.0, "hr", 1.0), ("s", 1.0, "hr", 2.0)])
    with pytest.raises(ValueError, match="duplicate"):
        data_io.load_long_csv(p, subject_col="subject_id")
    _write(p, [])
    with pytest.raises(ValueError, match="no data rows"):
        data_io.load_long_csv(p)
    _write(p, [("s", 1.0, "hr", 1.0)], header=("subject_id", "t", "task", "value"))
    with pytest.raises(ValueError, match="column 'time'"):
        data_io.load_long_csv(p)
    _write(p, [("s", 1.0, "hr", "")])  # empty measurement cell
    with pytest.raises(ValueError, match="line 2.*cannot parse"):
        data_io.load_long_csv(p)
    _write(p, [("s", 1.0, "hr", "NaN")])
    with pytest.raises(ValueError, match="non-finite"):
        data_io.load_long_csv(p)


def test_hadamard_to_full_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    n, m = 7, 3
    times = np.sort(rng.uniform(size=n))
    yy = rng.normal(size=(n, m))
    rows = [
        ("s", times[i], f"task{k}", yy[i, k]) for i in range(n) for k in range(m)
    ]
    rng.shuffle(rows)
    p = tmp_path / "t.csv"
    _write(p, rows)
    out = data_io.load_long_csv(p, subject_col="subject_id")
    x, indx, y = out["subjects"]["s"]
    xr, yr = data_io.hadamard_to_full(x, indx, y, m)
    np.testing.assert_allclose(xr, times)
    np.testing.assert_allclose(yr, yy)
    # incomplete layouts must refuse to densify
    with pytest.raises(ValueError, match="incomplete"):
        data_io.hadamard_to_full(x[:-1], indx[:-1], y[:-1], m)


@pytest.mark.slow
def test_clinical_example_end_to_end(tmp_path):
    """The worked-example driver: synthesize → load → masked Hadamard fleet."""
    repo = os.path.join(os.path.dirname(__file__), "..")
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": "",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=8"}
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "examples", "run_clinical_csv.py"),
         "--subjects", "3", "--n-opt", "30", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    import json

    out = json.loads(r.stdout)
    assert out["n_valid"] == 3
    assert np.isfinite(out["rmse"]["median"])
    assert (tmp_path / "demo_vitals.csv").exists()


def test_native_and_python_paths_agree(tmp_path, monkeypatch):
    """The native tokenizer and the csv-module fallback must produce
    identical tables (the native path is a pure fast path)."""
    from nonstationary_multivariate_gaussian_process_tpu import native

    rng = np.random.default_rng(1)
    p = tmp_path / "t.csv"
    rows = [
        (f"s{int(i)}", round(float(t), 4), f"task{int(k)}", round(float(v), 4))
        for i, t, k, v in zip(
            rng.integers(0, 5, 300), rng.uniform(size=300) * 48,
            rng.integers(0, 3, 300), rng.normal(size=300),
        )
    ]
    rows = list({(s, t, k): (s, t, k, v) for s, t, k, v in rows}.values())
    _write(p, rows)
    if native.csv_available():
        got_native = data_io.load_long_csv(p, subject_col="subject_id")
    else:
        got_native = None
    monkeypatch.setattr(native, "parse_long_csv", lambda *a, **k: None)
    got_py = data_io.load_long_csv(p, subject_col="subject_id")
    if got_native is not None:
        assert got_native["tasks"] == got_py["tasks"]
        assert set(got_native["subjects"]) == set(got_py["subjects"])
        for sid in got_py["subjects"]:
            for a, b in zip(got_native["subjects"][sid], got_py["subjects"][sid]):
                np.testing.assert_array_equal(a, b)


def test_quoted_csv_falls_back_to_python_path(tmp_path):
    p = tmp_path / "q.csv"
    with open(p, "w", newline="") as f:
        f.write('subject_id,time,task,value\n"s,1",1.0,hr,2.5\n')
    out = data_io.load_long_csv(p, subject_col="subject_id")
    (x, indx, y) = out["subjects"]["s,1"]  # quoted comma survives
    np.testing.assert_allclose(y, [2.5])


def test_native_interner_growth_high_cardinality(tmp_path):
    """10k unique subjects force the native hash tables to grow (regression:
    fixed-capacity tables spun forever past the initial sizing)."""
    p = tmp_path / "many.csv"
    with open(p, "w", newline="") as f:
        f.write("subject_id,time,task,value\n")
        for i in range(10_000):
            f.write(f"s{i:05d},{i * 0.25},hr,{i % 7}.5\n")
    out = data_io.load_long_csv(p, subject_col="subject_id")
    assert len(out["subjects"]) == 10_000
    x, indx, y = out["subjects"]["s00042"]
    np.testing.assert_allclose(x, [42 * 0.25])
    np.testing.assert_allclose(y, [0.5])


def test_float_underscore_falls_back_not_fails(tmp_path):
    """Python float() accepts '_' separators; strtod does not — the native
    path must fall back (not raise) so the file still loads."""
    p = tmp_path / "u.csv"
    _write(p, [("s", 1.0, "hr", "1_0.5")])
    out = data_io.load_long_csv(p, subject_col="subject_id")
    np.testing.assert_allclose(out["subjects"]["s"][2], [10.5])
