"""Tests for heatmap sequences, PDF pages, and the SVC hadamard sampler."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu import viz
from nonstationary_multivariate_gaussian_process_tpu.models import HadamardData
from nonstationary_multivariate_gaussian_process_tpu.ops import transforms
from nonstationary_multivariate_gaussian_process_tpu.predict import hadamard as pred_h


class TestVizExtra:
    def test_heatmap_sequence(self, tmp_path, rng):
        n, m = 6, 3
        a = rng.normal(size=(n, m, m))
        b = a @ np.swapaxes(a, -1, -2) + 3 * np.eye(m)
        d = np.sqrt(np.diagonal(b, axis1=-2, axis2=-1))
        cor = b / (d[..., :, None] * d[..., None, :])
        viz.correlation_heatmap_sequence(str(tmp_path / "hm"), cor,
                                         times=np.linspace(0, 1, n), every=2)
        assert (tmp_path / "hm_0000.png").exists()
        assert (tmp_path / "hm_0004.png").exists()
        assert not (tmp_path / "hm_0001.png").exists()

    def test_correlation_pdf(self, tmp_path, rng):
        subjects = {
            f"id{i}": {
                "x": np.linspace(0, 1, 10),
                "cor_q": np.sort(rng.uniform(-1, 1, size=(3, 10)), axis=0),
            }
            for i in range(3)
        }
        path = str(tmp_path / "cors.pdf")
        viz.correlation_pdf_pages(path, subjects)
        assert (tmp_path / "cors.pdf").stat().st_size > 1000


class TestSVCHadamardSample:
    def test_shapes_and_finiteness(self, rng):
        n, m = 14, 2
        x = np.sort(rng.uniform(size=n))
        indx = rng.integers(0, m, size=n)
        indx[:m] = np.arange(m)
        y = rng.normal(size=n)
        data = HadamardData(jnp.asarray(x), jnp.asarray(indx, jnp.int32), jnp.asarray(y))
        t = transforms.tri_size(m)
        vec = jnp.asarray(rng.normal(size=n + n * t + 1) * 0.3)
        hist = jnp.stack([vec, vec + 0.01, vec - 0.01])
        grid = jnp.linspace(0.2, 0.8, 5)
        ys = pred_h.svc_predict_sample(jax.random.PRNGKey(0), hist, data, grid, m)
        assert ys.shape == (5, 3, m)
        assert np.all(np.isfinite(np.asarray(ys)))


class TestNewFigures:
    def test_synthetic_comparison_figure(self, tmp_path):
        import jax

        from nonstationary_multivariate_gaussian_process_tpu import viz
        from nonstationary_multivariate_gaussian_process_tpu.data import sim
        from nonstationary_multivariate_gaussian_process_tpu.inference import (
            empirical,
            init as init_mod,
        )

        d = sim.sim_mnts(jax.random.PRNGKey(0), n=24)
        emp = empirical.local_estimation(
            np.asarray(d.x), np.asarray(d.y), window_size=6
        )
        vec = init_mod.gnmgp_from_empirical(emp, 24, 2)
        path = str(tmp_path / "syn.png")
        viz.synthetic_comparison_figure(path, d.x, d, emp=emp, map_vec=vec)
        assert os.path.getsize(path) > 0

    def test_extrapolation_figure(self, tmp_path):
        from nonstationary_multivariate_gaussian_process_tpu import viz

        g = np.linspace(0, 1, 50)
        pct = np.stack(
            [np.zeros((50, 2)) - 1, np.zeros((50, 2)), np.zeros((50, 2)) + 1], axis=1
        )
        path = str(tmp_path / "ext.png")
        viz.extrapolation_figure(
            path,
            np.linspace(0, 0.8, 20),
            np.zeros((20, 2)),
            np.linspace(0.82, 1, 5),
            np.zeros((5, 2)),
            g,
            pct,
            attributes=["sbp", "o2"],
        )
        assert os.path.getsize(path) > 0
