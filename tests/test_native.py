"""Native C++ variogram kernel: build, correctness vs numpy, dispatch."""

import numpy as np
import jax
import pytest

from nonstationary_multivariate_gaussian_process_tpu import native
from nonstationary_multivariate_gaussian_process_tpu.data import sim
from nonstationary_multivariate_gaussian_process_tpu.inference import empirical


@pytest.mark.skipif(not native.available(), reason="g++ toolchain unavailable")
class TestNative:
    def test_windowed_cov_matches_numpy(self, rng):
        y = rng.normal(size=(40, 3))
        w = 8
        got = native.windowed_cov(y, w)
        for i in [0, 5, 20, 39]:
            seg = y[max(0, i - w) : min(i + w, 39)]
            want = seg.T @ seg / (seg.shape[0] - 1)
            np.testing.assert_allclose(got[i], want, rtol=1e-12)

    def test_variogram_fit_matches_numpy_profile(self, rng):
        d = sim.sim_mnts(jax.random.PRNGKey(0), n=60)
        x, y = np.asarray(d.x), np.asarray(d.y)
        sig_n, ell_n = native.local_variogram_fit(x, y, 15)
        est_py = empirical.local_estimation(x, y, window_size=15, method="profile")
        # same estimator family (profile LS on a log grid); grids differ only
        # in endpoint handling, so agree loosely pointwise and tightly in bulk
        assert np.corrcoef(np.log(ell_n), np.log(est_py.est_ls))[0, 1] > 0.8
        assert np.median(np.abs(np.log(sig_n) - np.log(est_py.est_sigmas))) < 0.5

    def test_auto_dispatch_full_estimate(self):
        d = sim.sim_mnts(jax.random.PRNGKey(1), n=50)
        est = empirical.local_estimation(
            np.asarray(d.x), np.asarray(d.y), window_size=12, method="native"
        )
        assert est.est_ls.shape == (50,)
        assert np.all(np.isfinite(est.est_l_vecs))
        assert np.all(est.est_ls > 0)
        # initializer quality: std estimates track the truth
        corr = np.corrcoef(est.est_stds[:, 0], np.asarray(d.stds)[:, 0])[0, 1]
        assert corr > 0.2
