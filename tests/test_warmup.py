"""Windowed warmup (inference/warmup.py + hmc.py adapt_mass path).

The adaptive warmup must (a) partition the warmup exactly as specified —
init buffer, doubling slow windows, terminal buffer — and (b) actually learn
the geometry: on an anisotropic Gaussian the adapted inverse metric must
track the true marginal variances well enough that sampling works across a
10^4 condition-number range from a single step size.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nonstationary_multivariate_gaussian_process_tpu.inference import hmc, warmup


def test_window_schedule_partition():
    s = warmup.window_schedule(1000)
    # Stan defaults: 75 init, windows 25/50/100/... absorbing the remainder,
    # 50 terminal
    assert not s.in_slow[:75].any()
    assert s.in_slow[75:950].all()
    assert not s.in_slow[950:].any()
    ends = np.flatnonzero(s.window_end)
    # windows: 75+25=100, +50=150, +100=250, +200=450, then the final window
    # absorbs the remainder to 950 (next doubling would overrun)
    assert list(ends + 1) == [100, 150, 250, 450, 950]
    # dual-averaging counter restarts after each window end
    assert s.da_step[100] == 1 and s.da_step[99] == 100
    assert s.da_step[-1] == 50


def test_window_schedule_small():
    s = warmup.window_schedule(40)  # too small for default buffers: 15/75/10%
    assert s.in_slow.sum() == 40 - 6 - 4
    assert s.window_end.sum() == 1


def test_adapt_mass_learns_scales():
    scales = jnp.asarray([10.0, 1.0, 0.1])

    def potential(q):
        return 0.5 * jnp.sum((q / scales) ** 2)

    res = hmc.hmc_sample(
        potential,
        jnp.zeros(3),
        n_samples=600,
        key=jax.random.PRNGKey(0),
        step_size=0.1,
        n_leapfrog=8,
        n_warmup=500,
        adapt_mass=True,
    )
    assert res.inv_mass is not None
    # inverse metric ~ marginal variances (within a factor of 3)
    ratio = np.asarray(res.inv_mass) / np.asarray(scales) ** 2
    assert np.all(ratio > 1 / 3) and np.all(ratio < 3), ratio
    # healthy acceptance post-warmup and correct marginal spread
    assert float(res.accept_prob[500:].mean()) > 0.6
    sd = np.asarray(res.samples).std(axis=0)
    np.testing.assert_allclose(sd, np.asarray(scales), rtol=0.35)


def test_adapt_mass_beats_identity_metric():
    # with an identity metric and one shared step size, a 100:1 scale range
    # forces tiny steps; the adapted metric should explore the wide axis far
    # better per draw
    scales = jnp.asarray([10.0, 1.0, 0.1])

    def potential(q):
        return 0.5 * jnp.sum((q / scales) ** 2)

    kwargs = dict(
        n_samples=400,
        step_size=0.05,
        n_leapfrog=8,
        n_warmup=400,
    )
    adapted = hmc.hmc_sample(
        potential, jnp.zeros(3), key=jax.random.PRNGKey(1), adapt_mass=True, **kwargs
    )
    plain = hmc.hmc_sample(
        potential,
        jnp.zeros(3),
        key=jax.random.PRNGKey(1),
        adapt_step_size=True,
        **kwargs,
    )
    wide_sd_adapted = float(np.asarray(adapted.samples)[:, 0].std())
    wide_sd_plain = float(np.asarray(plain.samples)[:, 0].std())
    # adapted metric recovers the true sd=10 axis; the identity metric's
    # shared step size under-explores it in the same budget
    assert abs(wide_sd_adapted - 10.0) < 2.0, wide_sd_adapted
    assert wide_sd_adapted > wide_sd_plain + 1.0
