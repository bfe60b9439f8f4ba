"""Plotting: predictive bands, latent-process posteriors, chain diagnostics,
annotated correlation heatmaps.

TPU-native re-design of the reference's ``Utility/visualization.py``,
``Utility/posterior_analysis.py:102-286`` (band plots, heatmaps),
``Utility/empirical_estimation.py:136-181`` (initializer plots) and the
annotated z/t heatmaps of ``Post_Process/z_value_plot.py``.  All figures are
written with the Agg backend; every function takes arrays (no file-format
coupling to the inference layers).
"""

from __future__ import annotations

import numpy as np
import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _save(fig, path):
    fig.savefig(path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def plot_mean_and_ci(ax, x, mean, lb, ub, color_mean="b", color_shading="r"):
    """(posterior_analysis.py:102-106)"""
    ax.fill_between(x, ub, lb, color=color_shading, alpha=0.5,
                    label="predictive 95% interval")
    ax.plot(x, mean, color=color_mean, label="predictive mean")


def plot_posterior(path, grid, percentiles, x=None, y=None, x_test=None, y_test=None,
                   attributes=None):
    """Predictive bands per task with train/test overlays.

    ``percentiles``: (G, 3, M) as returned by ``predict.*.predict_map``.
    Mirrors ``visualization.Plot_posterior{,_trainandtest}`` (:21-107).
    """
    pct = np.asarray(percentiles)
    g, _, m = pct.shape
    attributes = attributes or [f"Dim {i+1}" for i in range(m)]
    fig, axes = plt.subplots(m, 1, figsize=(8, 3 * m), squeeze=False)
    for j in range(m):
        ax = axes[j, 0]
        plot_mean_and_ci(ax, np.asarray(grid), pct[:, 1, j], pct[:, 0, j], pct[:, 2, j])
        if x is not None and y is not None:
            ax.scatter(np.asarray(x), np.asarray(y)[:, j], s=8, c="k", label="train")
        if x_test is not None and y_test is not None:
            ax.scatter(np.asarray(x_test), np.asarray(y_test)[:, j], s=10, c="g",
                       marker="^", label="test")
        ax.set_title(attributes[j])
        ax.legend(loc="best", fontsize=7)
    _save(fig, path)


def plot_latent_summary(path_prefix, x, summary, truth_tilde_l=None, truth_stds=None,
                        truth_cors=None, attributes=None):
    """Posterior bands of the GNMGP latent processes vs optional truth.

    ``summary``: a ``postprocess.analysis.LatentSummary``.  Mirrors
    ``posterior_analysis.visualization_pos`` (:109-179).
    """
    x = np.asarray(x)
    n, m = summary.std_q.shape[1], summary.std_q.shape[2]
    attributes = attributes or [f"Dim {i+1}" for i in range(m)]

    fig, ax = plt.subplots(figsize=(7, 4))
    plot_mean_and_ci(ax, x, summary.tilde_l_q[1], summary.tilde_l_q[0], summary.tilde_l_q[2])
    if truth_tilde_l is not None:
        ax.plot(x, np.asarray(truth_tilde_l), "k--", label="truth")
    ax.set_title("log lengthscale process")
    ax.legend(fontsize=7)
    _save(fig, f"{path_prefix}_log_l.png")

    fig, ax = plt.subplots(figsize=(7, 4))
    for j in range(m):
        ax.plot(x, summary.std_q[1, :, j], label=f"std {attributes[j]}")
        ax.fill_between(x, summary.std_q[0, :, j], summary.std_q[2, :, j], alpha=0.3)
        if truth_stds is not None:
            ax.plot(x, np.asarray(truth_stds)[:, j], "--", lw=1)
    ax.set_title("std processes")
    ax.legend(fontsize=7)
    _save(fig, f"{path_prefix}_std.png")

    for i in range(m):
        for j in range(i + 1, m):
            fig, ax = plt.subplots(figsize=(7, 4))
            plot_mean_and_ci(ax, x, summary.cor_q[1, :, i, j], summary.cor_q[0, :, i, j],
                             summary.cor_q[2, :, i, j])
            if truth_cors is not None and i == 0 and j == 1:
                ax.plot(x, np.asarray(truth_cors), "k--", label="truth")
            ax.set_title(f"correlation R_{attributes[i]}_{attributes[j]}")
            ax.legend(fontsize=7)
            _save(fig, f"{path_prefix}_R_{i}{j}.png")


def plot_empirical(path_prefix, x, est, attributes=None):
    """Initializer diagnostics (empirical_estimation.py:136-181)."""
    x = np.asarray(x)
    m = est.est_stds.shape[1]
    attributes = attributes or [f"Dim {i+1}" for i in range(m)]
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(x, np.log(est.est_ls), label="log est_l")
    ax.plot(x, np.log(est.smooth_ls), label="log smooth_l")
    ax.legend(fontsize=7)
    _save(fig, f"{path_prefix}_log_l.png")
    fig, ax = plt.subplots(figsize=(7, 4))
    for j in range(m):
        ax.plot(x, est.est_stds[:, j], label=attributes[j])
    ax.legend(fontsize=7)
    _save(fig, f"{path_prefix}_std.png")
    for i in range(m):
        for j in range(i + 1, m):
            fig, ax = plt.subplots(figsize=(7, 4))
            ax.plot(x, est.est_r[:, i, j])
            ax.set_title(f"empirical R_{attributes[i]}_{attributes[j]}")
            _save(fig, f"{path_prefix}_R_{i}{j}.png")


def plot_target_trace(path, target_hist):
    """Objective trace (Nonseparable_model.py:196-202)."""
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.asarray(target_hist))
    ax.set_xlabel("iteration")
    ax.set_ylabel("log posterior")
    _save(fig, path)


def plot_chain_diagnostics(path_prefix, samples, param_indices=None, max_lag=60):
    """Trace + ACF per selected parameter (mpiKAISER_extended.py:617-623)."""
    from .inference.diagnostics import acf

    s = np.asarray(samples)
    idx = param_indices if param_indices is not None else list(range(min(4, s.shape[1])))
    for j in idx:
        fig, axes = plt.subplots(1, 2, figsize=(10, 3))
        axes[0].plot(s[:, j], lw=0.6)
        axes[0].set_title(f"trace p[{j}]")
        rho = acf(s[:, j], max_lag)
        axes[1].bar(np.arange(len(rho)), rho, width=0.8)
        axes[1].set_title(f"ACF p[{j}]")
        _save(fig, f"{path_prefix}_p{j}.png")


def correlation_heatmap_sequence(path_prefix, cor_process, times=None, attributes=None,
                                 every: int = 1):
    """Per-time-point correlation heatmaps of an (N, M, M) correlation process.

    Mirrors the reference's heatmap "movies"
    (``posterior_analysis.visualization_pos_map_heatmap``, :222-286): one
    annotated frame per (subsampled) input point.
    """
    c = np.asarray(cor_process)
    n, m, _ = c.shape
    attributes = attributes or [f"Dim {i+1}" for i in range(m)]
    for i in range(0, n, every):
        label = f"t={times[i]:.3f}" if times is not None else f"t[{i}]"
        fig, ax = plt.subplots(figsize=(1.2 * m + 2, 1.0 * m + 2))
        im = ax.imshow(c[i], cmap="coolwarm", vmin=-1, vmax=1)
        ax.set_xticks(range(m), labels=attributes, rotation=45, ha="right")
        ax.set_yticks(range(m), labels=attributes)
        for a in range(m):
            for b in range(m):
                ax.text(b, a, f"{c[i, a, b]:.2f}", ha="center", va="center", fontsize=8)
        ax.set_title(label)
        fig.colorbar(im, ax=ax, shrink=0.8)
        _save(fig, f"{path_prefix}_{i:04d}.png")


def correlation_pdf_pages(path, subjects: dict, i: int = 0, j: int = 1):
    """Multi-page PDF of per-subject correlation-process bands.

    Mirrors ``Post_Process/past/generate_correlation_process_pdf.py``:
    one page per subject; each entry of ``subjects`` maps an ID to a dict with
    ``x`` (N,), ``cor_q`` (3, N) quantile band of R_ij(x).
    """
    from matplotlib.backends.backend_pdf import PdfPages

    with PdfPages(path) as pdf:
        for sid, rec in subjects.items():
            fig, ax = plt.subplots(figsize=(7, 4))
            x = np.asarray(rec["x"])
            q = np.asarray(rec["cor_q"])
            plot_mean_and_ci(ax, x, q[1], q[0], q[2])
            ax.set_ylim(-1.05, 1.05)
            ax.set_title(f"subject {sid}: R_{i}{j}(x)")
            ax.legend(fontsize=7)
            pdf.savefig(fig, bbox_inches="tight")
            plt.close(fig)


def annotated_heatmap(path, values, row_labels, col_labels, cmap="coolwarm",
                      center=0.0, fmt="{:.2f}"):
    """Annotated statistic heatmap (z/t values per vital-sign pair).

    Mirrors the custom ``heatmap``/``annotate_heatmap`` of
    ``Post_Process/z_value_plot.py`` with a symmetric color scale about
    ``center`` (its ``shiftedColorMap``).
    """
    v = np.asarray(values, float)
    vmax = np.nanmax(np.abs(v - center)) or 1.0
    fig, ax = plt.subplots(figsize=(1.2 * v.shape[1] + 2, 1.0 * v.shape[0] + 2))
    im = ax.imshow(v, cmap=cmap, vmin=center - vmax, vmax=center + vmax)
    ax.set_xticks(range(v.shape[1]), labels=col_labels, rotation=45, ha="right")
    ax.set_yticks(range(v.shape[0]), labels=row_labels)
    for i in range(v.shape[0]):
        for j in range(v.shape[1]):
            if np.isfinite(v[i, j]):
                ax.text(j, i, fmt.format(v[i, j]), ha="center", va="center", fontsize=8)
    fig.colorbar(im, ax=ax, shrink=0.8)
    _save(fig, path)


def synthetic_comparison_figure(
    path,
    x,
    truth,
    emp=None,
    map_vec=None,
    m: int = 2,
):
    """Truth vs empirical-init vs MAP latent-process figure.

    TPU-native analogue of ``SIM_code/synthetic_plot.py``: one panel per
    latent process — log-lengthscale, per-task std processes, and the (0,1)
    correlation process — each overlaying the simulation truth, the
    empirical initializer, and the GNMGP MAP estimate.

    ``truth``: a ``data.sim.SimData`` (or HeteroSimData); ``emp``: an
    ``inference.empirical.EmpiricalEstimate`` (optional); ``map_vec``: a
    fitted GNMGP parameter vector (optional).
    """
    import jax.numpy as jnp

    from .ops import transforms
    from .postprocess import analysis as analysis_mod

    x = np.asarray(x)
    n = x.shape[0]
    panels = 2 + m
    fig, axes = plt.subplots(panels, 1, figsize=(8, 2.6 * panels), sharex=True)

    def _latents_from_lvecs(l_vecs):
        ls = np.asarray(transforms.vec_to_tril(
            jnp.asarray(np.asarray(l_vecs).reshape(n, -1)), m))
        b = np.einsum("nab,ncb->nac", ls, ls)
        stds = np.sqrt(np.einsum("naa->na", b))
        cors = b[:, 0, 1] / (stds[:, 0] * stds[:, 1])
        return stds, cors

    # truth
    axes[0].plot(x, np.log(np.asarray(truth.l)), "k-", label="truth")
    t_stds, t_cors = _latents_from_lvecs(truth.l_vecs)
    for a in range(m):
        axes[1 + a].plot(x, t_stds[:, a], "k-", label="truth")
    axes[-1].plot(x, t_cors, "k-", label="truth")

    if emp is not None:
        axes[0].plot(x, np.log(np.asarray(emp.est_ls)), "g--", label="empirical init")
        e_stds, e_cors = _latents_from_lvecs(emp.est_l_vecs)
        for a in range(m):
            axes[1 + a].plot(x, e_stds[:, a], "g--", label="empirical init")
        axes[-1].plot(x, e_cors, "g--", label="empirical init")

    if map_vec is not None:
        tilde_l, _, cor_proc, std_proc = analysis_mod.gnmgp_map_latents(
            np.asarray(map_vec), n, m
        )
        axes[0].plot(x, tilde_l, "b-.", label="MAP")
        for a in range(m):
            axes[1 + a].plot(x, std_proc[:, a], "b-.", label="MAP")
        axes[-1].plot(x, cor_proc[:, 0, 1], "b-.", label="MAP")

    axes[0].set_ylabel("log lengthscale")
    for a in range(m):
        axes[1 + a].set_ylabel(f"std task {a}")
    axes[-1].set_ylabel("correlation")
    axes[-1].set_xlabel("x")
    axes[0].legend(loc="best", fontsize=8)
    fig.tight_layout()
    _save(fig, path)


def extrapolation_figure(
    path, x_train, y_train, x_test, y_test, grid, percentiles, attributes=None
):  # noqa: D401
    """Extrapolation-holdout prediction figure (one panel per task).

    The reference's extrapolation-mode evidence
    (``Post_Process/past/kaiser_extrapolation_plot.py`` around the
    ``data_split_extrapolation`` drivers): predictive bands over the full
    grid, training points, held-out future points, and a vertical line at
    the train/test boundary.
    """
    grid = np.asarray(grid)
    pct = np.asarray(percentiles)  # (G, 3, M)
    m = pct.shape[-1]
    x_train = np.asarray(x_train)
    y_train = np.asarray(y_train)
    fig, axes = plt.subplots(m, 1, figsize=(8, 2.6 * m), sharex=True)
    axes = np.atleast_1d(axes)
    boundary = float(x_train.max())
    for a in range(m):
        ax = axes[a]
        plot_mean_and_ci(ax, grid, pct[:, 1, a], pct[:, 0, a], pct[:, 2, a])
        ax.plot(x_train, y_train[:, a], "k.", ms=3, label="train")
        if x_test is not None and len(np.asarray(x_test)) > 0:
            ax.plot(np.asarray(x_test), np.asarray(y_test)[:, a], "rx", ms=4,
                    label="held-out")
        ax.axvline(boundary, color="gray", ls=":", lw=1)
        name = attributes[a] if attributes else f"task {a}"
        ax.set_ylabel(name)
    axes[-1].set_xlabel("x")
    axes[0].legend(loc="best", fontsize=8)
    fig.tight_layout()
    _save(fig, path)


def functional_boxplot_figure(path, grid, fbox: dict, curves=None, truth=None,
                              title=None):
    """Depth-based functional boxplot figure (res_summary.py:88-157's
    statsmodels ``fboxplot`` panels): 50% central envelope, functional
    median, fences, outlier replicates highlighted, optional truth overlay.

    ``fbox`` is the dict from ``postprocess.summary.functional_boxplot``.
    """
    grid = np.asarray(grid)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.fill_between(grid, fbox["env_lo"], fbox["env_hi"], color="m", alpha=0.35,
                    label="50% central region")
    ax.plot(grid, fbox["fence_lo"], "b--", lw=1, label="fences")
    ax.plot(grid, fbox["fence_hi"], "b--", lw=1)
    ax.plot(grid, fbox["median_curve"], "k", lw=2, label="functional median")
    if curves is not None:
        curves = np.asarray(curves)
        for i in fbox["outlier_idx"]:
            ax.plot(grid, curves[i], "r", lw=0.8, alpha=0.8,
                    label="outlier" if i == fbox["outlier_idx"][0] else None)
    if truth is not None:
        ax.plot(grid, np.asarray(truth), "g", lw=2, ls="-.", label="truth")
    if title:
        ax.set_title(title)
    ax.set_xlabel("x")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    _save(fig, path)


def group_histograms(path, values_by_group: dict, bins: int = 100,
                     xlabel="complete records"):
    """Per-group + pooled histograms (LAPS2_correlation.py:117-131's
    record-count figures), one panel per group plus the pooled panel."""
    names = list(values_by_group)
    fig, axes = plt.subplots(len(names) + 1, 1,
                             figsize=(7, 2.2 * (len(names) + 1)))
    axes = np.atleast_1d(axes)
    pooled = []
    for ax, name in zip(axes, names):
        v = np.asarray(values_by_group[name])
        pooled.append(v)
        ax.hist(v, bins=bins)
        ax.set_title(f"{name} (n={v.size})", fontsize=9)
    allv = np.concatenate(pooled) if pooled else np.zeros(0)
    axes[-1].hist(allv, bins=bins)
    axes[-1].set_title(f"all (n={allv.size})", fontsize=9)
    axes[-1].set_xlabel(xlabel)
    fig.tight_layout()
    _save(fig, path)


def waiting_time_figure(path, curves_by_group: dict, colors=("b", "r", "g", "m")):
    """Correlation-vs-stay-length cumulative curves with ±1 std bands
    (LAPS2_correlation.py:157-177's ``corr.png``).

    ``curves_by_group``: the dict from
    ``postprocess.stats.waitingtime_vs_correlation``.
    """
    fig, ax = plt.subplots(figsize=(7, 4))
    for (name, cur), col in zip(curves_by_group.items(), colors):
        d = np.asarray(cur["days"])
        if d.size == 0:
            continue
        mean, std = np.asarray(cur["mean"]), np.asarray(cur["std"])
        ax.plot(d, mean, col, label=name)
        ax.plot(d, mean - std, col, ls="--", lw=1)
        ax.plot(d, mean + std, col, ls="--", lw=1)
    ax.set_xlabel("Day")
    ax.set_ylabel("Correlation")
    ax.legend(loc="best", fontsize=8)
    fig.tight_layout()
    _save(fig, path)
