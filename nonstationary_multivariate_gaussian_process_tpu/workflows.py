"""End-to-end pipelines: the reference's L4 driver scripts as library functions.

The reference ships ~20 driver scripts sharing one skeleton (SURVEY §2.2):
load data → empirical estimation → train (multi-start Adam MAP → optional
HMC) → analysis/prediction/evaluation stages gated by ``do_*`` flags, with
pickles as the interface between stages.  Here the skeleton is one function
per scope:

* :func:`run_subject`  — the single-subject pipeline (base drivers,
  ``*_personalized``, ``*_KAISER_private``),
* :func:`run_sim_fleet` — the replicate fleet (``*_mpisim`` + ``sim_job`` +
  ``SIM_code/res_summary.py``), subject-sharded over the device mesh,

with a :class:`PipelineConfig` replacing the hardcoded ``do_*`` blocks and the
artifact store replacing the pickle tree.
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from . import evaluate, settings
from .data import preprocess, sim
from .inference import (
    diagnostics,
    empirical,
    hmc as hmc_mod,
    init as init_mod,
    map as map_mod,
)
from .models import FullData, gnmgp, gnmgp_hetero, gnmgp_sparse, lmc, snmgp
from .models import lmc_sparse, snmgp_sparse
from .parallel import fleet as fleet_mod
from .parallel.mesh import make_mesh
from .predict import gnmgp as pred_gnmgp, lmc as pred_lmc, snmgp as pred_snmgp
from .predict import gnmgp_hetero as pred_gnmgp_hetero
from .predict import gnmgp_sparse as pred_gnmgp_sparse
from .predict import lmc_sparse as pred_lmc_sparse
from .predict import snmgp_sparse as pred_snmgp_sparse
from .utils.artifacts import ArtifactStore

_MODELS = {"lmc": lmc, "snmgp": snmgp, "gnmgp": gnmgp, "gnmgp_hetero": gnmgp_hetero,
           "gnmgp_sparse": gnmgp_sparse, "gnmgp_hetero_sparse": gnmgp_sparse,
           "snmgp_sparse": snmgp_sparse, "lmc_sparse": lmc_sparse}
_PREDICT = {
    "lmc": pred_lmc,
    "snmgp": pred_snmgp,
    "gnmgp": pred_gnmgp,
    "gnmgp_hetero": pred_gnmgp_hetero,
    "gnmgp_sparse": pred_gnmgp_sparse,
    "gnmgp_hetero_sparse": pred_gnmgp_sparse,
    "snmgp_sparse": pred_snmgp_sparse,
    "lmc_sparse": pred_lmc_sparse,
}

# Driver-surface model registries: the example CLIs source their --model
# choices here, so the script surface can never lag the library (the
# reference's per-driver hardcoded model scripts have no analogue of this).
MODEL_CHOICES = tuple(_MODELS)  # run_subject / run_cohort / run_sim_fleet
HADAMARD_MODEL_CHOICES = (  # layouts with a Hadamard (one-obs-per-pair)
    #                         objective: run_subject_hadamard /
    #                         run_cohort_hadamard (the hetero pair has none)
    "lmc", "snmgp", "gnmgp", "lmc_sparse", "snmgp_sparse", "gnmgp_sparse",
)


@dataclasses.dataclass
class PipelineConfig:
    """Stage gates + budgets (the reference's ``do_*`` flag blocks +
    ``hyper_pars`` dicts, e.g. ``Nonseparable_model.py:253-275``)."""

    model: str = "gnmgp"
    hyper: dict = dataclasses.field(default_factory=dict)
    n_inducing: int = 64  # *_sparse models: inducing-input count m (latents
    #                       parametrized at m quantile-chosen inputs, kriged
    #                       to the data; likelihood is O(N M (mM)^2) — the
    #                       large-N tier, models/{gnmgp,snmgp,lmc}_sparse.py)
    sparse_approx: str = "fitc"  # *_sparse: "fitc" (diag-corrected) or
    #                       "vfe" (Titsias bound on the exact likelihood)
    refine_z: int = 0  # any sparse model, either layout: alternating
    #                       inducing-input refinement rounds after MAP — Z
    #                       descends the objective through the traced
    #                       kriging projections, then the latents refit at
    #                       the moved Z (gnmgp_sparse.refine_inducing; the
    #                       small-m fidelity lever, ROADMAP)
    refine_z_iters: int = 40  # Adam steps on Z per refinement round
    do_empirical: bool = True
    do_map: bool = True
    do_map_analysis: bool = True  # latent-process summaries from the MAP/chain
    do_hmc: bool = False
    do_pred_grid: bool = True
    do_pred_test: bool = True
    do_evaluation: bool = True
    do_loo: bool = False  # with do_hmc: WAIC + PSIS-LOO from the chain via
    #                       exact joint-MVN LOO conditionals (evaluate.psis_loo;
    #                       k-hat reliability lands in result["loo"])
    loo_draws: int = 200  # chain draws used for LOO (evenly thinned)
    n_opt: int = 1000
    lr: float = 2e-1
    map_method: str = "lbfgs"  # "lbfgs" (default: zoom-linesearch
    #                 quasi-Newton — measured on GNMGP N=200: 300 iters
    #                 reach nlp -4988 in 34s where Adam's 2000 iters reach
    #                 -4379 in 136s, predictive G/P/D 5.6x better, latent
    #                 recovery corr 0.58->0.77; inference/map.py) | "adam"
    #                 (the reference's optimizer contract,
    #                 Nonseparable_model.py:161-175 — kept reachable)
    err_opt: float | None = None
    n_hmc: int = 100
    sampler: str = "hmc"  # "hmc" (reference contract) | "nuts" (adaptive
    #                        trajectories + windowed warmup, inference/nuts.py)
    #                        | "drhmc" (delayed rejection: rejected proposals
    #                        retry at reduced step size — threads funnel
    #                        necks, inference/drhmc.py)
    #                        | "rmhmc" (SoftAbs RMHMC-within-Gibbs: a
    #                        position-dependent metric on the rm_k worst-
    #                        mixing pilot coordinates, inference/rmhmc.py)
    #                        | "chees" (n_chains lockstep chains with cross-
    #                        chain adaptive trajectory lengths — the many-
    #                        chain TPU posture, inference/chees.py; pooled
    #                        min-ESS/max-R̂ land in result["sampling"])
    #                        | "smc" (adaptive tempered SMC: a particle
    #                        population follows the prior→posterior path —
    #                        the between-basin posture, inference/smc.py;
    #                        the evidence estimate lands in
    #                        result["sampling"]["log_evidence"])
    smc_particles: int = 0  # smc population size (0 = max(256, n_hmc))
    smc_mutations: int = 5  # smc batched-HMC decorrelation sweeps per stage
    smc_leapfrog: int = 10  # smc leapfrog steps per mutation sweep
    smc_cess: float = 0.5  # smc conditional-ESS target for the beta schedule
    smc_dr: float = 0.0  # smc >0: delayed-rejection sweeps at eps/this
    escalate_rhat: float = 1.2  # >0: cohort subjects whose multichain max
    #                  split-R-hat exceeds this are automatically re-sampled
    #                  by tempered SMC inside the bucket (chains where they
    #                  work, the population sampler where diagnostics prove
    #                  they don't).  ON by default: at the reference scale
    #                  (N=200) every chain tier's split-R-hat is ~1e3 while
    #                  SMC metric="full" reproduces log-evidence to ~1 nat
    #                  (ROADMAP "Adaptive tempered SMC") — a default cohort
    #                  run should return the measured-trustworthy posture
    #                  without extra flags.  0 = off (chains kept as-is).
    smc_polish: int = 0  # extra mutation-only stages at beta=1 (cheap
    #                  decorrelation against resampling coalescence)
    smc_resample_ess: float = 1.0  # <1: resample only when the carried-
    #                  weight ESS fraction drops below this (Del Moral et
    #                  al. adaptive resampling; fewer resampling
    #                  generations = less coalescence); 1.0 = every stage
    smc_resample: str = "systematic"  # resampling scheme: systematic |
    #                  stratified | residual | multinomial (inference/smc)
    smc_ref: str = "prior"  # SMC reference distribution: "prior" (N(0,I)
    #                  in the whitened space — the exact latent-GP prior)
    #                  or "pathfinder" (multipathfinder posterior moments
    #                  seed ref_mean/ref_scale: the tempering path starts
    #                  posterior-shaped, cutting stages; inference/pathfinder)
    pf_khat_max: float = 0.7  # pathfinder->SMC ref gate: seed only when
    #                  the PSIS diagnostic says the proposal is reliable
    #                  (k_hat <= this); above it the prior reference is
    #                  used and pf_ref_used=False is recorded — an
    #                  unreliable seed is a measured negative (ROADMAP)
    pf_paths: int = 8  # pathfinder: independent L-BFGS paths (vmapped)
    pf_iters: int = 100  # pathfinder: L-BFGS iterations per path
    pf_draws: int = 400  # pathfinder: draws per path pooled for PSIS
    pf_inflate: float = 1.25  # pathfinder->SMC ref: scale inflation (IS
    #                  wants overdispersed proposals; also floored at 0.05
    #                  whitened-prior units so no slot starts degenerate)
    pf_sweep_chunk: int = 256  # pathfinder: potential rows per dispatched
    #                  ELBO/draw-sweep block (lax.map); bounds live HBM —
    #                  a flat paths*iters*n_elbo sweep faults the chip at
    #                  N=200 — while keeping MXU batches large.  0 = flat
    smc_waste_free: int = 0  # >=2: waste-free SMC (Dau & Chopin 2022) —
    #                  resample only N/L ancestors per stage, keep every
    #                  state of their length-L mutation chains as the next
    #                  population (duplicates purge in one stage; same
    #                  sweep compute as smc_mutations = L-1)
    smc_metric: str = "full"  # mutation metric: full population covariance
    #                  (affine-invariant — aligns with the measured GNMGP
    #                  collective ridge; N=200/TPU: logz run-to-run spread
    #                  113 nats -> 0.9 nats vs "diag") or per-coordinate
    #                  "diag" scales
    dr_stages: int = 3  # drhmc proposal stages (1 = plain HMC)
    dr_reduction: float = 4.0  # drhmc per-stage step-size reduction
    rm_k: int = 12  # rmhmc subspace size (worst-mixing pilot coordinates)
    rm_leapfrog: int = 6  # rmhmc generalized-leapfrog steps per draw
    rm_step_size: float = 0.2  # rmhmc initial subspace step size (adapted)
    rm_fp: int = 6  # rmhmc fixed-point iterations per implicit half-step
    hmc_step_size: float = 1e-4
    hmc_leapfrog: int = 20
    hmc_adapt: bool = False  # dual-averaging step-size adaptation
    hmc_warmup: int = 0  # for "nuts": 0 means an automatic max(100, n_hmc)
    hmc_mass: str = "none"  # "none" | "pilot" (mass matrix from a pilot run,
    #                          the reference's preconditioning recipe)
    #                          | "window" (Stan-style windowed warmup)
    whiten: bool | str = False  # False | True/"prior": sample the
    #                       prior-whitened latent-GP blocks (inference/
    #                       whiten.py) | "pncp": partially non-centered —
    #                       a pilot chain retunes every eigendirection to
    #                       its *posterior* scale (whiten.retune).  Same
    #                       posterior either way; samples are returned in
    #                       the natural space.
    pncp_pilot: int = 200  # pilot-chain draws for whiten="pncp"
    pncp_interp: float = 1.0  # 0 = keep prior whitening, 1 = fully
    #                           posterior-scaled (whiten.retune interp)
    cohort_sampler: str = "auto"  # cohort drivers' posterior-sampling
    #                       posture.  "auto" (default): trustworthy —
    #                       whitened adaptive NUTS chains regardless of
    #                       `sampler`/`whiten` (those fields keep serving
    #                       run_subject); "config": follow `sampler`/`whiten`
    #                       exactly (the reference-contract fixed-HMC tier).
    #                       Either way per-subject min-ESS/max-R̂ are computed
    #                       and surfaced (`subjects[sid]["sampling"]`).
    n_chains: int = 2  # chains per subject for cohort sampling (chain 0
    #                    starts at the MAP, the rest at jittered inits;
    #                    split-R̂ runs across chains).  1 = single chain.
    n_grid: int = 201
    window_size: int = 30
    test_size: float = 0.0
    seed: int = 0


def _run_chain(nlp, map_vec, cfg: PipelineConfig, key, whitener=None):
    """Posterior sampling stage: reference-contract HMC or adaptive NUTS.

    Returns ``(samples ndarray, mean acceptance)``.  ``cfg.sampler`` picks the
    engine; ``cfg.hmc_mass`` picks HMC preconditioning ("pilot" = the
    reference's pilot-covariance recipe, "window" = Stan-style windowed
    warmup adapting a diagonal metric on the fly).  With a ``whitener`` the
    chain runs in the prior-whitened space and samples are mapped back.
    """
    if whitener is not None:
        pot = whitener.wrap(nlp)
        samples, accept = _run_chain(
            pot, whitener.to_white(map_vec),
            dataclasses.replace(cfg, whiten=False), key,
        )
        return np.asarray(whitener.from_white_batch(samples)), accept
    if cfg.sampler == "nuts":
        from .inference import nuts as nuts_mod

        n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
        chain = nuts_mod.nuts_sample(
            nlp, map_vec, cfg.n_hmc, key,
            step_size=cfg.hmc_step_size, n_warmup=n_warm,
        )
        accept = float(np.mean(np.asarray(chain.accept_stat)[n_warm:]))
        return np.asarray(chain.samples), accept
    if cfg.sampler == "drhmc":
        # delayed-rejection HMC: rejected proposals retry at reduced step
        # size — for posteriors with funnel necks (inference/drhmc.py)
        from .inference import drhmc as drhmc_mod

        n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
        chain = drhmc_mod.drhmc_sample(
            nlp, map_vec, cfg.n_hmc, key,
            step_size=cfg.hmc_step_size, n_leapfrog=cfg.hmc_leapfrog,
            n_warmup=n_warm, n_stages=cfg.dr_stages,
            reduction=cfg.dr_reduction,
        )
        accept = float(np.mean(np.asarray(chain.accept_stage)[n_warm:] > 0))
        return np.asarray(chain.samples), accept
    if cfg.sampler == "rmhmc":
        # SoftAbs RMHMC-within-Gibbs: a pilot chain picks the rm_k worst-
        # mixing coordinates; those get a position-dependent metric while
        # the full vector keeps plain HMC sweeps (inference/rmhmc.py)
        from .inference import rmhmc as rmhmc_mod

        n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
        k_pilot, k_main = jax.random.split(key)
        pilot = hmc_mod.hmc_sample(
            nlp, map_vec, cfg.pncp_pilot, k_pilot,
            step_size=cfg.hmc_step_size, n_leapfrog=cfg.hmc_leapfrog,
            n_warmup=cfg.pncp_pilot, adapt_step_size=True,
        )
        idx = rmhmc_mod.slowest_coords(
            np.asarray(pilot.samples), min(cfg.rm_k, int(map_vec.shape[0]))
        )
        chain = rmhmc_mod.rmhmc_gibbs_sample(
            nlp, map_vec, cfg.n_hmc, k_main, idx=idx,
            step_size=cfg.hmc_step_size, rm_step_size=cfg.rm_step_size,
            n_leapfrog=cfg.hmc_leapfrog, rm_leapfrog=cfg.rm_leapfrog,
            n_fp=cfg.rm_fp, n_warmup=n_warm,
            # off-CPU: per-draw dispatch — the monolithic third-order-AD
            # scan faults the tunneled TPU (same class and same fix as
            # SMC's host stage loop; draws bit-identical either way)
            dispatch=("device" if jax.devices()[0].platform == "cpu"
                      else "host"),
        )
        accept = float(np.mean(np.asarray(chain.accept_prob)[n_warm:]))
        return np.asarray(chain.samples), accept
    if cfg.sampler == "chees":
        # many-chain tier (whitening was already peeled off above); the
        # pooled diagnostics are recomputed by callers that surface them
        samples, accept, _ = _run_chain_chees(nlp, map_vec, cfg, key)
        return samples, accept
    if cfg.sampler == "smc":
        # tempered-SMC tier (whitening already peeled off above); callers
        # that surface evidence/diagnostics call _run_chain_smc directly
        samples, accept, _ = _run_chain_smc(nlp, map_vec, cfg, key)
        return samples, accept
    if cfg.sampler == "pathfinder":
        # variational tier (whitening already peeled off above)
        samples, accept, _ = _run_chain_pathfinder(nlp, map_vec, cfg, key)
        return samples, accept
    if cfg.sampler != "hmc":
        raise ValueError(
            f"unknown sampler {cfg.sampler!r} "
            "(want 'hmc', 'nuts', 'drhmc', 'rmhmc', 'chees', 'smc' or "
            "'pathfinder')"
        )
    mass = None
    if cfg.hmc_mass == "pilot":
        # mass matrix from a short pilot chain's sample covariance
        # (Nonseparable_model_mpiKAISER_extended.py:542-570 recipe)
        pilot = hmc_mod.hmc_sample(
            nlp, map_vec, max(20, cfg.n_hmc // 10), jax.random.fold_in(key, 7),
            step_size=cfg.hmc_step_size, n_leapfrog=cfg.hmc_leapfrog,
        )
        mass = hmc_mod.estimate_mass_matrix(pilot.samples)
    chain = hmc_mod.hmc_sample(
        nlp, map_vec, cfg.n_hmc, key, step_size=cfg.hmc_step_size,
        n_leapfrog=cfg.hmc_leapfrog, adapt_step_size=cfg.hmc_adapt,
        n_warmup=cfg.hmc_warmup, mass_matrix=mass,
        adapt_mass=(cfg.hmc_mass == "window"),
    )
    return np.asarray(chain.samples), float(np.mean(np.asarray(chain.accept_prob)))


def _run_chain_chees(nlp, map_vec, cfg: PipelineConfig, key, whitener=None):
    """ChEES-HMC sampling stage (``cfg.sampler == "chees"``).

    Runs ``max(2, cfg.n_chains)`` lockstep chains with cross-chain adaptive
    trajectory lengths (inference/chees.py) — chain 0 starts at the MAP, the
    rest jittered (the fleet multichain convention).  Returns
    ``(samples, accept, sampling)`` where ``samples`` is the pooled
    ``(K * n_hmc, P)`` draw matrix in the natural space (chain-major, so
    downstream chain-sample prediction consumes it unchanged) and
    ``sampling`` carries the honest pooled diagnostics — rank-normalized
    cross-chain min-ESS and max split-R̂ computed on natural-space
    coordinates — plus the tuned step size and trajectory length.
    """
    from .inference import chees as chees_mod
    from .inference import diagnostics as diag_mod
    from .inference import init as init_mod

    pot = nlp if whitener is None else whitener.wrap(nlp)
    q0 = map_vec if whitener is None else whitener.to_white(map_vec)
    n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
    k_start, k_run = jax.random.split(key)
    starts = init_mod.multichain_starts(
        pot, q0, max(2, cfg.n_chains), k_start,
    )
    r = chees_mod.chees_sample(
        pot, starts, cfg.n_hmc, k_run,
        step_size=cfg.hmc_step_size,
        n_warmup=n_warm,
    )
    k, s, p = r.samples.shape
    flat = np.asarray(r.samples.reshape(k * s, p))
    if whitener is not None:
        flat = np.asarray(whitener.from_white_batch(flat))
    nat = flat.reshape(k, s, p)
    cols = range(0, p, 7)  # the sampler-bench column subsample convention
    min_ess = float(min(diag_mod.ess_multichain(nat[:, :, j]) for j in cols))
    max_rhat = float(np.max(diag_mod.rhat(nat)))
    accept = float(np.mean(np.asarray(r.accept_prob)[n_warm:]))
    sampling = {
        "sampler": "chees",
        "chains": int(k),
        "min_ess": min_ess,
        "max_rhat": max_rhat,
        "accept": accept,
        "step_size": float(r.step_size),
        "trajectory_length": float(r.trajectory_length),
        "mean_leapfrog": float(np.mean(np.asarray(r.n_leapfrog))),
    }
    return flat, accept, sampling


def _run_chain_pathfinder(nlp, map_vec, cfg: PipelineConfig, key,
                          whitener=None):
    """Pathfinder variational stage (``cfg.sampler == "pathfinder"``).

    Seconds-scale approximate posterior: ``cfg.pf_paths`` vmapped L-BFGS
    paths from jittered starts, ELBO-selected low-rank Gaussians, pooled
    PSIS-resampled draws (inference/pathfinder.py).  Returns
    ``(samples, accept, sampling)`` in the ``_run_chain_smc`` contract —
    ``accept`` is NaN (no Metropolis step exists here) and ``sampling``
    carries the PSIS ``k_hat`` diagnostic (> 0.7 = unreliable proposal,
    escalate to ``sampler="smc"``) plus the importance-sampling evidence
    estimate (sanity check only; the SMC telescope stays the calibrated
    one).
    """
    from .inference import pathfinder as pf_mod

    pot = nlp if whitener is None else whitener.wrap(nlp)
    q0 = map_vec if whitener is None else whitener.to_white(map_vec)
    r = pf_mod.multipathfinder(
        pot, q0, key, n_paths=cfg.pf_paths, max_iters=cfg.pf_iters,
        n_draws=cfg.pf_draws, n_out=max(cfg.n_hmc, 1),
        sweep_chunk=cfg.pf_sweep_chunk,
    )
    parts = np.asarray(
        r.draws if whitener is None
        else whitener.from_white_batch(r.draws)
    )
    logev = float(r.log_evidence)
    sampling = {
        "sampler": "pathfinder",
        "n_paths": int(cfg.pf_paths),
        "k_hat": float(r.k_hat),
        "elbo_best": float(np.max(np.asarray(r.elbos))),
        "log_evidence_is": logev if whitener is None
        else logev + float(whitener.logdet()),
    }
    return parts[: cfg.n_hmc], float("nan"), sampling


def _run_chain_smc(nlp, map_vec, cfg: PipelineConfig, key, whitener=None):
    """Adaptive tempered SMC sampling stage (``cfg.sampler == "smc"``).

    A particle population follows the prior→posterior tempering path
    (inference/smc.py) — the between-basin posture where chain samplers
    measured at N=200 equilibrate at disagreeing levels.  Returns
    ``(samples, accept, sampling)``: ``samples`` are ``cfg.n_hmc``
    natural-space particles (exchangeable, so the leading subset of the
    population is a valid draw matrix for chain-sample prediction), and
    ``sampling`` carries the tempering diagnostics plus the log model
    evidence (``logz`` mapped through ``Whitener.logdet()`` when whitened —
    exact Bayes-factor model comparison, beyond evaluate.py's AIC/BIC/DIC).
    """
    from .inference import smc as smc_mod

    pot = nlp if whitener is None else whitener.wrap(nlp)
    # never return fewer draws than asked: the population at least n_hmc
    n_particles = max(cfg.smc_particles or 256, cfg.n_hmc)
    # off-CPU, dispatch stages from the host: the tunneled TPU runtime
    # faults minutes-long single-program executions (CLAUDE.md); the
    # draws are bit-identical either way (tests/test_smc.py)
    dispatch = "device" if jax.devices()[0].platform == "cpu" else "host"
    ref_kw = {}
    pf_info = {}
    if cfg.smc_ref == "pathfinder":
        # posterior-shaped reference: multipathfinder moments replace the
        # N(0, I) prior reference, so the geometric path starts most of
        # the way to the posterior (fewer tempering stages; logz stays
        # exact — the reference is a normalized Gaussian either way)
        from .inference import pathfinder as pf_mod

        key, k_pf = jax.random.split(key)
        t_pf = time.time()
        q0 = map_vec if whitener is None else whitener.to_white(map_vec)
        mpf = pf_mod.multipathfinder(
            pot, q0, k_pf, n_paths=cfg.pf_paths, max_iters=cfg.pf_iters,
            n_draws=cfg.pf_draws, n_out=cfg.pf_draws,
            sweep_chunk=cfg.pf_sweep_chunk,
        )
        pf_info = {"smc_ref": "pathfinder", "pf_k_hat": float(mpf.k_hat),
                   "pf_wall_s": round(time.time() - t_pf, 2)}
        if float(mpf.k_hat) > cfg.pf_khat_max:
            # the seed is gated on pathfinder's own PSIS diagnostic:
            # measured at the reference scale (N=200, TPU, 6 runs), a
            # k_hat=inf proposal's moments misplace the reference and
            # poison the telescope — logz -8016 +/- 4797 vs the prior
            # reference's 4901.6 +/- 0.8, min-ESS 0.8, ~45 stages vs ~24
            # (ROADMAP).  An unreliable proposal forfeits the seed; the
            # N(0, I) prior reference is always sound.
            pf_info["pf_ref_used"] = False
        else:
            ref_kw = dict(
                ref_mean=mpf.ref_mean,
                ref_scale=jnp.clip(
                    cfg.pf_inflate * mpf.ref_scale, 0.05, 10.0
                ),
            )
            pf_info["pf_ref_used"] = True
    elif cfg.smc_ref != "prior":
        raise ValueError(f"unknown smc_ref {cfg.smc_ref!r} "
                         "(want 'prior' or 'pathfinder')")
    r = smc_mod.smc_sample(
        pot, int(map_vec.shape[0]), key, n_particles, **ref_kw,
        n_mutations=cfg.smc_mutations, n_leapfrog=cfg.smc_leapfrog,
        target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
        metric=cfg.smc_metric, n_polish=cfg.smc_polish,
        waste_free=cfg.smc_waste_free,
        resample_ess=cfg.smc_resample_ess,
        resample=cfg.smc_resample,
        dispatch=dispatch,
    )
    parts = np.asarray(
        r.particles if whitener is None
        else whitener.from_white_batch(r.particles)
    )
    ns = int(r.n_stages)
    logz = float(r.logz)
    # n_stages counts tempering + polish calls; the history arrays hold
    # max_stages entries — clip like the fleet path's jnp.take
    last = min(max(ns - 1, 0), int(r.accept.shape[0]) - 1)
    sampling = {
        "sampler": "smc",
        "n_particles": int(n_particles),
        "n_stages": ns,
        "beta_final": float(r.beta_final),
        "log_evidence": logz if whitener is None
        else logz + float(whitener.logdet()),
        "final_accept": float(np.asarray(r.accept)[last]),
        "step_size": float(np.asarray(r.step_sizes)[last]),
        **pf_info,
    }
    accept = sampling["final_accept"]
    return parts[: cfg.n_hmc], accept, sampling


def _make_sampling_whitener(nlp, map_vec, cfg: PipelineConfig, key, x, n, m,
                            hadamard: bool = False):
    """Build the whitener for the sampling stage per ``cfg.whiten``.

    ``True``/``"prior"`` → prior-factor whitening.  ``"pncp"`` → partially
    non-centered: a short prior-whitened pilot chain (``cfg.pncp_pilot``
    draws) estimates every eigendirection's posterior scale and
    ``whiten.retune`` rebuilds the map around it (plus a diagonal scale for
    the raw hypers), so the main chain is preconditioned in likelihood- and
    prior-dominated directions alike.
    """
    if not cfg.whiten:
        return None
    from .inference import whiten as whiten_mod

    # the sparse layouts ARE the dense layouts with (x, N) -> (Z, m_z); the
    # caller passes x=Z, n=m_z, so the dense whiteners apply verbatim
    model_name = {"gnmgp_sparse": "gnmgp",
                  "gnmgp_hetero_sparse": "gnmgp_hetero",
                  "snmgp_sparse": "snmgp",
                  "lmc_sparse": "lmc"}.get(cfg.model, cfg.model)
    if cfg.whiten == "pncp":
        w = whiten_mod.make_whitener(model_name, x, n, m, cfg.hyper,
                                     hadamard=hadamard, mode="eig")
        pilot_cfg = dataclasses.replace(cfg, n_hmc=cfg.pncp_pilot, whiten=False)
        pilot, _ = _run_chain(nlp, map_vec, pilot_cfg,
                              jax.random.fold_in(key, 11), whitener=w)
        return whiten_mod.retune(w, pilot, interp=cfg.pncp_interp)
    if cfg.whiten in (True, "prior"):
        return whiten_mod.make_whitener(model_name, x, n, m, cfg.hyper,
                                        hadamard=hadamard)
    raise ValueError(f"unknown whiten setting {cfg.whiten!r} "
                     "(want False, True, 'prior' or 'pncp')")


#: Bucket subject length at/above which the adaptive-NUTS chain program on
#: a SINGLE real chip enters the tunneled runtime's device-fault class
#: (depth-8 trees × warmup+draws × tiled chains = a minutes-long single
#: program — observed kernel fault at N=200, benchmarks/cohort_tpu_run.py).
SINGLE_CHIP_NUTS_N = 128


def _cohort_sampling_posture(cfg: PipelineConfig, n_bucket: int | None = None,
                             mesh=None):
    """Resolve (sampler, whiten) for cohort posterior sampling.

    ``cohort_sampler="auto"`` is the trustworthy default: whitened adaptive
    NUTS — the configuration measured to dominate fixed-budget HMC on these
    posteriors (inference/whiten.py, benchmarks/sampler_bench.py).  On a
    *single non-CPU chip* with bucket subjects at/above
    ``SINGLE_CHIP_NUTS_N``, auto resolves to ``"hmc_auto"`` instead:
    whitened fixed-trajectory chains with warmup + step-size adaptation —
    a seconds-long program where NUTS's variable-depth trees are the
    minutes-long device-fault class (CLAUDE.md).  Statistically equivalent
    at that scale: every chain tier measures identically non-mixed there
    (split-R-hat ~1e3, ROADMAP), so the chains' production role is the
    R-hat diagnostic feeding the SMC escalation, which fixed trajectories
    serve equally.  ``"config"`` follows ``cfg.sampler``/``cfg.whiten``
    verbatim.
    """
    if cfg.cohort_sampler == "auto":
        if (n_bucket is not None and n_bucket >= SINGLE_CHIP_NUTS_N
                and fleet_mod.resolve_smc_dispatch("auto", mesh) == "host"):
            return "hmc_auto", True
        return "nuts", True
    if cfg.cohort_sampler == "config":
        return cfg.sampler, bool(cfg.whiten)
    raise ValueError(f"unknown cohort_sampler {cfg.cohort_sampler!r} "
                     "(want 'auto' or 'config')")


def _tile_chains(x, y, vecs, mask, n_chains: int, key, *,
                 model: str | None = None, hyper: dict | None = None,
                 indx=None, m: int | None = None, descend_iters: int = 300):
    """Tile a bucket's subjects across ``n_chains`` jittered chains.

    Unit ``i*C + c`` is chain c of subject i; chain 0 starts at the MAP and
    the rest at jittered inits (the :func:`parallel.fleet.hmc_fleet_multichain`
    recipe), so split-R̂ across chains detects non-mixing.  When ``model``
    is given, the jittered units are pulled back into the typical set with
    ``descend_iters`` guarded Adam steps of their own posterior
    (``parallel.fleet.descend_starts``; raw jitter strands chains above the
    typical set and warmup never relaxes them — measured numbers in
    ``inference.init.multichain_starts``).  ``indx``/``m`` select the
    Hadamard layout.
    """
    c = max(1, n_chains)
    if c == 1:
        return x, y, vecs, mask
    x_t = jnp.repeat(x, c, axis=0)
    y_t = jnp.repeat(y, c, axis=0)
    mask_t = jnp.repeat(mask, c, axis=0)
    q = jnp.repeat(vecs, c, axis=0)
    jit_mask = (jnp.arange(q.shape[0]) % c) > 0
    q = q + jnp.where(
        jit_mask[:, None], 0.05 * jax.random.normal(key, q.shape, q.dtype), 0.0
    )
    if model is not None and descend_iters > 0:
        if indx is not None:
            indx_t = jnp.repeat(indx, c, axis=0)
            q = fleet_mod.descend_starts_hadamard(
                model, x_t, indx_t, y_t, m, q, hyper=hyper, masks=mask_t,
                iters=descend_iters, keep=~jit_mask,
            )
        else:
            q = fleet_mod.descend_starts(
                model, x_t, y_t, q, hyper=hyper, masks=mask_t,
                iters=descend_iters, keep=~jit_mask,
            )
    return x_t, y_t, q, mask_t


def _sampling_record(chains: np.ndarray, n_chains: int) -> dict:
    """Per-subject sampling-health record from (C, T, P) draws."""
    d = diagnostics.chain_diagnostics(chains, stride=7)
    rec = {
        "min_ess": d["min_ess"],
        "median_ess": d["median_ess"],
        "max_rhat": d["max_rhat"],
        "n_chains": n_chains,
    }
    if d["max_rhat"] > 1.1 or d["min_ess"] < 10.0:
        rec["warning"] = (
            f"chains may not have mixed: min-ESS {d['min_ess']:.1f}, "
            f"max split-R̂ {d['max_rhat']:.3f} — at this scale longer "
            "chains were measured NOT to help (inference/drhmc.py); "
            "switch to cohort_sampler='config' with sampler='smc' "
            "(the configuration whose independent runs agree at N=200, "
            "inference/smc.py) or inspect the trace before using "
            "sample-based summaries"
        )
    return rec


def _validate_subject(x, y):
    """Named validation errors for degenerate inputs (instead of reshape
    errors surfacing from deep inside the variogram/kernel code)."""
    if x.ndim != 1:
        raise ValueError(f"x must be 1-D (N,), got shape {x.shape}")
    if y.ndim != 2:
        raise ValueError(f"Y must be 2-D (N, M), got shape {y.shape}")
    if x.shape[0] != y.shape[0]:
        raise ValueError(f"x and Y disagree on N: {x.shape[0]} vs {y.shape[0]}")
    if x.shape[0] < 4:
        raise ValueError(f"need at least 4 observations, got {x.shape[0]}")
    if y.shape[1] < 1:
        raise ValueError("Y must have at least one task column")
    if not np.all(np.isfinite(x)) or not np.all(np.isfinite(y)):
        raise ValueError("x/Y contain non-finite values")


def _validate_hadamard(x, indx, y, m):
    if x.ndim != 1 or indx.ndim != 1 or y.ndim != 1:
        raise ValueError(
            f"Hadamard layout needs 1-D x/indx/y, got {x.shape}/{indx.shape}/{y.shape}"
        )
    if not (x.shape[0] == indx.shape[0] == y.shape[0]):
        raise ValueError(
            f"x/indx/y lengths differ: {x.shape[0]}/{indx.shape[0]}/{y.shape[0]}"
        )
    if x.shape[0] < 4:
        raise ValueError(f"need at least 4 observations, got {x.shape[0]}")
    if indx.min() < 0 or indx.max() >= m:
        raise ValueError(f"task indices must lie in [0, {m}), got "
                         f"[{indx.min()}, {indx.max()}]")
    if not np.all(np.isfinite(x)) or not np.all(np.isfinite(y)):
        raise ValueError("x/y contain non-finite values")


def _build_inits(cfg, emp, x, y, key, z=None):
    n, m = y.shape
    model = cfg.model
    if model == "lmc":
        return {"empirical": init_mod.lmc_from_empirical(emp, n, m)}
    if model == "lmc_sparse":
        # the stationary layout is N-free already
        return {"empirical": init_mod.lmc_from_empirical(emp, n, m)}
    if model == "snmgp_sparse":
        dense = init_mod.snmgp_from_empirical(emp, n, m)
        return {"empirical": snmgp_sparse.init_from_empirical(
            dense, n, z.shape[0], m, x, z)}
    if model in ("gnmgp_sparse", "gnmgp_hetero_sparse"):
        # subsample the dense empirical init onto the inducing layout — no
        # separable warm-start fit (that costs the O((MN)^3) this tier avoids)
        dense = init_mod.gnmgp_from_empirical(emp, n, m)
        v = gnmgp_sparse.init_from_empirical(dense, n, z.shape[0], m, x, z)
        if model == "gnmgp_hetero_sparse":
            # broadcast the homoscedastic noise over the (Z x task) process
            v = jnp.concatenate(
                [v[:-1], jnp.full((z.shape[0] * m,), v[-1], v.dtype)]
            )
        return {"empirical": v}
    if model == "snmgp":
        lmc_nlp = lmc.make_objective(FullData(x, y))
        lmc_res = map_mod.fit_map(
            lmc_nlp, init_mod.lmc_from_empirical(emp, n, m), n_iters=min(cfg.n_opt, 500), lr=0.1
        )
        return {
            "stationary": init_mod.snmgp_from_stationary(lmc_res.vec, n),
            "empirical": init_mod.snmgp_from_empirical(emp, n, m),
            "combined": init_mod.snmgp_combined(lmc_res.vec, emp, n, m),
        }
    # gnmgp / gnmgp_hetero: warm-start from a short separable fit + empirical
    sn_nlp = snmgp.make_objective(FullData(x, y))
    sn_res = map_mod.fit_map(
        sn_nlp, init_mod.snmgp_from_empirical(emp, n, m), n_iters=min(cfg.n_opt, 500), lr=0.2
    )
    inits = {
        "separable": init_mod.gnmgp_from_separable(sn_res.vec, n, m),
        "empirical": init_mod.gnmgp_from_empirical(emp, n, m),
    }
    if model == "gnmgp_hetero":
        # broadcast the homoscedastic noise over the (input x task) process
        # (the extended driver warm-starts from the homoscedastic MAP,
        # Nonseparable_model_mpiKAISER_extended.py:317-328)
        inits = {
            name: gnmgp_hetero.init_from_gnmgp(v, n, m) for name, v in inits.items()
        }
    return inits


def run_subject(
    x,
    y,
    cfg: PipelineConfig | None = None,
    store: ArtifactStore | None = None,
    subject: Any = 0,
    dataset: str = "data",
) -> dict:
    """Single-subject pipeline: empirical init → multi-start MAP → HMC →
    grid/test prediction → scoring.  Returns a result dict; stages are also
    written to ``store`` when provided (resumable per stage)."""
    cfg = cfg or PipelineConfig()
    key = jax.random.PRNGKey(cfg.seed)
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    _validate_subject(x, y)
    if cfg.test_size > 0:
        x, x_test, y, y_test = preprocess.data_split(x, y, test_size=cfg.test_size)
    else:
        x_test = y_test = None
    n, m = y.shape
    xd, yd = jnp.asarray(x, settings.dtype), jnp.asarray(y, settings.dtype)
    data = FullData(xd, yd)
    model = _MODELS[cfg.model]
    result: dict = {"model": cfg.model, "n": n, "m": m, "timings": {}}

    def _key(stage):
        return ArtifactStore.key(cfg.model, dataset, subject, stage)

    if store is not None and not store.exists(_key("data")):
        # conditioning data rides the store so a serving engine can stand up
        # from the artifact root alone (serving/engine.py)
        store.save(_key("data"), x=np.asarray(x), y=np.asarray(y))

    t0 = time.time()
    emp = empirical.local_estimation(x, y, window_size=min(cfg.window_size, max(2, n // 3)))
    result["timings"]["empirical"] = time.time() - t0
    result["empirical"] = emp

    sparse = cfg.model.endswith("_sparse")
    hsparse = cfg.model == "gnmgp_hetero_sparse"
    if hsparse:
        nlp, sp_ops = gnmgp_sparse.make_objective_hetero(
            data, n_inducing=cfg.n_inducing, approx=cfg.sparse_approx,
            hyper=cfg.hyper,
        )
        m_z = int(sp_ops.base.z.shape[0])
        result["n_inducing"] = m_z
        result["sparse_approx"] = cfg.sparse_approx
    elif sparse:
        # gnmgp_sparse / snmgp_sparse / lmc_sparse share the (nlp, ops)
        # make_objective contract
        nlp, sp_ops = model.make_objective(
            data, n_inducing=cfg.n_inducing, approx=cfg.sparse_approx,
            hyper=cfg.hyper,
        )
        m_z = int(sp_ops.z.shape[0])
        result["n_inducing"] = m_z
        result["sparse_approx"] = cfg.sparse_approx
    else:
        nlp = model.make_objective(data, hyper=cfg.hyper)
        sp_ops = None
        m_z = None
    sp_z = ((sp_ops.base.z if hsparse else sp_ops.z) if sparse else None)
    if cfg.do_map:
        expected_p = (model.n_params(m) if cfg.model in ("lmc", "lmc_sparse")
                      else gnmgp_sparse.n_params_hetero(m_z, m) if hsparse
                      else model.n_params(m_z, m) if sparse
                      else model.n_params(n, m))
        stored = None
        if store is not None and store.exists(_key("map")):
            stored = jnp.asarray(store.load(_key("map"))["vec"], settings.dtype)
            if stored.shape != (expected_p,):
                # stale artifact from a run with different data/split: a
                # mismatched MAP would crash (or silently poison) every
                # downstream stage — refit instead of resuming
                warnings.warn(
                    f"ignoring stored MAP for {_key('map')}: length "
                    f"{stored.shape} != expected ({expected_p},) for "
                    f"N={n}, M={m} — refitting", stacklevel=2)
                stored = None
        if stored is not None:
            result["map_vec"] = map_vec = stored
            if sparse:
                # a refined-Z run stores its moved inducing set with the MAP;
                # resuming against the default quantile Z would silently
                # reinterpret the vector at the wrong locations
                z_art = store.load(_key("map")).get("z")
                if z_art is not None and not np.array_equal(
                        np.asarray(z_art, np.float64),
                        np.asarray(sp_z, np.float64)):
                    z_res = jnp.asarray(z_art, settings.dtype)
                    if hsparse:
                        nlp, sp_ops = gnmgp_sparse.make_objective_hetero(
                            data, z=z_res, approx=cfg.sparse_approx,
                            hyper=cfg.hyper)
                    else:
                        nlp, sp_ops = model.make_objective(
                            data, z=z_res, approx=cfg.sparse_approx,
                            hyper=cfg.hyper)
                    sp_z = z_res
        else:
            t0 = time.time()
            inits = _build_inits(cfg, emp, xd, yd, key, z=sp_z)
            ckpt = None
            if store is not None:
                ckpt = lambda v, i: store.save(_key("map_ckpt"), vec=np.asarray(v), iteration=i)
            name, res, _ = map_mod.multi_start_map(
                nlp, inits, n_iters=cfg.n_opt, lr=cfg.lr, err_opt=cfg.err_opt,
                checkpoint_fn=ckpt, method=cfg.map_method,
            )
            result["timings"]["map"] = time.time() - t0
            result["map_vec"] = map_vec = res.vec
            result["map_init"] = name
            result["target_hist"] = np.asarray(res.target_hist)
            if cfg.refine_z > 0 and sparse:
                # inducing-input refinement: Z descends the objective, the
                # latents refit at the moved Z; downstream stages (sampling,
                # prediction, LOO) condition on the refined ops.  Every
                # sparse model is supported (model= picks the traced
                # builders — gnmgp_sparse._refine_builders)
                t0 = time.time()
                sp_z, map_vec, _, _ = gnmgp_sparse.refine_inducing(
                    data, sp_z, map_vec, n_rounds=cfg.refine_z,
                    z_iters=cfg.refine_z_iters,
                    vec_iters=min(max(100, cfg.n_opt // 2), 400),
                    lr_vec=cfg.lr, hyper=cfg.hyper, approx=cfg.sparse_approx,
                    method=cfg.map_method, model=cfg.model,
                )
                if hsparse:
                    nlp, sp_ops = gnmgp_sparse.make_objective_hetero(
                        data, z=sp_z, approx=cfg.sparse_approx,
                        hyper=cfg.hyper)
                else:
                    nlp, sp_ops = model.make_objective(
                        data, z=sp_z, approx=cfg.sparse_approx,
                        hyper=cfg.hyper)
                result["map_vec"] = map_vec
                result["refined_z"] = np.asarray(sp_z)
                result["timings"]["refine_z"] = time.time() - t0
            if store is not None:
                extra = ({"z": np.asarray(sp_z),
                          "approx": np.asarray(cfg.sparse_approx)}
                         if sparse else {})
                store.save(_key("map"), vec=np.asarray(map_vec),
                           target_hist=np.asarray(res.target_hist), **extra)
    else:
        map_vec = None

    if cfg.do_hmc and map_vec is not None:
        t0 = time.time()
        whitener = (
            _make_sampling_whitener(nlp, map_vec, cfg, key, sp_z, m_z, m)
            if sparse else
            _make_sampling_whitener(nlp, map_vec, cfg, key, xd, n, m)
        )
        if cfg.sampler == "chees":
            samples, accept, sampling = _run_chain_chees(
                nlp, map_vec, cfg, key, whitener=whitener
            )
            result["sampling"] = sampling
        elif cfg.sampler == "smc":
            samples, accept, sampling = _run_chain_smc(
                nlp, map_vec, cfg, key, whitener=whitener
            )
            result["sampling"] = sampling
        elif cfg.sampler == "pathfinder":
            samples, accept, sampling = _run_chain_pathfinder(
                nlp, map_vec, cfg, key, whitener=whitener
            )
            result["sampling"] = sampling
        else:
            samples, accept = _run_chain(nlp, map_vec, cfg, key, whitener=whitener)
        result["timings"]["hmc"] = time.time() - t0
        result["hmc_samples"] = samples
        result["hmc_accept"] = accept
        if store is not None:
            store.save(_key("hmc"), samples=samples)
            if "sampling" in result:
                # persist the sampler's own record (evidence for SMC, pooled
                # diagnostics for chain tiers) so downstream consumers — the
                # serving info endpoint, completeness checks — see it without
                # re-running anything (run_cohort already does this)
                store.save(_key("sampling"), **{
                    k: v for k, v in result["sampling"].items()
                    if np.isscalar(v)
                })

    if (cfg.do_map_analysis and map_vec is not None
            and cfg.model in ("gnmgp", "gnmgp_sparse")):
        # latent-process analysis: MAP point processes + posterior bands
        # (the reference's do_map_analysis / do_post_analysis stages,
        # Nonseparable_model.py:290-299 and posterior_analysis.visualization_pos).
        # The sparse layout is the dense layout at the inducing inputs, so the
        # same unpack applies with n -> m_z; "inputs" records where the
        # processes live.
        from .postprocess import analysis as analysis_mod

        n_lat = m_z if sparse else n
        tilde_l, b_proc, cor_proc, std_proc = analysis_mod.gnmgp_map_latents(
            np.asarray(map_vec), n_lat, m
        )
        result["map_latents"] = {
            "tilde_l": tilde_l, "B": b_proc, "R": cor_proc, "stds": std_proc,
            "inputs": np.asarray(sp_z) if sparse else np.asarray(x),
        }
        if "hmc_samples" in result:
            result["latent_summary"] = analysis_mod.gnmgp_latent_summary(
                result["hmc_samples"], n_lat, m
            )

    pred = _PREDICT[cfg.model]
    grid = jnp.linspace(float(x.min()), float(x.max()), cfg.n_grid)
    if cfg.do_pred_grid and map_vec is not None:
        t0 = time.time()
        if hsparse:
            gp = pred.predict_map_hetero(map_vec, data, sp_ops, grid,
                                         hyper=cfg.hyper,
                                         approx=cfg.sparse_approx)
        elif sparse:
            gp = pred.predict_map(map_vec, data, sp_ops, grid,
                                  hyper=cfg.hyper, approx=cfg.sparse_approx)
        elif cfg.model == "lmc":
            gp = pred.predict_map(map_vec, data, grid)
        else:
            gp = pred.predict_map(map_vec, data, grid, hyper=cfg.hyper)
        result["timings"]["pred_grid"] = time.time() - t0
        result["pred_grid"] = gp
        result["grid"] = np.asarray(grid)
        if store is not None:
            store.save(_key("pred_grid"), percentiles=np.asarray(gp.percentiles),
                       grid=np.asarray(grid))

    if cfg.do_pred_test and map_vec is not None and x_test is not None:
        xt = jnp.asarray(x_test, settings.dtype)
        if hsparse:
            tp = pred.predict_map_hetero(map_vec, data, sp_ops, xt,
                                         hyper=cfg.hyper,
                                         approx=cfg.sparse_approx)
        elif sparse:
            tp = pred.predict_map(map_vec, data, sp_ops, xt,
                                  hyper=cfg.hyper, approx=cfg.sparse_approx)
        elif cfg.model == "lmc":
            tp = pred.predict_map(map_vec, data, xt)
        else:
            tp = pred.predict_map(map_vec, data, xt, hyper=cfg.hyper)
        result["pred_test"] = tp
        if cfg.do_evaluation:
            result["test_rmse"] = evaluate.rmse(np.asarray(tp.mean), y_test)
            result["test_lpd"] = evaluate.lpd(np.asarray(tp.mean), np.asarray(tp.std), y_test)
            result["test_pmse"] = evaluate.pmse(np.asarray(tp.mean), y_test)
            if store is not None:
                store.save(_key("scores"), rmse=result["test_rmse"], lpd=result["test_lpd"])

    if cfg.do_evaluation and map_vec is not None:
        if hsparse:
            dev = lambda v: -2.0 * gnmgp_sparse.log_lik_hetero(
                gnmgp_sparse.unpack_hetero(
                    jnp.asarray(v, settings.dtype), m_z, m),
                data, sp_ops, approx=cfg.sparse_approx, hyper=cfg.hyper,
            )
        elif sparse:
            # unpack is (vec, m) for the N-free lmc layout, (vec, m_z, m)
            # for the latent-process layouts
            _up = ((lambda v: model.unpack(v, m))
                   if cfg.model == "lmc_sparse"
                   else (lambda v: model.unpack(v, m_z, m)))
            dev = lambda v: -2.0 * model.log_lik(
                _up(jnp.asarray(v, settings.dtype)),
                data, sp_ops, approx=cfg.sparse_approx, hyper=cfg.hyper,
            )
        else:
            dev = lambda v: _MODELS[cfg.model].deviance(v, yd, xd)
        result["deviance"] = float(dev(map_vec))
        result["aic"] = evaluate.get_aic(map_vec, dev)
        result["bic"] = evaluate.get_bic(map_vec, dev, n_obs=n)
        if "hmc_samples" in result:
            result["dic"] = evaluate.get_dic(jnp.asarray(result["hmc_samples"]), dev)
        if cfg.do_loo and "hmc_samples" in result:
            # fully-Bayesian criteria from the chain: pointwise terms are the
            # exact LOO conditionals of the joint MVN likelihood (no refits)
            hist = np.asarray(result["hmc_samples"])
            if hist.shape[0] > cfg.loo_draws:
                idx = np.linspace(0, hist.shape[0] - 1, cfg.loo_draws).astype(int)
                hist = hist[idx]
            if sparse:
                cond_ll = evaluate.chain_conditional_loglik_sparse(
                    hist, data, sp_ops, approx=cfg.sparse_approx,
                    hyper=cfg.hyper, hetero=hsparse, model=cfg.model,
                )
            else:
                cond_ll = evaluate.chain_conditional_loglik(
                    cfg.model, hist, np.asarray(xd), np.asarray(yd)
                )
            loo = evaluate.psis_loo(cond_ll)
            wa = evaluate.waic(cond_ll)
            result["loo"] = {
                "elpd_loo": loo["elpd_loo"], "p_loo": loo["p_loo"],
                "looic": loo["looic"], "n_bad_k": loo["n_bad_k"],
                "k_hat_max": float(np.max(loo["k_hat"])),
                "elpd_waic": wa["elpd_waic"], "p_waic": wa["p_waic"],
                "waic": wa["waic"],
            }
            if store is not None:
                store.save(_key("loo"), **result["loo"])
            # pointwise elpd vector for paired model comparison / stacking
            # (evaluate.loo_compare, evaluate.stacking_weights); kept out of
            # the scalar artifact record
            result["loo"]["pointwise"] = loo["pointwise"]

    return result


def run_subject_hadamard(
    x,
    indx,
    y,
    m: int,
    cfg: PipelineConfig | None = None,
    key=None,
) -> dict:
    """Single-subject pipeline for Hadamard-layout data (one observation per
    (input, task) pair) — the reference's ``*_non``/mimic data path
    (``utils.data_split_non``, ``logpos.nlogpos_obj_hadamard*``).

    Runs MAP on the configured model's Hadamard objective, then grid and test
    prediction through ``predict.hadamard``.
    """
    from .models import HadamardData
    from .ops import transforms
    from .predict import hadamard as pred_h

    cfg = cfg or PipelineConfig()
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    x = np.asarray(x, float)
    indx = np.asarray(indx, int)
    y = np.asarray(y, float)
    _validate_hadamard(x, indx, y, m)
    if cfg.test_size > 0:
        x, x_te, indx_tr, indx_te, y_tr, y_te = preprocess.data_split_non(
            x, indx, y, test_size=cfg.test_size
        )
        indx, y = indx_tr, y_tr
    else:
        x_te = indx_te = y_te = None
    order = np.argsort(x)
    x, indx, y = x[order], indx[order], y[order]
    n = x.shape[0]
    t = transforms.tri_size(m)
    data = HadamardData(
        jnp.asarray(x, settings.dtype), jnp.asarray(indx, jnp.int32),
        jnp.asarray(y, settings.dtype),
    )
    model = _MODELS[cfg.model]

    if cfg.model == "gnmgp_hetero_sparse":
        raise ValueError(
            "gnmgp_hetero_sparse has no Hadamard objective — use "
            "model='gnmgp_sparse' (or the full-layout hetero pipeline)")
    sparse = cfg.model.endswith("_sparse")
    sp_ops = None
    if sparse:
        # gnmgp/snmgp/lmc sparse share the Hadamard (nlp, ops) contract
        nlp, sp_ops = model.make_objective_hadamard(
            data, m, n_inducing=cfg.n_inducing, approx=cfg.sparse_approx,
            hyper=cfg.hyper,
        )
        m_z = int(sp_ops.z.shape[0])
        dim = (model.n_params(m) if cfg.model == "lmc_sparse"
               else model.n_params(m_z, m))
    elif cfg.model == "lmc":
        dim = 2 + t + 1
        nlp = lambda v: model.nlogpos_hadamard(v, data.x, data.indx, data.y, m, **cfg.hyper)
    elif cfg.model == "snmgp":
        dim = 2 * n + t + 1
        nlp = lambda v: model.nlogpos_hadamard(v, data.x, data.indx, data.y, m, **cfg.hyper)
    else:
        dim = n + n * t + 1
        nlp = lambda v: model.nlogpos_hadamard(v, data.x, data.indx, data.y, m, **cfg.hyper)

    v0 = 0.1 * jax.random.normal(key, (dim,), settings.dtype)
    v0 = v0.at[-1].set(-2.0)
    res = map_mod.fit_map(nlp, v0, n_iters=cfg.n_opt, lr=cfg.lr,
                          err_opt=cfg.err_opt, method=cfg.map_method)
    out = {"map_vec": res.vec, "target_hist": np.asarray(res.target_hist), "n": n, "m": m}
    if cfg.refine_z > 0 and sparse:
        # inducing-input refinement through the traced Hadamard objective
        # (any sparse model — gnmgp_sparse._refine_builders)
        z_r, vec_r, sp_ops, _ = gnmgp_sparse.refine_inducing(
            data, sp_ops.z, res.vec, n_rounds=cfg.refine_z,
            z_iters=cfg.refine_z_iters,
            vec_iters=min(max(100, cfg.n_opt // 2), 400), lr_vec=cfg.lr,
            hyper=cfg.hyper, approx=cfg.sparse_approx, method=cfg.map_method,
            m=m, model=cfg.model,
        )
        nlp, _ = model.make_objective_hadamard(
            data, m, z=z_r, approx=cfg.sparse_approx, hyper=cfg.hyper)
        res = res._replace(vec=vec_r)
        out["map_vec"] = vec_r
        out["refined_z"] = np.asarray(z_r)

    grid = jnp.linspace(float(x.min()), float(x.max()), cfg.n_grid)
    if cfg.do_pred_grid:
        if sparse:
            gp = _PREDICT[cfg.model].predict_map_hadamard(
                res.vec, data, sp_ops, m, grid, hyper=cfg.hyper,
                approx=cfg.sparse_approx)
        elif cfg.model == "lmc":
            gp = pred_h.lmc_predict_map(res.vec, data, grid, m)
        elif cfg.model == "snmgp":
            gp = pred_h.snmgp_predict_map(res.vec, data, grid, m, hyper=cfg.hyper)
        else:
            gp = pred_h.svc_predict_map(res.vec, data, grid, m, hyper=cfg.hyper)
        out["pred_grid"] = gp
        out["grid"] = np.asarray(grid)

    if cfg.do_hmc:
        whitener = _make_sampling_whitener(
            nlp, res.vec, cfg, jax.random.fold_in(key, 3),
            sp_ops.z if sparse else data.x,
            int(sp_ops.z.shape[0]) if sparse else data.x.shape[0],
            m, hadamard=True,
        )
        samples, accept = _run_chain(
            nlp, res.vec, cfg, jax.random.fold_in(key, 3), whitener=whitener
        )
        out["hmc_samples"] = samples
        out["hmc_accept"] = accept
        if cfg.do_loo:
            hist = np.asarray(samples)
            if hist.shape[0] > cfg.loo_draws:
                idx = np.linspace(0, hist.shape[0] - 1, cfg.loo_draws).astype(int)
                hist = hist[idx]
            if sparse:
                cond_ll = evaluate.chain_conditional_loglik_sparse_hadamard(
                    hist, data, sp_ops, m, approx=cfg.sparse_approx,
                    hyper=cfg.hyper, model=cfg.model,
                )
            else:
                cond_ll = evaluate.chain_conditional_loglik_hadamard(
                    cfg.model, hist, np.asarray(data.x), np.asarray(data.indx),
                    np.asarray(data.y), m,
                )
            loo = evaluate.psis_loo(cond_ll)
            wa = evaluate.waic(cond_ll)
            out["loo"] = {
                "elpd_loo": loo["elpd_loo"], "p_loo": loo["p_loo"],
                "looic": loo["looic"], "n_bad_k": loo["n_bad_k"],
                "k_hat_max": float(np.max(loo["k_hat"])),
                "elpd_waic": wa["elpd_waic"], "p_waic": wa["p_waic"],
                "waic": wa["waic"],
            }

    if x_te is not None and cfg.do_pred_test:
        xt = jnp.asarray(x_te, settings.dtype)
        it = jnp.asarray(indx_te, jnp.int32)
        if sparse:
            mean, var = _PREDICT[cfg.model].predict_test_hadamard(
                res.vec, data, sp_ops, m, xt, it, hyper=cfg.hyper,
                approx=cfg.sparse_approx)
            std = jnp.sqrt(var)
        elif cfg.model == "lmc":
            mean, std = pred_h.lmc_predict_test(res.vec, data, xt, it, m)
        elif cfg.model == "snmgp":
            mean, std = pred_h.snmgp_predict_test(res.vec, data, xt, it, m, hyper=cfg.hyper)
        else:
            mean, std = pred_h.svc_predict_test(res.vec, data, xt, it, m, hyper=cfg.hyper)
        out["test_rmse"] = evaluate.rmse(np.asarray(mean), y_te)
        out["test_lpd"] = evaluate.lpd(np.asarray(mean), np.asarray(std), y_te)
        if "hmc_samples" in out:
            # sample-based indexed scoring over the chain — the KAISER path
            # (reference test_predsample_hadamard, prediction.py:678-708)
            hv = jnp.asarray(out["hmc_samples"])
            ks = jax.random.fold_in(key, 9)
            if sparse:
                draws = _PREDICT[cfg.model].predict_test_hadamard_sample(
                    ks, hv, data, sp_ops, m, xt, it, hyper=cfg.hyper,
                    approx=cfg.sparse_approx)
            elif cfg.model == "lmc":
                draws = pred_h.lmc_predict_test_sample(ks, hv, data, xt, it, m)
            elif cfg.model == "snmgp":
                draws = pred_h.snmgp_predict_test_sample(ks, hv, data, xt, it, m, hyper=cfg.hyper)
            else:
                draws = pred_h.svc_predict_test_sample(ks, hv, data, xt, it, m, hyper=cfg.hyper)
            d = np.asarray(draws)  # (G_test, S)
            out["test_sample_rmse"] = evaluate.rmse(d.mean(axis=1), y_te)
            out["test_sample_lpd"] = evaluate.lpd(
                d.mean(axis=1), np.maximum(d.std(axis=1), 1e-8), y_te
            )
    return out


def run_cohort_hadamard(
    subjects: dict,
    m: int,
    cfg: PipelineConfig | None = None,
    store: ArtifactStore | None = None,
    dataset: str = "cohort_h",
    n_buckets: int = 4,
    split: str = "random",
    test_size: float = 0.25,
    chunk_size: float = 0.2,
    mesh=None,
) -> dict:
    """Ragged multi-subject cohort for Hadamard-layout data.

    ``subjects``: {ID: (x, indx, y)} with one observation per (input, task)
    pair — the reference's distributed one-obs layout
    (``Separable_model_distributed.py:221-259`` with ``utils.data_split_non``).
    ``split``: "none", "random" (``data_split_non``) or "chunk"
    (``data_split_non_chunk`` — contiguous held-out windows).  Subjects are
    standardized per task, split, bucketed by observation count, MAP-fitted
    as masked shard_map fleets (exact ragged likelihoods), test-scored at
    their (x*, task*) pairs, and reduced to fleet RMSE/LPD summaries.
    """
    from .parallel import buckets as buckets_mod
    from .parallel import fleet as fleet_mod
    from .postprocess import summary as summary_mod
    from .predict import hadamard as pred_h
    from .models import HadamardData
    from .ops import transforms

    cfg = cfg or PipelineConfig()
    if cfg.model == "gnmgp_hetero_sparse":
        raise ValueError(
            "gnmgp_hetero_sparse has no Hadamard objective — use "
            "model='gnmgp_sparse' (or the full-layout hetero cohort)")
    mesh = mesh or make_mesh()
    t = transforms.tri_size(m)
    ids = sorted(subjects.keys(), key=str)
    xs, indxs, ys, tests = [], [], [], []
    for sid in ids:
        x_i, i_i, y_i = subjects[sid]
        x_i = np.asarray(x_i, float)
        i_i = np.asarray(i_i, int)
        y_i = np.asarray(y_i, float)
        # per-task detrend/standardize (the reference's orig2adj_non on the
        # per-task list layout)
        adj = y_i.astype(float).copy()
        for task in range(m):
            sel = i_i == task
            if sel.sum() >= 2:
                mu, sd = adj[sel].mean(), max(adj[sel].std(), 1e-12)
                adj[sel] = (adj[sel] - mu) / sd
        if split == "random":
            x_tr, x_te, i_tr, i_te, y_tr, y_te = preprocess.data_split_non(
                x_i, i_i, adj, test_size=test_size
            )
        elif split == "chunk":
            x_tr, x_te, i_tr, i_te, y_tr, y_te = preprocess.data_split_non_chunk(
                x_i, i_i, adj, chunk_size=chunk_size
            )
        else:
            x_tr, i_tr, y_tr, x_te, i_te, y_te = x_i, i_i, adj, None, None, None
        order = np.argsort(x_tr)
        xs.append(x_tr[order])
        indxs.append(i_tr[order])
        ys.append(y_tr[order])
        tests.append((x_te, i_te, y_te))

    def fit_bucket(x, y_pair, idxs, mask):
        # y_pair stacks (indx, y) along the last axis to ride the generic
        # bucket stager; unstack here
        indx = y_pair[..., 0].astype(np.int64)
        y = y_pair[..., 1]
        if cfg.model.endswith("_sparse"):
            # the large-N Hadamard tier: stacked-SparseOps fleet at Z
            # (gnmgp/snmgp/lmc; the hetero variant has no Hadamard objective
            # and is rejected at the top of the driver)
            return _fit_bucket_sparse_hadamard(x, indx, y, m, idxs, mask,
                                               cfg, mesh)
        s, n = x.shape
        rng_init = np.random.default_rng(0)
        dims = {"lmc": 2 + t + 1, "snmgp": 2 * n + t + 1, "gnmgp": n + n * t + 1}
        inits = 0.1 * rng_init.standard_normal((s, dims[cfg.model]))
        inits[:, -1] = -2.0
        res = fleet_mod.fit_fleet_map_hadamard(
            cfg.model, jnp.asarray(x), jnp.asarray(indx), jnp.asarray(y), m,
            jnp.asarray(inits), hyper=cfg.hyper, n_iters=cfg.n_opt, lr=cfg.lr,
            mesh=mesh, masks=jnp.asarray(mask), method=cfg.map_method,
        )
        out = {
            "vec": np.asarray(res.vecs),
            "final_nlp": np.asarray(res.final_nlp),
            "n_train": np.asarray(mask).sum(axis=1).astype(int),
        }
        if cfg.do_hmc:
            if cfg.whiten == "pncp":
                raise ValueError("run_cohort_hadamard supports whiten=True/"
                                 "'prior' only (pncp is single-subject)")
            sampler, whiten_flag = _cohort_sampling_posture(
                cfg, n_bucket=np.shape(x)[1], mesh=mesh)
            k_bucket = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), int(idxs[0]))
            c = max(1, cfg.n_chains)
            if sampler not in ("smc", "pathfinder"):  # these bring their
                # own populations/paths, untiled
                x_t, y_t, vec_t, mask_t = _tile_chains(
                    jnp.asarray(x), jnp.asarray(y), res.vecs, jnp.asarray(mask),
                    cfg.n_chains, jax.random.fold_in(k_bucket, 1),
                    model=cfg.model, hyper=cfg.hyper,
                    indx=jnp.asarray(indx), m=m,
                )
                indx_t = jnp.repeat(jnp.asarray(indx), c, axis=0)
            if sampler == "smc":
                r = fleet_mod.smc_fleet_hadamard(
                    cfg.model, jnp.asarray(x), jnp.asarray(indx),
                    jnp.asarray(y), m, k_bucket,
                    n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                    cfg.n_hmc),
                    n_mutations=cfg.smc_mutations,
                    n_leapfrog=cfg.smc_leapfrog,
                    target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                    metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                    waste_free=cfg.smc_waste_free,
                    resample_ess=cfg.smc_resample_ess,
                    resample=cfg.smc_resample,
                    hyper=cfg.hyper, mesh=mesh, whiten=bool(whiten_flag),
                    masks=jnp.asarray(mask),
                )
                c = 1
                out["hmc"] = np.asarray(
                    r.particles[:, : cfg.n_hmc, :]
                ).reshape(s, 1, cfg.n_hmc, -1)
                out["smc_logz"] = np.asarray(r.logz)
                out["smc_beta"] = np.asarray(r.beta_final)
                out["smc_stages"] = np.asarray(r.n_stages)
            elif sampler == "pathfinder":
                r = fleet_mod.pathfinder_fleet_hadamard(
                    cfg.model, jnp.asarray(x), jnp.asarray(indx),
                    jnp.asarray(y), m, k_bucket,
                    n_paths=cfg.pf_paths, max_iters=cfg.pf_iters,
                    n_draws=cfg.pf_draws, n_out=max(cfg.n_hmc, 1),
                    hyper=cfg.hyper, mesh=mesh, whiten=bool(whiten_flag),
                    masks=jnp.asarray(mask), vecs=res.vecs,
                )
                c = 1
                out["hmc"] = np.asarray(
                    r.draws[:, : cfg.n_hmc, :]
                ).reshape(s, 1, cfg.n_hmc, -1)
                out["pf_k_hat"] = np.asarray(r.k_hat)
                out["pf_logev"] = np.asarray(r.log_evidence)
            elif sampler == "nuts":
                n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
                samples, _ = fleet_mod.nuts_fleet_hadamard(
                    cfg.model, x_t, indx_t, y_t, m, vec_t, k_bucket,
                    n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                    n_warmup=n_warm, hyper=cfg.hyper, mesh=mesh,
                    whiten=whiten_flag, masks=mask_t,
                )
            elif sampler in ("hmc", "hmc_auto"):
                # "hmc_auto": the single-chip reference-scale posture
                # (_cohort_sampling_posture) — warmup + step-size
                # adaptation forced so the fixed-trajectory chains stay
                # zero-tuning like the NUTS default they replace
                auto = sampler == "hmc_auto"
                n_warm = (cfg.hmc_warmup if cfg.hmc_warmup > 0 or not auto
                          else max(100, cfg.n_hmc))
                samples = fleet_mod.hmc_fleet_hadamard(
                    cfg.model, x_t, indx_t, y_t, m, vec_t, k_bucket,
                    n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                    n_leapfrog=cfg.hmc_leapfrog, hyper=cfg.hyper, mesh=mesh,
                    n_warmup=n_warm,
                    adapt_step_size=cfg.hmc_adapt or auto,
                    masks=mask_t, whiten=whiten_flag,
                )
            else:
                raise ValueError(
                    f"unknown cohort sampler {sampler!r}: cohort drivers "
                    "support hmc/nuts/drhmc/chees/smc/pathfinder "
                    "(rmhmc is single-subject — use run_subject)")
            if "hmc" not in out:  # smc/pathfinder wrote (S, 1, T, P) direct
                out["hmc"] = np.asarray(samples).reshape(s, c, cfg.n_hmc, -1)
            if sampler not in ("smc", "pathfinder"):
                def run_smc_dense_h(idx_f):
                    idx = jnp.asarray(idx_f)
                    return fleet_mod.smc_fleet_hadamard(
                        cfg.model, jnp.asarray(x)[idx],
                        jnp.asarray(indx)[idx], jnp.asarray(y)[idx], m,
                        jax.random.fold_in(k_bucket, 99),
                        n_particles=max(cfg.smc_particles
                                        or max(256, cfg.n_hmc), cfg.n_hmc),
                        n_mutations=cfg.smc_mutations,
                        n_leapfrog=cfg.smc_leapfrog,
                        target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                        metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                        waste_free=cfg.smc_waste_free,
                        resample_ess=cfg.smc_resample_ess,
                        resample=cfg.smc_resample,
                        hyper=cfg.hyper, mesh=mesh, whiten=True,
                        masks=jnp.asarray(mask)[idx],
                    )

                _escalate_nonmixing(out, s, cfg, run_smc_dense_h)
        return out

    y_pairs = [np.stack([indxs[i], ys[i]], axis=-1) for i in range(len(ids))]
    per_subject = buckets_mod.run_bucketed(
        xs, y_pairs, fit_bucket, n_buckets=n_buckets, mode="pad"
    )

    results = {}
    for pos, sid in enumerate(ids):
        entry = per_subject[pos]
        rec = {"final_nlp": float(entry["final_nlp"])}
        if "hmc" in entry:
            chains = np.asarray(entry["hmc"])  # (C, T, P), bucket-padded
            rec["hmc_samples"] = chains.reshape(-1, chains.shape[-1])  # pooled
            if entry.get("escalated", False):
                # chains disagreed past cfg.escalate_rhat; draws were
                # replaced by a tempered-SMC population (run_cohort
                # convention — see _escalate_nonmixing)
                rec["sampling"] = {
                    "sampler": "smc",
                    "escalated_from_rhat": float(entry["esc_from_rhat"]),
                    "log_evidence": float(entry["esc_logz"]),
                    "beta_final": float(entry["esc_beta"]),
                }
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        log_evidence=rec["sampling"]["log_evidence"],
                        beta_final=rec["sampling"]["beta_final"],
                        escalated_from_rhat=rec["sampling"]["escalated_from_rhat"],
                    )
            elif "smc_logz" in entry:
                # exchangeable particles: surface evidence + tempering
                # health instead of chain ESS/R-hat (run_cohort convention)
                rec["sampling"] = {
                    "sampler": "smc",
                    "log_evidence": float(entry["smc_logz"]),
                    "beta_final": float(entry["smc_beta"]),
                    "n_stages": int(entry["smc_stages"]),
                }
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        log_evidence=rec["sampling"]["log_evidence"],
                        beta_final=rec["sampling"]["beta_final"],
                        n_stages=rec["sampling"]["n_stages"],
                    )
            elif "pf_k_hat" in entry:
                # PSIS-resampled variational draws (run_cohort convention)
                rec["sampling"] = {
                    "sampler": "pathfinder",
                    "k_hat": float(entry["pf_k_hat"]),
                    "log_evidence_is": float(entry["pf_logev"]),
                }
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        k_hat=rec["sampling"]["k_hat"],
                        log_evidence_is=rec["sampling"]["log_evidence_is"],
                    )
            else:
                rec["sampling"] = _sampling_record(chains, chains.shape[0])
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        min_ess=rec["sampling"]["min_ess"],
                        median_ess=rec["sampling"]["median_ess"],
                        max_rhat=rec["sampling"]["max_rhat"],
                        n_chains=rec["sampling"]["n_chains"],
                    )
        n_real = int(entry["n_train"])
        x_u = xs[pos][:n_real]
        i_u = indxs[pos][:n_real]
        y_u = ys[pos][:n_real]
        vec = jnp.asarray(entry["vec"], settings.dtype)
        h_sparse = cfg.model.endswith("_sparse")
        if h_sparse:
            # m_z layout: no latent-slot crop; rebuild the conditioning ops
            # at the subject's real inputs with the bucket-chosen Z
            from .models import lmc_sparse, snmgp_sparse
            from .predict import lmc_sparse as pred_lmc_sp
            from .predict import snmgp_sparse as pred_snmgp_sp

            n_fit = n_real
            if cfg.model == "snmgp_sparse":
                sp_ops_u = snmgp_sparse.make_ops(
                    np.asarray(x_u), jnp.asarray(entry["z"]), cfg.hyper)
                pred_sp = pred_snmgp_sp
            elif cfg.model == "lmc_sparse":
                sp_ops_u = lmc_sparse.make_ops(
                    np.asarray(x_u), jnp.asarray(entry["z"]), cfg.hyper)
                pred_sp = pred_lmc_sp
            else:
                sp_ops_u = gnmgp_sparse.make_ops_hadamard(
                    np.asarray(x_u), jnp.asarray(entry["z"]), cfg.hyper
                )
                pred_sp = pred_gnmgp_sparse
        else:
            n_fit = _vec_input_count(cfg.model, int(vec.shape[0]), m, n_real)
            vec = _crop_vec(cfg.model, vec, n_fit, n_real, m)
        rec["map_vec"] = np.asarray(vec)
        if cfg.do_loo and "hmc_samples" in rec:
            hist = np.asarray(rec["hmc_samples"])
            if hist.shape[0] > cfg.loo_draws:
                sel = np.linspace(0, hist.shape[0] - 1, cfg.loo_draws).astype(int)
                hist = hist[sel]
            if h_sparse:
                cond_ll = evaluate.chain_conditional_loglik_sparse_hadamard(
                    hist,
                    HadamardData(jnp.asarray(x_u, settings.dtype),
                                 jnp.asarray(i_u, jnp.int32),
                                 jnp.asarray(y_u, settings.dtype)),
                    sp_ops_u, m, approx=cfg.sparse_approx, hyper=cfg.hyper,
                    model=cfg.model,
                )
            else:
                if n_fit != n_real and cfg.model != "lmc":
                    hist = np.asarray(jax.vmap(
                        lambda v: _crop_vec(cfg.model, v, n_fit, n_real, m)
                    )(jnp.asarray(hist)))
                cond_ll = evaluate.chain_conditional_loglik_hadamard(
                    cfg.model, hist, np.asarray(x_u), np.asarray(i_u),
                    np.asarray(y_u), m,
                )
            loo = evaluate.psis_loo(cond_ll)
            wa = evaluate.waic(cond_ll)
            rec["loo"] = {
                "elpd_loo": loo["elpd_loo"], "p_loo": loo["p_loo"],
                "n_bad_k": loo["n_bad_k"],
                "k_hat_max": float(np.max(loo["k_hat"])),
                "elpd_waic": wa["elpd_waic"], "p_waic": wa["p_waic"],
            }
            if store is not None:
                store.save(ArtifactStore.key(cfg.model, dataset, sid, "loo"),
                           **rec["loo"])
        x_te, i_te, y_te = tests[pos]
        if x_te is not None and cfg.do_pred_test and len(np.asarray(x_te)) > 0:
            data = HadamardData(
                jnp.asarray(x_u, settings.dtype), jnp.asarray(i_u, jnp.int32),
                jnp.asarray(y_u, settings.dtype),
            )
            xt = jnp.asarray(x_te, settings.dtype)
            it = jnp.asarray(i_te, jnp.int32)
            if h_sparse:
                mean, var = pred_sp.predict_test_hadamard(
                    vec, data, sp_ops_u, m, xt, it, hyper=cfg.hyper,
                    approx=cfg.sparse_approx)
                std = jnp.sqrt(var)
            elif cfg.model == "lmc":
                mean, std = pred_h.lmc_predict_test(vec, data, xt, it, m)
            elif cfg.model == "snmgp":
                mean, std = pred_h.snmgp_predict_test(vec, data, xt, it, m, hyper=cfg.hyper)
            else:
                mean, std = pred_h.svc_predict_test(vec, data, xt, it, m, hyper=cfg.hyper)
            rec["test_rmse"] = evaluate.rmse(np.asarray(mean), y_te)
            rec["test_lpd"] = evaluate.lpd(np.asarray(mean), np.asarray(std), y_te)
            if "hmc_samples" in rec:
                # sample-based indexed scoring over the cohort chain — the
                # KAISER path (reference test_predsample_hadamard,
                # prediction.py:678-708), previously only reachable from
                # run_subject_hadamard.  Bucket-padded draws crop their
                # latent slots per draw before prediction (the sparse tier's
                # m_z-layout draws need no crop).
                hv = jnp.asarray(rec["hmc_samples"], settings.dtype)
                ks = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), 17 + pos)
                if h_sparse:
                    draws = pred_sp.predict_test_hadamard_sample(
                        ks, hv, data, sp_ops_u, m, xt, it, hyper=cfg.hyper,
                        approx=cfg.sparse_approx
                    )
                else:
                    hv = jax.vmap(
                        lambda v: _crop_vec(cfg.model, v, n_fit, n_real, m)
                    )(hv)
                    if cfg.model == "lmc":
                        draws = pred_h.lmc_predict_test_sample(
                            ks, hv, data, xt, it, m)
                    elif cfg.model == "snmgp":
                        draws = pred_h.snmgp_predict_test_sample(
                            ks, hv, data, xt, it, m, hyper=cfg.hyper)
                    else:
                        draws = pred_h.svc_predict_test_sample(
                            ks, hv, data, xt, it, m, hyper=cfg.hyper)
                d = np.asarray(draws)  # (G_test, S)
                rec["test_sample_rmse"] = evaluate.rmse(d.mean(axis=1), y_te)
                rec["test_sample_lpd"] = evaluate.lpd(
                    d.mean(axis=1), np.maximum(d.std(axis=1), 1e-8), y_te
                )
            if store is not None:
                store.save(
                    ArtifactStore.key(cfg.model, dataset, sid, "scores"),
                    rmse=rec["test_rmse"], lpd=rec["test_lpd"],
                )
        if store is not None:
            extra = ({"z": np.asarray(entry["z"]),
                      "approx": np.asarray(cfg.sparse_approx)}
                     if h_sparse else {})
            store.save(ArtifactStore.key(cfg.model, dataset, sid, "map"),
                       vec=rec["map_vec"], **extra)
        results[sid] = rec

    out = {"subjects": results, "ids": ids}
    if store is not None:
        keys = [ArtifactStore.key(cfg.model, dataset, sid, "scores") for sid in ids]
        out["reduction"] = summary_mod.reduce_fleet_metrics(store, keys)
    return out


def _run_sim_fleet_sparse(batch, cfg: PipelineConfig, mesh,
                          n_replicates: int) -> dict:
    """Sparse tier of :func:`run_sim_fleet`: equal-N replicates are one
    cohort bucket, so the stacked-SparseOps fleet engine
    (:func:`_fit_bucket_sparse`) carries the MAP + sampling stages
    (inducing inputs Z from prefix quantiles, whitened chains at Z,
    R-hat escalation).  Evaluation mirrors the dense branch: replicated-
    data G/P/D per subject from the sparse plug-in moments, and — for the
    GNMGP family — lengthscale-process recovery scored at Z (the sparse
    layout's latent slots), against the known truth interpolated there.
    No reference analog: the reference's mpisim drivers
    (``Nonseparable_model_mpisim.py``) have no sub-cubic tier at all.
    """
    s, n = np.asarray(batch.x).shape
    m = np.asarray(batch.y).shape[-1]
    mask = np.ones((s, n), bool)
    bucket = _fit_bucket_sparse(np.asarray(batch.x), np.asarray(batch.y),
                                np.arange(s), mask, cfg, mesh)
    fnlp = np.asarray(bucket["final_nlp"])
    res = fleet_mod.FleetResult(
        vecs=jnp.asarray(bucket["vec"]),
        final_nlp=jnp.asarray(fnlp),
        target_hist=jnp.zeros((s, 0), settings.dtype),
        fleet_metrics={
            "mean_final_nlp": float(fnlp.mean()),
            "min_final_nlp": float(fnlp.min()),
            "max_final_nlp": float(fnlp.max()),
        },
    )
    m_z = int(bucket["m_z"][0])
    out = {"batch": batch, "fleet": res, "fleet_metrics": res.fleet_metrics,
           "z": bucket["z"], "m_z": m_z}
    if "hmc" in bucket:
        chains = np.asarray(bucket["hmc"])  # (S, C, T, P)
        out["hmc_samples"] = chains.reshape(s, -1, chains.shape[-1])
        for k_extra in ("smc_logz", "smc_beta", "escalated", "esc_logz"):
            if k_extra in bucket:
                out[k_extra] = bucket[k_extra]
    if cfg.do_evaluation:
        pred = _PREDICT[cfg.model]
        hetero = cfg.model == "gnmgp_hetero_sparse"
        gpd = []
        for i in range(n_replicates):
            data_i = FullData(batch.x[i], batch.y[i])
            ops_i = _sparse_subject_ops(cfg.model, jnp.asarray(batch.x[i]),
                                        bucket["z"][i], cfg.hyper)
            pm = pred.predict_map_hetero if hetero else pred.predict_map
            gp = pm(res.vecs[i], data_i, ops_i, batch.x[i], hyper=cfg.hyper,
                    approx=cfg.sparse_approx)
            mean, std = np.asarray(gp.mean), np.asarray(gp.std)
            draws = mean[:, None, :] + std[:, None, :] * np.random.default_rng(
                cfg.seed + i
            ).normal(size=(n, 64, m))
            gpd.append(evaluate.gpd_scores(draws, np.asarray(batch.y[i])))
        out["gpd"] = gpd
        out["gpd_median_D"] = float(np.median([g["D"] for g in gpd]))
        if cfg.model in ("gnmgp_sparse", "gnmgp_hetero_sparse"):
            est = np.asarray(res.vecs[:, :m_z])
            true_l = np.stack([
                np.interp(np.asarray(bucket["z"][i]),
                          np.asarray(batch.x[i]),
                          np.log(np.asarray(batch.l[i])))
                for i in range(n_replicates)
            ])
            out["tilde_l_rmse"] = evaluate.rmse(est, true_l)
            corrs = [
                float(np.corrcoef(est[i], true_l[i])[0, 1])
                for i in range(n_replicates)
            ]
            out["tilde_l_corr_mean"] = float(np.mean(corrs))
    return out


def run_sim_fleet(
    n_replicates: int = 8,
    n: int = 64,
    cfg: PipelineConfig | None = None,
    mesh=None,
    key=None,
) -> dict:
    """Replicate-fleet pipeline (mpisim + sim_job + res_summary equivalents).

    Generates ``n_replicates`` synthetic subjects, MAP-fits the configured
    model to all of them sharded over the mesh, scores recovery against the
    known truth, and aggregates fleet metrics.  Every model in
    ``MODEL_CHOICES`` is served: the dense four ride ``parallel.fleet``,
    the ``*_sparse`` tier rides the stacked-SparseOps fleet engine
    (replicates are one equal-N cohort bucket — the large-N posture the
    reference's mpisim drivers lack entirely).
    """
    cfg = cfg or PipelineConfig()
    if cfg.model not in _MODELS:
        raise ValueError(f"unknown model {cfg.model!r} "
                         f"(want one of {sorted(_MODELS)})")
    key = key if key is not None else jax.random.PRNGKey(cfg.seed)
    mesh = mesh or make_mesh()
    k_sim, k_init = jax.random.split(key)
    batch = sim.sim_replicates(k_sim, n_replicates, n=n)
    m = batch.y.shape[-1]
    if cfg.model.endswith("_sparse"):
        return _run_sim_fleet_sparse(batch, cfg, mesh, n_replicates)

    # per-replicate empirical inits (host-side, embarrassingly parallel)
    inits = []
    for i in range(n_replicates):
        emp = empirical.local_estimation(
            np.asarray(batch.x[i]), np.asarray(batch.y[i]),
            window_size=min(cfg.window_size, max(2, n // 3)),
        )
        if cfg.model == "gnmgp":
            inits.append(init_mod.gnmgp_from_empirical(emp, n, m))
        elif cfg.model == "gnmgp_hetero":
            inits.append(gnmgp_hetero.init_from_gnmgp(
                init_mod.gnmgp_from_empirical(emp, n, m), n, m
            ))
        elif cfg.model == "snmgp":
            inits.append(init_mod.snmgp_from_empirical(emp, n, m))
        else:
            inits.append(init_mod.lmc_from_empirical(emp, n, m))
    init_vecs = jnp.stack(inits)

    res = fleet_mod.fit_fleet_map(
        cfg.model, batch.x, batch.y, init_vecs, hyper=cfg.hyper,
        n_iters=cfg.n_opt, lr=cfg.lr, mesh=mesh,
        method=cfg.map_method,
    )

    out = {
        "batch": batch,
        "fleet": res,
        "fleet_metrics": res.fleet_metrics,
    }
    if cfg.do_hmc:
        # fleet-level posterior sampling (each rank's HMC stage in the
        # reference mpisim drivers), prior-whitened per subject when
        # cfg.whiten is set (fleet factors double as the maps)
        if cfg.whiten == "pncp":
            raise ValueError(
                "run_sim_fleet supports whiten=True/'prior' only; the "
                "pilot-retuned 'pncp' sampler is single-subject "
                "(run_subject) — fleet chains would silently skip the retune"
            )
        if cfg.sampler == "nuts":
            n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
            samples, accept = fleet_mod.nuts_fleet(
                cfg.model, batch.x, batch.y, res.vecs,
                jax.random.fold_in(key, 31), n_samples=cfg.n_hmc,
                step_size=cfg.hmc_step_size, n_warmup=n_warm,
                hyper=cfg.hyper, mesh=mesh, whiten=bool(cfg.whiten),
            )
            out["hmc_accept"] = np.asarray(accept)
        elif cfg.sampler == "drhmc":
            n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
            samples, stages = fleet_mod.drhmc_fleet(
                cfg.model, batch.x, batch.y, res.vecs,
                jax.random.fold_in(key, 31), n_samples=cfg.n_hmc,
                step_size=cfg.hmc_step_size, n_leapfrog=cfg.hmc_leapfrog,
                n_warmup=n_warm, n_stages=cfg.dr_stages,
                reduction=cfg.dr_reduction, hyper=cfg.hyper, mesh=mesh,
                whiten=bool(cfg.whiten),
            )
            out["hmc_accept"] = np.asarray(
                (np.asarray(stages)[:, n_warm:] > 0).mean(axis=1)
            )
        elif cfg.sampler == "smc":
            r = fleet_mod.smc_fleet(
                cfg.model, batch.x, batch.y,
                jax.random.fold_in(key, 31),
                n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                cfg.n_hmc),
                n_mutations=cfg.smc_mutations, n_leapfrog=cfg.smc_leapfrog,
                target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                waste_free=cfg.smc_waste_free,
                resample_ess=cfg.smc_resample_ess,
                resample=cfg.smc_resample,
                hyper=cfg.hyper, mesh=mesh, whiten=True,
            )
            samples = r.particles[:, : cfg.n_hmc, :]
            out["hmc_accept"] = np.asarray(r.accept)
            out["log_evidence"] = np.asarray(r.logz)
            out["smc_beta_final"] = np.asarray(r.beta_final)
        elif cfg.sampler == "pathfinder":
            # variational fleet tier: seconds-scale approximate draws;
            # centers at the fleet MAPs, per-subject k_hat surfaced
            r = fleet_mod.pathfinder_fleet(
                cfg.model, batch.x, batch.y,
                jax.random.fold_in(key, 31),
                n_paths=cfg.pf_paths, max_iters=cfg.pf_iters,
                n_draws=cfg.pf_draws, n_out=max(cfg.n_hmc, 1),
                hyper=cfg.hyper, mesh=mesh, whiten=True, vecs=res.vecs,
            )
            samples = r.draws[:, : cfg.n_hmc, :]
            out["pf_k_hat"] = np.asarray(r.k_hat)
            out["log_evidence_is"] = np.asarray(r.log_evidence)
        else:
            samples = fleet_mod.hmc_fleet(
                cfg.model, batch.x, batch.y, res.vecs,
                jax.random.fold_in(key, 31), n_samples=cfg.n_hmc,
                step_size=cfg.hmc_step_size, n_leapfrog=cfg.hmc_leapfrog,
                hyper=cfg.hyper, mesh=mesh, n_warmup=cfg.hmc_warmup,
                adapt_step_size=cfg.hmc_adapt, whiten=bool(cfg.whiten),
            )
        out["hmc_samples"] = np.asarray(samples)
    if cfg.do_evaluation:
        # replicated-data G/P/D per subject (the mpisim drivers' model
        # evaluation, Nonseparable_model_mpisim.py:466-472) via predictive
        # sampling at the training inputs
        pred = _PREDICT[cfg.model]
        k_eval = jax.random.PRNGKey(cfg.seed + 101)
        gpd = []
        for i in range(n_replicates):
            data_i = FullData(batch.x[i], batch.y[i])
            vec_i = res.vecs[i]
            if cfg.model == "lmc":
                gp = pred.predict_map(vec_i, data_i, batch.x[i])
                mean, std = np.asarray(gp.mean), np.asarray(gp.std)
            elif cfg.model == "gnmgp_hetero":
                # plug-in moments with the kriged noise process (the hetero
                # predictor has no latent-sampling variant; the closed-form
                # mean/std feed the same G/P/D scoring)
                gp = pred.predict_map(vec_i, data_i, batch.x[i], hyper=cfg.hyper)
                mean, std = np.asarray(gp.mean), np.asarray(gp.std)
            else:
                sp = pred.predict_map_sampling(
                    jax.random.fold_in(k_eval, i), 64, vec_i, data_i, batch.x[i],
                    hyper=cfg.hyper,
                )
                mean, std = np.asarray(sp.mean), np.asarray(sp.std)
            draws = mean[:, None, :] + std[:, None, :] * np.random.default_rng(
                cfg.seed + i
            ).normal(size=(n, 64, m))
            gpd.append(evaluate.gpd_scores(draws, np.asarray(batch.y[i])))
        out["gpd"] = gpd
        out["gpd_median_D"] = float(np.median([s["D"] for s in gpd]))
    if cfg.model in ("gnmgp", "gnmgp_hetero"):
        # recovery of the lengthscale process vs the known truth
        est_tilde_l = np.asarray(res.vecs[:, :n])
        true_tilde_l = np.log(np.asarray(batch.l))
        out["tilde_l_rmse"] = evaluate.rmse(est_tilde_l, true_tilde_l)
        corrs = [
            float(np.corrcoef(est_tilde_l[i], true_tilde_l[i])[0, 1])
            for i in range(n_replicates)
        ]
        out["tilde_l_corr_mean"] = float(np.mean(corrs))
    return out


def _escalate_nonmixing(out, s, cfg: PipelineConfig, run_smc) -> None:
    """Diagnostic-driven escalation shared by the dense and sparse cohort
    buckets: subjects whose multichain max split-R-hat exceeds
    ``cfg.escalate_rhat`` are re-sampled by tempered SMC — chains where
    they work, the population sampler where the diagnostics prove they
    don't (the measured N=200 posture, ROADMAP "Adaptive tempered SMC").

    ``run_smc(idx_f)`` runs the matching SMC fleet on the flagged subject
    subset and returns an :class:`~.parallel.fleet.SMCFleetResult`.  The
    fleet tiers resolve their own dispatch per hardware
    (``fleet.resolve_smc_dispatch``): one vmapped device program on CPU
    meshes and multi-chip slices, per-subject host-dispatched tempering
    loops on a single real chip — so the default escalation posture is
    safe on the production TPU with no flags.
    Mutates ``out`` in place (draws + escalation bookkeeping).
    """
    from .inference import diagnostics as diag_mod

    chains_arr = out["hmc"]  # (S, C, T, P)
    if cfg.escalate_rhat <= 0 or chains_arr.shape[1] < 2:
        return
    rhat_max = np.array([
        float(np.max(diag_mod.rhat(chains_arr[i]))) for i in range(s)
    ])
    flagged = rhat_max > cfg.escalate_rhat
    if not flagged.any():
        return
    idx_f = np.where(flagged)[0]
    r = run_smc(idx_f)
    esc_draws = np.asarray(r.particles[:, : cfg.n_hmc, :])
    hmc_new = chains_arr.copy()
    # exchangeable particles: one pseudo-chain, repeated across the chain
    # axis so downstream pooling is a no-op
    hmc_new[idx_f] = esc_draws[:, None, :, :]
    out["hmc"] = hmc_new
    esc_logz = np.full(s, np.nan)
    esc_beta = np.full(s, np.nan)
    esc_from = np.full(s, np.nan)
    esc_logz[idx_f] = np.asarray(r.logz)
    esc_beta[idx_f] = np.asarray(r.beta_final)
    esc_from[idx_f] = rhat_max[idx_f]
    out["escalated"] = flagged
    out["esc_logz"] = esc_logz
    out["esc_beta"] = esc_beta
    out["esc_from_rhat"] = esc_from


def _sparse_subject_ops(model: str, x_used, z, hyper):
    """Rebuild one subject's conditioning ops at its real inputs with the
    bucket-chosen Z (prefix quantiles — identical to the fit's) for
    post-fit scoring/prediction."""
    from .models import lmc_sparse, snmgp_sparse

    z = jnp.asarray(z)
    if model == "gnmgp_hetero_sparse":
        return gnmgp_sparse.make_ops_hetero(x_used, z, hyper)
    if model == "snmgp_sparse":
        return snmgp_sparse.make_ops(x_used, z, hyper)
    if model == "lmc_sparse":
        return lmc_sparse.make_ops(x_used, z, hyper)
    return gnmgp_sparse.make_ops(x_used, z, hyper)


def _fit_bucket_sparse(x, y, idxs, mask, cfg: PipelineConfig, mesh) -> dict:
    """One bucket of a sparse-GNMGP cohort: a stacked-SparseOps fleet.

    The packed layout lives at the bucket's shared inducing count
    ``m_z = min(cfg.n_inducing, bucket min real N)`` — parameters are at Z,
    not X, so none of the dense cohort's latent-slot padding/cropping
    applies.  Posterior sampling is the sparse fleet's tier: prior-whitened
    adaptive HMC chains at Z (``parallel.fleet_sparse.hmc_fleet_sparse``),
    ``cfg.n_chains`` per subject with non-primary starts jittered and pulled
    back by a short fleet descent (the multichain recipe — raw jitter
    strands chains above the typical set, ``inference/init.py``).
    """
    from .models import lmc_sparse, snmgp_sparse
    from .parallel import fleet_sparse as fsp

    s = x.shape[0]
    m = y.shape[-1]
    hetero = cfg.model == "gnmgp_hetero_sparse"
    if hetero:
        ops, wl, wu, werr, m_z = fsp.make_fleet_sparse_ops_hetero(
            x, mask, cfg.n_inducing, cfg.hyper
        )
        z_stack = ops.base.z
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse_hetero, fsp.hmc_fleet_sparse_hetero,
            fsp.nuts_fleet_sparse_hetero, fsp.smc_fleet_sparse_hetero)
        wchols = (wl, wu, werr)
    elif cfg.model == "snmgp_sparse":
        ops, wl, ws, m_z = fsp.make_fleet_sparse_ops_snmgp(
            x, mask, cfg.n_inducing, cfg.hyper
        )
        z_stack = ops.z
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse_snmgp, fsp.hmc_fleet_sparse_snmgp,
            fsp.nuts_fleet_sparse_snmgp, fsp.smc_fleet_sparse_snmgp)
        wchols = (wl, ws)
    elif cfg.model == "lmc_sparse":
        ops, m_z = fsp.make_fleet_sparse_ops_lmc(
            x, mask, cfg.n_inducing, cfg.hyper
        )
        z_stack = ops.z
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse_lmc, fsp.hmc_fleet_sparse_lmc,
            fsp.nuts_fleet_sparse_lmc, fsp.smc_fleet_sparse_lmc)
        wchols = ()
    else:
        ops, wl, wu, m_z = fsp.make_fleet_sparse_ops(
            x, mask, cfg.n_inducing, cfg.hyper
        )
        z_stack = ops.z
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse, fsp.hmc_fleet_sparse,
            fsp.nuts_fleet_sparse, fsp.smc_fleet_sparse)
        wchols = (wl, wu)
    inits = []
    for j in range(s):
        n_real = int(mask[j].sum())
        emp = empirical.local_estimation(
            x[j][:n_real], y[j][:n_real],
            window_size=min(cfg.window_size, max(2, n_real // 3)),
        )
        if cfg.model == "snmgp_sparse":
            dense_init = init_mod.snmgp_from_empirical(emp, n_real, m)
            init_j = snmgp_sparse.init_from_empirical(
                dense_init, n_real, m_z, m, x[j][:n_real], z_stack[j]
            )
        elif cfg.model == "lmc_sparse":
            # the stationary layout is N-free — the dense empirical init
            # is the sparse init
            init_j = init_mod.lmc_from_empirical(emp, n_real, m)
        else:
            dense_init = init_mod.gnmgp_from_empirical(emp, n_real, m)
            init_j = gnmgp_sparse.init_from_empirical(
                dense_init, n_real, m_z, m, x[j][:n_real], z_stack[j]
            )
        if hetero:
            # broadcast the homoscedastic noise over the (Z x task) process
            # (run_subject's _build_inits recipe)
            init_j = jnp.concatenate(
                [init_j[:-1], jnp.full((m_z * m,), init_j[-1], init_j.dtype)]
            )
        inits.append(init_j)
    res = fit_fn(
        jnp.asarray(x), jnp.asarray(y), jnp.stack(inits), ops=ops,
        hyper=cfg.hyper, approx=cfg.sparse_approx, n_iters=cfg.n_opt,
        lr=cfg.lr, mesh=mesh, masks=jnp.asarray(mask),
        method=cfg.map_method,
    )
    out = {
        "vec": np.asarray(res.vecs),
        "final_nlp": np.asarray(res.final_nlp),
        "n_train": np.asarray(mask).sum(axis=1).astype(int),
        "z": np.asarray(z_stack),
        "m_z": np.full(s, m_z, dtype=int),
    }
    if cfg.do_hmc:
        if cfg.whiten == "pncp":
            raise ValueError("run_cohort supports whiten=True/'prior' only "
                             "(pncp is single-subject)")
        sampler, _ = _cohort_sampling_posture(
            cfg, n_bucket=np.shape(x)[1], mesh=mesh)
        k_bucket = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                      int(idxs[0]))
        if sampler == "smc":
            # tempered-SMC tier at Z: per-subject populations follow the
            # prior→posterior path (no warm start; evidence comes back in
            # the natural space); particles are exchangeable, chain axis=1
            r = smc_fn(
                jnp.asarray(x), jnp.asarray(y), k_bucket,
                n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                cfg.n_hmc),
                n_mutations=cfg.smc_mutations, n_leapfrog=cfg.smc_leapfrog,
                target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                waste_free=cfg.smc_waste_free,
                resample_ess=cfg.smc_resample_ess, resample=cfg.smc_resample,
                ops=ops, whiten_chols=wchols, hyper=cfg.hyper,
                approx=cfg.sparse_approx, mesh=mesh, whiten=True,
                masks=jnp.asarray(mask),
            )
            out["hmc"] = np.asarray(r.particles[:, : cfg.n_hmc, :])[:, None]
            out["smc_logz"] = np.asarray(r.logz)
            out["smc_beta"] = np.asarray(r.beta_final)
            out["smc_stages"] = np.asarray(r.n_stages)
            return out
        if sampler not in ("nuts", "hmc", "hmc_auto"):
            raise ValueError(
                "sparse cohort sampling supports whitened adaptive "
                "NUTS/HMC chains and tempered SMC (cohort_sampler='auto', "
                "or 'config' with sampler in hmc/nuts/smc); "
                f"got {sampler!r}")
        c = max(1, cfg.n_chains)
        reps = lambda a: jnp.repeat(jnp.asarray(a), c, axis=0)
        x_t, y_t = reps(x), reps(y)
        mask_t = jnp.repeat(jnp.asarray(mask, bool), c, axis=0)
        ops_t = jax.tree_util.tree_map(reps, ops)
        wchols_t = tuple(reps(w) for w in wchols)
        vec_t = reps(res.vecs)
        if c > 1:
            noise = 0.5 * jax.random.normal(
                jax.random.fold_in(k_bucket, 1), vec_t.shape, vec_t.dtype
            )
            primary = (jnp.arange(vec_t.shape[0]) % c) == 0
            vec_j = jnp.where(primary[:, None], vec_t, vec_t + noise)
            res_d = fit_fn(
                x_t, y_t, vec_j, ops=ops_t, hyper=cfg.hyper,
                approx=cfg.sparse_approx, n_iters=min(300, cfg.n_opt),
                lr=cfg.lr, mesh=mesh, masks=mask_t,
            )
            vec_t = res_d.vecs
        n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
        if sampler == "nuts":
            samples, _ = nuts_fn(
                x_t, y_t, vec_t, jax.random.fold_in(k_bucket, 2),
                ops=ops_t, whiten_chols=wchols_t,
                n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                n_warmup=n_warm, hyper=cfg.hyper,
                approx=cfg.sparse_approx, mesh=mesh, whiten=True,
                masks=mask_t,
            )
        else:
            samples = hmc_fn(
                x_t, y_t, vec_t, jax.random.fold_in(k_bucket, 2),
                ops=ops_t, whiten_chols=wchols_t,
                n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                n_leapfrog=cfg.hmc_leapfrog, hyper=cfg.hyper,
                approx=cfg.sparse_approx, mesh=mesh, n_warmup=n_warm,
                adapt_step_size=True, whiten=True, masks=mask_t,
            )
        out["hmc"] = np.asarray(samples).reshape(s, c, cfg.n_hmc, -1)

        def run_smc_sparse(idx_f):
            idx = jnp.asarray(idx_f)
            take = lambda tree: jax.tree_util.tree_map(lambda a: a[idx], tree)
            return smc_fn(
                jnp.asarray(x)[idx], jnp.asarray(y)[idx],
                jax.random.fold_in(k_bucket, 99),
                n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                cfg.n_hmc),
                n_mutations=cfg.smc_mutations, n_leapfrog=cfg.smc_leapfrog,
                target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                waste_free=cfg.smc_waste_free,
                resample_ess=cfg.smc_resample_ess, resample=cfg.smc_resample,
                ops=take(ops), whiten_chols=tuple(w[idx] for w in wchols),
                hyper=cfg.hyper, approx=cfg.sparse_approx, mesh=mesh,
                whiten=True, masks=jnp.asarray(mask)[idx],
            )

        _escalate_nonmixing(out, s, cfg, run_smc_sparse)
    return out


def _fit_bucket_sparse_hadamard(x, indx, y, m: int, idxs, mask,
                                cfg: PipelineConfig, mesh) -> dict:
    """Hadamard-layout analogue of :func:`_fit_bucket_sparse` (one
    observation per (input, task) pair; random inits, the dense Hadamard
    cohort's convention).  Routes every Hadamard-capable sparse model
    (gnmgp_sparse, snmgp_sparse, lmc_sparse)."""
    from .models import lmc_sparse, snmgp_sparse
    from .parallel import fleet_sparse as fsp

    s = x.shape[0]
    if cfg.model == "snmgp_sparse":
        ops, wl, ws, m_z = fsp.make_fleet_sparse_ops_snmgp(
            x, mask, cfg.n_inducing, cfg.hyper)
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse_snmgp_hadamard,
            fsp.hmc_fleet_sparse_snmgp_hadamard,
            fsp.nuts_fleet_sparse_snmgp_hadamard,
            fsp.smc_fleet_sparse_snmgp_hadamard)
        wchols = (wl, ws)
        n_par = snmgp_sparse.n_params(m_z, m)
    elif cfg.model == "lmc_sparse":
        ops, m_z = fsp.make_fleet_sparse_ops_lmc(
            x, mask, cfg.n_inducing, cfg.hyper)
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse_lmc_hadamard,
            fsp.hmc_fleet_sparse_lmc_hadamard,
            fsp.nuts_fleet_sparse_lmc_hadamard,
            fsp.smc_fleet_sparse_lmc_hadamard)
        wchols = ()
        n_par = lmc_sparse.n_params(m)
    else:
        ops, wl, wu, m_z = fsp.make_fleet_sparse_ops_hadamard(
            x, mask, cfg.n_inducing, cfg.hyper
        )
        fit_fn, hmc_fn, nuts_fn, smc_fn = (
            fsp.fit_fleet_map_sparse_hadamard,
            fsp.hmc_fleet_sparse_hadamard,
            fsp.nuts_fleet_sparse_hadamard,
            fsp.smc_fleet_sparse_hadamard)
        wchols = (wl, wu)
        n_par = gnmgp_sparse.n_params(m_z, m)
    rng_init = np.random.default_rng(0)
    inits = 0.1 * rng_init.standard_normal((s, n_par))
    inits[:, -1] = -2.0
    res = fit_fn(
        jnp.asarray(x), jnp.asarray(indx), jnp.asarray(y), m,
        jnp.asarray(inits), ops=ops, hyper=cfg.hyper,
        approx=cfg.sparse_approx, n_iters=cfg.n_opt, lr=cfg.lr, mesh=mesh,
        masks=jnp.asarray(mask), method=cfg.map_method,
    )
    out = {
        "vec": np.asarray(res.vecs),
        "final_nlp": np.asarray(res.final_nlp),
        "n_train": np.asarray(mask).sum(axis=1).astype(int),
        "z": np.asarray(ops.z),
        "m_z": np.full(s, m_z, dtype=int),
    }
    if cfg.do_hmc:
        if cfg.whiten == "pncp":
            raise ValueError("run_cohort_hadamard supports whiten=True/"
                             "'prior' only (pncp is single-subject)")
        sampler, _ = _cohort_sampling_posture(
            cfg, n_bucket=np.shape(x)[1], mesh=mesh)
        k_bucket = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                      int(idxs[0]))
        if sampler == "smc":
            r = smc_fn(
                jnp.asarray(x), jnp.asarray(indx, jnp.int32),
                jnp.asarray(y), m, k_bucket,
                n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                cfg.n_hmc),
                n_mutations=cfg.smc_mutations, n_leapfrog=cfg.smc_leapfrog,
                target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                waste_free=cfg.smc_waste_free,
                resample_ess=cfg.smc_resample_ess, resample=cfg.smc_resample,
                ops=ops, whiten_chols=wchols, hyper=cfg.hyper,
                approx=cfg.sparse_approx, mesh=mesh, whiten=True,
                masks=jnp.asarray(mask),
            )
            out["hmc"] = np.asarray(r.particles[:, : cfg.n_hmc, :])[:, None]
            out["smc_logz"] = np.asarray(r.logz)
            out["smc_beta"] = np.asarray(r.beta_final)
            out["smc_stages"] = np.asarray(r.n_stages)
            return out
        if sampler not in ("nuts", "hmc", "hmc_auto"):
            raise ValueError(
                "sparse cohort sampling supports whitened adaptive "
                "NUTS/HMC chains and tempered SMC (cohort_sampler='auto', "
                "or 'config' with sampler in hmc/nuts/smc); "
                f"got {sampler!r}")
        c = max(1, cfg.n_chains)
        reps = lambda a: jnp.repeat(jnp.asarray(a), c, axis=0)
        x_t, y_t = reps(x), reps(y)
        indx_t = jnp.repeat(jnp.asarray(indx, jnp.int32), c, axis=0)
        mask_t = jnp.repeat(jnp.asarray(mask, bool), c, axis=0)
        ops_t = jax.tree_util.tree_map(reps, ops)
        wchols_t = tuple(reps(w) for w in wchols)
        vec_t = reps(res.vecs)
        if c > 1:
            noise = 0.5 * jax.random.normal(
                jax.random.fold_in(k_bucket, 1), vec_t.shape, vec_t.dtype
            )
            primary = (jnp.arange(vec_t.shape[0]) % c) == 0
            vec_j = jnp.where(primary[:, None], vec_t, vec_t + noise)
            res_d = fit_fn(
                x_t, indx_t, y_t, m, vec_j, ops=ops_t, hyper=cfg.hyper,
                approx=cfg.sparse_approx, n_iters=min(300, cfg.n_opt),
                lr=cfg.lr, mesh=mesh, masks=mask_t,
            )
            vec_t = res_d.vecs
        n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
        if sampler == "nuts":
            samples, _ = nuts_fn(
                x_t, indx_t, y_t, m, vec_t, jax.random.fold_in(k_bucket, 2),
                ops=ops_t, whiten_chols=wchols_t,
                n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                n_warmup=n_warm, hyper=cfg.hyper,
                approx=cfg.sparse_approx, mesh=mesh, whiten=True,
                masks=mask_t,
            )
        else:
            samples = hmc_fn(
                x_t, indx_t, y_t, m, vec_t, jax.random.fold_in(k_bucket, 2),
                ops=ops_t, whiten_chols=wchols_t,
                n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                n_leapfrog=cfg.hmc_leapfrog, hyper=cfg.hyper,
                approx=cfg.sparse_approx, mesh=mesh, n_warmup=n_warm,
                adapt_step_size=True, whiten=True, masks=mask_t,
            )
        out["hmc"] = np.asarray(samples).reshape(s, c, cfg.n_hmc, -1)

        def run_smc_sparse_h(idx_f):
            idx = jnp.asarray(idx_f)
            take = lambda tree: jax.tree_util.tree_map(lambda a: a[idx], tree)
            return smc_fn(
                jnp.asarray(x)[idx], jnp.asarray(indx, jnp.int32)[idx],
                jnp.asarray(y)[idx], m, jax.random.fold_in(k_bucket, 99),
                n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                cfg.n_hmc),
                n_mutations=cfg.smc_mutations, n_leapfrog=cfg.smc_leapfrog,
                target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                waste_free=cfg.smc_waste_free,
                resample_ess=cfg.smc_resample_ess, resample=cfg.smc_resample,
                ops=take(ops), whiten_chols=tuple(w[idx] for w in wchols),
                hyper=cfg.hyper, approx=cfg.sparse_approx, mesh=mesh,
                whiten=True, masks=jnp.asarray(mask)[idx],
            )

        _escalate_nonmixing(out, s, cfg, run_smc_sparse_h)
    return out


def run_cohort(
    subjects: dict,
    cfg: PipelineConfig | None = None,
    store: ArtifactStore | None = None,
    dataset: str = "cohort",
    n_buckets: int = 4,
    extrapolation_size: int = 0,
    mesh=None,
    mode: str = "pad",
    sharded_threshold: int | None = None,
) -> dict:
    """Ragged multi-subject cohort pipeline (KAISER-style drivers:
    ``*_mpiKAISER``, ``*_distributed``, ``*_personalized``).

    ``subjects``: {ID: (x, Y)} with per-subject lengths — e.g. the output of
    ``data.io.load_kaiser_distributed``.  Subjects are detrended/standardized
    per feature (``preprocess.orig2adj``), optionally split with a last-k
    extrapolation holdout (``Stationary_model_distributed.py`` mode), bucketed
    by length, MAP-fitted as one sharded fleet per bucket, test-scored, and
    reduced to fleet-level RMSE/LPD summaries.

    ``sharded_threshold`` (GNMGP only): subjects with more than that many
    observations bypass the subject-parallel fleet and fit through the
    **model-parallel** matrix-free objective instead
    (``parallel.sharded_obj`` — the (MN × MN) Gram row-banded over the same
    mesh), so one year-long subject cannot cap the whole cohort's memory.
    LMC/SNMGP scale through their Kronecker structure and never need this.

    ``cfg.model="gnmgp_sparse"`` routes every bucket through the sparse
    inducing-point fleet instead (``parallel.fleet_sparse`` — many subjects
    × large N each at O(N·M·(m_z·M)²) per subject): MAP, whitened adaptive
    HMC chains at Z, Woodbury PSIS-LOO, and sparse test prediction land in
    the same artifacts and reduction as the dense models'.
    """
    from .parallel import buckets as buckets_mod
    from .postprocess import summary as summary_mod

    cfg = cfg or PipelineConfig()
    mesh = mesh or make_mesh()
    all_ids = sorted(subjects.keys(), key=str)
    big_ids: list = []
    if sharded_threshold is not None and cfg.model in ("gnmgp", "gnmgp_hetero"):
        big_ids = [
            sid for sid in all_ids
            if np.asarray(subjects[sid][0]).shape[0] > sharded_threshold
        ]
    ids = [sid for sid in all_ids if sid not in big_ids]

    # one preprocessing pipeline for every subject (fleet-fitted or sharded):
    # detrend/standardize per feature, optional extrapolation holdout.
    # Scoring happens in the adjusted space, as in the fleet path.
    prep = {}
    for sid in all_ids:
        x_i, y_i = subjects[sid]
        x_i = np.asarray(x_i, float)
        adj, _, _ = preprocess.orig2adj(np.asarray(y_i, float))
        if extrapolation_size > 0:
            x_tr, x_te, y_tr, y_te = preprocess.data_split_extrapolation(
                x_i, adj, size=extrapolation_size
            )
        else:
            x_tr, y_tr, x_te, y_te = x_i, adj, None, None
        prep[sid] = (x_tr, y_tr, (x_te, y_te))
    xs = [prep[sid][0] for sid in ids]
    ys = [prep[sid][1] for sid in ids]
    tests = [prep[sid][2] for sid in ids]

    def fit_bucket(x, y, idxs, mask):
        if cfg.model.endswith("_sparse"):
            # the large-N tier, subject-parallel: stacked SparseOps fleet
            # (m_z-layout parameters at Z — no latent-slot pad/crop for the
            # GNMGP family; snmgp/lmc ride the same layout engine)
            return _fit_bucket_sparse(x, y, idxs, mask, cfg, mesh)
        s, n = x.shape
        m = y.shape[-1]
        inits = []
        for j in range(s):
            n_real = int(mask[j].sum())
            emp = empirical.local_estimation(
                x[j][:n_real], y[j][:n_real],
                window_size=min(cfg.window_size, max(2, n_real // 3)),
            )
            if cfg.model == "gnmgp":
                init_j = init_mod.gnmgp_from_empirical(emp, n_real, m)
            elif cfg.model == "gnmgp_hetero":
                init_j = gnmgp_hetero.init_from_gnmgp(
                    init_mod.gnmgp_from_empirical(emp, n_real, m), n_real, m
                )
            elif cfg.model == "snmgp":
                init_j = init_mod.snmgp_from_empirical(emp, n_real, m)
            else:
                init_j = init_mod.lmc_from_empirical(emp, n_real, m)
            inits.append(_pad_vec(cfg.model, init_j, n_real, n, m))
        res = fleet_mod.fit_fleet_map(
            cfg.model, jnp.asarray(x), jnp.asarray(y), jnp.stack(inits),
            hyper=cfg.hyper, n_iters=cfg.n_opt, lr=cfg.lr, mesh=mesh,
            method=cfg.map_method,
            masks=jnp.asarray(mask),
        )
        out = {
            "vec": np.asarray(res.vecs),
            "final_nlp": np.asarray(res.final_nlp),
            "n_train": np.asarray(mask).sum(axis=1).astype(int),
        }
        if cfg.do_hmc:
            # per-subject posterior chains (the KAISER drivers' HMC stage),
            # exact masked likelihoods for padded ragged subjects.  The
            # default posture (cohort_sampler="auto") is whitened adaptive
            # NUTS with cfg.n_chains jittered chains per subject; split-R̂
            # and min-ESS are always computed so silent non-mixing is
            # impossible (VERDICT r2 #2).
            if cfg.whiten == "pncp":
                raise ValueError("run_cohort supports whiten=True/'prior' "
                                 "only (pncp is single-subject)")
            sampler, whiten_flag = _cohort_sampling_posture(
                cfg, n_bucket=np.shape(x)[1], mesh=mesh)
            k_bucket = jax.random.fold_in(jax.random.PRNGKey(cfg.seed), int(idxs[0]))
            if sampler not in ("chees", "smc", "pathfinder"):  # these bring
                # their own populations/paths/chains — no unit tiling
                x_t, y_t, vec_t, mask_t = _tile_chains(
                    jnp.asarray(x), jnp.asarray(y), res.vecs, jnp.asarray(mask),
                    cfg.n_chains, jax.random.fold_in(k_bucket, 1),
                    model=cfg.model, hyper=cfg.hyper,
                )
            if sampler == "chees":
                # the many-chain tier brings its own lockstep chains per
                # subject — no unit tiling; (S, C, T, P) comes back direct
                n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
                samples, _, _ = fleet_mod.chees_fleet(
                    cfg.model, jnp.asarray(x), jnp.asarray(y), res.vecs,
                    k_bucket, n_samples=cfg.n_hmc,
                    n_chains=max(2, cfg.n_chains),
                    step_size=cfg.hmc_step_size, n_warmup=n_warm,
                    hyper=cfg.hyper, mesh=mesh, whiten=whiten_flag,
                    masks=jnp.asarray(mask),
                )
                out["hmc"] = np.asarray(samples)
            elif sampler == "smc":
                # tempered-SMC tier: per-subject particle populations follow
                # the prior→posterior path (needs no warm start, returns
                # per-subject evidence); particles are exchangeable, so the
                # leading n_hmc serve as the draw matrix, chain axis = 1
                r = fleet_mod.smc_fleet(
                    cfg.model, jnp.asarray(x), jnp.asarray(y), k_bucket,
                    n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                    cfg.n_hmc),
                    n_mutations=cfg.smc_mutations,
                    n_leapfrog=cfg.smc_leapfrog,
                    target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                    metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                    waste_free=cfg.smc_waste_free,
                    resample_ess=cfg.smc_resample_ess,
                    resample=cfg.smc_resample,
                    hyper=cfg.hyper, mesh=mesh, whiten=bool(whiten_flag),
                    masks=jnp.asarray(mask),
                )
                out["hmc"] = np.asarray(r.particles[:, : cfg.n_hmc, :])[:, None]
                out["smc_logz"] = np.asarray(r.logz)
                out["smc_beta"] = np.asarray(r.beta_final)
                out["smc_stages"] = np.asarray(r.n_stages)
            elif sampler == "pathfinder":
                # variational tier: PSIS-resampled approximate draws,
                # chain axis = 1 (draws are exchangeable, like smc)
                r = fleet_mod.pathfinder_fleet(
                    cfg.model, jnp.asarray(x), jnp.asarray(y), k_bucket,
                    n_paths=cfg.pf_paths, max_iters=cfg.pf_iters,
                    n_draws=cfg.pf_draws, n_out=max(cfg.n_hmc, 1),
                    hyper=cfg.hyper, mesh=mesh, whiten=bool(whiten_flag),
                    masks=jnp.asarray(mask), vecs=res.vecs,
                )
                out["hmc"] = np.asarray(r.draws[:, : cfg.n_hmc, :])[:, None]
                out["pf_k_hat"] = np.asarray(r.k_hat)
                out["pf_logev"] = np.asarray(r.log_evidence)
            elif sampler == "nuts":
                n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
                samples, _ = fleet_mod.nuts_fleet(
                    cfg.model, x_t, y_t, vec_t,
                    k_bucket, n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                    n_warmup=n_warm, hyper=cfg.hyper, mesh=mesh,
                    whiten=whiten_flag, masks=mask_t,
                )
            elif sampler == "drhmc":
                n_warm = cfg.hmc_warmup if cfg.hmc_warmup > 0 else max(100, cfg.n_hmc)
                samples, _ = fleet_mod.drhmc_fleet(
                    cfg.model, x_t, y_t, vec_t,
                    k_bucket, n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                    n_leapfrog=cfg.hmc_leapfrog, n_warmup=n_warm,
                    n_stages=cfg.dr_stages, reduction=cfg.dr_reduction,
                    hyper=cfg.hyper, mesh=mesh,
                    whiten=whiten_flag, masks=mask_t,
                )
            elif sampler in ("hmc", "hmc_auto"):
                # "hmc_auto": the single-chip reference-scale posture
                # (_cohort_sampling_posture) — warmup + step-size
                # adaptation forced so the fixed-trajectory chains stay
                # zero-tuning like the NUTS default they replace
                auto = sampler == "hmc_auto"
                n_warm = (cfg.hmc_warmup if cfg.hmc_warmup > 0 or not auto
                          else max(100, cfg.n_hmc))
                samples = fleet_mod.hmc_fleet(
                    cfg.model, x_t, y_t, vec_t,
                    k_bucket, n_samples=cfg.n_hmc, step_size=cfg.hmc_step_size,
                    n_leapfrog=cfg.hmc_leapfrog, hyper=cfg.hyper, mesh=mesh,
                    n_warmup=n_warm, adapt_step_size=cfg.hmc_adapt or auto,
                    whiten=whiten_flag, masks=mask_t,
                )
            else:
                raise ValueError(
                    f"unknown cohort sampler {sampler!r}: cohort drivers "
                    "support hmc/nuts/drhmc/chees/smc/pathfinder "
                    "(rmhmc is single-subject — use run_subject)")
            if "hmc" not in out:  # chees writes (S, C, T, P) itself
                c = max(1, cfg.n_chains)
                out["hmc"] = np.asarray(samples).reshape(s, c, cfg.n_hmc, -1)
            if sampler != "smc":
                def run_smc_dense(idx_f):
                    return fleet_mod.smc_fleet(
                        cfg.model, jnp.asarray(x)[idx_f],
                        jnp.asarray(y)[idx_f],
                        jax.random.fold_in(k_bucket, 99),
                        n_particles=max(cfg.smc_particles or max(256, cfg.n_hmc),
                                        cfg.n_hmc),
                        n_mutations=cfg.smc_mutations,
                        n_leapfrog=cfg.smc_leapfrog,
                        target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                        metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                        waste_free=cfg.smc_waste_free,
                        resample_ess=cfg.smc_resample_ess,
                        resample=cfg.smc_resample,
                        hyper=cfg.hyper, mesh=mesh, whiten=True,
                        masks=jnp.asarray(mask)[idx_f],
                    )

                _escalate_nonmixing(out, s, cfg, run_smc_dense)
        return out

    per_subject = (
        buckets_mod.run_bucketed(xs, ys, fit_bucket, n_buckets=n_buckets,
                                 mode=mode)
        if ids else []
    )

    # per-subject test scoring + artifact writes
    results = {}
    pred_mod = _PREDICT[cfg.model]
    for pos, sid in enumerate(ids):
        entry = per_subject[pos]
        rec = {"map_vec": entry["vec"], "final_nlp": float(entry["final_nlp"])}
        if "hmc" in entry:
            chains = np.asarray(entry["hmc"])  # (C, T, P), bucket-padded
            rec["hmc_samples"] = chains.reshape(-1, chains.shape[-1])  # pooled
            if entry.get("escalated", False):
                # chains disagreed past cfg.escalate_rhat; draws were
                # replaced by a tempered-SMC population inside the bucket
                rec["sampling"] = {
                    "sampler": "smc",
                    "escalated_from_rhat": float(entry["esc_from_rhat"]),
                    "log_evidence": float(entry["esc_logz"]),
                    "beta_final": float(entry["esc_beta"]),
                }
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        log_evidence=rec["sampling"]["log_evidence"],
                        beta_final=rec["sampling"]["beta_final"],
                        escalated_from_rhat=rec["sampling"]["escalated_from_rhat"],
                    )
            elif "smc_logz" in entry:
                # SMC particles are exchangeable, not a chain — chain
                # ESS/R-hat do not apply; surface the tempering health
                # (beta_final == 1) and the per-subject evidence instead
                rec["sampling"] = {
                    "sampler": "smc",
                    "log_evidence": float(entry["smc_logz"]),
                    "beta_final": float(entry["smc_beta"]),
                    "n_stages": int(entry["smc_stages"]),
                }
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        log_evidence=rec["sampling"]["log_evidence"],
                        beta_final=rec["sampling"]["beta_final"],
                        n_stages=rec["sampling"]["n_stages"],
                    )
            elif "pf_k_hat" in entry:
                # pathfinder draws are PSIS-resampled, not a chain; surface
                # the proposal-reliability diagnostic (k_hat > 0.7 =
                # escalate to sampler="smc") and the IS evidence estimate
                rec["sampling"] = {
                    "sampler": "pathfinder",
                    "k_hat": float(entry["pf_k_hat"]),
                    "log_evidence_is": float(entry["pf_logev"]),
                }
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        k_hat=rec["sampling"]["k_hat"],
                        log_evidence_is=rec["sampling"]["log_evidence_is"],
                    )
            else:
                rec["sampling"] = _sampling_record(chains, chains.shape[0])
                if store is not None:
                    store.save(ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                               samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "sampling"),
                        min_ess=rec["sampling"]["min_ess"],
                        median_ess=rec["sampling"]["median_ess"],
                        max_rhat=rec["sampling"]["max_rhat"],
                        n_chains=rec["sampling"]["n_chains"],
                    )
        if cfg.do_loo and "hmc_samples" in rec:
            # per-subject WAIC + PSIS-LOO from the pooled draws (exact
            # joint-MVN LOO conditionals); padded fits are cropped to the
            # subject's real inputs first
            n_bucket = int(entry["n_train"])
            x_used = np.asarray(xs[pos][:n_bucket])
            y_used = np.asarray(ys[pos][:n_bucket])
            m_tasks = y_used.shape[1]
            hist = np.asarray(rec["hmc_samples"])
            if hist.shape[0] > cfg.loo_draws:
                sel = np.linspace(0, hist.shape[0] - 1, cfg.loo_draws).astype(int)
                hist = hist[sel]
            if cfg.model.endswith("_sparse"):
                # m_z-layout draws need no cropping; LOO conditionals come
                # from the sparse Woodbury factors (evaluate.py)
                hetero_sp = cfg.model == "gnmgp_hetero_sparse"
                ops_used = _sparse_subject_ops(
                    cfg.model, x_used, entry["z"], cfg.hyper)
                cond_ll = evaluate.chain_conditional_loglik_sparse(
                    hist,
                    FullData(jnp.asarray(x_used, settings.dtype),
                             jnp.asarray(y_used, settings.dtype)),
                    ops_used, approx=cfg.sparse_approx, hyper=cfg.hyper,
                    hetero=hetero_sp, model=cfg.model,
                )
            else:
                n_fit = _vec_input_count(cfg.model, hist.shape[1], m_tasks,
                                         n_bucket)
                if n_fit != n_bucket and cfg.model != "lmc":
                    hist = np.asarray(jax.vmap(
                        lambda v: _crop_vec(cfg.model, v, n_fit, n_bucket, m_tasks)
                    )(jnp.asarray(hist)))
                cond_ll = evaluate.chain_conditional_loglik(
                    cfg.model, hist, x_used, y_used
                )
            loo = evaluate.psis_loo(cond_ll)
            wa = evaluate.waic(cond_ll)
            rec["loo"] = {
                "elpd_loo": loo["elpd_loo"], "p_loo": loo["p_loo"],
                "n_bad_k": loo["n_bad_k"],
                "k_hat_max": float(np.max(loo["k_hat"])),
                "elpd_waic": wa["elpd_waic"], "p_waic": wa["p_waic"],
            }
            if store is not None:
                store.save(ArtifactStore.key(cfg.model, dataset, sid, "loo"),
                           **rec["loo"])
        x_te, y_te = tests[pos]
        if x_te is not None and cfg.do_pred_test:
            # bucket staging may have cropped (truncate) or padded (pad) the
            # subject; re-crop data and, for padded fits, the latent slots
            n_bucket = int(entry["n_train"])
            x_used = xs[pos][:n_bucket]
            y_used = ys[pos][:n_bucket]
            data = FullData(
                jnp.asarray(x_used, settings.dtype), jnp.asarray(y_used, settings.dtype)
            )
            vec = jnp.asarray(entry["vec"], settings.dtype)
            m_tasks = y_used.shape[1]
            if cfg.model.endswith("_sparse"):
                # m_z-layout vec; conditioning ops rebuilt at the subject's
                # real inputs with the bucket-chosen Z (prefix quantiles,
                # identical to the fit's)
                ops_used = _sparse_subject_ops(
                    cfg.model, np.asarray(x_used), entry["z"], cfg.hyper)
                pred_fn = (pred_mod.predict_map_hetero
                           if cfg.model == "gnmgp_hetero_sparse"
                           else pred_mod.predict_map)
                tp = pred_fn(
                    vec, data, ops_used,
                    jnp.asarray(x_te, settings.dtype),
                    hyper=cfg.hyper, approx=cfg.sparse_approx,
                )
            elif cfg.model == "lmc":
                n_pad_fit = _vec_input_count(
                    cfg.model, int(vec.shape[0]), m_tasks, n_bucket
                )
                vec = _crop_vec(cfg.model, vec, n_pad_fit, n_bucket, m_tasks)
                tp = pred_mod.predict_map(vec, data, jnp.asarray(x_te, settings.dtype))
            else:
                n_pad_fit = _vec_input_count(
                    cfg.model, int(vec.shape[0]), m_tasks, n_bucket
                )
                vec = _crop_vec(cfg.model, vec, n_pad_fit, n_bucket, m_tasks)
                tp = pred_mod.predict_map(
                    vec, data, jnp.asarray(x_te, settings.dtype), hyper=cfg.hyper
                )
            rec["test_rmse"] = evaluate.rmse(np.asarray(tp.mean), y_te)
            rec["test_lpd"] = evaluate.lpd(np.asarray(tp.mean), np.asarray(tp.std), y_te)
            if store is not None:
                store.save(
                    ArtifactStore.key(cfg.model, dataset, sid, "scores"),
                    rmse=rec["test_rmse"], lpd=rec["test_lpd"],
                )
        if store is not None:
            extra = ({"z": np.asarray(entry["z"]),
                      "approx": np.asarray(cfg.sparse_approx)}
                     if cfg.model.endswith("_sparse") else {})
            store.save(
                ArtifactStore.key(cfg.model, dataset, sid, "map"),
                vec=entry["vec"], **extra
            )
        results[sid] = rec

    # oversized subjects: model-parallel fits through the same mesh
    if big_ids:
        from .inference import whiten as whiten_mod
        from .parallel import sharded_obj
    for sid in big_ids:
        x_tr, y_tr, (x_te, y_te) = prep[sid]
        n_i, m_i = y_tr.shape
        emp = empirical.local_estimation(
            x_tr, y_tr, window_size=min(cfg.window_size, max(2, n_i // 3))
        )
        init_vec = init_mod.gnmgp_from_empirical(emp, n_i, m_i)
        if cfg.model == "gnmgp_hetero":
            init_vec = gnmgp_hetero.init_from_gnmgp(init_vec, n_i, m_i)
        data_i = FullData(
            jnp.asarray(x_tr, settings.dtype), jnp.asarray(y_tr, settings.dtype)
        )
        nlp = sharded_obj.make_objective_sharded(
            data_i, mesh=mesh, hyper=cfg.hyper, model=cfg.model
        )
        res_i = map_mod.fit_map(nlp, init_vec, n_iters=cfg.n_opt, lr=cfg.lr,
                                method=cfg.map_method)
        rec = {
            "map_vec": np.asarray(res_i.vec),
            # the optimizer's own trace supplies the final objective; no
            # extra forward-only compile of the sharded Gram program
            "final_nlp": float(-res_i.target_hist[-1]),
            "sharded": True,
        }
        if cfg.do_hmc:
            # same posterior-sampling stage as the fleet subjects, through
            # the sharded likelihood in the prior-whitened space
            if cfg.whiten == "pncp":
                raise ValueError("run_cohort supports whiten=True/'prior' "
                                 "only (pncp is single-subject)")
            k_big = jax.random.fold_in(jax.random.PRNGKey(cfg.seed),
                                       100003 + big_ids.index(sid))
            if cfg.sampler == "smc":
                # the between-basin tier over the sharded potential: the
                # population's likelihoods/gradients run as batched sharded
                # sweeps (sharded_obj.loglik_sharded_batch), one dispatch
                # per stage — driver symmetry with the fleet SMC tier
                r_smc, parts = sharded_obj.smc_sample_sharded_potential(
                    data_i, k_big, mesh=mesh, hyper=cfg.hyper,
                    model=cfg.model,
                    n_particles=max(cfg.smc_particles or 64, cfg.n_hmc),
                    n_mutations=cfg.smc_mutations,
                    n_leapfrog=cfg.smc_leapfrog,
                    target_cess=cfg.smc_cess, dr_reduction=cfg.smc_dr,
                    metric=cfg.smc_metric, n_polish=cfg.smc_polish,
                    waste_free=cfg.smc_waste_free,
                    resample_ess=cfg.smc_resample_ess,
                    resample=cfg.smc_resample,
                )
                rec["hmc_samples"] = np.asarray(parts)[: cfg.n_hmc]
                rec["sampling"] = {
                    "sampler": "smc",
                    "log_evidence": float(r_smc.logz),
                    "beta_final": float(r_smc.beta_final),
                    "n_stages": int(r_smc.n_stages),
                }
                if store is not None:
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                        samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid,
                                          "sampling"),
                        log_evidence=rec["sampling"]["log_evidence"],
                        beta_final=rec["sampling"]["beta_final"],
                        n_stages=rec["sampling"]["n_stages"],
                    )
            else:
                w = whiten_mod.make_whitener(
                    cfg.model, data_i.x, n_i, m_i, cfg.hyper
                )
                chain = hmc_mod.hmc_sample(
                    w.wrap(nlp), w.to_white(res_i.vec), cfg.n_hmc, k_big,
                    step_size=cfg.hmc_step_size,
                    n_leapfrog=cfg.hmc_leapfrog,
                    n_warmup=cfg.hmc_warmup, adapt_step_size=cfg.hmc_adapt,
                )
                rec["hmc_samples"] = np.asarray(
                    w.from_white_batch(chain.samples)
                )
                rec["sampling"] = _sampling_record(
                    rec["hmc_samples"][None], 1
                )
                if store is not None:
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid, "hmc"),
                        samples=rec["hmc_samples"])
                    store.save(
                        ArtifactStore.key(cfg.model, dataset, sid,
                                          "sampling"),
                        min_ess=rec["sampling"]["min_ess"],
                        median_ess=rec["sampling"]["median_ess"],
                        max_rhat=rec["sampling"]["max_rhat"],
                        n_chains=1,
                    )
        if x_te is not None and cfg.do_pred_test:
            tp = sharded_obj.predict_map_sharded(
                res_i.vec, data_i, jnp.asarray(x_te, settings.dtype),
                mesh=mesh, hyper=cfg.hyper, model=cfg.model,
            )
            rec["test_rmse"] = evaluate.rmse(np.asarray(tp.mean), y_te)
            rec["test_lpd"] = evaluate.lpd(
                np.asarray(tp.mean), np.asarray(tp.std), y_te
            )
            if store is not None:
                store.save(ArtifactStore.key(cfg.model, dataset, sid, "scores"),
                           rmse=rec["test_rmse"], lpd=rec["test_lpd"])
        if store is not None:
            store.save(ArtifactStore.key(cfg.model, dataset, sid, "map"),
                       vec=rec["map_vec"])
        results[sid] = rec
    ids = all_ids

    out = {"subjects": results, "ids": ids}
    if store is not None:
        keys = [ArtifactStore.key(cfg.model, dataset, sid, "scores") for sid in ids]
        out["reduction"] = summary_mod.reduce_fleet_metrics(store, keys)
    return out


def _pad_gnmgp_vec(vec, n_real: int, n_pad: int, m: int):
    """Extend a GNMGP parameter vector's latent slots from n_real to n_pad
    inputs by repeating the edge values (padded slots are masked out of the
    likelihood and only feel the prior)."""
    import jax.numpy as jnp

    t = m * (m + 1) // 2
    vec = jnp.asarray(vec)
    tilde_l = vec[:n_real]
    ul = vec[n_real : n_real + n_real * t].reshape(n_real, t)
    pad = n_pad - n_real
    tilde_l = jnp.concatenate([tilde_l, jnp.repeat(tilde_l[-1:], pad)])
    ul = jnp.concatenate([ul, jnp.repeat(ul[-1:, :], pad, axis=0)], axis=0)
    return jnp.concatenate([tilde_l, ul.reshape(-1), vec[-1:]])


def _crop_gnmgp_vec(vec, n_pad: int, n_real: int, m: int):
    """Inverse of :func:`_pad_gnmgp_vec`: keep only the real latent slots."""
    import jax.numpy as jnp

    t = m * (m + 1) // 2
    vec = jnp.asarray(vec)
    tilde_l = vec[:n_real]
    ul = vec[n_pad : n_pad + n_real * t]
    return jnp.concatenate([tilde_l, ul, vec[-1:]])


def _pad_snmgp_vec(vec, n_real: int, n_pad: int, m: int):
    """Extend an SNMGP vector's per-input latents (tilde_l, tilde_sigma) from
    n_real to n_pad inputs by repeating the edge values (layout:
    ``[tilde_l(N), tilde_sigma(N), uL_vec(T), tilde_sigma2_err]``,
    reference ``vec2pars``, logpos.py:17-29)."""
    import jax.numpy as jnp

    vec = jnp.asarray(vec)
    pad = n_pad - n_real
    tilde_l = vec[:n_real]
    tilde_sigma = vec[n_real : 2 * n_real]
    tail = vec[2 * n_real :]  # uL_vec + tilde_sigma2_err (N-independent)
    tilde_l = jnp.concatenate([tilde_l, jnp.repeat(tilde_l[-1:], pad)])
    tilde_sigma = jnp.concatenate([tilde_sigma, jnp.repeat(tilde_sigma[-1:], pad)])
    return jnp.concatenate([tilde_l, tilde_sigma, tail])


def _crop_snmgp_vec(vec, n_pad: int, n_real: int, m: int):
    """Inverse of :func:`_pad_snmgp_vec`."""
    import jax.numpy as jnp

    vec = jnp.asarray(vec)
    return jnp.concatenate(
        [vec[:n_real], vec[n_pad : n_pad + n_real], vec[2 * n_pad :]]
    )


def _pad_hetero_vec(vec, n_real: int, n_pad: int, m: int):
    """Extend a heteroscedastic-GNMGP vector's latent slots from n_real to
    n_pad inputs: tilde_l and the uL rows repeat their edge values (as in
    :func:`_pad_gnmgp_vec`), and each task's noise log-variance row (layout
    ``tilde_sigma2_err (N·M,)`` task-major) repeats its edge too."""
    import jax.numpy as jnp

    t = m * (m + 1) // 2
    vec = jnp.asarray(vec)
    pad = n_pad - n_real
    tilde_l = vec[:n_real]
    ul = vec[n_real : n_real + n_real * t].reshape(n_real, t)
    err = vec[n_real + n_real * t :].reshape(m, n_real)
    tilde_l = jnp.concatenate([tilde_l, jnp.repeat(tilde_l[-1:], pad)])
    ul = jnp.concatenate([ul, jnp.repeat(ul[-1:, :], pad, axis=0)], axis=0)
    err = jnp.concatenate([err, jnp.repeat(err[:, -1:], pad, axis=1)], axis=1)
    return jnp.concatenate([tilde_l, ul.reshape(-1), err.reshape(-1)])


def _crop_hetero_vec(vec, n_pad: int, n_real: int, m: int):
    """Inverse of :func:`_pad_hetero_vec`: keep only the real latent slots."""
    import jax.numpy as jnp

    t = m * (m + 1) // 2
    vec = jnp.asarray(vec)
    tilde_l = vec[:n_real]
    ul = vec[n_pad : n_pad + n_real * t]
    err = vec[n_pad + n_pad * t :].reshape(m, n_pad)[:, :n_real]
    return jnp.concatenate([tilde_l, ul, err.reshape(-1)])


def _pad_vec(model: str, vec, n_real: int, n_pad: int, m: int):
    """Model-dispatching latent-slot padding (LMC has no per-input latents)."""
    if n_pad == n_real or model == "lmc":
        return vec
    if model == "snmgp":
        return _pad_snmgp_vec(vec, n_real, n_pad, m)
    if model == "gnmgp_hetero":
        return _pad_hetero_vec(vec, n_real, n_pad, m)
    return _pad_gnmgp_vec(vec, n_real, n_pad, m)


def _vec_input_count(model: str, p_len: int, m: int, fallback: int) -> int:
    """Number of inputs N a packed vector of length ``p_len`` was fit at.

    Inverts each model's ``n_params`` (lmc has no per-input slots, so the
    caller's ``fallback`` is returned).
    """
    t = m * (m + 1) // 2
    if model == "gnmgp":
        return (p_len - 1) // (1 + t)
    if model == "gnmgp_hetero":
        return p_len // (1 + t + m)
    if model == "snmgp":
        return (p_len - t - 1) // 2
    return fallback


def _crop_vec(model: str, vec, n_pad: int, n_real: int, m: int):
    """Inverse of :func:`_pad_vec`."""
    if n_pad == n_real or model == "lmc":
        return vec
    if model == "snmgp":
        return _crop_snmgp_vec(vec, n_pad, n_real, m)
    if model == "gnmgp_hetero":
        return _crop_hetero_vec(vec, n_pad, n_real, m)
    return _crop_gnmgp_vec(vec, n_pad, n_real, m)
