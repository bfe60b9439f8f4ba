"""Sampler efficiency on the real TPU: NUTS vs the reference-contract HMC.

The reference's sampler budget is fixed-length HMC (20 leapfrog steps,
hand-tuned step size, ``Nonseparable_model.py:229``).  This bench measures,
on the GNMGP posterior at the reference scale, what the adaptive samplers
buy in effective samples per second and per gradient evaluation:

* ``hmc``        — fixed step/length, the reference contract,
* ``hmc+window`` — same trajectory budget, windowed warmup adapts step size
  and a diagonal metric,
* ``nuts``       — dynamic trajectories + windowed warmup.

Run: ``python benchmarks/sampler_bench.py [--n 200] [--draws 400]``.
Prints one JSON object; per-sampler stderr progress lines.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("NMGP_X64", "0")  # speed tier: float32

import numpy as np


def log(msg):
    print(f"[sampler_bench] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--draws", type=int, default=400)
    ap.add_argument("--warmup", type=int, default=400)
    ap.add_argument("--map-iters", type=int, default=2000,
                    help="Adam budget for the centering MAP (fit_map keeps "
                         "the best-seen iterate, so more is monotone better)")
    ap.add_argument("--map-method", default="adam", choices=["adam", "lbfgs"],
                    help="MAP engine for the centering fit (lbfgs: ~300 "
                         "iters reach what Adam's 2000 don't; inference/map.py)")
    ap.add_argument("--step-size", type=float, default=2e-3)
    ap.add_argument("--whiten", default="off", nargs="?", const="prior",
                    choices=["off", "prior", "pncp"],
                    help="sampling reparameterization: prior-whitened latent "
                         "blocks, or partially non-centered (a pilot chain "
                         "retunes every eigendirection to its posterior scale)")
    ap.add_argument("--pilot", type=int, default=200,
                    help="pilot draws for --whiten pncp")
    ap.add_argument("--samplers", default="hmc,hmc_window,nuts",
                    help="comma-separated subset to run (hmc, hmc_window, "
                         "nuts, drhmc, rmhmc, chees, smc, pathfinder)")
    ap.add_argument("--smc-particles", type=int, default=1024)
    ap.add_argument("--smc-runs", type=int, default=4,
                    help="smc: independent runs (vmapped into one program) "
                         "for the estimator-variance N_eff — SMC particles "
                         "share ancestry, so chain ESS does not apply")
    ap.add_argument("--smc-mutations", type=int, default=5,
                    help="smc: batched-HMC decorrelation sweeps per stage")
    ap.add_argument("--smc-leapfrog", type=int, default=10)
    ap.add_argument("--smc-cess", type=float, default=0.5,
                    help="smc: conditional-ESS fraction targeted by the "
                         "adaptive beta schedule")
    ap.add_argument("--smc-dr", type=float, default=0.0,
                    help="smc: >0 upgrades mutation sweeps to 2-stage "
                         "delayed rejection at eps/this (3x trajectories)")
    ap.add_argument("--smc-max-stages", type=int, default=64)
    ap.add_argument("--smc-adapt-mutations", action="store_true",
                    help="stop each stage's sweeps when population MSJD "
                         "saturates (n_mutations becomes the cap)")
    ap.add_argument("--smc-waste-free", type=int, default=0,
                    help="chain length L>=2: waste-free SMC (resample N/L "
                         "ancestors, keep every mutation state; Dau & "
                         "Chopin 2022); 0 = plain stages")
    ap.add_argument("--smc-polish", type=int, default=0,
                    help="smc: extra mutation-only stages at beta=1 (cheap "
                         "decorrelation against resampling coalescence)")
    ap.add_argument("--smc-resample-ess", type=float, default=1.0,
                    help="smc: resample only when the carried-weight ESS "
                         "fraction drops below this (Del Moral adaptive "
                         "resampling; 1.0 = every stage)")
    ap.add_argument("--smc-resample", default="systematic",
                    choices=["systematic", "stratified", "residual",
                             "multinomial"],
                    help="smc: resampling scheme (inference/smc._RESAMPLERS)")
    ap.add_argument("--smc-ref", default="prior",
                    choices=["prior", "pathfinder"],
                    help="smc: reference distribution — N(0,I) prior, or "
                         "per-run multipathfinder posterior moments "
                         "(posterior-shaped start = shorter tempering "
                         "path; pathfinder wall is counted in the total)")
    ap.add_argument("--pf-paths", type=int, default=8,
                    help="pathfinder: vmapped L-BFGS paths per run")
    ap.add_argument("--pf-iters", type=int, default=100,
                    help="pathfinder: L-BFGS iterations per path")
    ap.add_argument("--pf-draws", type=int, default=400,
                    help="pathfinder: IS draws per path and pooled output "
                         "size (n_out)")
    ap.add_argument("--smc-metric", default="full", choices=["diag", "full"],
                    help="smc: mutation metric — per-coordinate particle "
                         "scales, or the full population covariance "
                         "(affine-invariant; the move that aligns with the "
                         "GNMGP collective ridge)")
    ap.add_argument("--chees-chains", type=int, default=16,
                    help="chees: lockstep chains (it adapts from the cross-"
                         "chain ChEES criterion, so it brings its own "
                         "chains regardless of --chains)")
    ap.add_argument("--chees-max-leapfrog", type=int, default=256,
                    help="chees: leapfrog cap per jittered trajectory")
    ap.add_argument("--chees-traj", type=float, default=None,
                    help="chees: initial mean trajectory time (default "
                         "20 * step size, the reference budget)")
    ap.add_argument("--rm-k", type=int, default=12,
                    help="rmhmc: subspace size — the k worst-mixing pilot "
                         "coordinates get the position-dependent metric")
    ap.add_argument("--rm-leapfrog", type=int, default=6,
                    help="rmhmc: generalized-leapfrog steps per subspace draw")
    ap.add_argument("--rm-step-size", type=float, default=0.2,
                    help="rmhmc: initial subspace step size (dual-averaged)")
    ap.add_argument("--rm-fp", type=int, default=6,
                    help="rmhmc: fixed-point iterations per implicit half-step")
    ap.add_argument("--dr-stages", type=int, default=3,
                    help="delayed-rejection proposal stages for drhmc")
    ap.add_argument("--dr-reduction", type=float, default=4.0,
                    help="per-stage step-size reduction for drhmc")
    ap.add_argument("--dr-target", type=float, default=0.8,
                    help="drhmc stage-1 dual-averaging accept target; lower "
                         "it to run a coarser bulk step and lean on retries")
    ap.add_argument("--mass", default="none", choices=["none", "hessian"],
                    help="hessian: clipped |diag| of the (whitened-space) "
                         "negative-log-posterior Hessian at the MAP as the "
                         "HMC mass matrix — Hessian-diag preconditioning "
                         "composed with whitening (VERDICT r2 #2)")
    ap.add_argument("--max-depth", type=int, default=7,
                    help="NUTS tree-doubling depth cap (2^depth leapfrogs)")
    ap.add_argument("--leapfrog", type=int, default=20,
                    help="HMC trajectory length (reference budget: 20)")
    ap.add_argument("--chains", type=int, default=1,
                    help="vmapped chains on one chip (chain 0 at the MAP, "
                         "the rest jittered by --chain-jitter).  Scored "
                         "with rank-normalized POOLED ESS (Vehtari et al. "
                         "2021) + max split-R-hat, so stuck-but-disagreeing "
                         "chains cannot inflate the number — the TPU-native "
                         "throughput tier: batched chains fill the MXU that "
                         "one latency-bound chain leaves idle")
    ap.add_argument("--chain-jitter", type=float, default=0.5,
                    help="init jitter (sampled-space units) for chains > 0")
    ap.add_argument("--descend-iters", type=int, default=300,
                    help="Adam steps pulling each jittered start back into "
                         "the typical set (0 = raw position jitter; raw "
                         "jitter strands chains thousands of nats up and "
                         "no 400-draw warmup recovers — see "
                         "inference.init.multichain_starts)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.data import sim
    from nonstationary_multivariate_gaussian_process_tpu.inference import (
        chees,
        diagnostics,
        drhmc,
        hmc,
        init as init_mod,
        map as map_mod,
        nuts,
        rmhmc,
        smc,
        whiten,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models import gnmgp
    from nonstationary_multivariate_gaussian_process_tpu.models.base import FullData

    log(f"platform={jax.devices()[0].platform} n={args.n} draws={args.draws}")
    d = sim.sim_mnts(jax.random.PRNGKey(0), n=args.n)
    data = FullData(jnp.asarray(d.x), jnp.asarray(d.y))
    nlp = gnmgp.make_objective(data)
    n, m = data.y.shape
    vec0 = jnp.zeros((gnmgp.n_params(n, m),), data.y.dtype)
    res = map_mod.fit_map(nlp, vec0, n_iters=args.map_iters, lr=0.1,
                          method=args.map_method)
    map_vec = res.vec
    log(f"MAP fitted, nlp={float(nlp(map_vec)):.2f}")

    w = None
    pilot_cost = None
    if args.whiten != "off":
        mode = "eig" if args.whiten == "pncp" else "chol"
        w = whiten.make_whitener("gnmgp", data.x, n, m, mode=mode)
        if args.whiten == "pncp":
            t0 = time.time()
            pilot = hmc.hmc_sample(
                w.wrap(nlp), w.to_white(map_vec), args.pilot,
                jax.random.PRNGKey(9), step_size=args.step_size,
                n_leapfrog=20, n_warmup=args.pilot, adapt_step_size=True,
            )
            w = whiten.retune(w, w.from_white_batch(pilot.samples))
            pilot_cost = {"wall_s": round(time.time() - t0, 2),
                          "grad_evals": 2 * args.pilot * 20}
            log(f"pncp: retuned from {args.pilot}-draw pilot "
                f"({pilot_cost['wall_s']}s)")
        nlp = w.wrap(nlp)
        map_vec = w.to_white(map_vec)
        log(f"sampling the {args.whiten}-reparameterized space")

    mass = None
    if args.mass == "hessian":
        # diagonal Hessian of the current-space potential at the (mapped)
        # MAP; the whitened Hessian is indefinite (whiten.py docstring), so
        # clip |diag| away from zero — scales, not curvatures
        p_dim = map_vec.shape[0]
        eye = jnp.eye(p_dim, dtype=map_vec.dtype)
        hd = jax.jit(jax.vmap(
            lambda e: jax.jvp(jax.grad(nlp), (map_vec,), (e,))[1] @ e
        ))(eye)
        mass = jnp.clip(jnp.abs(hd), 1e-2, None)
        log(f"hessian mass: diag range [{float(mass.min()):.3g}, "
            f"{float(mass.max()):.3g}]")

    n_chains = args.chains

    def chain_starts(key, k=None):
        """(K, P) inits: chain 0 at the MAP, the rest jittered and (by
        default) descended back into the typical set — raw jitter strands
        chains thousands of nats up and defeats every warmup
        (init.multichain_starts docstring has the measured numbers)."""
        k = n_chains if k is None else k
        starts = init_mod.multichain_starts(
            nlp, map_vec, k, key,
            jitter=args.chain_jitter, descent_iters=args.descend_iters,
        )
        u = np.asarray(jax.vmap(nlp)(starts))
        log(f"chain starts: u range [{u.min():.1f}, {u.max():.1f}] "
            f"(map {float(nlp(map_vec)):.1f}, jitter {args.chain_jitter}, "
            f"descent {args.descend_iters})")
        return starts

    def score(name, run):
        """``run(q0, key) -> (samples, grads)``; vmapped when --chains > 1.

        Single-chain scoring keeps the historical min-ESS estimator (Geyer,
        one chain) so numbers stay comparable across rounds; the many-chain
        tier scores rank-normalized pooled ESS + max split-R-hat.
        """
        if n_chains > 1:
            starts = chain_starts(jax.random.PRNGKey(7))
        t0 = time.time()
        if n_chains == 1:
            samples, grads = run(map_vec, jax.random.PRNGKey(1))
            samples = samples[None]
        else:
            keys = jax.random.split(jax.random.PRNGKey(1), n_chains)
            samples, grads = jax.vmap(run)(starts, keys)  # (K, S, P)
        jax.block_until_ready(samples)
        wall = time.time() - t0
        grads = int(np.sum(np.asarray(grads)))
        if w is not None:
            k_, s_, p_ = samples.shape
            samples = w.from_white_batch(samples.reshape(k_ * s_, p_)).reshape(
                k_, s_, p_
            )
        s = np.asarray(samples)
        cols = range(0, s.shape[-1], 7)
        if n_chains == 1:
            ess = min(diagnostics.ess(s[0][:, j]) for j in cols)
        else:
            ess = min(diagnostics.ess_multichain(s[:, :, j]) for j in cols)
        out = {
            "min_ess": round(ess, 1),
            "ess_per_sec": round(ess / wall, 3),
            "ess_per_kgrad": round(1000.0 * ess / grads, 3),
            "wall_s": round(wall, 2),
            "grad_evals": int(grads),
        }
        if n_chains > 1:
            out["chains"] = n_chains
            out["max_rhat"] = round(float(np.max(diagnostics.rhat(s))), 3)
            out["min_ess_per_chain_sum"] = round(
                min(
                    sum(diagnostics.ess(s[c][:, j]) for c in range(s.shape[0]))
                    for j in cols
                ),
                1,
            )
        log(f"{name}: {out}")
        return out

    results = {}
    leap = args.leapfrog  # default 20: the reference budget (Nonseparable_model.py:229)

    def run_hmc(q0, key):
        r = hmc.hmc_sample(
            nlp, q0, args.draws, key,
            step_size=args.step_size, n_leapfrog=leap,
            n_warmup=args.warmup, adapt_step_size=True, mass_matrix=mass,
        )
        return r.samples, (args.draws + args.warmup) * leap

    def run_hmc_window(q0, key):
        r = hmc.hmc_sample(
            nlp, q0, args.draws, key,
            step_size=args.step_size, n_leapfrog=leap,
            n_warmup=args.warmup, adapt_mass=True,
        )
        return r.samples, (args.draws + args.warmup) * leap

    def run_drhmc(q0, key):
        r = drhmc.drhmc_sample(
            nlp, q0, args.draws, key,
            step_size=args.step_size, n_leapfrog=leap,
            n_warmup=args.warmup, n_stages=args.dr_stages,
            reduction=args.dr_reduction, target_accept=args.dr_target,
            mass_matrix=mass,
        )
        # a draw that reached stage s paid 2**(s-1) extra trajectories of
        # ghost+proposal leapfrogs (drhmc.py docstring); stage 0 = reached all
        st = r.accept_stage
        reached = jnp.where(st == 0, args.dr_stages, st)
        grads = leap * jnp.sum(2 ** reached - 1)  # sum of 2^(s-1), s<=reached
        return r.samples, grads

    # rmhmc: ONE pilot chain (at the MAP) picks the shared subspace so the
    # vmapped chains run a single program; host-side, so outside run_rmhmc
    rm_idx = None
    if "rmhmc" in args.samplers:
        pilot = hmc.hmc_sample(
            nlp, map_vec, 200, jax.random.PRNGKey(3),
            step_size=args.step_size, n_leapfrog=leap, n_warmup=200,
            adapt_step_size=True,
        )
        rm_idx = rmhmc.slowest_coords(np.asarray(pilot.samples), args.rm_k)
        log(f"rmhmc: subspace idx={rm_idx.tolist()}")

    def run_rmhmc(q0, key):
        r = rmhmc.rmhmc_gibbs_sample(
            nlp, q0, args.draws, key, idx=rm_idx,
            step_size=args.step_size, rm_step_size=args.rm_step_size,
            n_leapfrog=leap, rm_leapfrog=args.rm_leapfrog, n_fp=args.rm_fp,
            n_warmup=args.warmup,
            # off-CPU: per-draw dispatch — the monolithic third-order-AD
            # scan faults the tunneled TPU (workflows routes the same way)
            dispatch=("device" if jax.devices()[0].platform == "cpu"
                      else "host"),
        )
        # grad-equivalent accounting: stage A pays leap+1 full gradients per
        # draw (incl. the post-accept refresh); stage B pays, per leapfrog
        # step, n_fp+1 subspace Hessians (≈k HVPs ≈ 2k grads each) and one
        # metric-derivative tensor T (k fwd tangents through the Hessian,
        # ≈2k² grads) — the momentum fixed point itself is k³ einsums, free
        k = args.rm_k
        per_draw_b = args.rm_leapfrog * ((args.rm_fp + 1) * 2 * k + 2 * k * k)
        grads = (args.draws + args.warmup + 400) * (leap + 1) \
            + (args.draws + args.warmup) * per_draw_b
        return r.samples, grads

    def run_nuts(q0, key):
        r = nuts.nuts_sample(
            nlp, q0, args.draws, key,
            step_size=args.step_size, n_warmup=args.warmup,
            max_depth=args.max_depth,
            mass_matrix=mass, adapt_mass=mass is None,
        )
        return r.samples, jnp.sum(r.n_leapfrog)

    which = set(args.samplers.split(","))
    if "hmc" in which:
        results["hmc"] = score("hmc", run_hmc)
    if "hmc_window" in which:
        results["hmc_window"] = score("hmc+window", run_hmc_window)
    if "drhmc" in which:
        results["drhmc"] = score("drhmc", run_drhmc)
    if "rmhmc" in which:
        results["rmhmc"] = score("rmhmc", run_rmhmc)
    if "chees" in which:
        # brings its own lockstep chains — scored with the same pooled
        # rank-normalized estimator as the --chains tier
        kc = args.chees_chains
        starts = chain_starts(jax.random.PRNGKey(7), kc)
        t0 = time.time()
        r = chees.chees_sample(
            nlp, starts, args.draws, jax.random.PRNGKey(1),
            step_size=args.step_size,
            n_warmup=args.warmup, max_leapfrog=args.chees_max_leapfrog,
            trajectory_length=args.chees_traj,
            inv_mass=(1.0 / mass) if mass is not None else None,
            adapt_mass=mass is None,
        )
        jax.block_until_ready(r.samples)
        wall = time.time() - t0
        s = np.asarray(r.samples)  # (K, S, P)
        k_, s_, p_ = s.shape
        if w is not None:
            s = np.asarray(
                w.from_white_batch(s.reshape(k_ * s_, p_))
            ).reshape(k_, s_, p_)
        cols = range(0, p_, 7)
        ess = min(diagnostics.ess_multichain(s[:, :, j]) for j in cols)
        grads = int(kc * np.sum(np.asarray(r.n_leapfrog) + 1))
        results["chees"] = {
            "min_ess": round(float(ess), 1),
            "ess_per_sec": round(float(ess) / wall, 3),
            "ess_per_kgrad": round(1000.0 * float(ess) / grads, 3),
            "wall_s": round(wall, 2),
            "grad_evals": grads,
            "chains": kc,
            "max_rhat": round(float(np.max(diagnostics.rhat(s))), 3),
            "trajectory_length": round(float(r.trajectory_length), 5),
            "tuned_step_size": round(float(r.step_size), 6),
            "mean_leapfrog": round(float(np.mean(np.asarray(r.n_leapfrog))), 1),
        }
        log(f"chees: {results['chees']}")
    if "smc" in which:
        # tempered SMC brings its own population and scoring: R independent
        # runs (one vmapped program), N_eff = Var_pooled / Var_runs(mean) —
        # the honest cross-run estimator (smc.smc_ess_estimate), the same
        # quantity pooled chain ESS estimates for mixing chains
        # runs go sequentially (same shapes -> one compile): vmapping them
        # multiplies the batched-Cholesky temps past HBM at N=200.  Host
        # dispatch: the tunneled TPU runtime faults minutes-long
        # single-program executions (the f64-HMC-scan failure class).
        t0 = time.time()
        run_results = []
        pf_k_hats = []
        for i in range(args.smc_runs):
            ref_kw = {}
            if args.smc_ref == "pathfinder":
                # per-run independent pathfinder seed (runs stay fully
                # independent, including their references); moments are
                # inflated + floored exactly as the workflow tier does
                from nonstationary_multivariate_gaussian_process_tpu.inference import (  # noqa: E501
                    pathfinder as pf_mod,
                )

                mpf = pf_mod.multipathfinder(
                    nlp, map_vec, jax.random.PRNGKey(5000 + i),
                    n_paths=args.pf_paths, max_iters=args.pf_iters,
                    n_draws=args.pf_draws, n_out=args.pf_draws,
                )
                pf_k_hats.append(round(float(mpf.k_hat), 3))
                ref_kw = dict(
                    ref_mean=mpf.ref_mean,
                    ref_scale=jnp.clip(1.25 * mpf.ref_scale, 0.05, 10.0),
                )
                log(f"smc run {i}: pathfinder ref ready "
                    f"(k_hat={pf_k_hats[-1]})")
            ri = smc.smc_sample(
                nlp, int(map_vec.shape[0]), jax.random.PRNGKey(1000 + i),
                args.smc_particles, **ref_kw,
                n_mutations=args.smc_mutations, n_leapfrog=args.smc_leapfrog,
                target_cess=args.smc_cess, dr_reduction=args.smc_dr,
                metric=args.smc_metric, n_polish=args.smc_polish,
                waste_free=args.smc_waste_free,
                adapt_mutations=args.smc_adapt_mutations,
                resample_ess=args.smc_resample_ess,
                resample=args.smc_resample,
                max_stages=args.smc_max_stages, dispatch="host",
                progress=lambda d, i=i: log(f"smc run {i} {d}"),
            )
            jax.block_until_ready(ri.particles)
            log(f"smc run {i}: stages={int(ri.n_stages)} "
                f"beta={float(ri.beta_final):.3f} logz={float(ri.logz):.1f}")
            run_results.append(ri)
        wall = time.time() - t0
        rr = jax.tree.map(lambda *xs: jnp.stack(xs), *run_results)
        r_, np_, p_ = rr.particles.shape
        parts = rr.particles.reshape(r_ * np_, p_)
        if w is not None:
            parts = w.from_white_batch(parts)
        parts = np.asarray(parts).reshape(r_, np_, p_)
        est = smc.smc_ess_estimate(parts)
        stages = np.asarray(rr.n_stages)
        traj = 3 if args.smc_dr > 0 else 1
        # stages counts tempering + polish stage calls (both pay the sweeps);
        # waste-free stages run (L-1) sweeps on N/L ancestor rows each
        if args.smc_waste_free:
            lw = args.smc_waste_free
            sweep_rows = (lw - 1) * (args.smc_particles // lw)
        else:
            sweep_rows = args.smc_mutations * args.smc_particles
        grads = int(
            np.sum(stages)
            * (sweep_rows * traj * args.smc_leapfrog + args.smc_particles)
        )
        logzs = np.asarray(rr.logz)
        results["smc"] = {
            "min_ess": round(est["min_ess"], 1),
            "median_ess": round(est["median_ess"], 1),
            "pooled_ess": round(est["pooled_ess"], 1),
            "ess_per_sec": round(est["min_ess"] / wall, 3),
            "ess_per_kgrad": round(1000.0 * est["min_ess"] / grads, 3),
            "wall_s": round(wall, 2),
            "grad_evals": grads,
            "runs": r_,
            "particles": np_,
            "metric": args.smc_metric,
            "smc_ref": args.smc_ref,
            **({"pf_k_hats": pf_k_hats} if pf_k_hats else {}),
            "waste_free": args.smc_waste_free,
            "adapt_mutations": args.smc_adapt_mutations,
            "resample_ess": args.smc_resample_ess,
            "resample": args.smc_resample,
            "resampled_stages": np.asarray(rr.resampled).sum(axis=1).tolist(),
            "grads_are_cap": bool(args.smc_adapt_mutations),
            "stages": stages.tolist(),
            "beta_final": np.asarray(rr.beta_final).tolist(),
            "logz_mean": round(float(logzs.mean()), 2),
            "logz_std": round(float(logzs.std()), 3),
            "final_accept": [
                # stage counts include beta=1 polish; histories hold
                # max_stages entries, so clip
                round(float(np.asarray(rr.accept)[
                    i, min(s, args.smc_max_stages) - 1
                ]), 3)
                for i, s in enumerate(stages)
            ],
        }
        log(f"smc: {results['smc']}")
    if "pathfinder" in which:
        # variational tier: R independent multipathfinder runs, scored with
        # the same cross-run estimator as SMC (draws within a run share the
        # pooled PSIS resample, so chain ESS does not apply); logz is the
        # self-normalized IS evidence, comparable with smc's telescope in
        # the same (whitened) space
        from nonstationary_multivariate_gaussian_process_tpu.inference import (
            pathfinder as pf_mod,
        )

        t0 = time.time()
        pf_runs, pf_walls = [], []
        for i in range(args.smc_runs):
            ti = time.time()
            mpf = pf_mod.multipathfinder(
                nlp, map_vec, jax.random.PRNGKey(5000 + i),
                n_paths=args.pf_paths, max_iters=args.pf_iters,
                n_draws=args.pf_draws, n_out=args.pf_draws,
            )
            jax.block_until_ready(mpf.draws)
            pf_walls.append(round(time.time() - ti, 2))
            log(f"pathfinder run {i}: k_hat={float(mpf.k_hat):.3f} "
                f"log_ev={float(mpf.log_evidence):.1f} ({pf_walls[-1]}s)")
            pf_runs.append(mpf)
        wall = time.time() - t0
        parts = jnp.stack([r.draws for r in pf_runs])  # (R, D, P)
        r_, d_, p_ = parts.shape
        flat = parts.reshape(r_ * d_, p_)
        if w is not None:
            flat = w.from_white_batch(flat)
        est = smc.smc_ess_estimate(np.asarray(flat).reshape(r_, d_, p_))
        logzs = np.asarray([float(r.log_evidence) for r in pf_runs])
        # one value_and_grad per L-BFGS iter per path; zoom-linesearch value
        # evals and the batched ELBO sweep (value-only) are extra
        grads = args.smc_runs * args.pf_paths * args.pf_iters
        results["pathfinder"] = {
            "min_ess": round(est["min_ess"], 1),
            "median_ess": round(est["median_ess"], 1),
            "pooled_ess": round(est["pooled_ess"], 1),
            "ess_per_sec": round(est["min_ess"] / wall, 3),
            "wall_s": round(wall, 2),
            "wall_per_run_s": pf_walls,
            "grad_evals_lbfgs": grads,
            "runs": r_,
            "paths": args.pf_paths,
            "k_hats": [round(float(r.k_hat), 3) for r in pf_runs],
            "logz_mean": round(float(logzs.mean()), 2),
            "logz_std": round(float(logzs.std()), 3),
        }
        log(f"pathfinder: {results['pathfinder']}")
    if "nuts" in which:
        results["nuts"] = score("nuts", run_nuts)
    if "nuts" in results and "hmc" in results:
        results["speedup_ess_per_sec_nuts_vs_hmc"] = round(
            results["nuts"]["ess_per_sec"] / max(results["hmc"]["ess_per_sec"], 1e-9), 2
        )
    out = {"n": args.n, "draws": args.draws, "whiten": args.whiten,
           "mass": args.mass, "max_depth": args.max_depth,
           "precision": os.environ.get("NMGP_PRECISION", "f32"), **results}
    if pilot_cost is not None:
        out["pncp_pilot"] = pilot_cost
    print(json.dumps(out))


if __name__ == "__main__":
    main()
