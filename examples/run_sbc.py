"""Simulation-based calibration of a sampler tier on a chosen model.

Validates the full inference stack end-to-end (Talts et al. 2018): draws
parameters from the exact model prior, simulates data through the exact
likelihood, samples the posterior with the chosen tier, and tests the rank
statistics for uniformity per coordinate.  Systematic sampler bias (or a
drifted prior/likelihood implementation) shows up as small p-values.

    env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/run_sbc.py \
        --model gnmgp --n 8 --replicates 40 --sampler smc --out /tmp/sbc.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", default="gnmgp",
                    choices=["gnmgp", "snmgp", "gnmgp_hetero"])
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--m", type=int, default=2)
    ap.add_argument("--replicates", type=int, default=40)
    ap.add_argument("--sampler", default="smc", choices=["smc", "nuts"])
    ap.add_argument("--draws", type=int, default=16,
                    help="(approximately independent) posterior draws ranked "
                         "per replicate; chains are thinned to this count")
    ap.add_argument("--particles", type=int, default=64)
    ap.add_argument("--mutations", type=int, default=3)
    ap.add_argument("--nuts-warmup", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from nonstationary_multivariate_gaussian_process_tpu.inference import (
        nuts, sbc, smc, whiten,
    )
    from nonstationary_multivariate_gaussian_process_tpu.models import (
        FullData, gnmgp, gnmgp_hetero, snmgp,
    )
    from nonstationary_multivariate_gaussian_process_tpu.ops import transforms

    mod = {"gnmgp": gnmgp, "snmgp": snmgp, "gnmgp_hetero": gnmgp_hetero}[args.model]
    n, m = args.n, args.m
    x = np.sort(np.random.default_rng(args.seed).uniform(size=n))
    prior_fn = sbc.make_prior_sampler(args.model, x, m)
    sim_fn = sbc.make_simulator(args.model, x, m)
    w = whiten.make_whitener(args.model, jnp.asarray(x), n, m)

    def posterior_fn(key, theta_true, y):
        nlp = mod.make_objective(FullData(jnp.asarray(x), jnp.asarray(y)))
        if args.sampler == "smc":
            r = smc.smc_sample(
                w.wrap(nlp), w.n_params, key, args.particles,
                n_mutations=args.mutations, n_leapfrog=8, metric="full",
                n_polish=5,
            )
            thin = max(1, args.particles // args.draws)
            return w.from_white_batch(r.particles[::thin][: args.draws])
        n_keep = args.draws * 8  # thin an 8x chain for near-independence
        chain = nuts.nuts_sample(
            w.wrap(nlp), w.to_white(jnp.zeros(w.n_params)), n_keep, key,
            n_warmup=args.nuts_warmup,
        )
        return w.from_white_batch(chain.samples[:: 8][: args.draws])

    def progress(r, total):
        print(f"[sbc] replicate {r + 1}/{total}", file=sys.stderr, flush=True)

    res = sbc.sbc_ranks(
        prior_fn, sim_fn, posterior_fn, jax.random.PRNGKey(args.seed + 1),
        args.replicates, progress=progress,
    )
    p = sbc.uniformity_pvalues(res)

    t = transforms.tri_size(m)
    if args.model == "snmgp":
        blocks = {"tilde_l": np.arange(n), "tilde_sigma": np.arange(n, 2 * n),
                  "L_vec": np.arange(2 * n, 2 * n + t)}
        latent_end = 2 * n + t
    else:
        blocks = {"tilde_l": np.arange(n), "L_vecs": np.arange(n, n + n * t)}
        latent_end = n + n * t
    blocks["noise"] = np.arange(latent_end, p.shape[0])
    report = {
        "model": args.model, "sampler": args.sampler, "n": n, "m": m,
        "replicates": args.replicates, "draws_ranked": res.n_draws,
        "p_min": float(p.min()), "p_median": float(np.median(p)),
        "n_below_0.01": int((p < 0.01).sum()), "n_coords": int(p.shape[0]),
        "blocks": {
            k: {"p_min": float(p[v].min()), "p_median": float(np.median(p[v]))}
            for k, v in blocks.items() if v.size
        },
    }
    text = json.dumps(report, indent=1)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        np.savez(os.path.splitext(args.out)[0] + "_ranks.npz",
                 ranks=res.ranks, n_draws=res.n_draws, pvalues=p)
    print(text)


if __name__ == "__main__":
    main()
