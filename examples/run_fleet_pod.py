"""Multi-host pod fleet launcher — the SLURM ``sim_job`` equivalent.

The reference scales with ``#SBATCH -N 42 -n 1000; srun -n 1000 python
*_mpisim.py`` (one MPI process per subject, filesystem aggregation).  On a
TPU pod the same workload is ONE SPMD program: every host runs this script,
``jax.distributed.initialize()`` discovers the slice, and the global mesh
spans all chips; the subject axis shards across the whole pod and fleet
metrics ride ICI psums.

Launch (per host, e.g. with GKE/ray/xmanager or plain ssh):

    python examples/run_fleet_pod.py --replicates 1000 --n 200 --n-opt 2000

On a single host this degrades gracefully to the local device mesh.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=64)
    ap.add_argument("--n", type=int, default=200)
    ap.add_argument("--n-opt", type=int, default=1000)
    # every model the library serves (workflows.MODEL_CHOICES) — validated
    # after import: pulling the package in before jax.distributed.initialize
    # would risk touching the backend first
    ap.add_argument("--model", default="gnmgp",
                    help="any workflows.MODEL_CHOICES entry (dense lmc/"
                         "snmgp/gnmgp/gnmgp_hetero or any *_sparse tier)")
    ap.add_argument("--n-inducing", type=int, default=64,
                    help="*_sparse models: inducing-input count at Z")
    ap.add_argument("--out", default=None, help="artifact root (host 0 writes)")
    args = ap.parse_args()

    import jax

    # multi-host: initialize the distributed runtime when a coordinator is
    # configured (TPU pods auto-discover; CPU/GPU need COORDINATOR_ADDRESS)
    multihost = int(os.environ.get("NMGP_NUM_HOSTS", "1")) > 1 or (
        "COORDINATOR_ADDRESS" in os.environ
    )
    if multihost:
        jax.distributed.initialize()
    host = jax.process_index()

    from nonstationary_multivariate_gaussian_process_tpu import workflows
    from nonstationary_multivariate_gaussian_process_tpu.parallel import make_mesh
    from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore

    if args.model not in workflows.MODEL_CHOICES:
        ap.error(f"--model {args.model!r}: want one of "
                 f"{', '.join(workflows.MODEL_CHOICES)}")
    mesh = make_mesh()  # spans every addressable chip in the slice
    cfg = workflows.PipelineConfig(model=args.model, n_opt=args.n_opt,
                                   n_inducing=args.n_inducing)
    out = workflows.run_sim_fleet(
        n_replicates=args.replicates, n=args.n, cfg=cfg, mesh=mesh,
        key=jax.random.PRNGKey(0),
    )

    if host == 0:
        report = dict(out["fleet_metrics"])
        report["n_devices"] = int(mesh.devices.size)
        report["n_hosts"] = jax.process_count()
        for k in ("tilde_l_rmse", "tilde_l_corr_mean", "gpd_median_D"):
            if k in out:
                report[k] = float(out[k])
        if args.out:
            store = ArtifactStore(args.out)
            import numpy as np

            store.save(
                store.key(args.model, "pod_fleet", "all", "vecs"),
                vecs=np.asarray(out["fleet"].vecs),
            )
        print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
