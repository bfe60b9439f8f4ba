"""Serve a fitted artifact store as an HTTP predict API.

Fit subjects first (e.g. ``examples/run_sim_pipeline.py --out /tmp/out``),
then::

    python examples/serve.py --root /tmp/out --port 8000

    curl localhost:8000/health
    curl localhost:8000/subjects
    curl -X POST localhost:8000/predict \
         -d '{"subject": "0", "x": [0.1, 0.5, 0.9], "mode": "map"}'
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nonstationary_multivariate_gaussian_process_tpu.serving import serve


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True, help="artifact store root")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--model", default="gnmgp")
    ap.add_argument("--dataset", default="sim")
    ap.add_argument("--no-warm", action="store_true", help="skip precompilation")
    args = ap.parse_args()

    httpd = serve(
        args.root,
        host=args.host,
        port=args.port,
        model=args.model,
        dataset=args.dataset,
        warm=not args.no_warm,
    )
    n = len(httpd.engine.subject_ids())
    print(f"serving {n} subject(s) on http://{args.host}:{httpd.server_port}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
