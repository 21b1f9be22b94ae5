"""Serve an AOT-exported model artifact over HTTP.

The reference framework has no deployment path at all (inference happens
only inside the training harness's test loop,
``/root/reference/medmm/engine/trainer.py:550-581``); imp_tpu's serving
stack is TPU-native new capability: ``tools/export_model.py`` writes a
self-contained StableHLO artifact and this tool hosts it — no model code,
no tracing, no framework on the serving host beyond jax + this file.

Usage:
    python tools/serve.py --artifact exported/umeml_gan_s1 \
        [--host 0.0.0.0] [--port 8500] [--platform cpu|tpu]

    curl localhost:8500/health
    curl -X POST localhost:8500/predict -d '{
        "batch": {"img": [[[...512 floats...], ...]], "mol": [[...]]},
        "risk": true}'

``batch.img`` may be ragged (per-slide [n_i, d] bags of any length — the
host pads/masks to the exported static shapes); any batch size is accepted
and chunked to the exported batch size.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))


def main(args):
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from imp_tpu.serving import make_http_server

    server = make_http_server(args.artifact, host=args.host, port=args.port)
    m = server.serving_model.manifest
    host, port = server.server_address[:2]
    print(
        f"serving {m['model']} ({m['task']}, batch {m['batch_size']}, "
        f"platforms {m['platforms']}) on http://{host}:{port} "
        f"— GET /health, POST /predict",
        flush=True,
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--artifact", required=True,
                        help="export directory written by tools/export_model.py")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8500)
    parser.add_argument("--platform", default=None,
                        help="force a jax platform (cpu/tpu)")
    main(parser.parse_args())
