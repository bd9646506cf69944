#!/usr/bin/env python3
"""HTTP sampling server over a resident jitted DQ-Transformer.

The reference ships only offline sampling scripts; this wraps the
dynamic-batching engine (`dynamicvectorquantization_tpu/serve/server.py`)
in a threaded stdlib HTTP server so concurrent clients coalesce into full
device batches.

  python scripts/serve.py --yaml_path configs/stage2/uncond_imagenet_p6c18.yml \\
      --model_path <ckpt> --port 8000 --max_batch 64 --kv_cache_dtype int8

  POST /generate  {"num_images": 2, "seed": 7}
      -> {"images": [<base64 PNG>, ...], "batch": k}
  GET  /healthz   -> {"ok": true, "batches_run": n, "images_served": m}

JSON+base64 keeps the surface dependency-free; for bulk extraction use the
offline script (`scripts/sample_val/sample_dynamic_uncond.py`).
"""
import argparse
import base64
import io
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def get_parser():
    p = argparse.ArgumentParser()
    p.add_argument("--yaml_path", type=str, required=True)
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_batch", type=int, default=16)
    p.add_argument("--max_wait_ms", type=float, default=30.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=300)
    p.add_argument("--top_k_pos", type=int, default=1024)
    p.add_argument("--kv_cache_dtype", type=str, default=None, choices=("int8",))
    p.add_argument("--seed", type=int, default=0)
    return p


def _png_b64(img):
    """[-1,1] float HWC -> base64 PNG."""
    import numpy as np
    from PIL import Image

    u8 = np.clip((img + 1.0) * 127.5, 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def make_handler(engine):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {
                    "ok": True,
                    "batches_run": engine.batches_run,
                    "images_served": engine.images_served,
                    "max_batch": engine.max_batch,
                })
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                return self._reply(404, {"error": "unknown path"})
            try:
                length = int(self.headers.get("Content-Length", "0"))
                req = json.loads(self.rfile.read(length) or b"{}")
                n = int(req.get("num_images", 1))
                seed = req.get("seed")
                imgs = engine.generate(n, seed)
                self._reply(200, {
                    "images": [_png_b64(im) for im in imgs],
                    "batch": engine.batches_run,
                })
            except ValueError as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:  # pragma: no cover
                self._reply(500, {"error": repr(e)})

        def log_message(self, fmt, *args):  # quiet access log
            pass

    return Handler


def main():
    from dynamicvectorquantization_tpu.utils.platform import honor_jax_platforms_env
    honor_jax_platforms_env()

    opt = get_parser().parse_args()
    from dynamicvectorquantization_tpu.serve import BatchingSampler
    from dynamicvectorquantization_tpu.utils.model_loading import (
        load_model_and_variables,
    )

    model, variables = load_model_and_variables(
        opt.yaml_path, opt.model_path, opt.seed, opt.kv_cache_dtype
    )
    engine = BatchingSampler(
        model, variables,
        max_batch=opt.max_batch, max_wait_ms=opt.max_wait_ms,
        temperature=opt.temperature, top_k=opt.top_k, top_k_pos=opt.top_k_pos,
    )
    print(f"warming up (compiling batch-{opt.max_batch} sampler)...",
          file=sys.stderr)
    engine.generate(1, seed=0)
    server = ThreadingHTTPServer((opt.host, opt.port), make_handler(engine))
    print(f"serving on http://{opt.host}:{opt.port}", file=sys.stderr)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        engine.close()


if __name__ == "__main__":
    main()
