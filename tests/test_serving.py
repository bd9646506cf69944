"""Serving stack: dynamic-batching engine coalesces concurrent requests into
fixed-size device batches; HTTP front end round-trips PNG images.

The reference has no serving surface (offline scripts only);
see dynamicvectorquantization_tpu/serve/server.py.
"""
import json
import os
import threading
import urllib.request

import numpy as np
import pytest

from dynamicvectorquantization_tpu.serve import BatchingSampler

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one full (tiny) sampler compile for the module -> slow tier
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def engine(smoke_dualformer):
    model, variables = smoke_dualformer
    eng = BatchingSampler(
        model, variables, max_batch=4, max_wait_ms=200.0,
        top_k=30, top_k_pos=16, bf16=False,
    )
    yield eng
    eng.close()


@pytest.fixture(scope="module")
def smoke_dualformer():
    from dynamicvectorquantization_tpu.utils.model_loading import (
        load_model_and_variables,
    )

    return load_model_and_variables(
        os.path.join(_REPO, "configs/smoke/dqtransformer-uncond-tiny.yml"),
        None, seed=0,
    )


def test_single_request(engine):
    imgs = engine.generate(2, seed=7, timeout=600)
    assert imgs.shape[0] == 2 and imgs.shape[-1] == 3
    assert np.isfinite(imgs).all()


def test_concurrent_requests_coalesce(engine):
    before = engine.batches_run
    futures = [engine.submit(1, seed=i) for i in range(4)]
    outs = [f.result(timeout=600) for f in futures]
    assert all(o.shape[0] == 1 for o in outs)
    # 4 single-image requests against max_batch=4 with a 200ms window must
    # not take 4 separate device batches
    assert engine.batches_run - before <= 2
    assert engine.images_served >= 4


def test_rejects_oversized(engine):
    with pytest.raises(ValueError):
        engine.submit(5)


def test_http_roundtrip(engine):
    from http.server import ThreadingHTTPServer

    import sys
    sys.path.insert(0, _REPO)
    from scripts.serve import make_handler

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            health = json.loads(r.read())
        assert health["ok"] and health["max_batch"] == 4

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"num_images": 1, "seed": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        assert len(out["images"]) == 1
        import base64, io
        from PIL import Image

        img = Image.open(io.BytesIO(base64.b64decode(out["images"][0])))
        assert img.size[0] > 0
    finally:
        server.shutdown()
