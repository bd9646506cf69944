"""Native host-pipeline extension: build, decode, resize, normalize parity."""
import io

import numpy as np
import pytest

from dynamicvectorquantization_tpu import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native host pipeline unavailable (no g++/libjpeg)")
    return lib


@pytest.fixture(scope="module")
def jpeg_bytes(np_rng=None):
    from PIL import Image

    rng = np.random.default_rng(0)
    # smooth image so JPEG round-trip error is small
    base = rng.uniform(0, 255, (8, 8, 3))
    img = np.kron(base, np.ones((16, 16, 1))).astype(np.uint8)  # 128x128
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    return buf.getvalue(), img


def test_decode_matches_pil(lib, jpeg_bytes):
    data, _ = jpeg_bytes
    from PIL import Image

    got = native.decode_jpeg(data)
    assert got is not None
    want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert got.shape == want.shape
    # same decoder family; tiny IDCT differences allowed
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 2.0


def test_decode_dct_downscale(lib, jpeg_bytes):
    data, _ = jpeg_bytes
    got = native.decode_jpeg(data, min_side=32)
    assert got is not None
    assert min(got.shape[:2]) >= 32
    assert max(got.shape[:2]) <= 64  # 128/2 at least one denom step


def test_crop_flip_normalize_parity(lib):
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (40, 50, 3), np.uint8)
    out = native.crop_flip_normalize(src, top=3, left=7, size=32, flip=True)
    crop = src[3:35, 7:39].astype(np.float32) / 255.0 * 2 - 1
    want = crop[:, ::-1]
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_resize_bilinear_close_to_pil_on_smooth_content(lib):
    """Native resize is point-sampled bilinear (no antialias); it matches PIL
    closely on smooth content. The parity-critical transform path keeps PIL's
    antialiased resize; the native one is an opt-in fast path."""
    from PIL import Image

    yy, xx = np.mgrid[0:64, 0:48]
    src = np.stack([yy * 2, xx * 3, (yy + xx)], -1).astype(np.uint8)
    got = native.resize_bilinear(src, 32, 24)
    want = np.asarray(Image.fromarray(src).resize((24, 32), Image.BILINEAR))
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 3.0
