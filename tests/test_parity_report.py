"""CI exercise of scripts/tools/parity_report.py with synthesized stand-ins
(VERDICT r04 next #3): a fake reference torch `.ckpt` exported from our own
random-init model, a random-weight torchvision-format inception state_dict,
and a synthetic image tree. Every leg's code path runs end to end — the
weights-mounted day needs only the real files.
"""
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# ch=32 variant: the ACTUAL reference torch model is instantiated by the
# recon_tolerance leg, and its GroupNorm(32) requires 32-divisible widths
SMOKE_YAML = os.path.join(REPO, "configs/smoke/dqvae-dual-entropy-tiny-ref.yml")


@pytest.fixture(scope="module")
def standins(tmp_path_factory):
    import torch

    root = tmp_path_factory.mktemp("parity_standins")

    # 1. image tree: a few synthetic PNGs at the smoke geometry (64^2)
    from PIL import Image

    from dynamicvectorquantization_tpu.data.synthetic import build_pool

    img_dir = root / "val"
    img_dir.mkdir()
    pool = build_pool(8, 64, seed=5)
    for i in range(8):
        Image.fromarray(pool[i]).save(img_dir / f"img_{i:03d}.png")

    # 2. fake reference ckpt: export OUR random-init model to a torch
    #    state_dict (the same key mapping real reference ckpts use, inverse
    #    direction — proven bidirectional in tests/test_torch_ckpt.py)
    import jax

    from dynamicvectorquantization_tpu.config.yaml_config import load_config
    from dynamicvectorquantization_tpu.utils.instantiate import (
        instantiate_from_config,
    )
    from dynamicvectorquantization_tpu.utils.torch_ckpt import (
        export_dqvae_state_dict,
    )

    config = load_config([SMOKE_YAML], [])
    model = instantiate_from_config(config["model"])
    variables = model.init(jax.random.PRNGKey(3))
    sd = {
        k: torch.from_numpy(np.asarray(v))
        for k, v in export_dqvae_state_dict(variables).items()
    }
    ckpt = root / "fake_reference.ckpt"
    torch.save({"state_dict": sd}, ckpt)

    # 3. stand-in inception weights: random-init torchvision-format
    #    state_dict through the bundled trunk (eval/inception_torch.py)
    from dynamicvectorquantization_tpu.eval.inception_torch import InceptionV3

    torch.manual_seed(0)
    inception = root / "inception_v3_standin.pth"
    torch.save(InceptionV3().state_dict(), inception)

    return {"images": str(img_dir), "ckpt": str(ckpt),
            "inception": str(inception), "root": str(root)}


@pytest.mark.slow
def test_parity_report_end_to_end(standins):
    out = os.path.join(standins["root"], "report.json")
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        DQVQ_INCEPTION_WEIGHTS=standins["inception"],
    )
    r = subprocess.run(
        [
            sys.executable, "scripts/tools/parity_report.py",
            "--yaml_path", SMOKE_YAML,
            "--ref_ckpt", standins["ckpt"],
            "--images", standins["images"],
            "--size", "64", "--batch_size", "4", "--limit", "8",
            "--recon_images", "8",
            # random weights on both sides won't hit the real thresholds;
            # the test asserts the legs RAN, not the quality verdict
            "--tolerance", "1e9", "--rfid_rel_tol", "1e9",
            "--out", out,
        ],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    with open(out) as f:
        report = json.load(f)
    # the three stage-1 legs all ran through their REAL code paths
    assert report["ckpt_import"]["status"] == "ran"
    assert report["ckpt_import"]["mapped_leaves"] > 50
    assert report["recon_tolerance"]["status"] == "ran"
    assert report["recon_tolerance"]["images"] == 8
    assert np.isfinite(report["recon_tolerance"]["max_abs_diff"])
    assert report["rfid"]["status"] == "ran"
    assert report["rfid"]["metric"] == "rfid"  # real inception path, not proxy
    assert np.isfinite(report["rfid"]["value"])
    assert report["rfid"]["pass"] is True  # rel_tol disabled -> plumbing pass
    # sample leg skipped (no stage-2 ckpt) and says why
    assert report["sample_fid"]["status"] == "skipped"
    assert report["verdict"] == "INCOMPLETE"
    assert "sample_fid" in report["legs_skipped"]


def test_inception_trunk_state_dict_roundtrip(tmp_path):
    """The bundled trunk loads its own torchvision-format state_dict
    strictly and rejects a wrong architecture."""
    import torch

    from dynamicvectorquantization_tpu.eval.inception_torch import (
        InceptionV3,
        load_inception,
    )

    torch.manual_seed(1)
    m = InceptionV3().eval()
    p = tmp_path / "w.pth"
    torch.save(m.state_dict(), p)
    m2 = load_inception(str(p))
    with torch.no_grad():
        x = torch.randn(1, 3, 299, 299)
        a, b = m(x.clone()), m2(x.clone())
    assert a.shape == (1, 2048)
    assert torch.allclose(a, b)

    torch.save({"not_inception.weight": torch.zeros(3)}, p)
    with pytest.raises(ValueError):
        load_inception(str(p))
