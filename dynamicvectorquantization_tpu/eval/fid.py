"""FID / rFID evaluation.

The reference evaluates FID externally on pickled sample dumps
(`scripts/sample_val/sample_dynamic_uncond.py` -> e.g. pytorch-fid). Here the
metric is built in:

  * `frechet_distance(mu1, s1, mu2, s2)` — the exact Frechet distance
    (scipy sqrtm);
  * `compute_statistics(images, feature_fn)` — batched feature extraction;
  * `inception_feature_fn(weights_path)` — standard InceptionV3 pool3
    features via torchvision when local pretrained weights are available
    (zero-egress: set ``DQVQ_INCEPTION_WEIGHTS`` or pass the path). Without
    weights, FID against published numbers is not meaningful — the loader
    raises rather than silently computing random-feature "FID".
"""
from __future__ import annotations

import os
from typing import Callable, Iterable

import numpy as np


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def compute_statistics(batches: Iterable[np.ndarray], feature_fn: Callable):
    """batches of images in [-1, 1] (B, H, W, 3) -> (mu, sigma) of features."""
    feats = []
    for b in batches:
        feats.append(np.asarray(feature_fn(b)))
    feats = np.concatenate(feats, axis=0)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def inception_feature_fn(weights_path: str | None = None):
    """InceptionV3 pool3 (2048-d) features, CPU torch.

    Uses torchvision's `inception_v3` when importable; otherwise the bundled
    torchvision-state_dict-compatible implementation
    (`eval/inception_torch.py`) — this image ships torch but not
    torchvision, so the bundled trunk is what makes a weights-mounted day
    need ONLY the weights file. Without local weights this raises instead of
    producing meaningless random-feature FID."""
    import torch

    weights_path = weights_path or os.environ.get("DQVQ_INCEPTION_WEIGHTS")
    if not (weights_path and os.path.exists(weights_path)):
        raise FileNotFoundError(
            "InceptionV3 weights required for meaningful FID. Set "
            "DQVQ_INCEPTION_WEIGHTS to a local torchvision inception_v3 "
            "state_dict (zero-egress environment cannot download them)."
        )
    try:
        from torchvision.models import inception_v3

        model = inception_v3(weights=None, aux_logits=True, init_weights=False)
        if not isinstance(model, torch.nn.Module):
            # a stubbed torchvision (tests stub it to import the reference
            # code) imports fine but returns a dummy — fall back
            raise ImportError("torchvision.models.inception_v3 is a stub")
        sd = torch.load(weights_path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        model.load_state_dict(sd, strict=False)
        model.fc = torch.nn.Identity()
    except ImportError:
        from .inception_torch import load_inception

        model = load_inception(weights_path)
    model.eval()

    def feature_fn(images_nhwc):
        with torch.no_grad():
            x = torch.from_numpy(np.asarray(images_nhwc)).permute(0, 3, 1, 2)
            x = (x + 1.0) / 2.0  # [-1,1] -> [0,1]
            x = torch.nn.functional.interpolate(
                x, size=(299, 299), mode="bilinear", align_corners=False
            )
            x = (x - torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)) / (
                torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
            )
            return model(x).numpy()

    return feature_fn


def fid_between(batches_a, batches_b, feature_fn) -> float:
    mu1, s1 = compute_statistics(batches_a, feature_fn)
    mu2, s2 = compute_statistics(batches_b, feature_fn)
    return frechet_distance(mu1, s1, mu2, s2)


def rfid(model, variables, batches, feature_fn) -> float:
    """Reconstruction FID: dataset batches vs their DQ-VAE reconstructions."""
    import jax

    recon_batches = []
    orig_batches = []
    fwd = jax.jit(lambda v, x: model.net.apply(v, x)[0])
    for b in batches:
        x = b["image"] if isinstance(b, dict) else b
        orig_batches.append(np.asarray(x))
        recon_batches.append(np.asarray(fwd(variables, x)))
    return fid_between(orig_batches, recon_batches, feature_fn)
