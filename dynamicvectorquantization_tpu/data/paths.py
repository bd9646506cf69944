"""Dataset root paths.

The reference hard-codes roots in `data/default.py` (and omits the FFHQ /
CelebA-HQ entries its own `data/faceshq.py` needs — SURVEY.md §7.1.4). Here
every root is env-var-overridable with sane defaults.
"""
from __future__ import annotations

import os


def imagenet_root() -> str:
    return os.environ.get("DQVQ_IMAGENET_ROOT", "/data/imagenet")


def ffhq_root() -> str:
    return os.environ.get("DQVQ_FFHQ_ROOT", "/data/ffhq")


def celebahq_root() -> str:
    return os.environ.get("DQVQ_CELEBAHQ_ROOT", "/data/celebahq")
