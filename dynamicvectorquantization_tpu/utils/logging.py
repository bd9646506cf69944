"""Metrics + image logging.

Replaces the reference's wandb/tensorboard + `CaptionImageLogger`
(`utils/logger.py:57-147`): a JSONL/CSV metric writer and PNG grid dumps
every `batch_frequency` batches to `<logdir>/images/<split>/`, keeping the
reference's metric names (train_rec_loss, val_fine_ratio, ...) for
comparability (SURVEY.md §5).
"""
from __future__ import annotations

import csv
import json
import os
import time
from typing import Mapping

import numpy as np


class MetricLogger:
    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.jsonl_path = os.path.join(logdir, "metrics.jsonl")
        self._csv_path = os.path.join(logdir, "metrics.csv")
        self._csv_keys = None

    def log(self, step: int, metrics: Mapping[str, float], split: str = "train"):
        row = {"step": int(step), "split": split, "time": time.time()}
        row.update({k: float(v) for k, v in metrics.items()})
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(row) + "\n")
        if self._csv_keys is None:
            self._csv_keys = list(row.keys())
            with open(self._csv_path, "a", newline="") as f:
                csv.writer(f).writerow(self._csv_keys)
        with open(self._csv_path, "a", newline="") as f:
            csv.writer(f).writerow([row.get(k, "") for k in self._csv_keys])


def to_uint8(img):
    """[-1, 1] float -> uint8."""
    arr = np.asarray(img)
    arr = np.clip((arr + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return arr


def make_grid(images, ncol=4, pad=2):
    """(N, H, W, C) -> single grid array."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    ncol = min(ncol, n)
    nrow = (n + ncol - 1) // ncol
    grid = np.zeros((nrow * (h + pad) - pad, ncol * (w + pad) - pad, c), images.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * (h + pad) : r * (h + pad) + h, col * (w + pad) : col * (w + pad) + w] = (
            images[i]
        )
    return grid


class ImageLogger:
    """PNG grid dumps mirroring CaptionImageLogger.log_local
    (`utils/logger.py:105-147`)."""

    def __init__(self, logdir: str, batch_frequency: int = 50, max_images: int = 4):
        self.root = os.path.join(logdir, "images")
        self.batch_frequency = batch_frequency
        self.max_images = max_images

    def should_log(self, batch_idx: int) -> bool:
        return batch_idx % self.batch_frequency == 0

    def log(self, images: Mapping[str, np.ndarray], split: str, global_step: int,
            epoch: int, batch_idx: int):
        from PIL import Image

        outdir = os.path.join(self.root, split)
        os.makedirs(outdir, exist_ok=True)
        for name, batch in images.items():
            batch = np.asarray(batch)[: self.max_images]
            grid = make_grid(to_uint8(batch))
            fname = f"{name}_Step_{global_step}_e-{epoch}_b-{batch_idx}.png"
            Image.fromarray(grid).save(os.path.join(outdir, fname))
