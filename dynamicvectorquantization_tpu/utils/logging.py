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
    """JSONL + CSV always; optional TensorBoard event files (the reference's
    TensorBoardLogger, `train.py:128-150`) when ``logtype`` includes
    "tensorboard" — scalars land under <logdir>/tb/ tagged <split>/<name>."""

    def __init__(self, logdir: str, logtype: str = "csv"):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self.jsonl_path = os.path.join(logdir, "metrics.jsonl")
        self._csv_path = os.path.join(logdir, "metrics.csv")
        self._csv_keys = None
        self._tb = None
        if "tensorboard" in logtype or logtype == "all":
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(logdir, "tb"))
        if "wandb" in logtype:
            try:
                import wandb

                wandb.init(project=os.environ.get("WANDB_PROJECT", "dqvq-tpu"),
                           dir=logdir)
                self._wandb = wandb
            except ImportError:
                print("wandb not installed; skipping wandb sink")
                self._wandb = None
        else:
            self._wandb = None

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
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{split}/{k}", float(v), int(step))
        if self._wandb is not None:
            self._wandb.log({f"{split}/{k}": float(v) for k, v in metrics.items()},
                            step=int(step))

    def close(self):
        if self._tb is not None:
            self._tb.flush()
            self._tb.close()


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


class SetupCallback:
    """Registry shim for `utils.logger.SetupCallback`: the Trainer snapshots
    the merged config + argv natively (train.py); this class only keeps
    reference train-config blobs instantiable."""

    def __init__(self, **kwargs):
        self.kwargs = kwargs


class LightningShim:
    """Accepts any kwargs; stands in for pytorch_lightning callbacks/loggers
    (ModelCheckpoint -> orbax top-k+last, LearningRateMonitor -> per-step lr
    metric, TensorBoardLogger -> --logtype tensorboard, RichModelSummary /
    WandbLogger -> native printing / --logtype wandb)."""

    def __init__(self, *args, **kwargs):
        self.args, self.kwargs = args, kwargs


class ImageLogger:
    """PNG grid dumps mirroring CaptionImageLogger.log_local
    (`utils/logger.py:105-147`)."""

    def __init__(self, logdir: str = "logs", batch_frequency: int = 50,
                 max_images: int = 4, **_reference_kwargs):
        self.root = os.path.join(logdir, "images")
        self.batch_frequency = batch_frequency
        self.max_images = max_images

    def should_log(self, batch_idx: int, width: int = 1) -> bool:
        """True when `batch_idx` lands on (or, with `width`>1, within `width`
        steps after) a multiple of the frequency. `width` is used by the
        steps-per-dispatch loops, whose batch counter advances K optimizer
        steps per iteration and can jump over exact multiples."""
        return batch_idx % self.batch_frequency < width

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
