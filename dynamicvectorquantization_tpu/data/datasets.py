"""Datasets + DataModule mirroring the reference's data layer.

Reference surface (`data/build.py:16-90`, `data/imagenet.py`,
`data/faceshq.py`): configs instantiate a `DataModuleFromConfig` holding
train/validation dataset configs; each dataset `__getitem__` returns
{"image": float image in [-1, 1], "class_label": int, ...}.

TPU-native differences: images are HWC (NHWC batches), decoding/augmentation
run in host worker threads with device prefetch (`data/pipeline.py`) instead
of torch DataLoader workers, and a `SyntheticDataset` is provided for tests /
benchmarks.
"""
from __future__ import annotations

import os
from typing import Any, Mapping, Optional

import numpy as np

from ..utils.instantiate import instantiate_from_config
from . import paths as default_paths
from . import transforms as T


class FileListDataset:
    """Image files + labels with a per-item transform."""

    def __init__(self, files, labels=None, transform=None, size=256, human_labels=None):
        self.files = list(files)
        self.labels = labels
        self.human_labels = human_labels
        self.transform = transform
        self.size = size

    def __len__(self):
        return len(self.files)

    def _open(self, path):
        """JPEGs go through the native libjpeg decoder with DCT-domain
        downscale (never below the target size); everything else through PIL."""
        from PIL import Image

        if path.lower().endswith((".jpg", ".jpeg")):
            from .. import native

            with open(path, "rb") as f:
                data = f.read()
            arr = native.decode_jpeg(data, min_side=self.size)
            if arr is not None:
                return Image.fromarray(arr)
            return Image.open(__import__("io").BytesIO(data))
        return Image.open(path)

    def __getitem__(self, i, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        with self._open(self.files[i]) as img:
            image = self.transform(img, self.size, rng)
        ex = {"image": image}
        if self.labels is not None:
            ex["class_label"] = np.int32(self.labels[i])
        if self.human_labels is not None:
            ex["human_label"] = self.human_labels[i]
        return ex


def _list_images(root):
    exts = {".jpg", ".jpeg", ".png", ".bmp", ".webp", ".JPEG", ".JPG", ".PNG"}
    files = []
    for dirpath, _, filenames in sorted(os.walk(root)):
        for f in sorted(filenames):
            if os.path.splitext(f)[1] in exts:
                files.append(os.path.join(dirpath, f))
    return files


def _imagenet_split(root, split, size, train: bool):
    """Standard ImageNet layout: <root>/<split>/<synset>/*.JPEG. Supports a
    filelist at <root>/<split>_filelist.txt ("relpath synset_index")."""
    split_dir = os.path.join(root, split)
    filelist = os.path.join(root, f"{split}_filelist.txt")
    files, labels = [], []
    if os.path.exists(filelist):
        with open(filelist) as f:
            for line in f:
                rel, _, lab = line.strip().partition(" ")
                files.append(os.path.join(split_dir, rel))
                labels.append(int(lab or 0))
    elif os.path.isdir(split_dir):
        synsets = sorted(
            d for d in os.listdir(split_dir) if os.path.isdir(os.path.join(split_dir, d))
        )
        for idx, syn in enumerate(synsets):
            for fn in sorted(os.listdir(os.path.join(split_dir, syn))):
                files.append(os.path.join(split_dir, syn, fn))
                labels.append(idx)
    transform = T.imagenet_train_transform if train else T.imagenet_val_transform
    # synset -> human label map (reference data/imagenet.py:51-58,82-86),
    # prepared by scripts/tools/prepare_imagenet.py; optional.
    human_labels = None
    human_path = os.path.join(root, "synset_human.txt")
    if files and os.path.exists(human_path):
        with open(human_path) as f:
            table = {}
            for line in f:
                parts = line.strip().split(maxsplit=1)
                if parts:
                    table[parts[0]] = parts[1] if len(parts) > 1 else ""
        synsets = [os.path.basename(os.path.dirname(p)) for p in files]
        human_labels = [table.get(s, s) for s in synsets]
    return FileListDataset(files, labels, transform, size,
                           human_labels=human_labels)


class ImageNetTrain(FileListDataset):
    def __init__(self, config=None, root=None, **kwargs):
        config = dict(config or {})
        size = int(config.get("size", 256))
        root = root or default_paths.imagenet_root()
        ds = _imagenet_split(root, "train", size, train=True)
        super().__init__(ds.files, ds.labels, ds.transform, size,
                         human_labels=ds.human_labels)


class ImageNetValidation(FileListDataset):
    def __init__(self, config=None, root=None, **kwargs):
        config = dict(config or {})
        size = int(config.get("size", 256))
        root = root or default_paths.imagenet_root()
        ds = _imagenet_split(root, "val", size, train=False)
        super().__init__(ds.files, ds.labels, ds.transform, size,
                         human_labels=ds.human_labels)


class FFHQTrain(FileListDataset):
    def __init__(self, size=256, root=None, **kwargs):
        root = root or default_paths.ffhq_root()
        files = _list_images(os.path.join(root, "train") if os.path.isdir(
            os.path.join(root, "train")) else root)
        super().__init__(files, [0] * len(files), T.ffhq_train_transform, int(size))


class FFHQValidation(FileListDataset):
    def __init__(self, size=256, root=None, **kwargs):
        root = root or default_paths.ffhq_root()
        val_dir = os.path.join(root, "val")
        files = _list_images(val_dir if os.path.isdir(val_dir) else root)
        super().__init__(files, [0] * len(files), T.ffhq_val_transform, int(size))


class CelebAHQTrain(FileListDataset):
    def __init__(self, size=256, root=None, **kwargs):
        root = root or default_paths.celebahq_root()
        files = _list_images(os.path.join(root, "train") if os.path.isdir(
            os.path.join(root, "train")) else root)
        super().__init__(files, [0] * len(files), T.ffhq_train_transform, int(size))


class CelebAHQValidation(FileListDataset):
    def __init__(self, size=256, root=None, **kwargs):
        root = root or default_paths.celebahq_root()
        val_dir = os.path.join(root, "val")
        files = _list_images(val_dir if os.path.isdir(val_dir) else root)
        super().__init__(files, [0] * len(files), T.ffhq_val_transform, int(size))


class _Concat:
    """Concatenation of datasets (reference ConcatDatasetWithIndex /
    FacesHQ = CelebA-HQ + FFHQ)."""

    def __init__(self, *datasets):
        self.datasets = [d for d in datasets if len(d) > 0] or list(datasets)
        self._offsets = []
        off = 0
        for d in self.datasets:
            self._offsets.append(off)
            off += len(d)
        self._len = off

    def __len__(self):
        return self._len

    def __getitem__(self, i, rng=None):
        for d, off in zip(reversed(self.datasets), reversed(self._offsets)):
            if i >= off:
                return d.__getitem__(i - off, rng=rng)
        raise IndexError(i)


class FacesHQTrain(_Concat):
    """CelebA-HQ + FFHQ train (reference `data/faceshq.py:155`)."""

    def __init__(self, size=256, **kwargs):
        super().__init__(CelebAHQTrain(size=size), FFHQTrain(size=size))


class FacesHQValidation(_Concat):
    def __init__(self, size=256, **kwargs):
        super().__init__(CelebAHQValidation(size=size), FFHQValidation(size=size))


class SyntheticDataset:
    """Deterministic random images — tests and benchmarks without data on disk."""

    def __init__(self, config=None, size=256, length=256, num_classes=1000, **kwargs):
        if config:
            size = int(config.get("size", size))
            length = int(config.get("length", length))
        self.size = int(size)
        self.length = int(length)
        self.num_classes = num_classes

    def __len__(self):
        return self.length

    def __getitem__(self, i, rng=None):
        g = np.random.default_rng(i)
        return {
            "image": g.uniform(-1, 1, (self.size, self.size, 3)).astype(np.float32),
            "class_label": np.int32(i % self.num_classes),
        }


class DataModuleFromConfig:
    """Builds datasets from config and hands out prefetching loaders
    (reference `data/build.py`)."""

    def __init__(
        self,
        batch_size,
        train=None,
        validation=None,
        test=None,
        num_workers=None,
        **kwargs,
    ):
        self.batch_size = batch_size
        self.num_workers = num_workers or 2
        self.dataset_configs = {}
        if train is not None:
            self.dataset_configs["train"] = train
        if validation is not None:
            self.dataset_configs["validation"] = validation
        if test is not None:
            self.dataset_configs["test"] = test
        self.datasets = {
            k: instantiate_from_config(cfg) for k, cfg in self.dataset_configs.items()
        }

    def _loader(self, split, shuffle, seed=0):
        from .pipeline import PrefetchLoader

        return PrefetchLoader(
            self.datasets[split],
            batch_size=self.batch_size,
            shuffle=shuffle,
            num_workers=self.num_workers,
            seed=seed,
        )

    def train_dataloader(self, seed=0):
        return self._loader("train", shuffle=True, seed=seed)

    # reference exposes `_train_dataloader` (used by train.py for step counts)
    _train_dataloader = train_dataloader

    def val_dataloader(self, seed=0):
        return self._loader("validation", shuffle=False, seed=seed)

    def test_dataloader(self, seed=0):
        return self._loader("test", shuffle=False, seed=seed)
