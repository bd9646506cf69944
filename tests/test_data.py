"""Data layer: transforms semantics, prefetch loader, datasets, native decode path."""
import os

import numpy as np
import pytest

from dynamicvectorquantization_tpu.data import transforms as T
from dynamicvectorquantization_tpu.data.datasets import (
    DataModuleFromConfig,
    FileListDataset,
    SyntheticDataset,
)
from dynamicvectorquantization_tpu.data.pipeline import PrefetchLoader


def test_imagenet_transforms_shapes_and_range():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (300, 400, 3), np.uint8))
    train = T.imagenet_train_transform(img, 256, rng)
    val = T.imagenet_val_transform(img, 256)
    for arr in (train, val):
        assert arr.shape == (256, 256, 3)
        assert arr.dtype == np.float32
        assert arr.min() >= -1.0 and arr.max() <= 1.0
    # val transform: resize shorter side then center crop — deterministic
    val2 = T.imagenet_val_transform(img, 256)
    np.testing.assert_array_equal(val, val2)


def test_ffhq_train_transform():
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 256, (512, 512, 3), np.uint8))
    arr = T.ffhq_train_transform(img, 256, rng)
    assert arr.shape == (256, 256, 3)


def test_synthetic_dataset_and_loader():
    ds = SyntheticDataset(size=32, length=20)
    loader = PrefetchLoader(ds, batch_size=8, shuffle=True, num_workers=2)
    assert len(loader) == 2  # drop_last
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (8, 32, 32, 3)
    assert batches[0]["class_label"].shape == (8,)
    # deterministic across re-iterations of the same epoch
    batches2 = list(loader.epoch(0))
    np.testing.assert_array_equal(batches[0]["image"], batches2[0]["image"])
    # different epoch shuffles differently
    batches3 = list(loader.epoch(1))
    assert not np.array_equal(batches[0]["image"], batches3[0]["image"])


def test_datamodule_from_config():
    dm = DataModuleFromConfig(
        batch_size=4,
        train={
            "target": "dynamicvectorquantization_tpu.data.datasets.SyntheticDataset",
            "params": {"size": 16, "length": 8},
        },
        validation={
            "target": "dynamicvectorquantization_tpu.data.datasets.SyntheticDataset",
            "params": {"size": 16, "length": 4},
        },
        num_workers=1,
    )
    b = next(iter(dm.train_dataloader()))
    assert b["image"].shape == (4, 16, 16, 3)
    assert len(dm._train_dataloader()) == 2


def test_filelist_dataset_jpeg_native_path(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(3):
        arr = rng.integers(0, 256, (300, 280, 3), np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.jpg", quality=92)
    files = sorted(str(p) for p in tmp_path.glob("*.jpg"))
    ds = FileListDataset(files, [0, 1, 2], T.imagenet_val_transform, 128)
    ex = ds[1]
    assert ex["image"].shape == (128, 128, 3)
    assert ex["class_label"] == 1
