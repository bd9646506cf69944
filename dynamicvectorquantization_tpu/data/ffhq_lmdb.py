"""LMDB-backed FFHQ dataset (reference `data/ffhq_lmdb.py:16-77`).

Gated on the optional `lmdb` package (not in the base image); raises a clear
error otherwise. Keys are cached on first open like the reference.
"""
from __future__ import annotations

import io
from typing import Optional

import numpy as np

from . import transforms as T


class FFHQ_LMDB:
    def __init__(self, lmdb_path: str, split: str = "train", size: int = 256,
                 train_transform: bool = True):
        try:
            import lmdb  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "FFHQ_LMDB requires the `lmdb` package, which is not in this "
                "image; use the file-based FFHQTrain/FFHQValidation datasets."
            ) from e
        import lmdb

        self.env = lmdb.open(
            lmdb_path, readonly=True, lock=False, readahead=False, meminit=False
        )
        with self.env.begin(write=False) as txn:
            self.keys = [k for k, _ in txn.cursor()]
        self.size = size
        self.transform = (
            T.ffhq_train_transform if train_transform else T.ffhq_val_transform
        )

    def __len__(self):
        return len(self.keys)

    def __getitem__(self, i, rng: Optional[np.random.Generator] = None):
        from PIL import Image

        rng = rng or np.random.default_rng()
        with self.env.begin(write=False) as txn:
            data = txn.get(self.keys[i])
        img = Image.open(io.BytesIO(data))
        return {"image": self.transform(img, self.size, rng), "class_label": np.int32(0)}
