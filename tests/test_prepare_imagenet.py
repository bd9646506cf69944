"""Offline ImageNet prep CLI (scripts/tools/prepare_imagenet.py) against a
miniature synthetic archive set shaped like the official tars
(reference data/imagenet.py:100-232)."""
import importlib.util
import io
import os
import tarfile

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image

SPEC = importlib.util.spec_from_file_location(
    "prepare_imagenet",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "tools",
                 "prepare_imagenet.py"),
)
prep = importlib.util.module_from_spec(SPEC)
SPEC.loader.exec_module(prep)


def _jpeg_bytes(seed):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 255, (16, 16, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="JPEG")
    return buf.getvalue()


def _add_bytes(tar, name, data):
    info = tarfile.TarInfo(name)
    info.size = len(data)
    tar.addfile(info, io.BytesIO(data))


@pytest.fixture()
def fake_root(tmp_path):
    root = tmp_path / "imagenet"
    root.mkdir()
    synsets = ["n01440764", "n01443537"]
    # train tar: one sub-tar per synset, 3 JPEGs each
    with tarfile.open(root / prep.TRAIN_TAR, "w") as outer:
        for s in synsets:
            sub = io.BytesIO()
            with tarfile.open(fileobj=sub, mode="w") as st:
                for j in range(3):
                    _add_bytes(st, f"{s}_{j}.JPEG", _jpeg_bytes(j))
            _add_bytes(outer, f"{s}.tar", sub.getvalue())
    # val tar: flat JPEGs + synset map
    names = [f"ILSVRC2012_val_{i:08d}.JPEG" for i in range(4)]
    with tarfile.open(root / prep.VAL_TAR, "w") as tar:
        for i, n in enumerate(names):
            _add_bytes(tar, n, _jpeg_bytes(100 + i))
    with open(root / prep.VAL_SYNSET, "w") as f:
        for i, n in enumerate(names):
            f.write(f"{n} {synsets[i % 2]}\n")
    with open(root / prep.HUMAN_MAP, "w") as f:
        f.write("n01440764\ttench, Tinca tinca\nn01443537\tgoldfish\n")
    return root


def test_prepare_and_check(fake_root, monkeypatch):
    root = str(fake_root)
    prep.prepare_train(root)
    prep.prepare_val(root)
    # layout
    assert sorted(os.listdir(os.path.join(root, "train"))) == [
        "n01440764", "n01443537"]
    assert len(os.listdir(os.path.join(root, "val", "n01440764"))) == 2
    # filelists: "relpath class_index", sorted-synset class order
    with open(os.path.join(root, "train_filelist.txt")) as f:
        lines = [l.split() for l in f.read().splitlines()]
    assert len(lines) == 6
    assert {l[1] for l in lines} == {"0", "1"}
    assert all(l[0].split(os.sep)[0] == ("n01440764" if l[1] == "0" else "n01443537")
               for l in lines)
    # idempotent (markers)
    prep.prepare_train(root)
    # check passes, and fails if a filelist entry goes missing
    monkeypatch.setitem(prep.EXPECTED, "train", 6)
    monkeypatch.setitem(prep.EXPECTED, "val", 4)
    assert prep.check(root)

    # datasets layer picks up human labels from synset_human.txt
    from dynamicvectorquantization_tpu.data.datasets import _imagenet_split

    ds = _imagenet_split(root, "val", 16, train=False)
    assert len(ds) == 4
    ex = ds[0]
    assert ex["human_label"] in ("tench, Tinca tinca", "goldfish")
    assert ex["image"].shape == (16, 16, 3)


def test_tar_traversal_blocked(tmp_path):
    evil = tmp_path / "evil.tar"
    with tarfile.open(evil, "w") as tar:
        _add_bytes(tar, "../escape.JPEG", b"x")
    with tarfile.open(evil) as tar:
        with pytest.raises(RuntimeError, match="traversal"):
            prep._safe_extract(tar, str(tmp_path / "dest"))
