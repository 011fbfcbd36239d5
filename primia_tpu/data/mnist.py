"""MNIST support — the reference's ``--data_dir mnist`` "weak machine"
path (``train.py:99-129``, ``docs/index.md:32``).

The reference downloads via torchvision; this environment has no
network egress, so the loader reads the standard IDX files (gzipped or
raw) from a local directory — ``$MNIST_DIR``, ``data/MNIST/raw`` or
``mnist/`` — and fails with an actionable message otherwise.

``label_subset`` reproduces ``LabelMNIST`` (``torchlib/dataloader.py:
258-263``): restrict to a list of digit labels, used by the federated
path to give workers disjoint digit shards.
"""

from __future__ import annotations

import gzip
import os
import struct
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

_FILES = {
    "train_images": "train-images-idx3-ubyte",
    "train_labels": "train-labels-idx1-ubyte",
    "test_images": "t10k-images-idx3-ubyte",
    "test_labels": "t10k-labels-idx1-ubyte",
}

CLASSES = [str(i) for i in range(10)]


def _find_root(root: Optional[str] = None) -> Path:
    candidates = [root] if root else []
    candidates += [os.environ.get("MNIST_DIR"), "data/MNIST/raw", "mnist",
                   "data/mnist"]
    for c in candidates:
        if c and (Path(c) / "train-labels-idx1-ubyte").exists() or (
            c and (Path(c) / "train-labels-idx1-ubyte.gz").exists()
        ):
            return Path(c)
    raise FileNotFoundError(
        "MNIST IDX files not found. Place train-images-idx3-ubyte[.gz], "
        "train-labels-idx1-ubyte[.gz], t10k-* under data/MNIST/raw (or set "
        "$MNIST_DIR). This environment has no network egress, so they "
        "cannot be downloaded automatically."
    )


def _read_idx(path: Path) -> np.ndarray:
    gz = path.with_name(path.name + ".gz")
    if path.exists():
        data = path.read_bytes()
    elif gz.exists():
        data = gzip.decompress(gz.read_bytes())
    else:
        raise FileNotFoundError(path)
    magic, = struct.unpack(">I", data[:4])
    ndim = magic & 0xFF
    dims = struct.unpack(f">{ndim}I", data[4 : 4 + 4 * ndim])
    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)


def load_mnist(root: Optional[str] = None
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(train_imgs u8 (N,28,28,1), train_labels i32, test_imgs, test_labels)."""
    r = _find_root(root)
    tri = _read_idx(r / _FILES["train_images"])[..., None]
    trl = _read_idx(r / _FILES["train_labels"]).astype(np.int32)
    tei = _read_idx(r / _FILES["test_images"])[..., None]
    tel = _read_idx(r / _FILES["test_labels"]).astype(np.int32)
    return tri, trl, tei, tel


def label_subset(images: np.ndarray, labels: np.ndarray,
                 keep: Sequence[int]) -> Tuple[np.ndarray, np.ndarray]:
    """Reference ``LabelMNIST``: restrict to the given digit labels."""
    mask = np.isin(labels, list(keep))
    return images[mask], labels[mask]


def resize_to(images_u8: np.ndarray, resolution: int) -> np.ndarray:
    """Upscale 28x28 digits to the training resolution (uint8)."""
    if images_u8.shape[1] == resolution:
        return images_u8
    from primia_tpu import native

    return native.resize_bilinear(images_u8, resolution, resolution)
