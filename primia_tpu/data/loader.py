"""Batch iteration + dataset statistics.

Replaces the reference's torch DataLoader + per-image CPU transforms
(``torchlib/dataloader.py:220-247`` for ``calc_mean_std``; batch loops in
``torchlib/utils.py:1236-1292``). Materialized uint8 arrays live in host
RAM; batches are sliced as numpy and transferred to device by the jitted
step. Final partial batches are padded to the fixed batch size with a
validity mask so every step compiles exactly once.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple, Optional, Tuple

import numpy as np


class Batch(NamedTuple):
    images: np.ndarray  # (B, R, R, C) uint8
    labels: Optional[np.ndarray]  # (B,) int32 or None
    mask: np.ndarray  # (B,) float32; 0 for padding rows


def to_device_resident(images_u8: np.ndarray, max_bytes: int = 4 << 30):
    """Move a materialized dataset into device memory (HBM) when it fits.

    The TPU-first answer to input-pipeline overhead: the full X-ray
    training set is ~260 MB uint8 — far below HBM capacity — so batches
    become on-device gathers instead of per-step host->device copies of
    tens of MB (a 4x throughput loss through a tunneled link, and a
    PCIe tax even on a local host). Falls back to the host array when
    the dataset is too large or allocation fails.
    """
    import jax
    import jax.numpy as jnp

    if images_u8.nbytes > max_bytes:
        return images_u8
    try:
        return jax.device_put(jnp.asarray(images_u8))
    except Exception:
        return images_u8


def device_prefetch(batches, depth: int = 2):
    """Iterate ``batches`` with the next ``depth`` already in flight to
    the device.

    ``jax.device_put`` is asynchronous, so enqueueing the upcoming
    batches' transfers before yielding the current one overlaps
    host->device copies with the running step — without this, a training
    loop serializes a full batch transfer (tens of MB) against every
    step (measured 4x throughput loss on a tunneled v5e).
    """
    import collections

    import jax

    def put(b: Batch) -> Batch:
        return Batch(
            jax.device_put(b.images),
            None if b.labels is None else jax.device_put(b.labels),
            jax.device_put(b.mask),
        )

    q = collections.deque()
    it = iter(batches)
    try:
        for _ in range(max(1, depth)):
            q.append(put(next(it)))
    except StopIteration:
        pass
    while q:
        out = q.popleft()
        try:
            q.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def calc_mean_std(
    images_u8: np.ndarray, sample_limit: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std of a uint8 NHWC array, over [0, 1] floats.

    Matches the reference ``calc_mean_std`` (``torchlib/dataloader.py:220``):
    statistics of the ToTensor'd dataset, std with Bessel's correction
    (torch ``std_mean`` default).

    Computed from exact per-channel value histograms: uint8 has 256
    levels, so one bincount pass gives moments with zero rounding —
    no float32 blow-up of the (possibly multi-GB) image array and no
    host->device shipping of the whole dataset just for two scalars
    per channel.
    """
    x = images_u8
    if sample_limit is not None and len(x) > sample_limit:
        idx = np.linspace(0, len(x) - 1, sample_limit).astype(np.int64)
        x = x[idx]
    c = x.shape[-1]
    n = x.size // c
    # exact integer moments, accumulated image-chunk-wise so the int64
    # temporaries stay cache-sized (sum <= N*255, sumsq <= N*255^2:
    # both far inside int64 for any realistic dataset)
    s1 = np.zeros(c, np.int64)
    s2 = np.zeros(c, np.int64)
    flat = x.reshape(-1, c)
    step = max(1, (1 << 24) // max(c, 1))  # ~16M pixels per chunk
    for i in range(0, flat.shape[0], step):
        chunk = flat[i : i + step].astype(np.int64)
        s1 += chunk.sum(axis=0)
        s2 += np.square(chunk).sum(axis=0)
    mean = s1 / (255.0 * n)
    var = (s2 / (255.0 * 255.0) - n * mean * mean) / max(n - 1, 1)
    return mean, np.sqrt(np.maximum(var, 0.0))


class BatchLoader:
    """Shuffling fixed-shape batch iterator over materialized arrays."""

    def __init__(
        self,
        images: np.ndarray,
        labels: Optional[np.ndarray],
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: int = 0,
        pad_final: bool = True,
        drop_last: bool = False,
    ):
        self.images = images
        self.labels = labels
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.pad_final = pad_final
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.images)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    @property
    def num_samples(self) -> int:
        return len(self.images)

    def __iter__(self) -> Iterator[Batch]:
        n = len(self.images)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        self._epoch += 1
        B = self.batch_size
        nb = len(self)
        for b in range(nb):
            idx = order[b * B : (b + 1) * B]
            imgs = self.images[idx]  # device gather when images live in HBM
            labs = self.labels[idx] if self.labels is not None else None
            mask = np.ones(len(idx), np.float32)
            if len(idx) < B and self.pad_final:
                pad = B - len(idx)
                if isinstance(imgs, np.ndarray):
                    xp = np
                else:
                    import jax.numpy as xp
                imgs = xp.concatenate(
                    [imgs, xp.zeros((pad, *imgs.shape[1:]), imgs.dtype)])
                if labs is not None:
                    labs = np.concatenate([np.asarray(labs), np.zeros(pad, labs.dtype)])
                mask = np.concatenate([mask, np.zeros(pad, np.float32)])
            yield Batch(imgs, labs, mask)
