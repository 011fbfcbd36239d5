"""Micro-benchmark the two CLAHE Pallas kernels separately at the
canonical shape (200, 224, 224, 3) — used to attribute the 6.2 ms of
CLAHE inside the 45.3 ms canonical step (BASELINE.md round-2 close).

Run from the repo root on the machine with the TPU attached:
    python tools/bench_clahe_kernels.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def _run(fn, args, iters):
    for _ in range(iters):
        out = fn(*args)
    # block_until_ready returns early through the axon tunnel; a host
    # scalar fetch is the only reliable fence (see bench.py).
    float(jnp.sum(out.astype(jnp.float32).ravel()[:8]))


def timeit(fn, *args, iters=20, warmup=3):
    """Two-point measurement: the per-call device time is the slope
    between an ``iters`` run and a ``2*iters`` run, cancelling the
    constant tunnel-fetch overhead (~24 ms) of the final fence."""
    _run(fn, args, warmup)
    t0 = time.perf_counter()
    _run(fn, args, iters)
    t1 = time.perf_counter()
    _run(fn, args, 2 * iters)
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / iters * 1e3


def main():
    from primia_tpu.ops import pallas_clahe as pc

    B, H, W, C = 200, 224, 224, 3
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((B, H, W, C), np.float32))

    full = timeit(pc.clahe_pallas, imgs)
    print(f"clahe_pallas full: {full:.2f} ms  ({B}x{H}x{W}x{C})")

    # split: LUT kernel alone — the REAL pipeline stage exposed by
    # pallas_clahe.clahe_luts, not a re-implementation of its setup
    t_lut = timeit(pc.clahe_luts, imgs)
    print(f"LUT kernel (+blocking reshapes): {t_lut:.2f} ms")
    print(f"apply + pack + reassembly (residual): {full - t_lut:.2f} ms")


if __name__ == "__main__":
    main()
