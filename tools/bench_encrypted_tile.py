"""Encrypted-inference batch/resolution scaling via --mpc_batch_tile.

Validates that the tiled share-space forward breaks the monolithic
graph's compile ceiling (reference analogue: ``inference.py:292-321``
loops arbitrary image counts host-side; here the loop is on-device):

1. ResNet-18@224, batch 32 — failed to compile untiled (round 2,
   docs/HowTo.md); must compile AND run with batch_tile=8.
2. simpleconv@512 (the reference zoo's ``conv_at_resolution(512)``,
   ``torchlib/models.py:719``) — must compile AND run with tile 1.

Prints ms/img for each. Run on the TPU:  python tools/bench_encrypted_tile.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PRIMIA_JAX_CACHE", "/tmp/primia_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from primia_tpu.config import Arguments
from primia_tpu.mpc.inference import build_encrypted_predict
from primia_tpu.nn import create_model


def run_case(name, model, res, batch, tile, channels=1, reps=3,
             protocol="snn"):
    args = Arguments(model=model, train_resolution=res,
                     inference_resolution=res, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (batch, res, res, channels), dtype=np.uint8)
    mean = np.full(channels, 0.5)
    std = np.full(channels, 0.25)

    enc = build_encrypted_predict(md, args, mean, std, seed=1,
                                  batch_tile=tile, protocol=protocol)
    t0 = time.time()
    out = jax.block_until_ready(enc(params, state, imgs))
    compile_s = time.time() - t0

    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(enc(params, state, imgs))
        times.append(time.time() - t0)
    best = min(times)
    print(f"{name}: batch={batch} tile={tile} compile={compile_s:.1f}s "
          f"run={best * 1000:.0f}ms = {best * 1000 / batch:.1f} ms/img "
          f"logits_finite={bool(np.isfinite(np.asarray(out)).all())}")
    return best * 1000 / batch


if __name__ == "__main__":
    print("devices:", jax.devices())
    KNOWN = ("snn32", "fss32", "conv512", "conv512fss")
    cases = sys.argv[1:] or ["snn32", "conv512"]
    bad = [c for c in cases if c not in KNOWN]
    if bad:
        sys.exit(f"unknown case(s) {bad}; valid: {list(KNOWN)}")
    if "snn32" in cases:
        run_case("resnet18@224 snn", "resnet-18", 224, 32, 8)
    if "fss32" in cases:
        run_case("resnet18@224 fss", "resnet-18", 224, 32, 8,
                 protocol="fss")
    if "conv512" in cases:
        run_case("simpleconv@512 snn", "simpleconv", 512, 2, 1)
    if "conv512fss" in cases:
        run_case("simpleconv@512 fss", "simpleconv", 512, 2, 1,
                 protocol="fss")
