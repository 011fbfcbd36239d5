"""DP-SGD step throughput at the canonical operating point.

Compares the ghost-norm clipping step (default) against the
microbatched per-example path on ResNet-18@224 batch 200 with the full
canonical augment fused in (same operating point as BASELINE.md
anchor 4). Run on the TPU:  python tools/bench_dp_step.py [ghost|micro|both]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PRIMIA_JAX_CACHE", "/tmp/primia_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState

args = Arguments(model="resnet-18", train_resolution=224,
                 inference_resolution=224, batch_size=200, optimizer="Adam",
                 clahe=True, randomgamma=True, randombrightness=True,
                 blur=True, elastic=True, optical_distortion=True,
                 grid_distortion=True, fog=True, rotation=30, scale=0.15,
                 shear=10, pretrained=True, mixup=False,
                 noise_std=0.05, noise_prob=0.5,
                 differentially_private=True, noise_multiplier=1.3,
                 max_grad_norm=1.0, compute_dtype="bfloat16")
md = create_model(args, num_classes=3)
params, state = md.init(jax.random.PRNGKey(0))
opt = make_optimizer(args)
B = 200
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, (B, 224, 224, 3), dtype=np.uint8))
labels = jnp.asarray(rng.integers(0, 3, B, dtype=np.int32))
mask = jnp.ones(B, jnp.float32)
mean, std = np.array([0.5] * 3), np.array([0.25] * 3)


def run(name, build, **kw):
    # fresh copies: the step donates its TrainState, which would
    # otherwise free the shared `params` buffers and break the next case
    ts = TrainState(jax.tree.map(jnp.copy, params),
                    jax.tree.map(jnp.copy, state), opt.init(params))
    step = build(md, opt, args, mean, std, **kw)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, sk = jax.random.split(key)
        ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
    float(loss)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        key, sk = jax.random.split(key)
        ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"{name}: {dt * 1e3:.1f} ms/step = {B / dt:.0f} img/s "
          f"(loss {float(loss):.3f})")


which = sys.argv[1] if len(sys.argv) > 1 else "both"
if which in ("ghost", "both"):
    from primia_tpu.train.dp import build_ghost_dp_train_step

    run("ghost", build_ghost_dp_train_step)
if which in ("micro", "both"):
    from primia_tpu.train.dp import build_dp_train_step

    run("micro mb=8", build_dp_train_step, microbatch=8)
