"""Trace the ghost-clipping DP-SGD step at the canonical operating
point and print the per-op roofline table (same shape as
trace_canonical_step.py). Run on the TPU:

    python tools/trace_dp_step.py [ghost|micro]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState

mode = sys.argv[1] if len(sys.argv) > 1 else "ghost"
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
ts = TrainState(params, state, opt.init(params))
mean, std = np.array([0.5] * 3), np.array([0.25] * 3)
if mode == "ghost":
    from primia_tpu.train.dp import build_ghost_dp_train_step as build
else:
    from primia_tpu.train.dp import build_dp_train_step as build
step = build(md, opt, args, mean, std)
rng = np.random.default_rng(0)
B = 200
imgs = jnp.asarray(rng.integers(0, 255, (B, 224, 224, 3), dtype=np.uint8))
labels = jnp.asarray(rng.integers(0, 3, B, dtype=np.int32))
mask = jnp.ones(B, jnp.float32)
key = jax.random.PRNGKey(1)
for i in range(3):
    key, sk = jax.random.split(key)
    ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
float(loss)
jax.profiler.start_trace("/tmp/trace_dp")
for i in range(6):
    key, sk = jax.random.split(key)
    ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
float(loss)
jax.profiler.stop_trace()
from primia_tpu.profiler import find_xplane, parse_xplane, roofline
ops = parse_xplane(find_xplane("/tmp/trace_dp"))
r = roofline(ops, top=20)
print(f"{mode}: total {r['total_ms']/6:.1f} ms/step device, "
      f"floor {r['floor_ms']/6:.1f}, eff {r['efficiency']*100:.0f}%")
print(r["table"])
