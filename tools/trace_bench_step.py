import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState, build_train_step

# bench-step config (light augment, batch 256, 1ch) — the headline
args = Arguments(model="resnet-18", train_resolution=224, inference_resolution=224,
                 batch_size=256, rotation=10.0, translate=0.1, scale=0.1,
                 randomgamma=True, randombrightness=True, noise_std=0.05, noise_prob=0.5)
md = create_model(args, num_classes=3)
params, state = md.init(jax.random.PRNGKey(0))
opt = make_optimizer(args)
ts = TrainState(params, state, opt.init(params))
step = build_train_step(md, opt, args, np.array([0.5]), np.array([0.25]))
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, (256, 224, 224, 1), dtype=np.uint8))
labels = jnp.asarray(rng.integers(0, 3, 256, dtype=np.int32))
mask = jnp.ones(256, jnp.float32)
key = jax.random.PRNGKey(1)
for i in range(3):
    key, sk = jax.random.split(key)
    ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
float(loss)
jax.profiler.start_trace("/tmp/trace_bench")
for i in range(6):
    key, sk = jax.random.split(key)
    ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
float(loss)
jax.profiler.stop_trace()
print("trace done", flush=True)

from primia_tpu.profiler import find_xplane, parse_xplane, roofline, module_executions
xp = find_xplane("/tmp/trace_bench")
ops = parse_xplane(xp)
r = roofline(ops, top=30)
print(f"total {r['total_ms']:.1f} ms over 6 steps = {r['total_ms']/6:.2f} ms/step")
print(f"floor {r['floor_ms']:.1f} ms, efficiency {r['efficiency']*100:.0f}%")
print(r["table"])
