import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.train.optim import make_optimizer
from primia_tpu.train.steps import TrainState, build_train_step

args = Arguments(model="resnet-18", train_resolution=224, inference_resolution=224,
                 batch_size=200, optimizer="Adam",
                 clahe=True, randomgamma=True, randombrightness=True, blur=True,
                 elastic=True, optical_distortion=True, grid_distortion=True, fog=True,
                 rotation=30, scale=0.15, shear=10, pretrained=True,
                 mixup=True, mixup_prob=0.9, noise_std=0.05, noise_prob=0.5)
md = create_model(args, num_classes=3)
params, state = md.init(jax.random.PRNGKey(0))
opt = make_optimizer(args)
ts = TrainState(params, state, opt.init(params))
step = build_train_step(md, opt, args, np.array([0.5]*3), np.array([0.25]*3))
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
jax.profiler.start_trace("/tmp/trace_canon")
for i in range(6):
    key, sk = jax.random.split(key)
    ts, loss = step(ts, sk, imgs, labels, mask, 1e-4)
float(loss)
jax.profiler.stop_trace()
from primia_tpu.profiler import find_xplane, parse_xplane, roofline
ops = parse_xplane(find_xplane("/tmp/trace_canon"))
r = roofline(ops, top=12)
print(f"canonical: total {r['total_ms']/6:.1f} ms/step device, floor {r['floor_ms']/6:.1f}, eff {r['efficiency']*100:.0f}%")
print(r["table"])
