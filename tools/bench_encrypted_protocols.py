import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from primia_tpu.config import Arguments
from primia_tpu.mpc.inference import build_encrypted_predict
from primia_tpu.nn import create_model

args = Arguments(model="resnet-18", train_resolution=224, inference_resolution=224,
                 pooling_type="max", pretrained=True)
md = create_model(args, num_classes=3)
params, state = md.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(9)
imgs = rng.integers(0, 255, (8, 224, 224, 3), dtype=np.uint8)
for proto in ("snn", "fss"):
    enc = build_encrypted_predict(md, args, np.array([0.5]*3), np.array([0.25]*3),
                                  seed=1, protocol=proto)
    t0 = time.perf_counter()
    out = enc(params, state, imgs); float(jnp.sum(out))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out = enc(params, state, imgs)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / 3
    print(f"{proto}: {dt*1e3:.1f} ms/batch8 = {dt/8*1e3:.1f} ms/img (compile+first {compile_s:.0f}s)", flush=True)
