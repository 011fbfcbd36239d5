"""Per-op attribution of the fss encrypted-inference image (VERDICT r2
weak-item 5: the sign kernel is at ~80% of the VPU roofline, yet fss
end-to-end is 105 ms/img vs snn's 88 — find where the non-kernel time
lives: mask opens, share plumbing, limb conversions).

Run on the TPU:  python tools/trace_fss_inference.py [fss|snn]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PRIMIA_JAX_CACHE", "/tmp/primia_jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from primia_tpu.config import Arguments
from primia_tpu.mpc.inference import build_encrypted_predict
from primia_tpu.nn import create_model

proto = sys.argv[1] if len(sys.argv) > 1 else "fss"
args = Arguments(model="resnet-18", train_resolution=224,
                 inference_resolution=224, pooling_type="max", pretrained=True)
md = create_model(args, num_classes=3)
params, state = md.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(9)
imgs = rng.integers(0, 255, (8, 224, 224, 3), dtype=np.uint8)
enc = build_encrypted_predict(md, args, np.array([0.5] * 3),
                              np.array([0.25] * 3), seed=1, protocol=proto)
out = enc(params, state, imgs)
float(jnp.sum(out))  # compile + settle

jax.profiler.start_trace(f"/tmp/trace_{proto}_inf")
for _ in range(2):
    out = enc(params, state, imgs)
float(jnp.sum(out))
jax.profiler.stop_trace()

from primia_tpu.profiler import find_xplane, parse_xplane, roofline

ops = parse_xplane(find_xplane(f"/tmp/trace_{proto}_inf"))
r = roofline(ops, top=30)
n_img = 2 * 8
print(f"{proto}: total {r['total_ms'] / n_img:.1f} ms/img device, "
      f"floor {r['floor_ms'] / n_img:.1f}, eff {r['efficiency'] * 100:.0f}%")
print(r["table"])
