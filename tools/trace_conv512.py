"""Per-op attribution of the encrypted 512-px zoo model (VERDICT r4
weak #4: simpleconv@512 has run at 222.5 ms/img since round 3 with no
trace — where does the time live, and what do tile/batch buy?).

Reference serves this model too: ``torchlib/models.py:719``
(``conv_at_resolution(512)``).

Run on the TPU:
    python tools/trace_conv512.py trace [tile] [batch] [protocol]
    python tools/trace_conv512.py sweep            # tile/batch grid
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
from primia_tpu.mpc.inference import build_encrypted_predict
from primia_tpu.nn import create_model


def build(tile, protocol):
    args = Arguments(model="simpleconv", train_resolution=512,
                     inference_resolution=512, pooling_type="max")
    md = create_model(args, num_classes=3)
    params, state = md.init(jax.random.PRNGKey(0))
    enc = build_encrypted_predict(md, args, np.array([0.5]), np.array([0.25]),
                                  seed=1, protocol=protocol,
                                  batch_tile=tile)
    return enc, params, state


def timed(enc, params, state, batch, reps=5):
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (batch, 512, 512, 1), dtype=np.uint8)
    t0 = time.time()
    out = enc(params, state, imgs)
    float(jnp.sum(out))
    compile_s = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        float(jnp.sum(enc(params, state, imgs)))
        ts.append(time.time() - t0)
    ts.sort()
    med = ts[len(ts) // 2]
    return compile_s, med * 1e3 / batch, ts[0] * 1e3 / batch, ts[-1] * 1e3 / batch


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "trace"
    if mode == "sweep":
        # fss first: the snn trace shows its 31-bit compare machinery at
        # 10-20% of roof dominating; the fused DCF kernel rates 17.5
        # ns/elem for the same ~2M sign evals/img
        for proto, tile, batch in [("fss", 1, 2), ("fss", 2, 4),
                                   ("snn", 1, 2), ("snn", 1, 4),
                                   ("snn", 2, 4), ("snn", 2, 8),
                                   ("fss", 1, 4), ("fss", 2, 8)]:
            try:
                enc, params, state = build(tile, proto)
                c, med, lo, hi = timed(enc, params, state, batch)
                print(f"{proto} tile={tile} batch={batch}: {med:.1f} ms/img "
                      f"(spread [{lo:.1f}, {hi:.1f}], compile {c:.0f}s)",
                      flush=True)
            except Exception as e:
                print(f"{proto} tile={tile} batch={batch}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    proto = sys.argv[4] if len(sys.argv) > 4 else "snn"
    enc, params, state = build(tile, proto)
    rng = np.random.default_rng(9)
    imgs = rng.integers(0, 255, (batch, 512, 512, 1), dtype=np.uint8)
    out = enc(params, state, imgs)
    float(jnp.sum(out))

    jax.profiler.start_trace("/tmp/trace_conv512")
    out = enc(params, state, imgs)
    float(jnp.sum(out))
    jax.profiler.stop_trace()

    from primia_tpu.profiler import find_xplane, parse_xplane, roofline

    ops = parse_xplane(find_xplane("/tmp/trace_conv512"))
    r = roofline(ops, top=25)
    print(f"conv512 {proto} tile={tile} batch={batch}: "
          f"total {r['total_ms'] / batch:.1f} ms/img device, "
          f"floor {r['floor_ms'] / batch:.1f}, eff {r['efficiency'] * 100:.0f}%")
    print(r["table"])


if __name__ == "__main__":
    main()
