import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, os, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.compare import sign_shares
from primia_tpu.mpc.shares import AShare

N = 1 << 22  # 4M elements ~ half an image's comparisons
k = jax.random.PRNGKey(0)
x = jax.random.randint(k, (N,), -(1<<20), 1<<20, jnp.int64)
xs = S.share(jax.random.PRNGKey(1), x)
# median of REPS timed runs per tile (tunnel latency is noisy run to
# run; the driver's captures are single-shot — report the median and
# the observed spread so the quoted number is reproducible)
REPS = int(os.environ.get("PRIMIA_BENCH_REPS", "11"))
for tile_log in (16, 17, 18, 19):
    tile = 1 << tile_log
    f = jax.jit(lambda key, d: sign_shares(key, AShare(d), tile=tile).data)
    out = f(jax.random.PRNGKey(2), xs.data); float(jnp.sum(out))
    ts = []
    for r in range(REPS):
        t0 = time.perf_counter()
        out = f(jax.random.PRNGKey(3 + r), xs.data)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(f"tile=2^{tile_log}: median {med*1e3:.0f} ms over {REPS} runs "
          f"(spread {min(ts)*1e3:.0f}-{max(ts)*1e3:.0f}) = "
          f"{med/N*1e9:.1f} ns/elem", flush=True)
