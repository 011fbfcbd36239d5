"""PriMIA-TPU: a TPU-native privacy-preserving medical imaging framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of PriMIA
(gkaissis/PriMIA): federated training of CNN classifiers on chest X-rays
with weighted FedAvg, MPC secure aggregation, DP-SGD, and end-to-end
encrypted (SMPC) inference — expressed as sharded on-device simulation
(node and party mesh axes) instead of a hooked-torch message-passing
runtime.

The MPC engine works in the ring Z_{2^64}. JAX's x64 mode is therefore
enabled at import time; all framework code uses explicit dtypes so model
compute stays in float32/bfloat16.
"""

import os as _os

import jax as _jax

# Honor JAX_PLATFORMS even when the interpreter pre-imported jax and
# pinned a platform through jax.config (which silently outranks the env
# var): `JAX_PLATFORMS=cpu python -m primia_tpu.cli.train ...` must run
# on CPU.  Only effective before the first backend initializes, and only
# when nothing in-process has already chosen a DIFFERENT platform than
# the environment default (e.g. tests pin cpu via jax.config while the
# image exports JAX_PLATFORMS=axon — that explicit pin must win).
_plat = _os.environ.get("JAX_PLATFORMS")
_cur = getattr(_jax.config, "jax_platforms", None)
# "axon"/"axon,cpu" are image defaults (seeded through jax.config, so
# they outrank the env var even though the user never chose them) —
# treat them as overridable; an in-process pin to anything else wins.
if _plat and (_cur in (None, "", _plat) or "axon" in str(_cur)):
    try:
        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass  # backend already live; too late to switch

_jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the share-space (MPC) programs are
# compile-heavy (minutes for an encrypted ResNet forward); caching makes
# that a one-time cost per machine. Overridable via PRIMIA_JAX_CACHE.
_cache_dir = _os.environ.get("PRIMIA_JAX_CACHE", "/tmp/primia_jax_cache")
if _cache_dir and _cache_dir != "0":
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"

from primia_tpu.config import Arguments, read_worker_config  # noqa: E402,F401
