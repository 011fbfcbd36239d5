"""Encrypted-inference parity check for VGG-16 (reference model zoo).

The reference shares any of its models for SMPC inference
(``inference.py:279-286`` iterates the module tree generically); our
MPC engine likewise interprets the same model graph in share space.
The default test suite pins this end-to-end on simpleconv
(``tests/test_mpc.py::test_encrypted_inference_matches_plaintext``);
VGG-16's 13 share-space convolutions make its compile too heavy for
the suite (~7 min on CPU), so the check lives here and is run
manually.

Last verified 2026-08-18 (CPU backend): max |enc - plain| = 7.9e-6,
argmax parity 100%.

Run:  python tools/parity_vgg_encrypted.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

t0 = time.time()
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/primia_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from primia_tpu.config import Arguments
from primia_tpu.mpc.inference import build_encrypted_predict
from primia_tpu.nn import create_model
from primia_tpu.train.steps import build_predict_step

args = Arguments(model="vgg16", train_resolution=32,
                 inference_resolution=32, pooling_type="max")
md = create_model(args, num_classes=3)
params, state = md.init(jax.random.PRNGKey(0))
rng = np.random.default_rng(9)
imgs = rng.integers(0, 255, (1, 32, 32, 1), dtype=np.uint8)
mean, std = np.array([0.5]), np.array([0.25])

plain = build_predict_step(md, args, mean, std)
want = np.asarray(plain(params, state, imgs))
print(f"plain done {time.time() - t0:.1f}s")

enc = build_encrypted_predict(md, args, mean, std, seed=1, protocol="snn")
got = np.asarray(enc(params, state, imgs))
print(f"encrypted done {time.time() - t0:.1f}s")

diff = np.abs(got - want).max()
ok = (got.argmax(1) == want.argmax(1)).all()
print(f"max abs diff {diff:.3g}  argmax match {bool(ok)}")
assert diff < 0.02 and ok
print("PARITY OK")
