"""Threefry-2x32 PRG for the FSS key trees.

The reference's FSS uses a SHA-256/512 PRG driven by the Rust ``shaloop``
library (``syft/frameworks/torch/mpc/fss.py:532,581``). The exact PRG is
not part of the observable MPC contract (only share correctness is), so
the TPU build uses Threefry-2x32 — the same cipher JAX's own PRNG is
built on — hand-rolled in jnp uint32 ops so the identical code runs
inside Pallas kernels. 20 rounds (full-strength Threefry-20).

Seeds are ``(..., 4) uint32`` (lambda = 128). ``expand`` maps a seed to
two child seeds plus per-child control bits and payload words — the
G(s) of the DPF/DCF constructions.
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np

_ROTATIONS = (13, 15, 26, 6, 17, 29, 16, 24)
_PARITY = np.uint32(0x1BD11BDA)  # numpy scalar: not a traced constant (Pallas kernels import this)


def threefry2x32(key0, key1, x0, x1):
    """One Threefry-2x32 block: encrypt counter (x0, x1) under (key0, key1).

    All inputs uint32 arrays of a common shape; returns two uint32 arrays.
    Standard 20-round schedule (5 four-round groups with key injections).
    """
    ks0, ks1 = key0, key1
    ks2 = _PARITY ^ key0 ^ key1
    x0 = x0 + ks0
    x1 = x1 + ks1
    ks = (ks0, ks1, ks2)
    for group in range(5):
        for r in range(4):
            rot = _ROTATIONS[(group % 2) * 4 + r]
            x0 = x0 + x1
            x1 = (x1 << rot) | (x1 >> (32 - rot))
            x1 = x1 ^ x0
        inj1 = ks[(group + 1) % 3]
        inj2 = ks[(group + 2) % 3]
        x0 = x0 + inj1
        x1 = x1 + inj2 + jnp.uint32(group + 1)
    return x0, x1


def _blocks(seed, n_blocks: int):
    """Expand a (..., 4) uint32 seed into n_blocks*2 uint32 words.

    Uses (seed[0], seed[1]) as the cipher key and (seed[2] ^ c, seed[3])
    as counters — every seed word affects the output.
    """
    k0, k1 = seed[..., 0], seed[..., 1]
    outs = []
    for c in range(n_blocks):
        o0, o1 = threefry2x32(k0, k1, seed[..., 2] ^ jnp.uint32(c), seed[..., 3])
        outs.append(o0)
        outs.append(o1)
    return outs


def expand(seed):
    """G(s): seed (..., 4) u32 -> (sL, tL, vL, sR, tR, vR).

    sL/sR: (..., 4) u32 child seeds; tL/tR: (...,) u32 control bits;
    vL/vR: (..., 2) u32 payload words (64-bit group element each).

    The control bit is the LSB of each child's first word, which is
    then zeroed in the seed — i.e. lambda = 127, exactly the
    reference's FSS parameterization (``fss.py`` uses lambda = 127 for
    the same reason: the bit spent on t must not stay in the seed).
    12 words -> 6 Threefry blocks (the DPF path uses only 4: XLA
    dead-code-eliminates the v blocks, which are independent).
    """
    w = _blocks(seed, 6)
    tL = w[0] & jnp.uint32(1)
    tR = w[4] & jnp.uint32(1)
    mask = ~jnp.uint32(1)
    sL = jnp.stack([w[0] & mask, w[1], w[2], w[3]], axis=-1)
    sR = jnp.stack([w[4] & mask, w[5], w[6], w[7]], axis=-1)
    vL = jnp.stack([w[8], w[9]], axis=-1)
    vR = jnp.stack([w[10], w[11]], axis=-1)
    return sL, tL, vL, sR, tR, vR


def words_to_ring(v):
    """(..., 2) u32 payload -> int64 ring element (Convert of the papers)."""
    lo = v[..., 0].astype(jnp.uint64)
    hi = v[..., 1].astype(jnp.uint64)
    return (lo | (hi << jnp.uint64(32))).astype(jnp.int64)
