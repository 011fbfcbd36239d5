"""Beaver-triple multiplication for any bilinear op (mul / matmul / conv).

Reference: ``syft/frameworks/torch/mpc/spdz.py:22-197`` masks the
operands with a triple (delta = x - a, epsilon = y - b), opens them, and
combines ``z = c + delta*b + a*epsilon + delta*epsilon``. The TPU
version generalizes the combine over *any* bilinear ``f`` so conv2d gets
conv-shaped triples (``c = f(a, b)``) instead of the reference's
im2col + matmul detour (``syft/frameworks/torch/nn/functional.py:204``)
— the masked-open terms ``f(delta, b)``, ``f(a, epsilon)`` run as plain
local int64 convs that XLA maps straight to the conv engine.

The dealer (crypto provider) is simulated inline from a PRNG key: in the
single-program simulation the provider's randomness is just another key
split, matching the reference's colocated ``crypto_provider``
VirtualWorker. All of it traces into the one XLA program.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc import ring_ops
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.shares import AShare


class Triple(NamedTuple):
    a: AShare
    b: AShare
    c: AShare


def gen_triple(key, f: Callable, a_shape, b_shape) -> Triple:
    """Dealer: random a, b; c = f(a, b) in the ring; all three shared."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = S.rand_ring(k1, a_shape)
    b = S.rand_ring(k2, b_shape)
    c = f(a, b)
    return Triple(S.share(k3, a), S.share(k4, b), S.share(jax.random.fold_in(k3, 1), c))


def bilinear(f: Callable, x: AShare, y: AShare, triple: Triple) -> AShare:
    """z = f(x, y) on sharings via the triple (online phase).

    delta/epsilon are opened (public); the cross terms are local
    per-party ops vectorized over the party axis; f(delta, epsilon)
    enters party 0's share only.
    """
    delta = S.reconstruct(S.sub(x, triple.a))
    eps = S.reconstruct(S.sub(y, triple.b))
    fv = jax.vmap(f)  # over the party axis
    z = triple.c.data + fv(jnp.stack([delta, delta]), triple.b.data)
    z = z + fv(triple.a.data, jnp.stack([eps, eps]))
    z = z.at[0].add(f(delta, eps))
    return AShare(z)


def mul(key, x: AShare, y: AShare) -> AShare:
    """Elementwise product (broadcasting supported)."""
    f = ring_ops.ring_mul
    t = gen_triple(key, f, x.shape, y.shape)
    return bilinear(f, x, y, t)


def matmul(key, x: AShare, y: AShare) -> AShare:
    f = ring_ops.ring_matmul
    t = gen_triple(key, f, x.shape, y.shape)
    return bilinear(f, x, y, t)


def conv2d(key, x: AShare, w: AShare, stride: int, padding: int) -> AShare:
    f = lambda a, b: ring_ops.ring_conv2d(a, b, stride, padding)
    t = gen_triple(key, f, x.shape, w.shape)
    return bilinear(f, x, w, t)
