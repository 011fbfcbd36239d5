"""Replicated secret sharing (3-party, falcon-style, honest majority).

Reference: ``syft/frameworks/torch/tensors/interpreters/
replicated_shared.py`` (the falcon WIP tensor) keeps x = x0 + x1 + x2
with party i holding the pair (x_i, x_{i+1}); it supports add/sub,
public add/mul, and private mul/matmul with a PRZS reshare. This module
covers the same op surface.

TPU redesign: one array with leading axes ``(3, 2, ...)`` — party axis
then replica-slot axis — so every local op is a single vectorized XLA
op across all parties and slots, and the multiplication cross terms are
one batched product. "Sending z_i to party i-1" (the reshare round)
is a party-axis roll — a ``ppermute`` over ICI when the party axis is
sharded on a mesh, a register shuffle when simulated on one chip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc import fixed, przs
from primia_tpu.mpc import shares as S

N_PARTIES = 3


class RShare(NamedTuple):
    """(3, 2, *shape) int64: party i holds (x_i, x_{i+1 mod 3});
    x = x_0 + x_1 + x_2 (mod 2^64)."""

    data: jnp.ndarray

    @property
    def shape(self):
        return self.data.shape[2:]


def _replicate(parts: jnp.ndarray) -> RShare:
    """(3, *shape) additive parts -> replicated layout (each party also
    holds its successor's part)."""
    return RShare(jnp.stack([parts, jnp.roll(parts, -1, axis=0)], axis=1))


def share(key, value) -> RShare:
    """Split a ring value into 3 parts and distribute the pairs
    (reference ``generate_shares`` + ``distribute_shares``)."""
    value = jnp.asarray(value, jnp.int64)
    k1, k2 = jax.random.split(key)
    r1 = S.rand_ring(k1, value.shape)
    r2 = S.rand_ring(k2, value.shape)
    return _replicate(jnp.stack([r1, r2, value - r1 - r2]))


def reconstruct(x: RShare) -> jnp.ndarray:
    """Open: any two parties suffice; party 0's pair plus party 1's
    second slot is (x_0, x_1, x_2)."""
    return x.data[0, 0] + x.data[0, 1] + x.data[1, 1]


def add(x: RShare, y: RShare) -> RShare:
    return RShare(x.data + y.data)


def sub(x: RShare, y: RShare) -> RShare:
    return RShare(x.data - y.data)


def neg(x: RShare) -> RShare:
    return RShare(-x.data)


def add_public(x: RShare, c) -> RShare:
    """x + public c: only the x_0 part is offset — party 0 holds it in
    slot 0 and party 2 re-holds it in slot 1."""
    c = jnp.broadcast_to(jnp.asarray(c, jnp.int64), x.shape)
    d = x.data.at[0, 0].add(c)
    return RShare(d.at[2, 1].add(c))


def mul_public(x: RShare, c) -> RShare:
    return RShare(x.data * jnp.asarray(c, jnp.int64))


def _mul_core(key, x: RShare, y: RShare, f) -> RShare:
    """Private bilinear product + PRZS reshare.

    Party i computes z_i = f(x_i, y_i) + f(x_i, y_{i+1}) + f(x_{i+1}, y_i)
    — together the nine cross terms of (x_0+x_1+x_2)(y_0+y_1+y_2) each
    appear exactly once, so {z_i} is a 3-of-3 additive sharing of the
    product. Each party masks with its PRZS zero share and the ring
    rolls the masked parts to rebuild the replicated pairs (the one
    communication round of the falcon multiply).
    """
    fv = jax.vmap(f)  # over the party axis
    xd, yd = x.data, y.data
    z = fv(xd[:, 0], yd[:, 0]) + fv(xd[:, 0], yd[:, 1]) + fv(xd[:, 1], yd[:, 0])
    alpha = przs.zero_shares(przs.setup(key, N_PARTIES), z.shape[1:])
    return _replicate(z + alpha)


def mul(key, x: RShare, y: RShare) -> RShare:
    """Elementwise private product (one round, no Beaver triple —
    the honest-majority advantage over the 2-party additive engine)."""
    return _mul_core(key, x, y, jnp.multiply)


def matmul(key, x: RShare, y: RShare) -> RShare:
    from primia_tpu.mpc import ring_ops

    return _mul_core(key, x, y, ring_ops.ring_matmul)


def truncate(key, x: RShare, frac_bits: int = fixed.DEFAULT_FRAC_BITS) -> RShare:
    """Fixed-point rescale after a product: convert to a 2-of-2 split
    (parts 0+1 vs part 2), truncate each side SecureML-style,
    re-randomize, re-split. Error <= 1 ulp for
    |x| << 2^(63 - frac_bits), same contract as the 2-party engine
    (``fixed.truncate_shares``).

    The PRZS re-randomization before re-replication is load-bearing for
    secrecy: without it the 3-of-3 vector is (t0, 0, t1), and party 2's
    replicated pair (x_2, x_0) = (t1, t0) would span the full 2-of-2
    sharing — a single party could reconstruct the plaintext.
    """
    parts = jnp.stack([x.data[0, 0] + x.data[1, 0], x.data[2, 0]])
    t = fixed.truncate_shares(parts, frac_bits)
    raw = jnp.stack([t[0], jnp.zeros_like(t[0]), t[1]])
    alpha = przs.zero_shares(przs.setup(key, N_PARTIES), raw.shape[1:])
    return _replicate(raw + alpha)
