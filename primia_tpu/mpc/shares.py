"""Additive secret sharing over Z_{2^64} with a leading party axis.

Reference: ``syft/.../interpreters/additive_shared.py:63-1356`` keeps a
dict {worker_id -> share pointer} and sends per-op messages. The TPU
redesign stacks both parties' shares along a leading axis ``(2, ...)``
int64 so every linear op is one vectorized XLA op over both parties at
once; "communication" (reconstruction / openings) is a sum over the
party axis — ``psum`` over an ICI mesh axis when the party dim is
sharded, a register-level reduce when simulated on one chip.

An ``AShare`` is a pytree, so whole model parameter trees of shares flow
through jit/grad-free forward code unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

N_PARTIES = 2


class AShare(NamedTuple):
    """(2, *shape) int64 additive sharing; x = sum over axis 0 (mod 2^64)."""

    data: jnp.ndarray

    @property
    def shape(self):
        return self.data.shape[1:]

    @property
    def ndim(self):
        return self.data.ndim - 1


def rand_ring(key, shape):
    """Uniform ring elements (int64 via uint64 bits)."""
    return jax.random.bits(key, shape, jnp.uint64).astype(jnp.int64)


def share(key, value) -> AShare:
    """Split a ring value (int64) into 2 additive shares
    (reference ``generate_shares``, ``additive_shared.py:336``:
    n-1 uniform randoms + residual)."""
    value = jnp.asarray(value, jnp.int64)
    r = rand_ring(key, value.shape)
    return AShare(jnp.stack([value - r, r]))


def make_public(value) -> AShare:
    """Trivial sharing of a public ring value (party 0 holds it all) —
    for public constants entering share-space iterations (e.g. the
    Newton-Schulz identity init, ``precision.py:538``)."""
    value = jnp.asarray(value, jnp.int64)
    return AShare(jnp.stack([value, jnp.zeros_like(value)]))


def reconstruct(x: AShare) -> jnp.ndarray:
    """Open a sharing (reference ``reconstruct``: move + sum,
    ``additive_shared.py:367``)."""
    return jnp.sum(x.data, axis=0)


def zeros_like(x: AShare) -> AShare:
    return AShare(jnp.zeros_like(x.data))


def add(x: AShare, y: AShare) -> AShare:
    return AShare(x.data + y.data)


def sub(x: AShare, y: AShare) -> AShare:
    return AShare(x.data - y.data)


def neg(x: AShare) -> AShare:
    return AShare(-x.data)


def add_public(x: AShare, c) -> AShare:
    """x + public c: only party 0 offsets its share."""
    c = jnp.broadcast_to(jnp.asarray(c, jnp.int64), x.shape)
    return AShare(x.data.at[0].add(c))


def mul_public(x: AShare, c) -> AShare:
    """x * public integer c: both parties scale locally."""
    return AShare(x.data * jnp.asarray(c, jnp.int64))


def stack(shares, axis: int = 0) -> AShare:
    """Stack a list of equal-shape sharings along a new value axis."""
    return AShare(jnp.stack([s.data for s in shares], axis=axis + 1))


def reshape(x: AShare, shape) -> AShare:
    return AShare(x.data.reshape((N_PARTIES, *shape)))
