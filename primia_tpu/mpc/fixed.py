"""Fixed-point codec over the ring Z_{2^64}.

Reference: ``syft/.../interpreters/precision.py:18-162`` encodes floats
as ``round(x * base**precision_fractional)`` in int64 (the wraparound of
two's-complement int64 *is* the mod-2^64 ring). The reference default is
base 10; this engine uses **base 2** (``scale = 2**frac_bits``) so that
truncation is an arithmetic shift and products stay analyzable:
``frac_bits=16`` gives products of scale 2^32, leaving 31 bits of
integer headroom in the ring — the reference's base-10
``precision_fractional=16`` (scale 10^16) overflows the ring for any
product and only works for the addition-only aggregation path. The
parameter keeps its reference name; the observable contract (decoded
results match plaintext within ~2^-frac_bits) is unchanged.

All ops are jnp int64 and jit-traceable. XLA integer arithmetic wraps,
which is exactly mod-2^64 ring arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp

DEFAULT_FRAC_BITS = 16
RING_DTYPE = jnp.int64


def encode(x, frac_bits: int = DEFAULT_FRAC_BITS):
    """float -> ring. Round-to-nearest like the reference's long() cast
    path (which rounds toward zero after scaling; nearest is strictly
    more accurate and within the tolerance contract)."""
    return jnp.round(jnp.asarray(x, jnp.float64) * (1 << frac_bits)).astype(RING_DTYPE)


def decode(v, frac_bits: int = DEFAULT_FRAC_BITS):
    """ring -> float64 (interpret int64 as signed: values in [-2^63, 2^63))."""
    return jnp.asarray(v, jnp.float64) / (1 << frac_bits)


def truncate_public(v, frac_bits: int = DEFAULT_FRAC_BITS):
    """Exact signed truncation of a *public* ring value after a product
    (divide by scale, rounding toward -inf; arithmetic shift)."""
    return jnp.right_shift(v, frac_bits)


def truncate_shares(shares, frac_bits: int = DEFAULT_FRAC_BITS):
    """SecureML-style local truncation of a (2, ...) additive sharing.

    Party 0 arithmetically shifts its share; party 1 shifts the negation
    and negates back. For |x| << 2^(63 - frac_bits) the reconstruction
    equals (x >> frac_bits) + e with |e| <= 1 — the standard local
    truncation error, same contract as the reference's share-local
    division (``precision.py:146-153``).
    """
    s0 = jnp.right_shift(shares[0], frac_bits)
    s1 = -jnp.right_shift(-shares[1], frac_bits)
    return jnp.stack([s0, s1])
