"""Pseudo-random zero shares (PRZS).

Reference: ``syft/frameworks/torch/mpc/przs.py:12-153`` sets up a ring
of paired seeded generators — party i shares a seed with party i+1 and
emits ``PRG(seed_i) - PRG(seed_{i-1})`` so the per-party values sum to
zero without communication. Used by the replicated (falcon-style)
3-party sharing for resharing after a multiplication.

TPU-native form: the "seed ring" is a set of n JAX PRNG keys; the n
zero shares are produced in one vectorized expression with a leading
party axis, so downstream share math stays a single XLA op over all
parties.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from primia_tpu.mpc import shares as S


def setup(key, n_parties: int):
    """The seed ring: key i is known to parties i and (i+1) mod n
    (reference ``PRZS.setup``)."""
    return jax.random.split(key, n_parties)


def zero_shares(ring_keys, shape, dtype=jnp.int64) -> jnp.ndarray:
    """(n_parties, *shape) values summing to 0 mod 2^64.

    Party i's share = PRG(key_i) - PRG(key_{i-1}) (reference
    ``gen_alpha_3of3``): each PRG term appears once positively (at the
    party that owns the seed) and once negatively (at its ring
    neighbour), so the party-axis sum telescopes to zero.
    """
    streams = jnp.stack([S.rand_ring(k, shape) for k in ring_keys])
    return (streams - jnp.roll(streams, 1, axis=0)).astype(dtype)
