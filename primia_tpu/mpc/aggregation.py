"""Secure (MPC) federated averaging — workload "federated_secure".

Reference (``torchlib/utils.py:1000-1105`` ``aggregation``): for every
state-dict entry, each worker's parameter x its weight is fixed-precision
encoded, additively shared across the compute parties via FSS-protocol
sharing, the shared tensors are summed, and the sum is revealed and
decoded; ``num_batches_tracked`` is skipped.

TPU redesign: node-stacked parameter pytrees (leading node axis) are
encoded to the ring, split into 2 party shares, summed across the node
axis *in share space* (one vectorized reduce; a ``psum`` over the node
mesh axis when sharded), revealed, and decoded — one jitted program for
the whole model, replacing the reference's per-parameter Python loop
over ~11M-element tensors.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from primia_tpu.mpc import fixed
from primia_tpu.mpc import shares as S


def _leaf_key(path) -> int:
    """Stable per-leaf PRNG fold-in value.

    Python's string ``hash`` is salted per process, so it would draw
    different shares across runs even with a fixed seed (breaking the
    reference's deterministic-seed contract, ``train.py:63-68``); use a
    process-independent CRC-32 of the key path instead.
    """
    import zlib

    return zlib.crc32(jax.tree_util.keystr(path).encode("utf-8"))


def _is_count_leaf(path) -> bool:
    """BN batch counters are excluded from aggregation (reference skips
    ``num_batches_tracked``, ``utils.py:1049``)."""
    for p in path:
        name = getattr(p, "key", None)
        if name == "count":
            return True
    return False


def secure_fedavg(key, stacked_tree, weights, frac_bits: int = fixed.DEFAULT_FRAC_BITS,
                  party_sharding=None):
    """Weighted average of node-stacked trees via MPC share-sum.

    ``stacked_tree``: pytree with leaves (N_nodes, ...); ``weights``:
    (N_nodes,) floats summing to 1. Returns the aggregated (unstacked)
    tree. Count leaves pass through from node 0.

    ``party_sharding``: optional ``jax.sharding.Sharding`` pinning the
    leading (2, ...) party axis of each sharing to a mesh axis (same
    contract as ``mpc.inference.build_encrypted_predict``): the two
    parties' share-sums then run on separate devices and the reveal is
    an ICI all-reduce — exact, since ring arithmetic is int64.
    """
    weights = jnp.asarray(weights, jnp.float64)

    def agg_leaf(path, leaf):
        if _is_count_leaf(path):
            return leaf[0]
        w = weights.reshape((-1,) + (1,) * (leaf.ndim - 1))
        scaled = jnp.asarray(leaf, jnp.float64) * w
        ring = fixed.encode(scaled, frac_bits)  # (N, ...)
        shared = S.share(jax.random.fold_in(key, _leaf_key(path)), ring)
        if party_sharding is not None:
            shared = S.AShare(
                jax.lax.with_sharding_constraint(shared.data, party_sharding))
        summed = AShareSumNodes(shared)
        revealed = S.reconstruct(summed)
        return fixed.decode(revealed, frac_bits).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(agg_leaf, stacked_tree)


def AShareSumNodes(sh: S.AShare) -> S.AShare:
    """Sum a sharing over its first value axis (the node axis) — the
    share-space federated reduce (psum over ICI when node-sharded)."""
    return S.AShare(jnp.sum(sh.data, axis=1))


def plain_fedavg(stacked_tree, weights):
    """Unencrypted weighted average (``--unencrypted_aggregation``;
    reference ``federated_avg``, ``syft/frameworks/torch/fl/utils.py:32``)."""
    weights = jnp.asarray(weights, jnp.float64)

    def agg_leaf(path, leaf):
        if _is_count_leaf(path):
            return leaf[0]
        w = weights.reshape((-1,) + (1,) * (leaf.ndim - 1))
        return jnp.sum(jnp.asarray(leaf, jnp.float64) * w, axis=0).astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(agg_leaf, stacked_tree)


def secure_average_stats(key, per_node_values, frac_bits: int = fixed.DEFAULT_FRAC_BITS):
    """Securely average per-node statistics vectors (the mean/std
    averaging of ``setup_pysyft``, ``utils.py:764-791``: share each
    node's value, sum in share space, reveal, divide by N)."""
    stacked = jnp.stack([jnp.asarray(v, jnp.float64) for v in per_node_values])
    n = stacked.shape[0]
    ring = fixed.encode(stacked, frac_bits)
    shared = S.share(key, ring)
    summed = S.AShare(jnp.sum(shared.data, axis=1))
    return (fixed.decode(S.reconstruct(summed), frac_bits) / n).astype(jnp.float32)
