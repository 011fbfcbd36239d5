"""Encrypted (SMPC) inference — workload 5.

Reference flow (``inference.py:279-321``): the model owner fixes
precision and shares the model, the data owner shares each image, the
parties run the whole forward in share space (2 compute parties +
crypto provider), and only the logits are revealed.

TPU redesign: the parties live on a leading party axis; the entire
pipeline — BN fold, fixed-point encode, share split, the share-space
forward (Beaver convs, DCF ReLUs, tournament max-pools) and the final
reveal — is ONE jitted XLA program. The pool<->relu swap
(``inference.py:289``) is applied exactly as in the reference: pooling
first quarters the number of private ReLU elements.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from primia_tpu.mpc import fixed
from primia_tpu.mpc.engine import (
    MpcContext,
    MpcEngine,
    encode_and_share,
    reveal_and_decode,
)
from primia_tpu.nn.core import bn_fold


def fold_bn_tree(params, state, eps: float = 1e-5):
    """Replace every {gamma, beta} BN subtree with its folded inference
    affine {scale, offset} using the matching running stats."""
    if isinstance(params, dict):
        if set(params.keys()) == {"gamma", "beta"}:
            return bn_fold(params, state, eps)
        return {
            k: fold_bn_tree(v, state.get(k) if isinstance(state, dict) else None, eps)
            for k, v in params.items()
        }
    if isinstance(params, list):
        return [
            fold_bn_tree(p, state[i] if state is not None else None, eps)
            for i, p in enumerate(params)
        ]
    return params


def build_encrypted_predict(
    model_def,
    args,
    mean,
    std,
    *,
    precision_fractional: int = fixed.DEFAULT_FRAC_BITS,
    seed: int = 0,
    swap_pool_relu: bool = True,
    protocol: str = "snn",
    party_sharding=None,
    batch_tile: Optional[int] = None,
):
    """Returns jitted ``predict(params, model_state, images_u8) -> logits``
    running the forward over secret shares; signature-compatible with the
    plain ``build_predict_step``.

    ``batch_tile``: run the share-space forward ``batch_tile`` images at
    a time under ``lax.map``. The monolithic graph holds every layer's
    Beaver triples and comparison keys live at the full batch size,
    which walls both the compiler and HBM past batch ~16 @ 224 px; the
    tiled form traces the forward ONCE at the tile size and loops it,
    so program size and live dealer material are constant in the batch
    — batch (and, with tile 1, resolution) scale past the compiler
    instead of around it. Each tile draws a fresh dealer stream
    (``fold_in(tile_idx)``); tails are padded and sliced off. The
    reference achieves the same unboundedness by looping images in
    Python (``inference.py:292-321``) — here the loop is on-device.

    ``party_sharding``: optional ``jax.sharding.Sharding`` whose first
    partitioned dim is the party axis (e.g. ``NamedSharding(mesh,
    P("party"))``). The share trees are pinned to it right after the
    split, and GSPMD propagates the layout through the whole share-space
    forward — each device computes one party's share locally, and the
    protocol's openings (Beaver delta/eps, comparison reveals, the final
    logits reveal — every ``sum`` over the party axis) lower to ICI
    all-reduces. This is the mesh translation of the reference's
    party-parallel execution (``additive_shared.py:63-167``: per-party
    remote calls; SURVEY §2.4), with the wire protocol replaced by XLA
    collectives. Ring arithmetic is int64, so the distributed reductions
    are exact — sharded and unsharded logits are bit-identical.
    """
    frac = precision_fractional
    mean_a = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)
    std_a = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, -1)
    use_clahe = bool(args.clahe)
    # max pooling commutes with relu; avg does not — only swap for max
    swap = swap_pool_relu and model_def.pooling == "max"

    def _pin_parties(tree):
        if party_sharding is None:
            return tree
        return jax.tree.map(
            lambda a: jax.lax.with_sharding_constraint(a, party_sharding), tree
        )

    def predict(params, model_state, images_u8):
        key = jax.random.PRNGKey(seed)
        k_model, k_data, k_online = jax.random.split(key, 3)

        # model owner: fold BN, fix precision, share (once, outside the
        # tile loop — the parameter shares are batch-independent).
        # normalization=group keeps its raw {gamma, beta}: GN statistics
        # are input-dependent, so the engine normalizes privately
        # (mpc/engine.py:group_norm) instead of an offline fold
        if getattr(args, "normalization", "batch") == "group":
            folded = params
        else:
            folded = fold_bn_tree(params, model_state)
        shared_params = _pin_parties(encode_and_share(k_model, folded, frac))

        def forward_tile(operand):
            idx, imgs = operand
            # data owner: preprocess in plaintext, then share
            x = imgs.astype(jnp.float32) / 255.0
            if use_clahe:
                from primia_tpu.ops.image import clahe

                x = clahe(x, clip_limit=1.0, tiles=8)
            x = (x - mean_a) / std_a
            x_shared = _pin_parties(
                encode_and_share(jax.random.fold_in(k_data, idx), x, frac))

            E = MpcEngine(MpcContext(
                jax.random.fold_in(k_online, idx), frac, protocol=protocol))
            logits_shared, _ = model_def.forward(
                shared_params, {}, x_shared, E=E, train=False,
                swap_pool_relu=swap
            )
            return reveal_and_decode(logits_shared, frac).astype(jnp.float32)

        B = images_u8.shape[0]
        if batch_tile is None or batch_tile >= B:
            return forward_tile((jnp.int32(0), images_u8))
        pad = (-B) % batch_tile
        imgs = images_u8
        if pad:
            imgs = jnp.concatenate(
                [imgs, jnp.repeat(imgs[:1], pad, axis=0)], axis=0)
        n = imgs.shape[0] // batch_tile
        tiles = imgs.reshape((n, batch_tile) + imgs.shape[1:])
        out = jax.lax.map(forward_tile, (jnp.arange(n, dtype=jnp.int32), tiles))
        return out.reshape((n * batch_tile,) + out.shape[2:])[:B]

    return jax.jit(predict)
