"""Jit-compiled train and eval steps.

The reference's hot loop (``torchlib/utils.py:1236-1292``) is a Python
loop over torch ops with CPU-side per-image augmentation. Here one XLA
program per step fuses device-side augmentation
(``primia_tpu.ops.augment``), the forward/backward pass, and the
optimizer update; the learning rate is a runtime scalar so epoch changes
don't recompile.

Loss selection mirrors ``train.py:304-324``: one-hot soft CE when mixup
(or federated class weighting) is active, otherwise hard-label CE, both
optionally class-weighted.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from primia_tpu.nn.core import tree_cast
from primia_tpu.ops.augment import AugmentConfig, build_augment_fn, normalize_only
from primia_tpu.train import losses


def resolve_compute_dtype(args):
    """"auto" -> bfloat16 on TPU (MXU-native mixed precision), float32
    elsewhere; explicit names pass through."""
    name = getattr(args, "compute_dtype", "auto")
    if name == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    return jnp.dtype(name)


class TrainState(NamedTuple):
    params: Any
    model_state: Any  # batch-norm running stats
    opt_state: Any


def _center_crop(x, size: int):
    H = x.shape[1]
    if H == size:
        return x
    off = (H - size) // 2
    return x[:, off : off + size, off : off + size, :]


def uses_onehot_loss(args) -> bool:
    return bool(args.mixup or (args.train_federated and args.weight_classes))


def build_train_step(model_def, optimizer, args, mean, std,
                     class_weights: Optional[np.ndarray] = None,
                     donate: bool = True, jit_compile: bool = True):
    """Returns jitted ``step(ts, key, images_u8, labels, mask, lr)
    -> (ts, loss)``.

    ``images_u8``: (B, inference_res, inference_res, C) uint8 —
    augmentation, mixup, forward, backward, and the optimizer update run
    as one compiled program. ``mask`` zeroes padded rows' loss (padded
    rows do still enter BN batch stats — only the final partial batch
    is affected; the local path passes unpadded batches).
    """
    cfg = AugmentConfig.from_args(args)
    augment = build_augment_fn(cfg, mean, std, model_def.in_channels)
    w = jnp.asarray(class_weights) if (args.weight_classes and class_weights is not None) else None
    onehot = uses_onehot_loss(args)
    nc = model_def.num_classes
    cdtype = resolve_compute_dtype(args)
    # space-to-depth stem for the training hot path (exact rewrite of
    # the strided conv1; see nn/resnet.py). PRIMIA_STEM_S2D=0 disables.
    import os

    fwd_kw = {}
    if (model_def.name == "resnet-18"
            and os.environ.get("PRIMIA_STEM_S2D", "1") != "0"):
        fwd_kw["stem_s2d"] = True

    def step(ts: TrainState, key, images_u8, labels, mask, lr):
        k_aug, k_mix = jax.random.split(key)
        x = augment(k_aug, images_u8)
        y_oh = losses.to_one_hot(labels, nc)
        if args.mixup:
            x, y_oh = losses.mixup(
                k_mix, x, y_oh, lam=args.mixup_lambda, prob=args.mixup_prob
            )
        x = x.astype(cdtype)

        def loss_fn(p):
            # mixed precision: bf16 compute against fp32 master params;
            # grads come back fp32 through the cast
            logits, new_ms = model_def.forward(
                tree_cast(p, cdtype), ts.model_state, x, train=True, **fwd_kw
            )
            logits = logits.astype(jnp.float32)
            if onehot:
                loss = losses.cross_entropy_one_hot(logits, y_oh, weight=w,
                                                    sample_mask=mask)
            else:
                loss = losses.cross_entropy(logits, labels, weight=w,
                                            sample_mask=mask)
            return loss, new_ms

        (loss, new_ms), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts.params)
        new_p, new_opt = optimizer.update(grads, ts.opt_state, ts.params, lr)
        return TrainState(new_p, new_ms, new_opt), loss

    # the federated driver keeps the pre-step state alive for masking, so
    # donation must be optional; multi-chip wrappers re-jit with shardings
    if not jit_compile:
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def build_eval_step(model_def, args, mean, std,
                    class_weights: Optional[np.ndarray] = None):
    """Returns jitted ``eval_step(params, model_state, images_u8, labels,
    mask) -> (loss, logits)`` — deterministic center-crop + normalize +
    forward in inference mode. ``mask`` zeroes padded rows (fixed-shape
    final batches)."""
    w = jnp.asarray(class_weights) if (args.weight_classes and class_weights is not None) else None
    onehot = uses_onehot_loss(args)
    nc = model_def.num_classes
    size = args.train_resolution

    def step(params, model_state, images_u8, labels, mask):
        x = _center_crop(images_u8, size)
        x = normalize_only(x, mean, std, model_def.in_channels)
        logits, _ = model_def.forward(params, model_state, x, train=False)
        if onehot:
            loss = losses.cross_entropy_one_hot(
                logits, losses.to_one_hot(labels, nc), weight=w, sample_mask=mask
            )
        else:
            loss = losses.cross_entropy(logits, labels, weight=w, sample_mask=mask)
        return loss, logits

    return jax.jit(step)


def build_predict_step(model_def, args, mean, std, *, swap_pool_relu: bool = False,
                       apply_clahe: Optional[bool] = None):
    """Returns jitted ``predict(params, model_state, images_u8) -> logits``
    for the inference/eval CLIs.

    Mirrors the reference eval transform (``test.py:83-100``,
    ``inference.py:176-204``): Resize + CenterCrop at
    ``inference_resolution`` (identity here — images are materialized at
    that size), CLAHE re-applied at eval when it was on during training,
    then ToFloat + Normalize.
    """
    from primia_tpu.ops.image import clahe as clahe_op

    use_clahe = args.clahe if apply_clahe is None else apply_clahe

    def step(params, model_state, images_u8):
        x = images_u8.astype(jnp.float32) / 255.0
        if use_clahe:
            x = clahe_op(x, clip_limit=1.0, tiles=8)
        x = (x - jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, -1)) / jnp.asarray(
            std, jnp.float32
        ).reshape(1, 1, 1, -1)
        logits, _ = model_def.forward(
            params, model_state, x, train=False, swap_pool_relu=swap_pool_relu
        )
        return logits

    return jax.jit(step)
