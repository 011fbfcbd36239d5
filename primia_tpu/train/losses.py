"""Losses, MixUp, and class weighting.

Reference: ``torchlib/utils.py:305-513`` (``Cross_entropy_one_hot``,
``To_one_hot``, ``MixUp``, ``AddGaussianNoise``, ``calc_class_weights``).
All functions here are jit-traceable and batched; MixUp is reformulated
permutation-style so batch shapes stay static under XLA (the reference
halves the batch at load time, which would force recompilation).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def to_one_hot(labels, num_classes: int):
    """Integer labels -> float one-hot (reference ``To_one_hot``)."""
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)


def cross_entropy_one_hot(logits, target_oh, weight=None, reduction: str = "mean",
                          sample_mask=None):
    """Soft-target cross entropy with optional per-class weights.

    Matches reference ``Cross_entropy_one_hot`` (``utils.py:404-436``):
    ``loss_i = (sum_c w_c t_ic) * sum_c (-t_ic * log_softmax(o)_ic)``,
    reduced by mean or sum. ``sample_mask`` zeroes padded rows and is our
    addition for fixed-shape final batches (masked mean).
    """
    logp = jax.nn.log_softmax(logits, axis=1)
    per = jnp.sum(-target_oh * logp, axis=1)
    if weight is not None:
        per = per * jnp.sum(jnp.asarray(weight) * target_oh, axis=1)
    if sample_mask is not None:
        per = per * sample_mask
        denom = jnp.maximum(jnp.sum(sample_mask), 1.0)
        if reduction == "mean":
            return jnp.sum(per) / denom
        return jnp.sum(per)
    if reduction == "mean":
        return jnp.mean(per)
    if reduction == "sum":
        return jnp.sum(per)
    raise NotImplementedError("reduction method unknown")


def cross_entropy(logits, labels, weight=None, sample_mask=None):
    """Hard-label CE (torch ``CrossEntropyLoss`` analogue, incl. torch's
    weighted-mean normalization by the summed weights of the targets)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    per = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    if weight is not None:
        w = jnp.asarray(weight)[labels]
    else:
        w = jnp.ones_like(per)
    if sample_mask is not None:
        w = w * sample_mask
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1e-12)


def mixup(key, x, y_oh, lam: Optional[float] = None, prob: float = 1.0):
    """Permutation MixUp with static shapes.

    Reference ``MixUp`` (``utils.py:327-400``) pairs the two batch halves
    with a single shared λ ~ U(0,1) (or a fixed λ), applied with
    probability ``prob`` per batch. Here each sample mixes with a random
    partner under the same shared λ; output batch size equals input
    batch size, so one XLA program serves every step.
    """
    kc, kl, kp = jax.random.split(key, 3)
    apply = jax.random.bernoulli(kc, prob)
    l = jax.random.uniform(kl) if lam is None else jnp.float32(lam)
    l = jnp.where(apply, l, 1.0)
    perm = jax.random.permutation(kp, x.shape[0])
    x_mix = l * x + (1.0 - l) * x[perm]
    y_mix = l * y_oh + (1.0 - l) * y_oh[perm]
    return x_mix, y_mix


def add_gaussian_noise(key, x, mean: float = 0.0, std: float = 1.0,
                       p: Optional[float] = None):
    """Reference ``AddGaussianNoise`` (``utils.py:305-324``)."""
    kc, kn = jax.random.split(key)
    noise = jax.random.normal(kn, x.shape) * std + mean
    if p is None:
        return x + noise
    return jnp.where(jax.random.bernoulli(kc, p), x + noise, x)


def calc_class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """Normalized inverse-frequency weights (reference
    ``calc_class_weights``, ``utils.py:469-513``). Returns ones (with a
    warning) if no labels are present, matching the reference fallback."""
    occ = np.bincount(np.asarray(labels, np.int64), minlength=num_classes).astype(
        np.float64
    )
    if occ.sum() == 0:
        import warnings

        warnings.warn("class weights could not be calculated - no weights are used")
        return np.ones(num_classes, np.float32)
    with np.errstate(divide="ignore"):
        cw = 1.0 / occ
    cw[~np.isfinite(cw)] = 0.0
    cw /= cw.sum()
    return cw.astype(np.float32)
