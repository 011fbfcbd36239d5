"""Optimizers with torch-equivalent semantics and a dynamic learning rate.

The reference uses ``torch.optim.Adam(lr, betas, weight_decay)`` or
``torch.optim.SGD(lr, momentum, weight_decay)`` (``train.py:280-303``) and
rewrites ``param_group["lr"]`` every epoch from the scheduler
(``torchlib/utils.py:85-89``). Here the learning rate is a *runtime
argument* of the jitted update, so one compiled program serves every
epoch.

Torch semantics reproduced exactly:
- weight decay is an L2 term added to the gradient *before* the
  momentum/Adam statistics (both optimizers);
- Adam uses bias-corrected first/second moments;
- SGD momentum has dampening 0 and no Nesterov.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


def _uniform_f32(params) -> bool:
    """True when every leaf is float32 — the fused flat path applies.

    Per-parameter tree.map updates compile to ~60 tiny fusions whose
    fixed launch/copy latency dominates (measured 7.8 ms/step of a
    29 ms ResNet-18 train step on v5e). Raveling params/grads/moments
    into single vectors runs the same elementwise math as ~3 big
    HBM-bound fusions (~0.5 ms). Element order is identical, so the
    torch-parity semantics are unchanged.
    """
    leaves = jax.tree.leaves(params)
    # single-leaf trees gain nothing from raveling, and a 1-D single
    # leaf would make the flat moments indistinguishable from per-leaf
    # ones in update()'s detection
    return len(leaves) > 1 and all(l.dtype == jnp.float32 for l in leaves)


class AdamState(NamedTuple):
    step: jnp.ndarray  # scalar int32
    mu: Any  # first-moment pytree
    nu: Any  # second-moment pytree


class SGDState(NamedTuple):
    step: jnp.ndarray
    momentum: Any  # velocity pytree


class Optimizer(NamedTuple):
    """``init(params) -> state``; ``update(grads, state, params, lr)
    -> (new_params, new_state)``. Both sides jit-friendly."""

    name: str
    init: Any
    update: Any


def adam(beta1: float = 0.9, beta2: float = 0.999, eps: float = 1e-8,
         weight_decay: float = 0.0) -> Optimizer:
    def init(params):
        if _uniform_f32(params):
            flat, _ = ravel_pytree(params)
            # two distinct buffers — aliasing mu/nu breaks donation
            return AdamState(jnp.zeros((), jnp.int32),
                             jnp.zeros_like(flat), jnp.zeros_like(flat))
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), z(), z())

    def update(grads, state, params, lr):
        step = state.step + 1
        m_l = jax.tree.leaves(state.mu)
        p_l = jax.tree.leaves(params)
        fused = len(m_l) == 1 and (len(p_l) != 1 or m_l[0].shape != p_l[0].shape)
        if fused:
            flat_p, unravel = ravel_pytree(params)
            grads, _ = ravel_pytree(grads)
            params = flat_p
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        mu = jax.tree.map(lambda m, g: beta1 * m + (1 - beta1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: beta2 * v + (1 - beta2) * g * g, state.nu, grads)
        t = step.astype(jnp.float32)
        bc1 = 1 - beta1 ** t
        bc2 = 1 - beta2 ** t
        new_params = jax.tree.map(
            lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps),
            params, mu, nu,
        )
        if fused:
            new_params = unravel(new_params)
        return new_params, AdamState(step, mu, nu)

    return Optimizer("Adam", init, update)


def sgd(momentum: float = 0.0, weight_decay: float = 0.0) -> Optimizer:
    def init(params):
        if not momentum:
            return SGDState(jnp.zeros((), jnp.int32), None)
        if _uniform_f32(params):
            flat, _ = ravel_pytree(params)
            return SGDState(jnp.zeros((), jnp.int32), jnp.zeros_like(flat))
        return SGDState(jnp.zeros((), jnp.int32),
                        jax.tree.map(jnp.zeros_like, params))

    def update(grads, state, params, lr):
        unravel = None
        if momentum:
            m_l = jax.tree.leaves(state.momentum)
            p_l = jax.tree.leaves(params)
            if len(m_l) == 1 and (len(p_l) != 1 or m_l[0].shape != p_l[0].shape):
                flat_p, unravel = ravel_pytree(params)
                grads, _ = ravel_pytree(grads)
                params = flat_p
        elif len(jax.tree.leaves(params)) > 1 and _uniform_f32(params):
            flat_p, unravel = ravel_pytree(params)
            grads, _ = ravel_pytree(grads)
            params = flat_p
        if weight_decay:
            grads = jax.tree.map(lambda g, p: g + weight_decay * p, grads, params)
        if momentum:
            # torch: buf = mu * buf + g (dampening 0); first step buf = g
            vel = jax.tree.map(
                lambda b, g: momentum * b + g, state.momentum, grads
            )
            step_dir = vel
        else:
            vel = None
            step_dir = grads
        new_params = jax.tree.map(lambda p, d: p - lr * d, params, step_dir)
        if unravel is not None:
            new_params = unravel(new_params)
        return new_params, SGDState(state.step + 1, vel)

    return Optimizer("SGD", init, update)


def make_optimizer(args) -> Optimizer:
    """Optimizer from an ``Arguments`` (reference ``train.py:280-303``)."""
    if args.optimizer == "Adam":
        return adam(args.beta1, args.beta2, weight_decay=args.weight_decay)
    if args.optimizer == "SGD":
        return sgd(momentum=args.momentum, weight_decay=args.weight_decay)
    raise ValueError(f"optimizer {args.optimizer!r} not supported")
