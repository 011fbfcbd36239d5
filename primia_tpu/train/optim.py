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
        z = lambda: jax.tree.map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), z(), z())

    def update(grads, state, params, lr):
        step = state.step + 1
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
        return new_params, AdamState(step, mu, nu)

    return Optimizer("Adam", init, update)


def sgd(momentum: float = 0.0, weight_decay: float = 0.0) -> Optimizer:
    def init(params):
        vel = jax.tree.map(jnp.zeros_like, params) if momentum else None
        return SGDState(jnp.zeros((), jnp.int32), vel)

    def update(grads, state, params, lr):
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
        return new_params, SGDState(state.step + 1, vel)

    return Optimizer("SGD", init, update)


def make_optimizer(args) -> Optimizer:
    """Optimizer from an ``Arguments`` (reference ``train.py:280-303``)."""
    if args.optimizer == "Adam":
        return adam(args.beta1, args.beta2, weight_decay=args.weight_decay)
    if args.optimizer == "SGD":
        return sgd(momentum=args.momentum, weight_decay=args.weight_decay)
    raise ValueError(f"optimizer {args.optimizer!r} not supported")
