"""DP-SGD: per-example clipping + Gaussian noise, with RDP accounting.

Reference (``train.py:326-334``): attaches ``torchdp.PrivacyEngine``
with ``noise_multiplier=1.3, max_grad_norm=1.0, alphas=[1, 10, 100]``
to the optimizer (local training only — the federated branch ``exit()``s
first, ``train.py:310``); epsilon is never reported.

TPU redesign: per-example gradients come from a ``vmap``-ed ``grad``
inside the jitted step (no autograd hooks), clipped and summed in
chunks via ``lax.scan`` so the per-example gradient buffer stays at
``microbatch x |params|``. Noise std = noise_multiplier * max_grad_norm
added to the summed clipped gradient, then scaled by 1/batch (torchdp
semantics). BatchNorm runs on its running statistics inside the
per-example closure (batch statistics would couple examples and break
per-sample gradient isolation — the same restriction opacus/torchdp
enforce by rejecting BN modules).

As an improvement over the reference, ``rdp_epsilon`` implements the
subsampled-Gaussian RDP accountant (Mironov et al. 2019) so training
can report (epsilon, best_alpha) per epoch.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from primia_tpu.ops.augment import AugmentConfig, build_augment_fn
from primia_tpu.train import losses
from primia_tpu.train.steps import TrainState

DEFAULT_ALPHAS = (2, 4, 8, 16, 32, 64, 100)


def build_dp_train_step(model_def, optimizer, args, mean, std,
                        class_weights: Optional[np.ndarray] = None,
                        microbatch: Optional[int] = None,
                        donate: bool = True):
    """Jitted DP step: ``step(ts, key, images_u8, labels, mask, lr) ->
    (ts, loss)`` — drop-in for ``build_train_step``.

    Per-example gradients are computed against the bf16 compute-dtype
    copy of the parameters (like the non-private step): the dominant
    cost is streaming ``microbatch x |params|`` per-example gradient
    buffers through HBM, and bf16 halves that traffic. Clip factors,
    the accumulator, the noise, and the optimizer stay f32; DP noise
    (sigma ~ 1.3) dwarfs the bf16 quantization error. ``microbatch``
    defaults to $PRIMIA_DP_MICROBATCH or 8 (measured sweep on v5e for
    ResNet-18@224 batch 200 with the full canonical augment fused in:
    mb=2/4/8/16 -> 606/1,033/1,425/1,111 img/s — the per-example grad
    buffers are pure HBM traffic, so smaller chunks that stay resident
    win).
    """
    import os

    from primia_tpu.nn.core import tree_cast
    from primia_tpu.train.steps import resolve_compute_dtype

    if microbatch is None:
        microbatch = int(os.environ.get("PRIMIA_DP_MICROBATCH", 8))
    cfg = AugmentConfig.from_args(args)
    augment = build_augment_fn(cfg, mean, std, model_def.in_channels)
    w = jnp.asarray(class_weights) if (args.weight_classes and class_weights is not None) else None
    nc = model_def.num_classes
    clip = args.max_grad_norm
    sigma = args.noise_multiplier * args.max_grad_norm
    cdtype = resolve_compute_dtype(args)

    def step(ts: TrainState, key, images_u8, labels, mask, lr):
        k_aug, k_noise = jax.random.split(key)
        x = augment(k_aug, images_u8).astype(cdtype)
        B = x.shape[0]
        pc = tree_cast(ts.params, cdtype)

        def ex_loss(p, xi, yi):
            logits, _ = model_def.forward(
                p, ts.model_state, xi[None], train=False
            )
            return losses.cross_entropy(
                logits.astype(jnp.float32), yi[None], weight=w)

        def clipped_chunk(carry, chunk):
            xs, ys, ms = chunk
            ls, gs = jax.vmap(
                jax.value_and_grad(ex_loss), in_axes=(None, 0, 0)
            )(pc, xs, ys)
            sq = sum(
                jnp.sum(
                    jnp.square(g.reshape(g.shape[0], -1).astype(jnp.float32)),
                    axis=1)
                for g in jax.tree.leaves(gs)
            )
            factor = jnp.minimum(1.0, clip / jnp.sqrt(sq + 1e-12)) * ms
            acc, loss_acc = carry
            acc = jax.tree.map(
                lambda a, g: a + jnp.tensordot(
                    factor, g.astype(jnp.float32), axes=1),
                acc, gs,
            )
            return (acc, loss_acc + jnp.sum(ls * ms)), None

        # pad (never truncate) to a whole number of chunks: padded rows
        # carry mask 0, so their clip factor and loss contribution are 0
        mb = min(microbatch, B)
        n_chunks = -(-B // mb)
        pad = n_chunks * mb - B
        chunks = jax.tree.map(
            lambda t: jnp.pad(t, ((0, pad),) + ((0, 0),) * (t.ndim - 1))
            .reshape(n_chunks, mb, *t.shape[1:]),
            (x, labels, mask),
        )
        zero = jax.tree.map(jnp.zeros_like, ts.params)
        (summed, loss_sum), _ = jax.lax.scan(clipped_chunk, (zero, 0.0), chunks)

        nkeys = jax.random.split(k_noise, len(jax.tree.leaves(summed)))
        flat, treedef = jax.tree.flatten(summed)
        noised = [
            g + sigma * jax.random.normal(k, g.shape, g.dtype)
            for g, k in zip(flat, nkeys)
        ]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        grads = jax.tree.unflatten(treedef, [g / denom for g in noised])

        new_p, new_opt = optimizer.update(grads, ts.opt_state, ts.params, lr)
        return TrainState(new_p, ts.model_state, new_opt), loss_sum / denom

    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ------------------------------------------------------------- accounting

def _log_comb(n: int, k: int) -> float:
    return math.lgamma(n + 1) - math.lgamma(k + 1) - math.lgamma(n - k + 1)


def rdp_sampled_gaussian(q: float, sigma: float, alpha: int) -> float:
    """RDP of the subsampled Gaussian mechanism at integer order alpha
    (Mironov-Talwar-Zhang 2019, eq. for integer alpha)."""
    if q == 0:
        return 0.0
    if q == 1.0:
        return alpha / (2 * sigma ** 2)
    logs = []
    for k in range(alpha + 1):
        logs.append(
            _log_comb(alpha, k)
            + k * math.log(q)
            + (alpha - k) * math.log(1 - q)
            + (k * k - k) / (2 * sigma ** 2)
        )
    m = max(logs)
    return (m + math.log(sum(math.exp(l - m) for l in logs))) / (alpha - 1)


def rdp_epsilon(
    *,
    noise_multiplier: float,
    sample_rate: float,
    steps: int,
    delta: float = 1e-5,
    alphas: Sequence[int] = DEFAULT_ALPHAS,
):
    """(epsilon, best_alpha) after ``steps`` subsampled-Gaussian steps."""
    best = (float("inf"), None)
    for a in alphas:
        if a < 2:
            continue
        rdp = steps * rdp_sampled_gaussian(sample_rate, noise_multiplier, a)
        eps = rdp + math.log(1 / delta) / (a - 1)
        if eps < best[0]:
            best = (eps, a)
    return best
