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


# ------------------------------------------------- ghost-norm clipping

class _GhostEngine:
    """Engine wrapper for ghost-norm DP: delegates every op to PLAIN,
    but (a) adds a zero "tap" to each parameterized op's output so a
    single ``jax.vjp`` exposes that layer's per-example output
    cotangent, and (b) records the op's input + static metadata, from
    which per-example gradient *norms* are computed in closed form —
    without ever materializing per-example gradients (Goodfellow 2015
    for linear/affine; the ghost inner-product trick of Bu et al. 2022
    for convolutions where the T^2 form is cheaper).

    ``taps=None`` puts the engine in probe mode (under
    ``jax.eval_shape``): it only collects tap shapes.
    """

    name = "ghost"

    def __init__(self, taps=None):
        self.taps = taps
        self.i = 0
        self.meta = []      # static per-record dicts (same order as taps)
        self.captured = []  # per-record tuples of traced arrays
        self.tap_specs = []

    def _tap(self, y):
        if self.taps is None:
            self.tap_specs.append((y.shape, y.dtype))
            return y
        t = self.taps[self.i]
        self.i += 1
        return y + t

    def conv2d(self, x, w, stride: int = 1, padding: int = 0):
        from primia_tpu.nn.core import PLAIN

        y = PLAIN.conv2d(x, w, stride=stride, padding=padding)
        kh, kw, cin, cout = w.shape
        T = y.shape[1] * y.shape[2]
        K = kh * kw * cin
        # ghost (T^2) form iff its FLOPs beat materializing the
        # per-example weight gradient: B*T^2*(K+C) vs B*T*K*C
        self.meta.append(dict(kind="conv", stride=stride, padding=padding,
                              wshape=w.shape, ghost=T * (K + cout) < K * cout))
        self.captured.append((x,))
        return self._tap(y)

    def bias_add(self, x, b):
        self.meta.append(dict(kind="bias"))
        self.captured.append(())
        return self._tap(x + b)

    def affine(self, x, scale, offset):
        y = x * scale + offset
        self.meta.append(dict(kind="affine"))
        self.captured.append((x,))
        return self._tap(y)

    def bn_meta(self, mean, r):
        """Called by core.batch_norm right after its eval-mode affine:
        upgrades the record so norms chain to (gamma, beta) exactly."""
        assert self.meta[-1]["kind"] == "affine"
        self.meta[-1]["kind"] = "bn"
        self.captured[-1] = self.captured[-1] + (mean, r)

    def linear(self, x, w, b=None):
        from primia_tpu.nn.core import PLAIN

        y = PLAIN.linear(x, w, b)
        self.meta.append(dict(kind="linear", bias=b is not None))
        self.captured.append((x,))
        return self._tap(y)

    def __getattr__(self, name):
        from primia_tpu.nn.core import PLAIN

        return getattr(PLAIN, name)


def _ghost_sq_norms(meta, captured, dtaps):
    """Per-example squared L2 norm of the full parameter gradient,
    assembled layer-by-layer from (input, output-cotangent) pairs."""
    from primia_tpu.nn.core import PLAIN

    f32 = jnp.float32
    total = 0.0
    for m, cap, dy in zip(meta, captured, dtaps):
        kind = m["kind"]
        if kind == "conv":
            (x,) = cap
            kh, kw, cin, cout = m["wshape"]
            s, p = m["stride"], m["padding"]
            B = x.shape[0]
            if m["ghost"]:
                pat = jax.lax.conv_general_dilated_patches(
                    x, (kh, kw), (s, s), ((p, p), (p, p)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                pat = pat.reshape(B, -1, kh * kw * cin)
                dyf = dy.reshape(B, -1, cout)
                sx = jnp.einsum("btk,bsk->bts", pat, pat,
                                preferred_element_type=f32)
                sd = jnp.einsum("btc,bsc->bts", dyf, dyf,
                                preferred_element_type=f32)
                total = total + jnp.einsum("bts,bts->b", sx, sd)
            else:
                wz = jnp.zeros(m["wshape"], x.dtype)

                def wgrad_sq(xi, dyi, _s=s, _p=p, _wz=wz):
                    _, vjp = jax.vjp(
                        lambda w: PLAIN.conv2d(xi[None], w, stride=_s,
                                               padding=_p), _wz)
                    (g,) = vjp(dyi[None])
                    return jnp.sum(jnp.square(g.astype(f32)))

                total = total + jax.vmap(wgrad_sq)(x, dy)
        elif kind == "bias":
            df = dy.astype(f32)
            gb = jnp.sum(df, axis=tuple(range(1, dy.ndim - 1))) \
                if dy.ndim > 2 else df
            total = total + jnp.sum(jnp.square(gb), axis=-1)
        elif kind == "linear":
            (x,) = cap
            xs = jnp.sum(jnp.square(x.astype(f32)), axis=-1)
            ds = jnp.sum(jnp.square(dy.astype(f32)), axis=-1)
            total = total + xs * ds + (ds if m["bias"] else 0.0)
        else:  # "bn" / plain "affine": y = a*x + b channelwise
            x = cap[0]
            sp = tuple(range(1, dy.ndim - 1))
            xf, df = x.astype(f32), dy.astype(f32)
            ga = jnp.sum(xf * df, axis=sp) if dy.ndim > 2 else xf * df
            gb = jnp.sum(df, axis=sp) if dy.ndim > 2 else df
            if kind == "bn":
                mean, r = cap[1], cap[2]
                # a = gamma*r, b = beta - mean*gamma*r =>
                # g_gamma = r*(g_a - mean*g_b), g_beta = g_b
                ga = r * (ga - mean * gb)
            total = total + jnp.sum(jnp.square(ga) + jnp.square(gb), axis=-1)
    return total


def build_ghost_dp_train_step(model_def, optimizer, args, mean, std,
                              class_weights: Optional[np.ndarray] = None,
                              donate: bool = True):
    """Ghost-clipping DP step: same contract and DP semantics as
    ``build_dp_train_step`` (clip each per-example grad to
    ``max_grad_norm``, sum, noise, /batch), but per-example gradients
    are never materialized. One forward, then two backward passes
    through a single ``jax.vjp``:

    1. cotangent = ones: exposes every layer's per-example output
       cotangent via zero "taps" added to layer outputs; closed-form
       per-layer norms (``_ghost_sq_norms``) give each example's full
       gradient norm.
    2. cotangent = clip factors: because examples are independent in
       the eval-mode forward, ``vjp(c)`` IS the clipped-and-summed
       gradient — exactly, not approximately.

    XLA dead-code-eliminates the unused weight-gradient half of pass 1
    and the unused tap cotangents of pass 2, so the step costs about
    one forward + two input-gradient backward sweeps + one weight
    sweep: ~2x the non-private step, vs ~3.5x for the microbatched
    per-example path. Class-weight note: per-example hard-label CE
    normalizes each example's weight away (w_y*ce/w_y), matching the
    microbatched path's semantics exactly.
    """
    from primia_tpu.nn.core import tree_cast
    from primia_tpu.train.steps import resolve_compute_dtype

    cfg = AugmentConfig.from_args(args)
    augment = build_augment_fn(cfg, mean, std, model_def.in_channels)
    clip = args.max_grad_norm
    sigma = args.noise_multiplier * args.max_grad_norm
    cdtype = resolve_compute_dtype(args)

    def step(ts: TrainState, key, images_u8, labels, mask, lr):
        k_aug, k_noise = jax.random.split(key)
        x = augment(k_aug, images_u8).astype(cdtype)
        ms = ts.model_state
        holder = {}

        def run(p, taps):
            ge = _GhostEngine(taps)
            holder["ge"] = ge
            pc = tree_cast(p, cdtype)
            logits, _ = model_def.forward(pc, ms, x, E=ge, train=False)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
            lvec = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return lvec, tuple(ge.captured)

        # probe (abstract eval, no FLOPs) for the tap shapes
        probe = _GhostEngine(None)

        def probe_fn(p, ms_, x_):
            pc = tree_cast(p, cdtype)
            logits, _ = model_def.forward(pc, ms_, x_, E=probe, train=False)
            return logits

        sds = lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype)
        jax.eval_shape(probe_fn, jax.tree.map(sds, ts.params),
                       jax.tree.map(sds, ms), sds(x))
        taps = tuple(jnp.zeros(s, d) for (s, d) in probe.tap_specs)

        lvec, vjp_fn, captured = jax.vjp(run, ts.params, taps, has_aux=True)
        _, dtaps = vjp_fn(jnp.ones_like(lvec))
        sq = _ghost_sq_norms(holder["ge"].meta, captured, dtaps)
        factor = jnp.minimum(1.0, clip / jnp.sqrt(sq + 1e-12)) * mask
        summed, _ = vjp_fn(factor)
        loss_sum = jnp.sum(lvec * mask)

        nkeys = jax.random.split(k_noise, len(jax.tree.leaves(summed)))
        flat, treedef = jax.tree.flatten(summed)
        noised = [
            g.astype(jnp.float32) + sigma * jax.random.normal(k, g.shape)
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
