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

# dense integer orders: the optimum usually sits at small alpha for
# the subsampled Gaussian, and a coarse grid (the reference passes
# [1, 10, 100] to torchdp) overstates epsilon by 10-20%
DEFAULT_ALPHAS = tuple(range(2, 65)) + (100, 128, 256)


def _gaussian_tree_noise(k_noise, leaves):
    """One Gaussian draw covering the whole parameter tree, returned as
    per-leaf f32 arrays. Two TPU moves vs naive per-leaf draws:

    - the key is re-keyed onto the ``rbg`` PRNG (hardware
      RngBitGenerator, same move as the augment pipeline's
      ``_fast_prng``) — threefry lane arithmetic put ~4 ms/step of
      pure bit generation on the VPU for ResNet-18's ~11.7M params;
    - ONE flat draw instead of a draw per leaf — per-leaf draws left
      ~3 ms/step of small bits+erfinv fusions on the ghost-step trace;
      the flat draw is one full-width op, and the per-leaf slices fuse
      into the consuming adds.

    Distribution quality is unchanged (same erfinv transform over
    uniform bits; the accountant only cares about the marginal being
    N(0,1)); the reference's torchdp draws from torch's default Philox
    stream, the same posture. Off-TPU the key stays on threefry so CPU
    tests keep the reference stream. Because the noise stream IS the
    privacy mechanism, the rbg key is built from two independent
    threefry splits of ``k_noise`` (full 128-bit keyspace — tiling one
    64-bit key into both halves would narrow it), and
    ``PRIMIA_DP_SECURE_NOISE=1`` keeps the draw on threefry entirely
    for users who want the stronger generator (opacus ships a
    secure-RNG mode for the same reason)."""
    import os

    sizes = [int(np.prod(l.shape)) for l in leaves]
    if (jax.default_backend() != "tpu"
            or os.environ.get("PRIMIA_DP_SECURE_NOISE") == "1"):
        k = k_noise
    else:
        ka, kb = jax.random.split(k_noise)

        def _words(kk):
            d = (kk if jnp.issubdtype(kk.dtype, jnp.uint32)
                 else jax.random.key_data(kk))
            return d.reshape(-1)[:2].astype(jnp.uint32)

        k = jax.random.wrap_key_data(
            jnp.concatenate([_words(ka), _words(kb)]), impl="rbg")
    z = jax.random.normal(k, (sum(sizes),), jnp.float32)
    out, off = [], 0
    for leaf, n in zip(leaves, sizes):
        out.append(jax.lax.slice(z, (off,), (off + n,)).reshape(leaf.shape))
        off += n
    return out


def build_dp_train_step(model_def, optimizer, args, mean, std,
                        class_weights: Optional[np.ndarray] = None,
                        microbatch: Optional[int] = None,
                        donate: bool = True, jit_compile: bool = True):
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
    # augmentation multiplicity (De et al. 2022): each example's
    # gradient is the MEAN over K independently-augmented views,
    # computed before clipping. The clipped unit is still one example,
    # so the accountant and sensitivity are unchanged — the per-example
    # gradient just has ~1/K the augmentation variance.
    K = max(int(getattr(args, "augment_multiplicity", 1)), 1)

    def step(ts: TrainState, key, images_u8, labels, mask, lr):
        k_aug, k_noise = jax.random.split(key)
        if K == 1:
            x = augment(k_aug, images_u8).astype(cdtype)
        else:
            views = jax.vmap(lambda kk: augment(kk, images_u8))(
                jax.random.split(k_aug, K))  # (K, B, H, W, C)
            x = jnp.moveaxis(views, 0, 1).astype(cdtype)  # (B, K, ...)
        B = x.shape[0]
        pc = tree_cast(ts.params, cdtype)

        def ex_loss(p, xi, yi):
            # xi: (H,W,C) for K=1, (K,H,W,C) for multiplicity — the K
            # views forward as one batch; mean CE => grad = mean grad
            xb = xi[None] if K == 1 else xi
            logits, _ = model_def.forward(p, ts.model_state, xb, train=False)
            yb = yi[None] if K == 1 else jnp.broadcast_to(yi, (K,))
            return losses.cross_entropy(
                logits.astype(jnp.float32), yb, weight=w)

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

        flat, treedef = jax.tree.flatten(summed)
        zs = _gaussian_tree_noise(k_noise, flat)
        noised = [
            g + (sigma * z).astype(g.dtype) for g, z in zip(flat, zs)
        ]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        grads = jax.tree.unflatten(treedef, [g / denom for g in noised])

        new_p, new_opt = optimizer.update(grads, ts.opt_state, ts.params, lr)
        return TrainState(new_p, ts.model_state, new_opt), loss_sum / denom

    if not jit_compile:  # federated wrappers vmap the raw step
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ------------------------------------------------- ghost-norm clipping

class _GhostEngine:
    """Engine wrapper for ghost-norm DP: delegates every op to PLAIN,
    but (a) adds a zero "tap" to each parameterized op's output so a
    single ``jax.vjp`` exposes that layer's per-example output
    cotangent, (b) records the op's input + static metadata, from
    which per-example gradient *norms* are computed in closed form —
    without ever materializing per-example gradients (Goodfellow 2015
    for linear/affine; the ghost inner-product trick of Bu et al. 2022
    for convolutions where the T^2 form is cheaper) — and (c) keeps a
    reference to each op's parameter leaves so the clipped-sum
    gradient can be assembled analytically (no second backward pass:
    examples are independent in the eval-mode forward, so each
    example's contribution to any weight gradient scales linearly with
    its loss cotangent).

    ``taps=None`` puts the engine in probe mode (under
    ``jax.eval_shape``): it only collects tap shapes.
    """

    name = "ghost"

    def __init__(self, taps=None):
        self.taps = taps
        self.i = 0
        self.meta = []      # static per-record dicts (same order as taps)
        self.captured = []  # per-record tuples of traced arrays
        self.refs = []      # per-record tuples of parameter leaves
        self.tap_specs = []

    def _tap(self, y):
        if self.taps is None:
            self.tap_specs.append((y.shape, y.dtype))
            return y
        t = self.taps[self.i]
        self.i += 1
        return y + t

    def conv2d(self, x, w, stride: int = 1, padding: int = 0):
        # raw XLA conv, NOT PLAIN.conv2d: the plain engine routes 3x3/s1
        # bf16 convs through a custom_vjp whose backward computes a
        # weight-grad kernel — pass 1 here differentiates wrt the taps
        # only and must stay a pure input-cotangent chain
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        kh, kw, cin, cout = w.shape
        T = y.shape[1] * y.shape[2]
        # T^2 gram form only where T is small enough that the grams
        # (2 * B * T^2 f32) stay tiny and its FLOPs B*T^2*(K+C) beat
        # the per-tap matmuls' B*T*K*C — late ResNet stages. At T=784
        # (layer2) the grams materialize 492 MB each and lose to the
        # per-tap form (measured).
        self.meta.append(dict(kind="conv", stride=stride, padding=padding,
                              wshape=w.shape, ghost=T <= 256))
        self.captured.append((x,))
        self.refs.append((w,))
        return self._tap(y)

    def bias_add(self, x, b):
        self.meta.append(dict(kind="bias"))
        self.captured.append(())
        self.refs.append((b,))
        return self._tap(x + b)

    def affine(self, x, scale, offset):
        y = x * scale + offset
        self.meta.append(dict(kind="affine"))
        self.captured.append((x,))
        self.refs.append((scale, offset))
        return self._tap(y)

    def bn_meta(self, mean, r, gamma, beta):
        """Called by core.batch_norm right after its eval-mode affine:
        upgrades the record so norms/grads chain to (gamma, beta)
        exactly (a = gamma*r, b = beta - mean*gamma*r)."""
        assert self.meta[-1]["kind"] == "affine"
        self.meta[-1]["kind"] = "bn"
        self.captured[-1] = self.captured[-1] + (mean, r)
        self.refs[-1] = (gamma, beta)

    def linear(self, x, w, b=None):
        from primia_tpu.nn.core import PLAIN

        y = PLAIN.linear(x, w, b)
        self.meta.append(dict(kind="linear", bias=b is not None))
        self.captured.append((x,))
        self.refs.append((w,) if b is None else (w, b))
        return self._tap(y)

    def __getattr__(self, name):
        from primia_tpu.nn.core import PLAIN

        return getattr(PLAIN, name)


def _stem_sq_norms(x, dy):
    """Per-example squared wgrad norms of the 7x7/s2/p3 stem via the
    space-to-depth rewrite (``nn/resnet.py:_stem_s2d_conv``): on the
    s2d grid the stem is a 4x4/s1 conv over 4C channels, so the norm
    splits EXACTLY across the 16 unit-stride taps (disjoint K rows, no
    cross terms) — one small einsum per tap, no patch buffer. (History:
    strided (1,2,2,1) slices on the original 7x7 geometry ran at 7% of
    the HBM roof, ~22 ms/step; a materialized 16-slice concat
    (B,H2*W2,16*4C) ran at 22%, 10.6 ms/step + a 1.3 ms dy relayout —
    the per-tap form reads ~1 GB total and needs neither.) The s2d
    kernel embeds the 7x7 weights injectively (8x8 zero-pad at the
    top-left): kernel position (2a+py, 2b+qx) is real iff both >= 1,
    so each tap masks its (4C,) K-rows before the square-sum."""
    B, H, W, C = x.shape
    H2, W2 = H // 2, W // 2
    x2 = (x.reshape(B, H2, 2, W2, 2, C)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(B, H2, W2, 4 * C))
    xp = jnp.pad(x2, ((0, 0), (2, 1), (2, 1), (0, 0)))
    py = np.arange(4 * C) // (2 * C)
    qx = (np.arange(4 * C) // C) % 2
    total = 0.0
    gs = []
    for a in range(4):
        for b in range(4):
            real = (2 * a + py >= 1) & (2 * b + qx >= 1)
            xs = jax.lax.slice(xp, (0, a, b, 0), (B, a + H2, b + W2, 4 * C))
            g = jnp.einsum("bhwi,bhwo->bio", xs, dy,
                           preferred_element_type=jnp.float32)  # (B,4C,co)
            gs.append(g)
            total = total + jnp.einsum(
                "bic,i->b", jnp.square(g), jnp.asarray(real, jnp.float32))
    # the per-example G stack doubles as the weighted-grad source
    # (sweep 2 contracts it with the clip factors instead of running a
    # second weight-grad conv) — see _ghost_weighted_grads. Stored
    # bf16: the stack is pure HBM traffic (~550 MB/step across the
    # per-tap layers at canonical batch); the norms above used the f32
    # values, and the 2^-8 relative error on the clipped SUM is orders
    # below the DP noise it feeds into.
    return total, jnp.stack(gs, axis=1).astype(jnp.bfloat16)  # (B,16,4C,co)


def _ghost_layer_stats(meta, captured, dtaps):
    """Sweep 1: per-example squared L2 norm of the full parameter
    gradient, assembled layer-by-layer from (input, output-cotangent)
    pairs, plus the small per-example per-channel stats ([B, C]) the
    weighted-grad sweep reuses. Returns (sq_norms [B] f32, stats)."""
    f32 = jnp.float32
    total = 0.0
    stats = []
    for m, cap, dy in zip(meta, captured, dtaps):
        kind = m["kind"]
        st = {}
        if kind == "conv":
            (x,) = cap
            kh, kw, cin, cout = m["wshape"]
            s, p = m["stride"], m["padding"]
            B, Ho, Wo = dy.shape[0], dy.shape[1], dy.shape[2]
            if m["ghost"]:
                # T^2 inner-product form: ||G_i||^2 = <XX^T, DD^T>
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
            elif (kh, kw, s, p) == (7, 7, 2, 3) \
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
                sq7, st["G7"] = _stem_sq_norms(x, dy)
                total = total + sq7
            else:
                # per-tap shifted batched matmuls: G's K axis indexes
                # (tap, cin), so the squared norm splits EXACTLY across
                # the kh*kw taps (disjoint rows — no cross terms). The
                # unit-stride slices fuse into the dot reads; no patch
                # buffer. (A grouped-conv per-example wgrad was tried
                # and lowered to 2%-of-roof reduce loops; the T^2 form
                # below it materialized 492 MB grams at layer2 — both
                # measured slower.) The stacked per-example G is KEPT
                # (~550 MB across ResNet-18's per-tap layers): sweep 2
                # contracts it with the clip factors, which replaces
                # those layers' second weight-grad conv outright.
                xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
                gs = []
                for di in range(kh):
                    for dj in range(kw):
                        xs = jax.lax.slice(
                            xp, (0, di, dj, 0),
                            (B, di + (Ho - 1) * s + 1,
                             dj + (Wo - 1) * s + 1, cin),
                            (1, s, s, 1))
                        gs.append(jnp.einsum("bhwi,bhwo->bio", xs, dy,
                                             preferred_element_type=f32))
                G = jnp.stack(gs, axis=1)  # (B, kh*kw, cin, cout)
                total = total + jnp.sum(jnp.square(G), axis=(1, 2, 3))
                st["G"] = G.astype(jnp.bfloat16)  # see _stem_sq_norms note
        elif kind == "bias":
            df = dy.astype(f32)
            gb = jnp.sum(df, axis=tuple(range(1, dy.ndim - 1))) \
                if dy.ndim > 2 else df
            total = total + jnp.sum(jnp.square(gb), axis=-1)
            st["gb"] = gb
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
            st["ga"], st["gb"] = ga, gb
        stats.append(st)
    return total, stats


def _ghost_weighted_grads(meta, captured, dtaps, stats, factor):
    """Sweep 2: the clipped-and-summed gradient sum_i c_i * g_i per
    parameter, assembled from the captured tensors — examples are
    independent in the eval-mode forward, so each layer's pass-1
    cotangent scales linearly per example and NO second backward pass
    is needed. Conv weight grads go through the layer's own conv-vjp
    with the c-scaled cotangent (XLA's native, efficient weight-grad
    conv); everything else is a small einsum over the [B, C] stats.
    Returns a list of (param_leaf_refs, grads) per record."""
    from primia_tpu.nn.core import PLAIN

    f32 = jnp.float32
    out = []
    for m, cap, dy, st in zip(meta, captured, dtaps, stats):
        kind = m["kind"]
        if kind == "conv":
            (x,) = cap
            kh, kw = m["wshape"][:2]
            s, p = m["stride"], m["padding"]
            if "G" in st:
                # per-tap layers: sweep 1 already materialized the
                # per-example weight gradient G (B, kh*kw, cin, cout) —
                # the clipped sum is one contraction, no second conv
                gw = jnp.einsum("b,btic->tic", factor.astype(jnp.bfloat16),
                                st["G"], preferred_element_type=jnp.float32)
                out.append((gw.reshape(m["wshape"]),))
                continue
            if "G7" in st:
                # stem: reassemble the 16 s2d tap-G blocks onto the 8x8
                # embedded kernel grid (position (2a+py, 2b+qx)) and
                # crop the zero-pad row/col to the true 7x7 grad
                C, co = m["wshape"][2], m["wshape"][3]
                ws = jnp.einsum("b,btic->tic", factor.astype(jnp.bfloat16),
                                st["G7"], preferred_element_type=jnp.float32)
                ws = (ws.reshape(4, 4, 2, 2, C, co)
                      .transpose(0, 2, 1, 3, 4, 5).reshape(8, 8, C, co))
                out.append((ws[1:, 1:],))
                continue
            dyc = (dy.astype(f32)
                   * factor[(...,) + (None,) * (dy.ndim - 1)]).astype(dy.dtype)
            if ((kh, kw, s, p) == (3, 3, 1, 1) and x.dtype == jnp.bfloat16
                    and 128 <= x.shape[-1] <= 256
                    and 128 <= m["wshape"][-1] <= 256):
                from primia_tpu.ops.pallas_wgrad import (
                    conv3x3_wgrad_pallas_v2, use_pallas_wgrad)

                if use_pallas_wgrad():
                    # straight to the Pallas one-read wgrad kernel (v2:
                    # VMEM halo shifts, no HBM pads) — no data-grad
                    # conv to rely on DCE to remove; C=512 stays on
                    # XLA's wgrad (already at its MXU floor)
                    out.append((conv3x3_wgrad_pallas_v2(x, dyc)
                                .astype(x.dtype),))
                    continue
            conv_fn = lambda w_: PLAIN.conv2d(x, w_, stride=s, padding=p)
            _, vjp_w = jax.vjp(conv_fn, jnp.zeros(m["wshape"], x.dtype))
            (gw,) = vjp_w(dyc)
            out.append((gw,))
        elif kind == "bias":
            out.append((jnp.einsum("b,bc->c", factor, st["gb"]),))
        elif kind == "linear":
            (x,) = cap
            xc = x.astype(f32) * factor[:, None]
            df = dy.astype(f32)
            gw = jnp.einsum("bk,bc->kc", xc, df)
            out.append((gw, jnp.einsum("b,bc->c", factor, df))
                       if m["bias"] else (gw,))
        else:  # "bn" / "affine"
            out.append((jnp.einsum("b,bc->c", factor, st["ga"]),
                        jnp.einsum("b,bc->c", factor, st["gb"])))
    return out


def build_ghost_dp_train_step(model_def, optimizer, args, mean, std,
                              class_weights: Optional[np.ndarray] = None,
                              donate: bool = True, jit_compile: bool = True):
    """Ghost-clipping DP step: same contract and DP semantics as
    ``build_dp_train_step`` (clip each per-example grad to
    ``max_grad_norm``, sum, noise, /batch), but per-example gradients
    are never materialized — and there is only ONE backward pass:

    1. ``jax.vjp`` over the zero "taps" (cotangent = ones) exposes
       every layer's per-example output cotangent; the parameters are
       NOT vjp inputs, so the backward contains no weight-gradient
       convs at all — just the input-cotangent chain.
    2. closed-form per-layer inner products (``_ghost_layer_stats``)
       give each example's full gradient norm, hence its clip factor.
    3. because examples are independent in the eval-mode forward, the
       cotangent of example i under loss weighting c_i is c_i times
       its pass-1 cotangent — so the clipped-and-summed weight
       gradients are assembled analytically from the captured
       (input, cotangent) pairs (``_ghost_weighted_grads``), exactly.

    Total cost ~ one forward + one input-grad backward + the norm
    einsums + a weight-grad sweep for the layers whose norms came from
    grams (the per-tap layers reuse their norm-sweep G matrices, so
    their weighted grad is a single contraction). Measured anchors:
    BASELINE.md anchor 4. Class-weight
    note: per-example hard-label CE normalizes each example's weight
    away (w_y*ce/w_y), matching the microbatched path's semantics
    exactly.
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

        pc = tree_cast(ts.params, cdtype)
        # (path, leaf) pairs held strongly: leaf ids key the analytic
        # gradient assembly back onto the parameter tree
        pc_pairs, pc_treedef = jax.tree_util.tree_flatten_with_path(pc)

        def run(taps):
            ge = _GhostEngine(taps)
            holder["ge"] = ge
            logits, _ = model_def.forward(pc, ms, x, E=ge, train=False)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=1)
            lvec = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
            return lvec, tuple(ge.captured)

        # probe (abstract eval, no FLOPs) for the tap shapes
        probe = _GhostEngine(None)

        def probe_fn(p_, ms_, x_):
            logits, _ = model_def.forward(p_, ms_, x_, E=probe, train=False)
            return logits

        sds = lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype)
        jax.eval_shape(probe_fn, jax.tree.map(sds, pc),
                       jax.tree.map(sds, ms), sds(x))
        taps = tuple(jnp.zeros(s, d) for (s, d) in probe.tap_specs)

        lvec, vjp_fn, captured = jax.vjp(run, taps, has_aux=True)
        (dtaps,) = vjp_fn(jnp.ones_like(lvec))
        ge = holder["ge"]
        sq, layer_stats = _ghost_layer_stats(ge.meta, captured, dtaps)
        factor = jnp.minimum(1.0, clip / jnp.sqrt(sq + 1e-12)) * mask
        contribs = _ghost_weighted_grads(ge.meta, captured, dtaps,
                                         layer_stats, factor)
        grad_map = {}
        for refs, gs in zip(ge.refs, contribs):
            for ref, g in zip(refs, gs):
                prev = grad_map.get(id(ref))
                g = g.astype(jnp.float32)
                grad_map[id(ref)] = g if prev is None else prev + g
        flat = []
        for _, leaf in pc_pairs:
            g = grad_map.pop(id(leaf), None)
            flat.append(jnp.zeros(leaf.shape, jnp.float32) if g is None else g)
        assert not grad_map, (
            "ghost DP: an engine op received a parameter that is not a "
            "leaf of the params tree — its gradient cannot be placed")
        summed = jax.tree.unflatten(pc_treedef, flat)
        loss_sum = jnp.sum(lvec * mask)

        flat, treedef = jax.tree.flatten(summed)
        zs = _gaussian_tree_noise(k_noise, flat)
        noised = [
            g.astype(jnp.float32) + sigma * z for g, z in zip(flat, zs)
        ]
        denom = jnp.maximum(jnp.sum(mask), 1.0)
        grads = jax.tree.unflatten(treedef, [g / denom for g in noised])

        new_p, new_opt = optimizer.update(grads, ts.opt_state, ts.params, lr)
        return TrainState(new_p, ts.model_state, new_opt), loss_sum / denom

    if not jit_compile:  # federated wrappers vmap the raw step
        return step
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def select_train_step(model_def, optimizer, args, mean, std,
                      class_weights: Optional[np.ndarray] = None,
                      donate: bool = True, jit_compile: bool = True):
    """The train step the config asks for: plain, or DP-SGD when
    ``args.differentially_private`` (ghost-norm clipping by default,
    ``PRIMIA_DP_GHOST=0`` restores the microbatched per-example path).

    One selection point shared by the local loop, the simulated
    federated loop, and the grid node's ``train_round`` verb — the
    reference instead hard-exits on ``--train_federated`` + DP
    (``train.py:310``); here per-node DP-SGD composes with secure
    aggregation because the DP step has the same ``(ts, key, imgs,
    labels, mask, lr)`` contract as the plain one and vmaps over the
    node axis.
    """
    import os

    from primia_tpu.train.steps import build_train_step

    if not args.differentially_private:
        return build_train_step(model_def, optimizer, args, mean, std,
                                class_weights, donate=donate,
                                jit_compile=jit_compile)
    if getattr(args, "augment_multiplicity", 1) > 1:
        # multiplicity needs per-example MEAN-over-views gradients; the
        # ghost engine's closed-form norms would need cross-view inner
        # products, so the vmap'd microbatch path carries this mode
        return build_dp_train_step(model_def, optimizer, args, mean, std,
                                   class_weights, donate=donate,
                                   jit_compile=jit_compile)
    if os.environ.get("PRIMIA_DP_GHOST", "1") != "0":
        return build_ghost_dp_train_step(model_def, optimizer, args, mean,
                                         std, class_weights, donate=donate,
                                         jit_compile=jit_compile)
    return build_dp_train_step(model_def, optimizer, args, mean, std,
                               class_weights, donate=donate,
                               jit_compile=jit_compile)


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
    if noise_multiplier <= 0:
        return float("inf"), None  # no noise -> no DP guarantee
    best = (float("inf"), None)
    for a in alphas:
        if a < 2:
            continue
        rdp = steps * rdp_sampled_gaussian(sample_rate, noise_multiplier, a)
        eps = rdp + math.log(1 / delta) / (a - 1)
        if eps < best[0]:
            best = (eps, a)
    return best
