"""The full PriMIA augmentation pipeline as one batched XLA program.

Reference (``torchlib/dataloader.py:138-217``): torchvision RandomAffine
(rotation/translate/scale/shear) followed by an albumentations chain —
Resize -> RandomCrop -> [CLAHE] -> VerticalFlip -> {gamma, brightness,
blur, elastic, optical distortion, grid distortion, grid shuffle, HSV,
invert, cutout, shadow, fog, sun flare, solarize, equalize, grid
dropout} -> GaussNoise -> ToFloat -> Normalize(mean, std) — executed
per image on CPU.

Here the same chain is a single jit-compiled batched function: every
stochastic transform draws its parameters from a split of one PRNG key
and is gated per-sample with ``jnp.where`` (both branches compute; the
VPU is not the bottleneck). The three geometric distortions (elastic /
optical / grid) are *fused into one dense warp* by summing their
displacement fields — one resample instead of three.

Inputs are uint8 NHWC batches (host-decoded, host-resized to
``inference_resolution``); output is normalized float32 NHWC at
``train_resolution``.

Photometric weather effects (shadow/fog/sun flare) are simplified
TPU-friendly analogues of the albumentations versions; the augmentation
distribution — not its exact pixels — is the parity contract.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from primia_tpu.ops import image as I


class AugmentConfig(NamedTuple):
    # geometry (torchvision RandomAffine)
    rotation: float = 0.0
    translate: float = 0.0
    scale: float = 0.0
    shear: float = 0.0
    # albumentations block
    train_resolution: int = 224
    inference_resolution: int = 224
    clahe: bool = False
    overall_prob: float = 1.0
    individual_prob: float = 1.0
    noise_std: float = 0.0
    noise_prob: float = 0.0
    randomgamma: bool = False
    randombrightness: bool = False
    blur: bool = False
    elastic: bool = False
    optical_distortion: bool = False
    grid_distortion: bool = False
    grid_shuffle: bool = False
    hsv: bool = False
    invert: bool = False
    cutout: bool = False
    shadow: bool = False
    fog: bool = False
    sun_flare: bool = False
    solarize: bool = False
    equalize: bool = False
    grid_dropout: bool = False

    @classmethod
    def from_args(cls, args) -> "AugmentConfig":
        return cls(
            rotation=args.rotation, translate=args.translate, scale=args.scale,
            shear=args.shear, train_resolution=args.train_resolution,
            inference_resolution=args.inference_resolution, clahe=args.clahe,
            overall_prob=args.albu_prob, individual_prob=args.individual_albu_probs,
            noise_std=args.noise_std, noise_prob=args.noise_prob,
            randomgamma=args.randomgamma, randombrightness=args.randombrightness,
            blur=args.blur, elastic=args.elastic,
            optical_distortion=args.optical_distortion,
            grid_distortion=args.grid_distortion, grid_shuffle=args.grid_shuffle,
            hsv=args.hsv, invert=args.invert, cutout=args.cutout,
            shadow=args.shadow, fog=args.fog, sun_flare=args.sun_flare,
            solarize=args.solarize, equalize=args.equalize,
            grid_dropout=args.grid_dropout,
        )


def _fast_prng(key):
    """Re-key onto the ``rbg`` PRNG on TPU: bulk draws (the image-sized
    GaussNoise field, displacement fields) then use the hardware
    RngBitGenerator instead of threefry lane arithmetic — measured ~4 ms
    off the augment step at 256x224x224. Augmentation only needs
    distributional randomness, so the stream change is immaterial;
    determinism per input key is preserved. Off-TPU returns the key
    unchanged (keeps CPU tests on the reference threefry stream)."""
    if jax.default_backend() != "tpu":
        return key
    data = key if jnp.issubdtype(key.dtype, jnp.uint32) else jax.random.key_data(key)
    data = jnp.tile(data.reshape(-1), 2)[:4].astype(jnp.uint32)
    return jax.random.wrap_key_data(data, impl="rbg")


def _gate(key, p, B):
    return jax.random.bernoulli(key, p, (B,))


def _blend(mask, new, old):
    """Per-sample select: mask (B,), tensors (B,H,W,C)."""
    return jnp.where(mask[:, None, None, None], new, old)


def _affine_mats(key, cfg: AugmentConfig, B) -> jnp.ndarray:
    """Inverse affine matrices (B,2,3), torchvision RandomAffine ranges."""
    kr, kt, ks, kh = jax.random.split(key, 4)
    deg = jax.random.uniform(kr, (B,), minval=-cfg.rotation,
                             maxval=cfg.rotation, dtype=jnp.float32)
    theta = deg * (math.pi / 180.0)
    # translate fraction of width/height
    t = jax.random.uniform(kt, (B, 2), minval=-cfg.translate,
                           maxval=cfg.translate, dtype=jnp.float32)
    s = jax.random.uniform(ks, (B,), minval=1.0 - cfg.scale,
                           maxval=1.0 + cfg.scale, dtype=jnp.float32)
    shear = jax.random.uniform(kh, (B,), minval=-cfg.shear, maxval=cfg.shear,
                               dtype=jnp.float32) * (
        math.pi / 180.0
    )
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    # forward A = R(theta) @ Shear_x(shear) @ s*Id ; invert analytically
    a = cos * s
    b = (cos * jnp.tan(shear) - sin) * s
    c = sin * s
    d = (sin * jnp.tan(shear) + cos) * s
    det = a * d - b * c
    ia, ib, ic, id_ = d / det, -b / det, -c / det, a / det
    H = cfg.inference_resolution
    tx, ty = t[:, 0] * H, t[:, 1] * H
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    return jnp.stack(
        [jnp.stack([ia, ib, itx], -1), jnp.stack([ic, id_, ity], -1)], axis=1
    )


def _hsv_impl(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn + 1e-12
    h = jnp.where(
        mx == r, (g - b) / d % 6.0, jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0)
    ) / 6.0
    s = d / (mx + 1e-12)
    return jnp.stack([h, s, mx], axis=-1)


def _hsv_to_rgb(x):
    h, s, v = x[..., 0] * 6.0, x[..., 1], x[..., 2]
    i = jnp.floor(h)
    f = h - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def _upsample_matrix(n_out: int, n_in: int) -> jnp.ndarray:
    """(n_out, n_in) bilinear interpolation weights, align_corners=False
    (matches ``jax.image.resize(method="bilinear")``)."""
    scale = n_in / n_out
    pos = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * scale - 0.5
    idx = jnp.arange(n_in, dtype=jnp.float32)
    w = jnp.clip(1.0 - jnp.abs(pos[:, None] - idx[None, :]), 0.0, 1.0)
    # edge handling: resize clamps sample positions, so renormalize rows
    return w / jnp.sum(w, axis=1, keepdims=True)


def _coarse_field(key, B, H, W, coarse: int, amp) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Smooth random displacement fields (dy, dx), each (B,H,W)*amp px.

    Bilinear upsampling as two explicit weight-matrix contractions —
    ``jax.image.resize``'s general lowering costs ~30 ms for a
    (200,2,28,28)->(...,224,224) field on TPU; the separable matmul form
    rides the MXU (<1 ms). Distributionally identical (same tent
    interpolation of the same uniform draws)."""
    f = jax.random.uniform(key, (B, 2, coarse, coarse), minval=-1.0,
                           maxval=1.0, dtype=jnp.float32)
    wh = _upsample_matrix(H, coarse)
    ww = _upsample_matrix(W, coarse)
    up = jnp.einsum("hi,bcij,wj->bchw", wh, f, ww)
    return up[:, 0] * amp[:, None, None], up[:, 1] * amp[:, None, None]


def build_augment_fn(cfg: AugmentConfig, mean, std, channels: int):
    """Returns jittable ``augment(key, u8_batch) -> float32 batch``.

    ``u8_batch``: (B, inference_res, inference_res, C) uint8.
    Output: (B, train_res, train_res, C) float32, normalized.
    """
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, channels)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, channels)
    R = cfg.inference_resolution
    Rt = cfg.train_resolution

    def augment(key, batch_u8):
        B = batch_u8.shape[0]
        # pixel pipeline runs in bfloat16 on TPU (halves VPU/bandwidth
        # cost; augmentation is distributional, 8 mantissa bits suffice);
        # the final normalize promotes back to float32
        dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
        # vertical flip, hoisted from its reference position (after
        # CLAHE, albumentations order) to the uint8 input: a u8
        # reverse+select fuses into the dtype-convert pass instead of
        # costing two full bf16 passes mid-pipeline. Exactly
        # distribution-preserving: flip conjugates the affine draw
        # (theta, shear, ty sign-flip — all symmetric uniforms), mirrors
        # the crop offset (uniform), and commutes with CLAHE outright
        # (uniform tile grid + mirrored bilinear weights — exact when the
        # crop resolution divides the tile count; with ceil tiling the
        # bottom/right edge padding makes flipped images see a slightly
        # asymmetric tile grid at non-divisible resolutions, a
        # distributional nit only; canonical 224/8 is exact). Same gate
        # key (keys[3]) and probability as before.
        keys = jax.random.split(_fast_prng(key), 64)
        flip_m = _gate(keys[3], cfg.individual_prob, B) & _gate(
            keys[2], cfg.overall_prob, B)
        batch_u8 = jnp.where(flip_m[:, None, None, None],
                             batch_u8[:, ::-1], batch_u8)
        x = batch_u8.astype(dt) / jnp.asarray(255.0, dt)
        # 64 keys, non-overlapping regions: 0-2 affine/crop/block-gate,
        # 3-19 per-op gates, 20-21 noise gate/field, 24-43 per-op
        # parameter draws (gate idx + 24), 44-49 displacement
        # fields/amplitudes. (A previous 32-key layout double-booked
        # keys between field draws and gates, correlating augmentations.)

        # 1. torchvision RandomAffine. When the config's matrix ranges
        # are well-conditioned (``twopass_safe``), the warp runs as the
        # two-pass shear decomposition — on TPU a Pallas lane-gather
        # kernel (8.4 ms vs 38.3 dense-einsum at (200,224,224,3)); the
        # XLA einsum form of the same math only wins on low-FLOP
        # backends (PRIMIA_TWOPASS_WARP opts in there). Unsafe ranges
        # fall back to the exact dense tent resampler (Pallas on TPU,
        # ``row_band``-bounded einsum otherwise).
        if cfg.rotation or cfg.translate or cfg.scale or cfg.shear:
            mats = _affine_mats(keys[0], cfg, B)
            safe = I.twopass_safe(cfg.rotation, cfg.shear, cfg.scale)
            x = I.warp_affine(
                x, mats,
                twopass=safe and (I.use_pallas_warp() or bool(
                    os.environ.get("PRIMIA_TWOPASS_WARP"))),
                row_band=I.affine_row_band(cfg.rotation, cfg.shear,
                                           cfg.scale, R),
            )

        # 2. RandomCrop(train_resolution) after host-side Resize
        if Rt < R:
            off = jax.random.randint(keys[1], (B, 2), 0, R - Rt + 1)

            def crop(img, o):
                return jax.lax.dynamic_slice(img, (o[0], o[1], 0), (Rt, Rt, img.shape[-1]))

            x = jax.vmap(crop)(x, off)

        # 3. CLAHE (always applied when enabled; clip_limit=(1,1) in ref)
        if cfg.clahe:
            x = I.clahe(x, clip_limit=1.0, tiles=8)

        # 4. gated albumentations block
        p = cfg.individual_prob
        block_on = _gate(keys[2], cfg.overall_prob, B)

        def gated(idx, mask_p, fn):
            nonlocal x
            m = _gate(keys[idx], mask_p, B) & block_on
            x = _blend(m, fn(keys[idx + 24]), x)

        # (vertical flip: hoisted to the uint8 input above, key 3)

        if cfg.randomgamma:
            def gamma_fn(k):
                g = jax.random.uniform(k, (B, 1, 1, 1), minval=0.8, maxval=1.2)
                return jnp.power(jnp.maximum(x, jnp.asarray(1e-6, dt)), g.astype(dt))
            gated(4, p, gamma_fn)

        if cfg.randombrightness:
            def bright_fn(k):
                f = jax.random.uniform(k, (B, 1, 1, 1), minval=-0.2, maxval=0.2)
                return jnp.clip(x + f.astype(dt), 0.0, 1.0)
            gated(5, p, bright_fn)

        if cfg.blur:
            gated(6, p, lambda k: I.box_blur(x, 3))

        # fused geometric distortions: sum displacement fields, warp once
        warp_terms = []
        max_disp = 0.0  # static |dy| bound for the banded resampler
        if cfg.elastic:
            warp_terms.append((7, partial(_coarse_field, coarse=Rt // 8), 2.0))
            max_disp += 2.0
        if cfg.optical_distortion:
            warp_terms.append((8, None, None))  # radial, handled below
            # |dy| = |k| r^2 |ys| / (cy cx) <= 0.05 * 2 * (Rt-1)/2
            max_disp += 0.05 * (Rt - 1)
        if cfg.grid_distortion:
            warp_terms.append((9, partial(_coarse_field, coarse=6), 0.06 * Rt))
            max_disp += 0.06 * Rt
        if warp_terms:
            dy = jnp.zeros((B, Rt, Rt), jnp.float32)
            dx = jnp.zeros((B, Rt, Rt), jnp.float32)
            for idx, fieldfn, amp_max in warp_terms:
                # idx in {7, 8, 9}: fields at keys[44+idx-7], amplitudes
                # at keys[47+idx-7] — disjoint from every gate/param key
                m = (_gate(keys[idx], p, B) & block_on).astype(jnp.float32)
                if fieldfn is not None:
                    amp = jax.random.uniform(keys[47 + idx - 7], (B,), maxval=amp_max,
                                             dtype=jnp.float32) * m
                    fy, fx = fieldfn(keys[44 + idx - 7], B, Rt, Rt, amp=amp)
                    dy, dx = dy + fy, dx + fx
                else:
                    # barrel/pincushion: r' = r (1 + k r^2), k ~ U(-.05,.05)
                    kk = jax.random.uniform(
                        keys[47 + idx - 7], (B, 1, 1), minval=-0.05,
                        maxval=0.05, dtype=jnp.float32
                    ) * m[:, None, None]
                    cy = cx = (Rt - 1) / 2.0
                    ys = jax.lax.broadcasted_iota(jnp.float32, (Rt, Rt), 0) - cy
                    xs = jax.lax.broadcasted_iota(jnp.float32, (Rt, Rt), 1) - cx
                    r2 = (ys ** 2 + xs ** 2) / (cy * cx)
                    dy = dy + kk * r2 * ys
                    dx = dx + kk * r2 * xs
            x = I.warp_dense(x, dy, dx, max_dy=max_disp)

        if cfg.grid_shuffle:
            def shuffle_fn(k):
                g = 3
                cell = Rt // g
                xx = x[:, : g * cell, : g * cell]
                cells = xx.reshape(B, g, cell, g, cell, -1).transpose(0, 1, 3, 2, 4, 5)
                cells = cells.reshape(B, g * g, cell, cell, -1)
                perm = jax.vmap(lambda kk: jax.random.permutation(kk, g * g))(
                    jax.random.split(k, B)
                )
                cells = jax.vmap(lambda c, pm: c[pm])(cells, perm)
                out = cells.reshape(B, g, g, cell, cell, -1).transpose(0, 1, 3, 2, 4, 5)
                out = out.reshape(B, g * cell, g * cell, -1)
                return jnp.pad(
                    out, ((0, 0), (0, Rt - g * cell), (0, Rt - g * cell), (0, 0))
                ) if g * cell < Rt else out
            gated(10, p, shuffle_fn)

        if cfg.hsv and channels == 3:
            def hsv_fn(k):
                sh = jax.random.uniform(k, (B, 1, 1, 3), minval=-1.0, maxval=1.0)
                sh = (sh * jnp.array([20 / 255.0, 30 / 255.0, 20 / 255.0])).astype(dt)
                hsv = _hsv_impl(x)
                hsv = jnp.stack(
                    [(hsv[..., 0] + sh[..., 0]) % 1.0,
                     jnp.clip(hsv[..., 1] + sh[..., 1], 0, 1),
                     jnp.clip(hsv[..., 2] + sh[..., 2], 0, 1)], -1)
                return _hsv_to_rgb(hsv)
            gated(11, p, hsv_fn)

        if cfg.invert:
            gated(12, p, lambda k: 1.0 - x)

        if cfg.cutout:
            def cutout_fn(k):
                out = x
                ks = jax.random.split(k, 5)
                mask = jnp.ones((B, Rt, Rt, 1), jnp.float32)
                ys = jax.lax.broadcasted_iota(jnp.int32, (Rt, Rt), 0)
                xs = jax.lax.broadcasted_iota(jnp.int32, (Rt, Rt), 1)
                for h in range(5):  # 5 holes up to 80x80 (ref dataloader.py:180)
                    kc, kwh = jax.random.split(ks[h])
                    c = jax.random.randint(kc, (B, 2), 0, Rt)
                    wh = jax.random.randint(kwh, (B, 2), 1, min(80, Rt) + 1)
                    inside = (
                        (ys[None] >= c[:, 0:1, None]) & (ys[None] < c[:, 0:1, None] + wh[:, 0:1, None])
                        & (xs[None] >= c[:, 1:2, None]) & (xs[None] < c[:, 1:2, None] + wh[:, 1:2, None])
                    )
                    mask = mask * (1.0 - inside[..., None].astype(jnp.float32))
                # keep the image in its compute dtype (an f32 mask would
                # promote the whole blend chain — see fog)
                return out * mask.astype(dt)
            gated(13, p, cutout_fn)

        if cfg.shadow:
            def shadow_fn(k):
                # darken a random vertical band (simplified RandomShadow)
                k1, k2 = jax.random.split(k)
                a = jax.random.randint(k1, (B, 1, 1, 1), 0, Rt)
                w = jax.random.randint(k2, (B, 1, 1, 1), Rt // 8, Rt // 2)
                xs = jax.lax.broadcasted_iota(jnp.int32, (1, Rt, Rt, 1), 2)
                band = (xs >= a) & (xs < a + w)
                return jnp.where(band, x * 0.5, x)
            gated(14, p, shadow_fn)

        if cfg.fog:
            def fog_fn(k):
                # cast the fog factor to the pixel dtype BEFORE mixing:
                # an f32 factor promotes the whole image off the bf16
                # path (measured 99 ms vs 9 ms for this op at 200x224)
                f = jax.random.uniform(
                    k, (B, 1, 1, 1), minval=0.1, maxval=0.45).astype(dt)
                return I.box_blur(x * (1 - f) + f, 3)
            gated(15, p, fog_fn)

        if cfg.sun_flare:
            def flare_fn(k):
                k1, k2 = jax.random.split(k)
                c = jax.random.uniform(k1, (B, 2), maxval=float(Rt))
                rad = jax.random.uniform(k2, (B,), minval=Rt / 8, maxval=Rt / 3)
                ys = jax.lax.broadcasted_iota(jnp.float32, (Rt, Rt), 0)
                xs = jax.lax.broadcasted_iota(jnp.float32, (Rt, Rt), 1)
                d2 = (ys[None] - c[:, 0, None, None]) ** 2 + (
                    xs[None] - c[:, 1, None, None]) ** 2
                glow = jnp.exp(-d2 / (2 * (rad[:, None, None] / 2) ** 2))
                return jnp.clip(x + glow[..., None].astype(dt), 0, 1)
            gated(16, p, flare_fn)

        if cfg.solarize:
            gated(17, p, lambda k: jnp.where(x >= 0.5, 1.0 - x, x))

        if cfg.equalize:
            gated(18, p, lambda k: I.equalize(x))

        if cfg.grid_dropout:
            def gd_fn(k):
                g = 8
                cell = Rt // g
                ys = jax.lax.broadcasted_iota(jnp.int32, (Rt, Rt), 0) // cell
                xs = jax.lax.broadcasted_iota(jnp.int32, (Rt, Rt), 1) // cell
                keep = ((ys + xs) % 2 == 0)[None, :, :, None]
                return x * keep
            gated(19, p, gd_fn)

        # 5. GaussNoise(var_limit=noise_std^2, p=noise_prob)
        if cfg.noise_std > 0 and cfg.noise_prob > 0:
            m = _gate(keys[20], cfg.noise_prob, B)
            noise = jax.random.normal(keys[21], x.shape, dt) * jnp.asarray(
                cfg.noise_std, dt)
            x = _blend(m, jnp.clip(x + noise, 0.0, 1.0), x)

        # 6. Normalize (images already in [0,1] float = ToFloat(255))
        return (x - mean) / std

    return augment


def normalize_only(batch_u8, mean, std, channels: int):
    """The eval-time transform: ToFloat + Normalize (no augmentation)."""
    mean = jnp.asarray(mean, jnp.float32).reshape(1, 1, 1, channels)
    std = jnp.asarray(std, jnp.float32).reshape(1, 1, 1, channels)
    return (batch_u8.astype(jnp.float32) / 255.0 - mean) / std
