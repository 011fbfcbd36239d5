"""Core batched image ops: bilinear warping, histograms, CLAHE, resize.

These are the device-side building blocks of the augmentation pipeline
(reference: ``torchlib/dataloader.py:138-217`` builds a torchvision +
albumentations CPU chain; here every transform is a batched jnp/XLA op
so the whole pipeline fuses into the training step on TPU).

Conventions: images are NHWC float32 in [0, 1] unless stated otherwise;
warps use inverse mapping with bilinear sampling and zero fill.
"""

from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- sampling

def bilinear_sample(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample one HWC image at float coords (ys, xs) [shape (H', W')].

    Out-of-bounds samples return 0 (zero fill, matching the reference's
    affine fill).
    """
    H, W, C = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = (ys - y0)[..., None]
    wx = (xs - x0)[..., None]
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        vals = img[yc, xc]  # (H', W', C)
        return jnp.where(valid[..., None], vals, 0.0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def resample_bilinear_mxu(imgs: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray,
                          max_chunk_px: int = 4096,
                          row_band: int | None = None) -> jnp.ndarray:
    """Batched bilinear resampling as dense tent-weight contractions.

    TPU gathers are serialized scalar loads — the XLA lowering of
    ``img[yc, xc]`` runs ~170 ms for a 64x224x224 batch. This reformulates
    sampling as two dense contractions that ride the MXU (~5 ms):

        out[p] = sum_u sum_v tent(y[p]-u) * tent(x[p]-v) * img[u, v]

    where ``tent(d) = clip(1-|d|, 0, 1)`` — exactly the bilinear kernel,
    and rows/cols outside the image get zero weight, which reproduces the
    gather path's zero fill bit-for-bit (up to bf16 weight rounding).

    imgs (B,H,W,C); ys/xs (B,Ho,Wo) absolute source coords. Output pixels
    are processed in chunks of at most ``max_chunk_px`` pixels (keeps the
    (B, chunk, W) weight matrices ~100 MB at batch 64); chunks run under
    ``lax.map`` (one compiled body).

    ``row_band``: optional static GUARANTEE from the caller that within
    any chunk of ``max_chunk_px // Wo`` consecutive output rows, each
    image's source-row range (±1 for the tent support) spans at most
    this many rows. The first contraction then runs over a
    dynamic-sliced band of ``row_band`` input rows instead of all H —
    exact, with H/row_band fewer MACs. A band that does NOT satisfy the
    guarantee silently drops samples, so callers must derive it from
    static bounds (see ``affine_row_band``).
    """
    B, H, W, C = imgs.shape
    Ho, Wo = ys.shape[1:]
    # chunk_rows is capped at 16 when banding so the caller's
    # affine_row_band(chunk_rows=16) guarantee holds for any resolution
    max_rows = min(Ho, max(1, max_chunk_px // Wo))
    if row_band is not None:
        max_rows = min(max_rows, 16)
    rows = 1
    for cand in range(max_rows, 0, -1):
        if Ho % cand == 0:
            rows = cand
            break
    n = Ho // rows
    P = rows * Wo
    dt = jnp.bfloat16
    imgs_t = imgs.astype(dt)
    iw = jax.lax.broadcasted_iota(jnp.float32, (1, 1, W), 2)
    ih = jax.lax.broadcasted_iota(jnp.float32, (1, 1, H), 2)
    ys_c = ys.astype(jnp.float32).reshape(B, n, P).transpose(1, 0, 2)
    xs_c = xs.astype(jnp.float32).reshape(B, n, P).transpose(1, 0, 2)

    use_band = row_band is not None and row_band < H
    Hb = 0
    if use_band:
        Hb = min(H, max(8, int(np.ceil(row_band / 8.0)) * 8))
        use_band = Hb < H

    def chunk(c):
        yc, xc = c
        wx = jnp.clip(1.0 - jnp.abs(xc[..., None] - iw), 0.0, 1.0).astype(dt)
        if use_band:
            # per-image band of source rows covering the chunk's samples
            base = jnp.clip(
                jnp.floor(jnp.min(yc, axis=1)).astype(jnp.int32) - 1, 0, H - Hb
            )  # (B,)
            zero = jnp.zeros((), jnp.int32)
            band = jax.vmap(
                lambda im, b0: jax.lax.dynamic_slice(
                    im, (b0, zero, zero), (Hb, W, C))
            )(imgs_t, base)
            ihb = base[:, None, None].astype(jnp.float32) + jax.lax.broadcasted_iota(
                jnp.float32, (1, 1, Hb), 2
            )
            wy = jnp.clip(1.0 - jnp.abs(yc[..., None] - ihb), 0.0, 1.0).astype(dt)
            inner = jnp.einsum("bhwc,bpw->bhpc", band, wx,
                               preferred_element_type=jnp.float32)
        else:
            wy = jnp.clip(1.0 - jnp.abs(yc[..., None] - ih), 0.0, 1.0).astype(dt)
            inner = jnp.einsum("bhwc,bpw->bhpc", imgs_t, wx,
                               preferred_element_type=jnp.float32)
        return jnp.einsum("bhpc,bph->bpc", inner.astype(dt), wy,
                          preferred_element_type=jnp.float32)

    outs = jax.lax.map(chunk, (ys_c, xs_c))  # (n, B, P, C)
    return outs.transpose(1, 0, 2, 3).reshape(B, Ho, Wo, C).astype(imgs.dtype)


def affine_row_band(rotation_deg: float, shear_deg: float, scale_frac: float,
                    width: int, chunk_rows: int = 16) -> int:
    """Static source-row-band bound for ``resample_bilinear_mxu`` under
    the augment config's inverse-affine matrix ranges.

    Within a chunk of ``chunk_rows`` output rows, sy = ic*xc + id*yc + ty
    varies by at most |ic|*(W-1) + |id|*(chunk_rows-1); the inverse
    coefficients are bounded by |ic| <= sin(rot+|shear|)/s_min and
    |id| <= 1/s_min over the draw ranges (det A = s^2). +3 covers the
    bilinear tent support and the floor() in the base row.
    """
    s_min = 1.0 - abs(scale_frac)
    if s_min < 0.1:
        # the drawn scale can get arbitrarily close to 0, so no finite
        # band is sound — disable banding (resampler falls back to dense)
        return 1 << 30
    ang = min(abs(rotation_deg) + abs(shear_deg), 89.0) * math.pi / 180.0
    spread = math.sin(ang) / s_min * (width - 1) + (chunk_rows - 1) / s_min
    return int(math.ceil(spread)) + 3


def warp_affine_twopass(imgs: jnp.ndarray, mats: jnp.ndarray,
                        weight_budget_mb: int = 128) -> jnp.ndarray:
    """Affine warp as two axis-aligned shear/scale passes (Catmull-Smith).

    The dense 2D resampler (``resample_bilinear_mxu``) contracts every
    output pixel against the FULL input height and width —
    B*(Ho*Wo)*(H+W) MACs, ~1.3 TFLOP for a 256x224x224 batch, as much as
    the entire ResNet-18 fwd+bwd. An affine map factors into a
    horizontal pass (per input row) then a vertical pass (per output
    column), dropping the arithmetic 224x:

        pass 1:  tmp[u, x] = img[u, q(x, u)]   q = d*xc + e*(u-cy) + z + cx
        pass 2:  out[y, x] = tmp[p(y, x), x]   p = C*xc + D*yc + Ty + cy

    with e = B/D, d = (AD - BC)/D, z = Tx - e*Ty (A..D, Tx, Ty the
    inverse-map coefficients). Pass 2's bilinear uses the two integer
    rows around p, so pass 1 is evaluated at u=floor(p), ceil(p) rather
    than exactly p: the horizontal sample position differs from the true
    2D bilinear by at most |B| <= sin(rot)*scale pixels (exact when
    rotation = shear = 0). Degenerate when |D| ~ 0 (rotation near 90°);
    the caller must check ``twopass_safe`` before using this path.

    Each pass materializes tent-weight blocks of at most
    ``weight_budget_mb`` under ``lax.map``.
    """
    Bn, H, W, C = imgs.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    A_, Bc = mats[:, 0, 0], mats[:, 0, 1]
    Cc, D_ = mats[:, 1, 0], mats[:, 1, 1]
    Tx, Ty = mats[:, 0, 2], mats[:, 1, 2]
    Dsafe = jnp.where(jnp.abs(D_) < 1e-2, jnp.where(D_ < 0, -1e-2, 1e-2), D_)
    e = Bc / Dsafe
    d = A_ - e * Cc
    z = Tx - e * Ty

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else imgs.dtype
    imgs_t = imgs.astype(dt)
    itemsize = 2 if dt == jnp.bfloat16 else 4
    # rows per chunk so the (B, rows, W, W) weight block stays in budget
    rows = max(1, (weight_budget_mb * (1 << 20)) // (Bn * W * W * itemsize))
    for cand in range(min(H, rows), 0, -1):
        if H % cand == 0:
            rows = cand
            break

    xc = jax.lax.broadcasted_iota(jnp.float32, (W,), 0) - cx
    iw = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, W), 3)

    # ---- pass 1: horizontal, per input row u (rows chunked with their
    # weight blocks under lax.map)
    us = (jnp.arange(H, dtype=jnp.float32) - cy).reshape(H // rows, rows)
    img_r = imgs_t.reshape(Bn, H // rows, rows, W, C)

    def pass1(args_):
        u_c, rows_img = args_  # (rows,), (B, rows, W, C)
        q = (d[:, None, None] * xc[None, None, :]
             + e[:, None, None] * u_c[None, :, None]
             + z[:, None, None] + cx)  # (B, rows, Wo)
        wq = jnp.clip(1.0 - jnp.abs(q[..., None] - iw), 0.0, 1.0).astype(dt)
        # tmp[b, r, p, c] = sum_w img[b, r, w, c] * wq[b, r, p, w]
        return jnp.einsum("brpw,brwc->brpc", wq, rows_img,
                          preferred_element_type=jnp.float32).astype(dt)

    tmp = jax.lax.map(pass1, (us, img_r.transpose(1, 0, 2, 3, 4)))
    tmp = tmp.transpose(1, 0, 2, 3, 4).reshape(Bn, H, W, C)  # (B, H, Wo, C)

    # ---- pass 2: vertical, per output row y
    ih = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, H), 3)
    ys = (jnp.arange(H, dtype=jnp.float32) - cy).reshape(H // rows, rows)

    def pass2(y_c):  # (rows,) centered output-row indices
        p = (Cc[:, None, None] * xc[None, None, :]
             + D_[:, None, None] * y_c[None, :, None]
             + Ty[:, None, None] + cy)  # (B, rows, Wo)
        wp = jnp.clip(1.0 - jnp.abs(p[..., None] - ih), 0.0, 1.0).astype(dt)
        # out[b, r, x, c] = sum_h tmp[b, h, x, c] * wp[b, r, x, h]
        return jnp.einsum("brxh,bhxc->brxc", wp, tmp,
                          preferred_element_type=jnp.float32)

    out = jax.lax.map(pass2, ys)  # (H//rows, B, rows, Wo, C)
    out = out.transpose(1, 0, 2, 3, 4).reshape(Bn, H, W, C)
    return out.astype(imgs.dtype)


def twopass_safe(rotation_deg: float, shear_deg: float, scale_frac: float,
                 min_d: float = 0.35) -> bool:
    """Static (trace-time) check that the two-pass decomposition is
    well-conditioned for ALL matrices the augment config can draw.

    The pass-2 vertical coefficient is D = cos(theta)/s (inverse of
    A = R(theta) Shear s*Id has det s^2), so over the config ranges
    |D| >= cos(rot + |shear|) / (1 + scale). Requiring it above
    ``min_d`` bounds the shear-pass magnification 1/|D|.
    """
    ang = min(abs(rotation_deg) + abs(shear_deg), 89.0) * math.pi / 180.0
    return math.cos(ang) / (1.0 + abs(scale_frac)) >= min_d


def _use_mxu_resample() -> bool:
    return jax.default_backend() == "tpu"


def _use_pallas_resample() -> bool:
    """Opt-in alternate kernel (see ops/pallas_kernels.py for the
    measured trade-off at production shapes)."""
    return _use_mxu_resample() and bool(os.environ.get("PRIMIA_PALLAS_AUGMENT"))


def _use_twopass_dense() -> bool:
    """Default-on two-pass gather for the dense *augmentation* warp
    (``PRIMIA_WARP_TWOPASS=0`` falls back to the exact joint-bilinear
    tent kernel). See ``pallas_tent.warp_dense_twopass_pallas`` for the
    approximation contract; measured 8.8 -> ~1.3 ms at the canonical
    (200, 224, 224, 3) distortion-field warp."""
    return os.environ.get("PRIMIA_WARP_TWOPASS", "1") != "0"


def use_pallas_warp() -> bool:
    """Default-on TPU warp kernels (``ops/pallas_tent.py``): the fused
    tent resampler (25.9 vs 38.3 ms at (200,224,224,3) against the
    banded einsum — the (B,H,P,C) intermediate stays in VMEM) and the
    two-pass shear warp (8.4 ms) for well-conditioned affine maps.
    ``PRIMIA_PALLAS_WARP=0`` falls back to the XLA formulations."""
    return _use_mxu_resample() and os.environ.get("PRIMIA_PALLAS_WARP", "1") != "0"


def warp_affine(imgs: jnp.ndarray, mats: jnp.ndarray,
                twopass: bool = False,
                row_band: int | None = None,
                channels_first: bool = False) -> jnp.ndarray:
    """Batched inverse-affine warp. imgs (B,H,W,C); mats (B,2,3) maps
    OUTPUT pixel coords (x, y, 1) -> input coords, centered at the image
    center (torchvision RandomAffine convention).

    ``twopass``: use the 224x-lower-FLOP shear decomposition — only
    pass True when ``twopass_safe`` holds for the matrix distribution
    (the caller knows the static config ranges; this function sees
    traced values). As XLA einsums the two-pass form loses on TPU
    (per-row matvecs the MXU can't tile), but as a Pallas lane-gather
    kernel it is the fastest warp by 4.6x (8.4 ms vs 38.3 at
    (200,224,224,3)) and is the default TPU path when safe.
    """
    if twopass:
        if use_pallas_warp():
            from primia_tpu.ops.pallas_tent import warp_affine_shear_pallas

            return warp_affine_shear_pallas(imgs, mats,
                                            channels_first=channels_first)
        if channels_first:
            return warp_affine_twopass(
                imgs.transpose(0, 2, 3, 1), mats).transpose(0, 3, 1, 2)
        return warp_affine_twopass(imgs, mats)
    if channels_first:
        # non-twopass planar callers only exist off the Pallas path
        # (ill-conditioned affine ranges): NHWC round trip is fine there
        return warp_affine(imgs.transpose(0, 2, 3, 1), mats,
                           twopass=False, row_band=row_band,
                           ).transpose(0, 3, 1, 2)
    B, H, W, C = imgs.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx

    sy = mats[:, 1, 0, None, None] * xs + mats[:, 1, 1, None, None] * ys \
        + mats[:, 1, 2, None, None] + cy
    sx = mats[:, 0, 0, None, None] * xs + mats[:, 0, 1, None, None] * ys \
        + mats[:, 0, 2, None, None] + cx
    if _use_pallas_resample():
        from primia_tpu.ops.pallas_kernels import resample_bilinear_pallas

        return resample_bilinear_pallas(imgs, sy, sx)
    if use_pallas_warp():
        from primia_tpu.ops.pallas_tent import resample_tent_pallas

        return resample_tent_pallas(imgs, sy, sx)
    if _use_mxu_resample():
        return resample_bilinear_mxu(imgs, sy, sx, row_band=row_band)
    return jax.vmap(bilinear_sample)(imgs, sy, sx)


def warp_dense(imgs: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray,
               max_dy: float | None = None,
               channels_first: bool = False) -> jnp.ndarray:
    """Batched dense warp: sample input at (y + dy, x + dx).

    dy/dx: (B, H, W) float displacement fields in pixels. ``max_dy``:
    optional STATIC bound on |dy| (the augment config knows its
    amplitude caps); enables the row-banded contraction — source rows
    for a chunk of 16 output rows then span at most 15 + 2*max_dy + 3.
    ``channels_first``: imgs is (B, C, H, W) (planar augment pipeline).
    """
    if use_pallas_warp() and _use_twopass_dense():
        from primia_tpu.ops.pallas_tent import warp_dense_twopass_pallas

        return warp_dense_twopass_pallas(imgs, dy, dx,
                                         channels_first=channels_first)
    if channels_first:
        return warp_dense(imgs.transpose(0, 2, 3, 1), dy, dx,
                          max_dy=max_dy).transpose(0, 3, 1, 2)
    B, H, W, C = imgs.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    sy, sx = ys[None] + dy, xs[None] + dx
    if use_pallas_warp():
        from primia_tpu.ops.pallas_tent import resample_tent_pallas

        return resample_tent_pallas(
            imgs, sy, sx,
            max_dy=float(max_dy) if max_dy is not None else None)
    if _use_mxu_resample():
        band = None
        if max_dy is not None:
            band = 15 + int(math.ceil(2.0 * max_dy)) + 3
        return resample_bilinear_mxu(imgs, sy, sx, row_band=band)
    return jax.vmap(bilinear_sample)(imgs, sy, sx)


def resize_bilinear(imgs: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    B, H, W, C = imgs.shape
    return jax.image.resize(imgs, (B, size[0], size[1], C), method="bilinear")


# -------------------------------------------------------------- histograms

def _u8_histogram(flat_u8: jnp.ndarray) -> jnp.ndarray:
    """256-bin histogram of a flattened uint8/int32 array via one-hot sum."""
    oh = jax.nn.one_hot(flat_u8, 256, dtype=jnp.float32)
    return jnp.sum(oh, axis=tuple(range(flat_u8.ndim)))


def equalize(imgs: jnp.ndarray, channels_first: bool = False) -> jnp.ndarray:
    """Global histogram equalization per image per channel ([0,1] float)."""
    u8 = jnp.clip(imgs * 255.0 + 0.5, 0, 255).astype(jnp.int32)

    def one_channel(ch):  # (H, W) int32
        hist = _u8_histogram(ch.reshape(-1))
        cdf = jnp.cumsum(hist)
        total = cdf[-1]
        cdf_min = cdf[jnp.argmax(hist > 0)]
        lut = jnp.clip(
            jnp.round((cdf - cdf_min) / jnp.maximum(total - cdf_min, 1.0) * 255.0),
            0, 255,
        )
        return lut[ch]

    ax = 0 if channels_first else 2  # channel axis below the batch dim
    out = jax.vmap(jax.vmap(one_channel, in_axes=ax, out_axes=ax))(u8)
    return out.astype(imgs.dtype) / 255.0


def clahe_mxu(imgs: jnp.ndarray, clip_limit: float = 1.0, tiles: int = 8,
              chunk: int = 8) -> jnp.ndarray:
    """CLAHE as one-hot matmuls — the TPU formulation.

    The gather formulation below costs ~1.9 s for 200 images at 224px
    (TPU gathers serialize); here both hot parts become MXU work:

    * per-tile histograms: ``ones @ onehot(pixels)``;
    * LUT application: group pixels on a half-tile-shifted grid so all
      pixels in a group share the same four neighbour tiles, then
      ``onehot(pixels) @ [LUT00 LUT01 LUT10 LUT11]`` is one batched
      matmul per group, mixed with the per-pixel bilinear weights.

    Exact vs the gather path: one-hot and LUT entries (ints <= 255) are
    exact in bf16 and the dots accumulate in f32.
    """
    B, H, W, C = imgs.shape
    T = tiles
    th, tw = -(-H // T), -(-W // T)
    padH, padW = th * T - H, tw * T - W
    u8 = jnp.clip(imgs * 255.0 + 0.5, 0, 255).astype(jnp.int32)
    if padH or padW:
        u8 = jnp.pad(u8, ((0, 0), (0, padH), (0, padW), (0, 0)), mode="edge")
    Hp, Wp = th * T, tw * T
    N = B * C
    x = u8.transpose(0, 3, 1, 2).reshape(N, Hp, Wp)  # image-channel batch

    levels = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
    P = th * tw
    limit = max(clip_limit * P / 256.0, 1.0)

    # LUT-interp weights on the UNPADDED pixel grid (identical math to
    # the gather path)
    ys = jax.lax.broadcasted_iota(jnp.float32, (Hp, Wp), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (Hp, Wp), 1)
    fy = (ys - th / 2.0) / th
    fx = (xs - tw / 2.0) / tw
    wy = jnp.clip(fy - jnp.clip(jnp.floor(fy), 0, T - 1), 0.0, 1.0)
    wx = jnp.clip(fx - jnp.clip(jnp.floor(fx), 0, T - 1), 0.0, 1.0)

    # shifted grid: pad th/2 top / tw/2 left (plus remainder bottom/right)
    # so every (T+1)x(T+1) group shares its 4 neighbour tiles
    sh, sw = th // 2, tw // 2
    x_sh = jnp.pad(x, ((0, 0), (sh, th - sh), (sw, tw - sw)), mode="edge")
    wy_sh = jnp.pad(wy, ((sh, th - sh), (sw, tw - sw)))
    wx_sh = jnp.pad(wx, ((sh, th - sh), (sw, tw - sw)))
    G = T + 1
    # group corner indices: group g reads tiles (clip(g-1), clip(g))
    g0 = jnp.clip(jnp.arange(G) - 1, 0, T - 1)
    g1 = jnp.clip(jnp.arange(G), 0, T - 1)

    def blocks(a, n_lead, g):  # (..., g*th, g*tw) -> (..., g*g, th*tw)
        s = a.shape[:n_lead]
        a = a.reshape(*s, g, th, g, tw)
        a = jnp.moveaxis(a, -3, -2)  # (..., g, g, th, tw)
        return a.reshape(*s, g * g, th * tw)

    wgt = jnp.stack(
        [
            (1 - wy_sh) * (1 - wx_sh),
            (1 - wy_sh) * wx_sh,
            wy_sh * (1 - wx_sh),
            wy_sh * wx_sh,
        ],
        axis=0,
    )  # (4, Hp+th, Wp+tw)
    wgt_b = blocks(wgt, 1, G)  # (4, G*G, P)

    n_c = min(chunk, N)
    while N % n_c:
        n_c -= 1
    xs_all = x.reshape(N // n_c, n_c, Hp, Wp)
    xsh_all = x_sh.reshape(N // n_c, n_c, Hp + th, Wp + tw)

    def per_chunk(c):
        xc, xshc = c  # (n_c, Hp, Wp), (n_c, Hp+th, Wp+tw)
        # ---- histograms on the unshifted tile grid
        tb = blocks(xc, 1, T)  # (n_c, T*T, P)
        oh_h = (tb[..., None] == levels).astype(jnp.bfloat16)  # (n_c,T2,P,256)
        hist = jnp.einsum("ntpv->ntv", oh_h,
                          preferred_element_type=jnp.float32)
        excess = jnp.sum(jnp.maximum(hist - limit, 0.0), -1, keepdims=True)
        hist = jnp.minimum(hist, limit) + excess / 256.0
        cdf = jnp.cumsum(hist, -1)
        luts = jnp.clip(jnp.round(cdf / P * 255.0), 0, 255)  # (n_c, T2, 256)
        luts2 = luts.reshape(-1, T, T, 256)

        # 4 corner LUTs per shifted group: (n_c, G, G, 256, 4)
        l00 = luts2[:, g0][:, :, g0]
        l01 = luts2[:, g0][:, :, g1]
        l10 = luts2[:, g1][:, :, g0]
        l11 = luts2[:, g1][:, :, g1]
        lut4 = jnp.stack([l00, l01, l10, l11], axis=-1)  # (n_c,G,G,256,4)
        lut4 = lut4.reshape(-1, G * G, 256, 4).astype(jnp.bfloat16)

        gb = blocks(xshc, 1, G)  # (n_c, G*G, P)
        oh_a = (gb[..., None] == levels).astype(jnp.bfloat16)  # (n_c,GG,P,256)
        out4 = jnp.einsum("ngpv,ngvc->ngpc", oh_a, lut4,
                          preferred_element_type=jnp.float32)  # (n_c,GG,P,4)
        out = jnp.einsum("cgp,ngpc->ngp", wgt_b.astype(jnp.float32), out4)
        return out  # (n_c, G*G, P)

    outs = jax.lax.map(per_chunk, (xs_all, xsh_all))  # (N/n_c, n_c, GG, P)
    out = outs.reshape(N, G, G, th, tw)
    out = jnp.moveaxis(out, 2, 3).reshape(N, Hp + th, Wp + tw)
    out = out[:, sh : sh + H, sw : sw + W]  # un-shift, un-pad
    out = out.reshape(B, C, H, W).transpose(0, 2, 3, 1)
    return (out / 255.0).astype(imgs.dtype)


# OpenCV D65 colour matrices (cvtColor docs): linear RGB in [0,1] ->
# XYZ; white point Xn/Zn normalization folded at use site. The rows of
# _RGB2XYZ sum to exactly (Xn, 1, Zn), so grey inputs map to a=b=128
# exactly and survive the LAB round trip unchanged.
_RGB2XYZ = np.array(
    [[0.412453, 0.357580, 0.180423],
     [0.212671, 0.715160, 0.072169],
     [0.019334, 0.119193, 0.950227]], np.float64)
_XYZ2RGB = np.linalg.inv(_RGB2XYZ)
_XN = 0.950456
_ZN = 1.088754
_LAB_EPS = 0.008856  # (6/29)^3
_LAB_KAPPA = 903.3   # 29^3/3^3 (OpenCV's value)


def _srgb_to_linear(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB companding removal (IEC 61966-2-1), as cv2's 8-bit
    COLOR_RGB2LAB applies via its gamma LUT (grey 128 -> L 137, not the
    linear formula's 194 — verified against cv2 5.0 golden values)."""
    return jnp.where(
        x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def _linear_to_srgb(y: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(
        y <= 0.0031308,
        12.92 * y,
        1.055 * jnp.power(jnp.maximum(y, 0.0), 1.0 / 2.4) - 0.055)


def rgb_to_lab_u8(imgs: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """RGB floats in [0, 1] (channel ``axis``, size 3) -> LAB in
    OpenCV's uint8 scale (L in [0, 255] = L*255/100, a/b offset by
    +128), kept in float.

    Matches ``cv2.cvtColor(COLOR_RGB2LAB)`` 8-bit semantics including
    the sRGB linearization its implementation applies before the
    RGB->XYZ matrix; OpenCV's fixed-point table interpolation may
    differ from this float evaluation by 1 level
    (``tests/test_augment.py`` pins cv2 golden values).
    """
    rgb = jnp.floor(jnp.clip(imgs.astype(jnp.float32) * 255.0 + 0.5, 0, 255))
    rgb = _srgb_to_linear(rgb / 255.0)
    # explicit linear combinations, not a (..,3)@(3,3) dot: the default
    # dot precision computes in bf16 (~0.3 uint8 level error) and a K=3
    # contraction is degenerate MXU work anyway
    r = jnp.take(rgb, 0, axis=axis)
    g = jnp.take(rgb, 1, axis=axis)
    b_ = jnp.take(rgb, 2, axis=axis)
    # python-float coefficients: numpy f64 scalars would promote the
    # whole pipeline to f64 under the package's x64 mode
    (m00, m01, m02), (m10, m11, m12), (m20, m21, m22) = _RGB2XYZ.tolist()
    xr = (m00 * r + m01 * g + m02 * b_) / _XN
    yr = m10 * r + m11 * g + m12 * b_
    zr = (m20 * r + m21 * g + m22 * b_) / _ZN

    def f(t):
        return jnp.where(t > _LAB_EPS, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)

    fx, fy, fz = f(xr), f(yr), f(zr)
    L = jnp.where(yr > _LAB_EPS, 116.0 * fy - 16.0, _LAB_KAPPA * yr)
    a = 500.0 * (fx - fy) + 128.0
    b = 200.0 * (fy - fz) + 128.0
    lab = jnp.stack([L * (255.0 / 100.0), a, b], axis=axis)
    return jnp.clip(lab, 0.0, 255.0)


def lab_u8_to_rgb(lab: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_lab_u8`; returns [0, 1] floats quantized
    to uint8 levels (the reference pipeline hands albumentations' uint8
    result onward)."""
    L = jnp.take(lab, 0, axis=axis) * (100.0 / 255.0)
    a = jnp.take(lab, 1, axis=axis) - 128.0
    b = jnp.take(lab, 2, axis=axis) - 128.0
    fy = (L + 16.0) / 116.0
    fx = fy + a / 500.0
    fz = fy - b / 200.0

    def finv(t):
        t3 = t * t * t
        return jnp.where(t3 > _LAB_EPS, t3, (t - 16.0 / 116.0) / 7.787)

    yr = jnp.where(L > _LAB_KAPPA * _LAB_EPS, fy * fy * fy, L / _LAB_KAPPA)
    x_, y_, z_ = finv(fx) * _XN, yr, finv(fz) * _ZN
    # explicit python-float combinations: see rgb_to_lab_u8
    (i00, i01, i02), (i10, i11, i12), (i20, i21, i22) = _XYZ2RGB.tolist()
    rgb = jnp.stack(
        [i00 * x_ + i01 * y_ + i02 * z_,
         i10 * x_ + i11 * y_ + i12 * z_,
         i20 * x_ + i21 * y_ + i22 * z_], axis=axis)
    rgb = _linear_to_srgb(jnp.clip(rgb, 0.0, 1.0))
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return jnp.floor(rgb * 255.0 + 0.5) / 255.0


def clahe(
    imgs: jnp.ndarray,
    clip_limit: float = 1.0,
    tiles: int = 8,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Contrast-limited adaptive histogram equalization (batched).

    Channel semantics follow albumentations' ``a.CLAHE``
    (``albumentations/augmentations/functional.py``: the reference
    enables it at ``torchlib/dataloader.py:152-157``): a 3-channel
    image is converted RGB -> LAB (OpenCV uint8 convention) and only
    the L channel is equalized; 1-channel images are equalized
    directly. Besides parity, this is 3x less histogram/LUT work on
    the canonical 3-channel config. Any other channel count falls back
    to per-channel equalization.
    """
    ch_ax = 1 if channels_first else -1
    if imgs.shape[ch_ax] == 3:
        # quantize LAB to uint8 IMMEDIATELY: cv2's pipeline stores all
        # LAB channels as uint8, CLAHE re-quantizes its input anyway,
        # and a single u8 carrier between the conversion fusions is 4x
        # cheaper than the full-res f32 stack (which also forced XLA
        # layout copies at the Pallas CLAHE boundary).
        lab = jnp.round(rgb_to_lab_u8(imgs, axis=ch_ax)).astype(jnp.uint8)
        Lch = (lab[:, :1] if channels_first else lab[..., :1])
        L_eq = _clahe_channels(Lch.astype(jnp.float32) / 255.0,
                               clip_limit, tiles,
                               channels_first=channels_first)
        rest = (lab[:, 1:] if channels_first else lab[..., 1:])
        lab = jnp.concatenate(
            [jnp.round(L_eq.astype(jnp.float32) * 255.0).astype(jnp.uint8),
             rest], axis=ch_ax)
        return lab_u8_to_rgb(lab.astype(jnp.float32),
                             axis=ch_ax).astype(imgs.dtype)
    return _clahe_channels(imgs, clip_limit, tiles,
                           channels_first=channels_first)


def _clahe_channels(
    imgs: jnp.ndarray,
    clip_limit: float = 1.0,
    tiles: int = 8,
    channels_first: bool = False,
) -> jnp.ndarray:
    """Per-channel CLAHE backend dispatch.

    OpenCV-style: per-tile clipped histograms -> per-tile LUTs ->
    bilinear interpolation between the four neighbouring tile LUTs.
    Operates on [0,1] float, independently per channel.

    On TPU dispatches to the Pallas two-kernel pipeline
    (``ops.pallas_clahe`` — measured 4.7x over the one-hot matmul
    formulation at the canonical (200, 224, 224, 3) shape; set
    ``PRIMIA_PALLAS_CLAHE=0`` to fall back to ``clahe_mxu``). The
    gather formulation below is the CPU/reference path.

    Reference pipeline applies ``a.CLAHE(clip_limit=(1,1))`` on uint8
    (``torchlib/dataloader.py:152-157``).
    """
    if _use_mxu_resample():
        if os.environ.get("PRIMIA_PALLAS_CLAHE", "1") != "0":
            from primia_tpu.ops.pallas_clahe import clahe_pallas

            return clahe_pallas(imgs, clip_limit, tiles,
                                channels_first=channels_first)
        if channels_first:
            return clahe_mxu(imgs.transpose(0, 2, 3, 1), clip_limit,
                             tiles).transpose(0, 3, 1, 2)
        return clahe_mxu(imgs, clip_limit, tiles)
    if channels_first:
        return _clahe_channels(imgs.transpose(0, 2, 3, 1), clip_limit,
                               tiles).transpose(0, 3, 1, 2)
    B, H, W, C = imgs.shape
    th, tw = -(-H // tiles), -(-W // tiles)  # ceil: any resolution
    padH, padW = th * tiles - H, tw * tiles - W
    u8 = jnp.clip(imgs * 255.0 + 0.5, 0, 255).astype(jnp.int32)
    if padH or padW:
        u8 = jnp.pad(u8, ((0, 0), (0, padH), (0, padW), (0, 0)), mode="edge")
    Hp, Wp = H + padH, W + padW

    def one_channel(ch):  # (Hp, Wp) int32
        t = ch.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)  # (T,T,th,tw)
        oh = jax.nn.one_hot(t.reshape(tiles, tiles, -1), 256, dtype=jnp.float32)
        hist = jnp.sum(oh, axis=2)  # (T, T, 256)
        # clip & redistribute (OpenCV semantics: limit = clip*avg)
        limit = jnp.maximum(clip_limit * (th * tw) / 256.0, 1.0)
        excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
        hist = jnp.minimum(hist, limit) + excess / 256.0
        cdf = jnp.cumsum(hist, axis=-1)
        luts = jnp.clip(jnp.round(cdf / (th * tw) * 255.0), 0, 255)  # (T,T,256)

        # bilinear interpolation between tile LUTs at every (unpadded) pixel
        ch = ch[:H, :W]
        ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
        xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
        fy = (ys - th / 2.0) / th
        fx = (xs - tw / 2.0) / tw
        y0 = jnp.clip(jnp.floor(fy), 0, tiles - 1).astype(jnp.int32)
        x0 = jnp.clip(jnp.floor(fx), 0, tiles - 1).astype(jnp.int32)
        y1 = jnp.clip(y0 + 1, 0, tiles - 1)
        x1 = jnp.clip(x0 + 1, 0, tiles - 1)
        wy = jnp.clip(fy - y0, 0.0, 1.0)
        wx = jnp.clip(fx - x0, 0.0, 1.0)

        def lut_at(ty, tx):
            return luts[ty, tx, ch]  # advanced indexing -> (H, W)

        v00 = lut_at(y0, x0)
        v01 = lut_at(y0, x1)
        v10 = lut_at(y1, x0)
        v11 = lut_at(y1, x1)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    out = jax.vmap(jax.vmap(one_channel, in_axes=2, out_axes=2))(u8)
    return out.astype(imgs.dtype) / 255.0


# ------------------------------------------------------------------ blur

def box_blur(imgs: jnp.ndarray, ksize: int,
             channels_first: bool = False) -> jnp.ndarray:
    """Depthwise box blur, zero-padded same-size output.

    Shift-and-add formulation: a 1-channel depthwise conv is a terrible
    MXU shape (K = ksize^2), while 2*ksize shifted adds fuse into one
    VPU pass over the batch. Spatial dims are (1, 2) for NHWC and
    (2, 3) with ``channels_first``.
    """
    ha, wa = (2, 3) if channels_first else (1, 2)
    H, W = imgs.shape[ha], imgs.shape[wa]
    pad = ksize // 2
    pads = [(0, 0)] * 4
    pads[ha] = pads[wa] = (pad, pad)
    z = jnp.pad(imgs, pads)

    def sl(t, axis, start, size):
        idx = [slice(None)] * 4
        idx[axis] = slice(start, start + size)
        return t[tuple(idx)]

    rows = sl(z, ha, 0, H)
    for i in range(1, ksize):
        rows = rows + sl(z, ha, i, H)
    out = sl(rows, wa, 0, W)
    for j in range(1, ksize):
        out = out + sl(rows, wa, j, W)
    return out / jnp.asarray(ksize * ksize, imgs.dtype)


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / jnp.sum(k)


def gaussian_blur_field(field: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Separable gaussian blur of a (B, H, W) scalar field."""
    k = gaussian_kernel1d(sigma, radius)
    B, H, W = field.shape
    x = field[:, None]  # (B,1,H,W)
    kx = k.reshape(1, 1, 1, -1)
    ky = k.reshape(1, 1, -1, 1)
    pad = radius
    x = jax.lax.conv_general_dilated(
        x, kx, (1, 1), ((0, 0), (pad, pad)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, ky, (1, 1), ((pad, pad), (0, 0)), dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x[:, 0]
