"""Fused tent-weight bilinear resampler — the production warp kernel.

The XLA formulation (``ops.image.resample_bilinear_mxu``) is two chained
einsums whose ``(B, H, P, C)`` f32 intermediate round-trips HBM between
them (~46 GB for the canonical (200, 224, 224, 3) affine warp — the
entire ~60 ms cost is that traffic, not FLOPs). This kernel keeps the
intermediate in VMEM and replaces the second matmul with a VPU
multiply + sublane reduction:

    for each output row r (``rows`` per grid step), channel c:
        wxT[v, j] = tent(xs[r, j] - v)          (W, Wo)  built in-regs
        inner     = img[c] @ wxT                (H, Wo)  one MXU matmul
        wyT[u, j] = tent(ys[r, j] - u)          (H, Wo)  built in-regs
        out[r, c] = sum_u inner * wyT           sublane reduce

Everything is lane-major in the output-pixel axis ``j``, so no
transposes or relayouts appear anywhere: the tent operands come
straight off broadcasted iotas against the coordinate row. Per-channel
reuse of both tents comes free from the unrolled channel loop.

Same contract as ``resample_bilinear_mxu`` (reference semantics:
torchvision RandomAffine / albumentations distortions resampling,
``torchlib/dataloader.py:138-217``): absolute source coords, zero fill
outside the image (tent weights vanish there), bf16 weights with f32
accumulation.

**Measured status (v5e): this is the default warp path on TPU** — see
numbers in ``ops/image.py:warp_affine``; ``PRIMIA_PALLAS_WARP=0`` falls
back to the einsum formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# x64 would make weak-int promotions inside the kernel emit i64
# converts Mosaic cannot lower (see ops/pallas_clahe.py)
from jax._src.config import enable_x64 as _x64_scope

_I0 = np.int32(0)

# sublane alignment for the banded kernel's dynamic row slice (16 covers
# both the f32 (8, 128) and packed bf16 (16, 128) tilings)
_ALIGN = 16


def _tent_kernel(img_ref, ys_ref, xs_ref, out_ref, *, H, W, C, Pp,
                 band=None):
    """img: (1, C, H, W) bf16; ys/xs: (1, 1, 1, Pp) f32 source coords
    for one flattened chunk of output pixels (pad pixels carry coord -2
    — zero tent weight); out: (1, 1, C, Pp) in the output dtype.

    One (H, W) x (W, Pp) matmul per channel — all of the chunk's output
    pixels share it, so N is large enough to keep the MXU busy.

    ``band``: optional STATIC (lo, Hb, rows_per_chunk) guarantee from
    the caller that chunk k (= minor grid index) only samples source
    rows in [k*rows_per_chunk - lo, same + Hb): the row contraction then
    runs over a dynamic-sliced band of Hb rows — ~H/Hb fewer MACs,
    exact under the guarantee (out-of-band samples silently drop, the
    same contract as ``resample_bilinear_mxu(row_band=...)``)."""
    xr = xs_ref[0, 0]  # (1, Pp) — output pixels along lanes
    yr = ys_ref[0, 0]
    iv = jax.lax.broadcasted_iota(jnp.int32, (W, Pp), 0).astype(jnp.float32)
    wxT = jnp.clip(1.0 - jnp.abs(xr - iv), 0.0, 1.0).astype(jnp.bfloat16)
    if band is not None:
        lo, Hb, rows_per_chunk = band
        base = jnp.clip(pl.program_id(1) * rows_per_chunk - lo, 0, H - Hb)
        # Mosaic requires the dynamic sublane offset of the row slice to
        # be provably tile-aligned; floor-align it (the caller widened Hb
        # by _ALIGN-1 so the window still covers the band) and assert the
        # alignment. H - Hb is a multiple of _ALIGN, so the clip bound
        # survives the floor.
        base = pl.multiple_of((base // _ALIGN) * _ALIGN, _ALIGN)
        iu = base.astype(jnp.float32) + jax.lax.broadcasted_iota(
            jnp.int32, (Hb, Pp), 0).astype(jnp.float32)
    else:
        base, Hb = None, H
        iu = jax.lax.broadcasted_iota(jnp.int32, (H, Pp), 0).astype(jnp.float32)
    wyT = jnp.clip(1.0 - jnp.abs(yr - iu), 0.0, 1.0)
    for c in range(C):
        img_c = img_ref[0, c] if base is None else img_ref[0, c, pl.ds(base, Hb), :]
        inner = jax.lax.dot(
            img_c, wxT, preferred_element_type=jnp.float32
        )  # (Hb, Pp)
        out_ref[0, 0, c:c + 1, :] = jnp.sum(
            inner * wyT, axis=0, keepdims=True
        ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "max_dy"))
def resample_tent_pallas(imgs: jnp.ndarray, ys: jnp.ndarray,
                         xs: jnp.ndarray, *,
                         max_dy: float | None = None,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ``resample_bilinear_mxu``: imgs (B, H, W, C),
    ys/xs (B, Ho, Wo) absolute source coordinates.

    ``max_dy``: optional STATIC guarantee that ``|ys - output_row| <=
    max_dy`` everywhere (the displacement-field warps know their
    amplitude caps); enables the banded row contraction inside the
    kernel — exact under the guarantee, ~H/band fewer MACs."""
    with _x64_scope(False):
        B, H, W, C = imgs.shape
        Ho, Wo = ys.shape[1:]
        # chunk of flattened output pixels per grid step = the matmul's
        # N dim. 3584 (= 16 rows at 224 px) keeps tent build + inner
        # comfortably in VMEM (~11 MB f32) with full MXU occupancy;
        # larger sources (512 px inference res) shrink the chunk so
        # wxT (W, Pc) bf16 + inner/wyT (H, Pc) f32 stay in budget.
        P = Ho * Wo
        budget = (11 << 20) // (2 * W + 8 * H)
        Pc = min(3584, max(128, budget // 128 * 128), -(-P // 128) * 128)
        band = None
        if max_dy is not None and Pc >= Wo:
            # banding needs chunks aligned to whole output rows and to
            # the 128-lane block grain
            rows_per_chunk = Pc // Wo
            if (rows_per_chunk * Wo) % 128 == 0:
                Pc = rows_per_chunk * Wo
                lo = int(np.ceil(max_dy)) + 1
                # +(_ALIGN-1): the kernel floor-aligns the slice base to
                # _ALIGN, shifting the window down by up to _ALIGN-1 rows
                Hb = rows_per_chunk + 2 * lo + 1 + (_ALIGN - 1)
                Hb = min(H, -(-Hb // _ALIGN) * _ALIGN)
                # H % _ALIGN == 0 keeps the clip bound H-Hb aligned too
                if Hb < H and H % _ALIGN == 0:
                    band = (lo, Hb, rows_per_chunk)
        n = -(-P // Pc)
        Pp = n * Pc
        # pad coords with -2: zero tent weight -> zero-filled pixels
        ysf = jnp.full((B, 1, Pp), -2.0, jnp.float32)
        ysf = jax.lax.dynamic_update_slice(
            ysf, ys.astype(jnp.float32).reshape(B, 1, P), (0, 0, 0))
        xsf = jnp.full((B, 1, Pp), -2.0, jnp.float32)
        xsf = jax.lax.dynamic_update_slice(
            xsf, xs.astype(jnp.float32).reshape(B, 1, P), (0, 0, 0))
        ysf = ysf.reshape(B, n, 1, Pc)
        xsf = xsf.reshape(B, n, 1, Pc)
        x4 = imgs.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # (B,C,H,W)
        kernel = functools.partial(_tent_kernel, H=H, W=W, C=C, Pp=Pc,
                                   band=band)
        out = pl.pallas_call(
            kernel,
            grid=(B, n),
            in_specs=[
                # image block constant in the chunk axis -> fetched once
                # per image by the pipeline's revisiting logic
                pl.BlockSpec((1, C, H, W), lambda b, k: (b, _I0, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, Pc), lambda b, k: (b, k, _I0, _I0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 1, Pc), lambda b, k: (b, k, _I0, _I0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, C, Pc),
                                   lambda b, k: (b, k, _I0, _I0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n, C, Pc), imgs.dtype),
            interpret=interpret,
        )(x4, ysf, xsf)
        out = out.transpose(0, 2, 1, 3).reshape(B, C, Pp)[:, :, :P]
        return out.reshape(B, C, Ho, Wo).transpose(0, 2, 3, 1)


# ==================================================================
# Two-pass (Catmull-Smith) affine warp as per-row lane-gather kernels.
#
# The dense resampler above is VPU-bound on its tent builds
# (B*(H+W)*Ho*Wo elements, ~4.5e9 at the canonical shape). An affine
# map factors into a horizontal pass then a vertical pass (see
# ``ops.image.warp_affine_twopass`` for the math and the conditioning
# gate ``twopass_safe``); each pass samples every row at coordinates
# within that same row, which on TPU is a real per-vreg
# ``tpu.dynamic_gather`` — two gathers and one fma per output pixel
# instead of a W- or H-wide tent contraction. Between the passes the
# array is transposed in XLA (sublane gathers do not lower).
#
# Gathers operate on exactly 128 lanes, so source rows are processed as
# ``roll``-aligned 128-lane halves selected by index range (the same
# decomposition as the CLAHE apply kernel's 256-entry LUT lookup).


def _rows_kernel(img_ref, qs_ref, out_ref, *, H, W, Wp, C):
    """img: (1, C, H, Wp) bf16 (cols >= W are zero pad); qs: (1, H, Wp)
    f32 per-pixel source column; out: (1, C, H, Wp) bf16 with
    ``out[c, i, j] = tent-interp of img[c, i, :] at qs[i, j]`` (zero
    outside [-1, W] — identical edge semantics to the dense tent)."""
    nh = Wp // 128
    q = qs_ref[0]  # (H, Wp)
    q0f = jnp.floor(q)
    frac = q - q0f
    q0 = q0f.astype(jnp.int32)

    for c in range(C):
        op = img_ref[0, c].astype(jnp.float32)  # (H, Wp)
        halves = [
            pltpu.roll(op, jnp.int32(Wp - s * 128), 1)[:, :128]
            for s in range(nh)
        ]

        def gather(idx):  # idx (H, 128) int32, full-range column index
            valid = (idx >= 0) & (idx < W)
            idxc = jnp.clip(idx, 0, W - 1)
            acc = jnp.zeros(idx.shape, jnp.float32)
            for s, hv in enumerate(halves):
                rel = idxc - s * 128
                sel = (rel >= 0) & (rel < 128)
                g = jnp.take_along_axis(hv, jnp.clip(rel, 0, 127), axis=1)
                acc = acc + jnp.where(sel, g, 0.0)
            return jnp.where(valid, acc, 0.0)

        for jc in range(nh):
            sl = slice(jc * 128, (jc + 1) * 128)
            i0 = q0[:, sl]
            fc = frac[:, sl]
            res = gather(i0) * (1.0 - fc) + gather(i0 + 1) * fc
            out_ref[0, c, :, sl] = res.astype(out_ref.dtype)


def _resample_rows(img4: jnp.ndarray, qs: jnp.ndarray,
                   interpret: bool) -> jnp.ndarray:
    """img4 (B, C, H, W) bf16, qs (B, H, W) f32 -> (B, C, H, W)."""
    B, C, H, W = img4.shape
    Wp = -(-W // 128) * 128
    if Wp != W:
        img4 = jnp.pad(img4, ((0, 0), (0, 0), (0, 0), (0, Wp - W)))
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, Wp - W)),
                     constant_values=-2.0)
    kernel = functools.partial(_rows_kernel, H=H, W=W, Wp=Wp, C=C)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, C, H, Wp), lambda b: (b, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, Wp), lambda b: (b, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, H, Wp), lambda b: (b, _I0, _I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, H, Wp), img4.dtype),
        interpret=interpret,
    )(img4, qs)
    return out[..., :W] if Wp != W else out


@functools.partial(jax.jit, static_argnames=("interpret", "channels_first"))
def warp_dense_twopass_pallas(imgs: jnp.ndarray, dy: jnp.ndarray,
                              dx: jnp.ndarray, *,
                              interpret: bool = False,
                              channels_first: bool = False) -> jnp.ndarray:
    """Two-pass dense displacement warp: vertical lane-gather pass (on
    the transpose), then horizontal lane-gather pass.

        out[r, j] = img[r + dy(r, x*), x*],   x* = j + dx(r, j)

    vs the joint bilinear ``resample_tent_pallas``'s
    ``img[r + dy(r, j), x*]`` — i.e. the vertical field is sampled at
    the pre-warp column. Exact for any axis-aligned field (dy == 0 or
    dx == 0) and for locally-constant fields; for the smooth random
    fields of the augmentation pipeline (elastic / optical / grid
    distortion, ``ops/augment.py``) the difference is itself a
    same-class random smooth distortion, which is why this is safe as
    the default *augmentation* warp but NOT a general resampler.

    Why: the dense tent formulation contracts a 2-sparse tent with a
    W-wide matmul — ~96*224 MACs per output pixel at the canonical
    shape (measured 8.8 ms/step, MXU-bound at 5%% of the HBM roof).
    The two gather passes do 4 gathers + 2 fma per pixel.
    """
    if channels_first:
        B, C, H, W = imgs.shape
        x4 = imgs.astype(jnp.bfloat16)
    else:
        B, H, W, C = imgs.shape
        x4 = imgs.transpose(0, 3, 1, 2).astype(jnp.bfloat16)  # (B, C, H, W)
    with _x64_scope(False):
        rr = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)  # output row
        cc = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)  # output col
        # pass 1 — vertical, as a horizontal pass on the transpose:
        # rows of the transposed image are source columns, lanes are y
        p = (rr[None] + dy.astype(jnp.float32)).transpose(0, 2, 1)  # (B,W,H)
        tmp = _resample_rows(x4.transpose(0, 1, 3, 2), p, interpret)
        # pass 2 — horizontal on the untransposed layout
        q = cc[None] + dx.astype(jnp.float32)                       # (B,H,W)
        out = _resample_rows(tmp.transpose(0, 1, 3, 2), q, interpret)
    if channels_first:
        return out.astype(imgs.dtype)
    return out.transpose(0, 2, 3, 1).astype(imgs.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "channels_first"))
def warp_affine_shear_pallas(imgs: jnp.ndarray, mats: jnp.ndarray, *,
                             interpret: bool = False,
                             channels_first: bool = False) -> jnp.ndarray:
    """Two-pass affine warp (same coefficients/conditioning contract as
    ``ops.image.warp_affine_twopass`` — callers must check
    ``twopass_safe`` first). imgs (B, H, W, C) float — or (B, C, H, W)
    with ``channels_first`` (the planar augment pipeline; skips the
    NHWC round-trip transposes); mats (B, 2, 3) inverse maps,
    torchvision RandomAffine convention."""
    with _x64_scope(False):
        if channels_first:
            B, C, H, W = imgs.shape
        else:
            B, H, W, C = imgs.shape
        cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
        mats = mats.astype(jnp.float32)
        A_, Bc = mats[:, 0, 0], mats[:, 0, 1]
        Cc, D_ = mats[:, 1, 0], mats[:, 1, 1]
        Tx, Ty = mats[:, 0, 2], mats[:, 1, 2]
        Dsafe = jnp.where(jnp.abs(D_) < 1e-2,
                          jnp.where(D_ < 0, -1e-2, 1e-2), D_)
        e = Bc / Dsafe
        d = A_ - e * Cc
        z = Tx - e * Ty

        x4 = (imgs if channels_first
              else imgs.transpose(0, 3, 1, 2)).astype(jnp.bfloat16)
        uc = jnp.arange(H, dtype=jnp.float32) - cy
        xc = jnp.arange(W, dtype=jnp.float32) - cx

        # pass 1 — horizontal, per input row u
        q = (d[:, None, None] * xc[None, None, :]
             + e[:, None, None] * uc[None, :, None]
             + z[:, None, None] + cx)  # (B, H, W)
        tmp = _resample_rows(x4, q, interpret)

        # pass 2 — vertical, as a horizontal pass on the transpose
        p = (Cc[:, None, None] * xc[None, :, None]
             + D_[:, None, None] * uc[None, None, :]
             + Ty[:, None, None] + cy)  # (B, W, H): rows x, lanes y
        out_t = _resample_rows(tmp.transpose(0, 1, 3, 2), p, interpret)

        out = out_t.transpose(0, 1, 3, 2)  # (B, C, H, W)
        if channels_first:
            return out.astype(imgs.dtype)
        return out.transpose(0, 2, 3, 1).astype(imgs.dtype)
