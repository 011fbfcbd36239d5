"""Pallas weight-gradient kernel for unit-stride 3x3 SAME convolutions.

The 3x3 weight-grads are the largest sub-roofline bucket of the ResNet
train step (BASELINE.md round-3: 6.08 ms/step at 45-60% of roof @
batch 256). XLA lowers a wgrad as a dilated convolution whose input
re-reads scale with the kernel taps; a shifted-matmul rewrite at the
XLA level re-reads ``x`` nine times from HBM and loses (documented in
BASELINE.md). This kernel owns the reuse instead:

* each grid step DMAs one batch-chunk of ``x`` (padded in h) and ``g``
  once into VMEM,
* builds the 3 h-shifted copies of ``x`` and the 3 w-shifted copies of
  ``g`` *in VMEM* (``X3``: (n*H*W, 3*ci), ``G3``: (n*H*W, 3*co)) —
  shifting ``g`` by ``-kw`` instead of ``x`` by ``+kw`` is what lets one
  flattened (h,w) contraction produce all nine taps:
  ``dw[kh,kw] = sum_{oh,ow} x_pad[oh+kh, ow+kw] g[oh,ow]
             = sum_{h,w}  x_h[h+kh, w]  g_w[h, w+2-kw]``,
* one bf16 matmul ``X3^T @ G3`` per step accumulates all nine taps
  into a (3ci, 3co) f32 scratch across the sequential TPU grid.

HBM traffic is exactly one read of ``x`` and one of ``g``; MXU tiles
are (3ci, 3co) — full 128-lane tiles for every ResNet stage (ci >= 64).

The matching forward/data-grad stay on XLA's convolutions (they already
run at the roof); :func:`conv3x3_s1p1` packages the three as a
``custom_vjp`` so ``jax.grad`` picks this kernel up transparently.
Reference hot loop this accelerates: ``torchlib/utils.py:1236-1292``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_I0 = np.int32(0)


def _pick_batch_chunk(B: int, H: int, W: int, C: int) -> int:
    """Largest batch chunk whose VMEM working set stays under budget.

    The (3ci,3co) f32 accumulator IS the output block (no separate
    scratch — at C=512 two copies blew the 16 MB scoped-VMEM limit on
    the real chip). Inputs are double-buffered by the pipeline, the
    shifted X3/G3 copies live on the stack once.
    """
    acc = 9 * C * C * 4
    per_img = (
        2 * ((H + 2) * W * C * 2 + H * (W + 2) * C * 2)  # x/g, double-buffered
        + 2 * H * W * 3 * C * 2 * 2  # X3 + G3 stack temporaries
    )
    budget = 13 * 1024 * 1024 - acc
    n = max(1, budget // max(per_img, 1))
    n = int(min(n, B))
    while B % n:
        n -= 1
    return n


def _wgrad_kernel(x_ref, g_ref, out_ref, *, n, H, W, ci, co):
    """One batch-chunk per grid step; out block persists across the grid."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]  # (n, H+2, W, ci) bf16, zero h-halo
    g = g_ref[:]  # (n, H,  W+2, co) bf16, zero w-halo
    X3 = jnp.concatenate(
        [x[:, kh : kh + H].reshape(n * H * W, ci) for kh in range(3)], axis=1
    )
    G3 = jnp.concatenate(
        [g[:, :, 2 - kw : 2 - kw + W].reshape(n * H * W, co) for kw in range(3)],
        axis=1,
    )
    out_ref[:] += jax.lax.dot_general(
        X3, G3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def conv3x3_wgrad_pallas(x: jnp.ndarray, g: jnp.ndarray, *, interpret: bool = False
                         ) -> jnp.ndarray:
    """dL/dw for y = conv(x, w, stride 1, SAME(pad 1)), 3x3 HWIO kernel.

    x: (B, H, W, ci); g: (B, H, W, co) — cotangent of y. Returns
    (3, 3, ci, co) float32.
    """
    B, H, W, ci = x.shape
    co = g.shape[-1]
    n = _pick_batch_chunk(B, H, W, max(ci, co))
    dt = jnp.bfloat16
    # zero halos materialized once (fused pads, cheap); shifting g by -kw
    # needs one w-halo column on each side, x one h-halo row
    x_h = jnp.pad(x.astype(dt), ((0, 0), (1, 1), (0, 0), (0, 0)))
    g_w = jnp.pad(g.astype(dt), ((0, 0), (0, 0), (1, 1), (0, 0)))

    kernel = functools.partial(_wgrad_kernel, n=n, H=H, W=W, ci=ci, co=co)
    dw2 = pl.pallas_call(
        kernel,
        grid=(B // n,),
        in_specs=[
            pl.BlockSpec((n, H + 2, W, ci), lambda b: (b, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, H, W + 2, co), lambda b: (b, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * ci, 3 * co), lambda b: (_I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * ci, 3 * co), jnp.float32),
        interpret=interpret,
    )(x_h, g_w)
    # dw2[kh*ci + ci', kw*co + co'] -> (3, 3, ci, co) HWIO
    return dw2.reshape(3, ci, 3, co).transpose(0, 2, 1, 3)


def _wgrad_kernel_v2(x_ref, g_ref, out_ref, *, n, H, W, ci, co):
    """v2 schedule: halo shifts built IN VMEM by zero-fill concatenates
    instead of reading pre-padded HBM copies — v1 materialized padded
    x and g in HBM (an extra full write+read of each operand, exactly
    the traffic the kernel exists to avoid). Same single
    (nHW, 3ci)^T @ (nHW, 3co) nine-tap contraction."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x = x_ref[:]  # (n, H, W, ci) bf16, unpadded
    g = g_ref[:]  # (n, H, W, co) bf16, unpadded
    zx = jnp.zeros((n, 1, W, ci), x.dtype)
    zg = jnp.zeros((n, H, 1, co), g.dtype)
    # tap kh reads x[h + kh - 1] (zero outside); tap kw reads g[w + 1 - kw]
    xs = (jnp.concatenate([zx, x[:, :-1]], 1), x,
          jnp.concatenate([x[:, 1:], zx], 1))
    gs = (jnp.concatenate([g[:, :, 1:], zg], 2), g,
          jnp.concatenate([zg, g[:, :, :-1]], 2))
    X3 = jnp.concatenate([t.reshape(n * H * W, ci) for t in xs], axis=1)
    G3 = jnp.concatenate([t.reshape(n * H * W, co) for t in gs], axis=1)
    out_ref[:] += jax.lax.dot_general(
        X3, G3, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def conv3x3_wgrad_pallas_v2(x: jnp.ndarray, g: jnp.ndarray, *,
                            interpret: bool = False) -> jnp.ndarray:
    """v2 of :func:`conv3x3_wgrad_pallas`: no HBM halo pads (shifts in
    VMEM), natural (n,H,W,C) blocks. Same contract: (3,3,ci,co) f32."""
    B, H, W, ci = x.shape
    co = g.shape[-1]
    C = max(ci, co)
    # VMEM per image: x+g double-buffered + shifted copies + X3/G3
    acc = 9 * ci * co * 4
    per_img = 2 * 2 * H * W * (ci + co) * 2 + 2 * H * W * 3 * (ci + co) * 2
    budget = 13 * 1024 * 1024 - acc
    n = max(1, budget // max(per_img, 1))
    n = int(min(n, B))
    while B % n:
        n -= 1

    kernel = functools.partial(_wgrad_kernel_v2, n=n, H=H, W=W, ci=ci, co=co)
    dw2 = pl.pallas_call(
        kernel,
        grid=(B // n,),
        in_specs=[
            pl.BlockSpec((n, H, W, ci), lambda b: (b, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, H, W, co), lambda b: (b, _I0, _I0, _I0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * ci, 3 * co), lambda b: (_I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * ci, 3 * co), jnp.float32),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), g.astype(jnp.bfloat16))
    return dw2.reshape(3, ci, 3, co).transpose(0, 2, 1, 3)


def _conv_s1p1(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@jax.custom_vjp
def conv3x3_s1p1(x, w):
    """3x3/s1/p1 NHWC conv whose weight-grad runs on the Pallas kernel.

    Forward and data-grad are XLA's own convolutions (already at the
    roof); only the wgrad lowering is replaced.
    """
    return _conv_s1p1(x, w)


def _fwd(x, w):
    return _conv_s1p1(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # data grad: full-correlation with the spatially-flipped, IO-swapped
    # kernel — exact for stride 1 SAME
    w_rot = jnp.flip(w, (0, 1)).swapaxes(2, 3)
    dx = _conv_s1p1(g, w_rot.astype(g.dtype)).astype(x.dtype)
    ci, co = x.shape[-1], g.shape[-1]
    if max(ci, co) <= 256:
        # v2 only where XLA's wgrad runs below roof (the early/mid HBM-
        # bound stages); the C=512 stage is at its MXU floor under XLA
        # and the 9C^2 f32 accumulator would leave 1-2-image chunks
        dw = conv3x3_wgrad_pallas_v2(x, g).astype(w.dtype)
    else:
        _, vjp_w = jax.vjp(lambda w_: _conv_s1p1(x, w_), w)
        (dw,) = vjp_w(g)  # XLA's own wgrad: already at its MXU floor
    return dx, dw


conv3x3_s1p1.defvjp(_fwd, _bwd)


def use_pallas_wgrad() -> bool:
    """Opt-in (PRIMIA_PALLAS_WGRAD=1). Both schedules are correct on
    the chip and both LOSE to XLA's wgrad lowering — v1 6,229 and v2
    6,625 vs 8,035 img/s baseline (bench A/B @ batch 512, medians).
    v2 removed v1's HBM halo pads (+6%), but the remaining gap is
    structural: the (3ci, 3co) f32 VMEM accumulator caps the batch
    chunk at 1-4 images, whose (n*H*W)-row contractions under-tile the
    MXU, and the in-VMEM X3/G3 shift-copies add ~6x the input volume
    in VPU copy work that XLA's direct dilated-conv lowering never
    pays. Blocking the accumulator to raise the chunk would push
    accumulator partial sums through HBM and cost more than the one
    read of x/g saves. The 3x3-wgrad roofline bucket is retired with
    this bound (BASELINE.md round 5); the kernels stay as measured
    documentation."""
    return (jax.default_backend() == "tpu"
            and os.environ.get("PRIMIA_PALLAS_WGRAD", "0") == "1")
