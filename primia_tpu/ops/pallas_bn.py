"""Pallas channel-reduction kernels for train-mode batch norm.

The BN-stat reductions are the second sub-roofline bucket of the
ResNet train step (BASELINE.md round-3: 7.68 ms/step at 55-92% of the
HBM roof @ batch 256): the forward mean/var reduction and the backward
dgamma/dbeta reductions each traverse every activation in the network.
These kernels run exactly those traversals — bf16 reads, f32 register
accumulation, one HBM pass per reduction — and nothing else:

* :func:`channel_sums` — (sum x, sum x^2) per channel in ONE read,
* :func:`grad_channel_sums` — (sum g, sum g*x) per channel in one read
  of the pair.

Everything elementwise (the normalize, relu, dx assembly) deliberately
stays in jnp so XLA keeps fusing it with neighboring ops; only the
reductions are hand-scheduled. :func:`bn_train` packages the pair as a
``custom_vjp`` train-mode batch norm with torch semantics (biased var
for the normalize), used by ``nn.core.batch_norm`` on TPU.

Layout is the whole game at C < 128: XLA keeps such activations in the
batch-minor ``{0,3,2,1}`` layout (batch fills the 128 lanes), so those
take a copy-free ``(H*W, C, B)`` transpose-view kernel that reduces
over rows AND lanes. C >= 128 activations are row-major and reduce
directly; small odd shapes (C < 128 with small batch) fold channels
into lane groups ((N, C) -> (N/G, G*C), G = 128//C). Partial final
row-blocks are masked in-register on every path.

Reference counterpart: torch's fused CUDA batch norm inside the hot
loop at ``torchlib/utils.py:1236-1292`` (the reference has no TPU
path at all).
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


def _block_rows(lanes: int, nbufs: int) -> int:
    """Rows per block: keep nbufs input blocks around ~1 MB total."""
    target = (1024 * 1024) // (nbufs * lanes * 2)
    return max(8, (target // 8) * 8)


def _row_mask(shape, base, n_valid):
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 0) + base
    return rows < n_valid


def _sums_kernel(x_ref, out_ref, acc_ref, *, rows, n_valid):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)
    m = _row_mask(x.shape, pl.program_id(0) * rows, n_valid)
    x = jnp.where(m, x, 0.0)
    acc_ref[0:1, :] += jnp.sum(x, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(x * x, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _gsums_kernel(g_ref, x_ref, out_ref, acc_ref, *, rows, n_valid):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:].astype(jnp.float32)
    m = _row_mask(g.shape, pl.program_id(0) * rows, n_valid)
    # mask the PRODUCT too: out-of-bounds x reads are garbage and can
    # be NaN/Inf, and 0 * NaN = NaN
    gx = jnp.where(m, g * x_ref[:].astype(jnp.float32), 0.0)
    g = jnp.where(m, g, 0.0)
    acc_ref[0:1, :] += jnp.sum(g, axis=0, keepdims=True)
    acc_ref[1:2, :] += jnp.sum(gx, axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# batch-minor variants: blocks are (rows, C, B) slices of the
# (H*W, C, B) transpose view; reduce over rows and lanes, keep C

def _sums_kernel_bm(x_ref, out_ref, acc_ref, *, rows, n_valid):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:].astype(jnp.float32)  # (rows, C, B)
    m = _row_mask(x.shape, pl.program_id(0) * rows, n_valid)
    x = jnp.where(m, x, 0.0)
    acc_ref[0:1, :] += jnp.sum(x, axis=(0, 2))[None, :]
    acc_ref[1:2, :] += jnp.sum(x * x, axis=(0, 2))[None, :]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _gsums_kernel_bm(g_ref, x_ref, out_ref, acc_ref, *, rows, n_valid):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g = g_ref[:].astype(jnp.float32)  # (rows, C, B)
    m = _row_mask(g.shape, pl.program_id(0) * rows, n_valid)
    gx = jnp.where(m, g * x_ref[:].astype(jnp.float32), 0.0)
    g = jnp.where(m, g, 0.0)
    acc_ref[0:1, :] += jnp.sum(g, axis=(0, 2))[None, :]
    acc_ref[1:2, :] += jnp.sum(gx, axis=(0, 2))[None, :]

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _batch_minor(x) -> bool:
    """True when XLA keeps this activation in the batch-minor
    ``{0,3,2,1}`` layout: C < 128 wastes lanes row-major (the (8,128)
    tile pads C up to 128, doubling HBM bytes for C=64), so XLA puts
    the batch on the lanes instead. Reading such tensors through their
    free ``(H, W, C, B)`` transpose view keeps the kernel copy-free."""
    return x.ndim == 4 and x.shape[-1] < 128 and x.shape[0] >= 128


def _fold(x2d):
    """Fold small channel counts into full 128-lane groups.

    (N, C) -> (N/G, G*C) with G = 128//C; rows are zero-padded up to a
    multiple of G (zeros contribute nothing to either sum). Only used
    on the row-major path — batch-minor activations (the common C<128
    case at training batch sizes) take the transpose-view path instead.
    """
    N, C = x2d.shape
    if C >= 128:
        return x2d, 1
    G = max(1, 128 // C)
    pad = (-N) % G
    if pad:
        x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
    return x2d.reshape(-1, G * C), G


def _interpret() -> bool:
    return os.environ.get("PRIMIA_PALLAS_INTERPRET", "0") == "1"


def _run_reduce(kernel_fn, arrays, lanes, rows_n):
    rows = _block_rows(lanes, len(arrays))
    grid = pl.cdiv(rows_n, rows)
    kern = functools.partial(kernel_fn, rows=rows, n_valid=rows_n)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, lanes), lambda i: (i, _I0),
                         memory_space=pltpu.VMEM)
            for _ in arrays
        ],
        out_specs=pl.BlockSpec((2, lanes), lambda i: (_I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, lanes), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, lanes), jnp.float32)],
        interpret=_interpret(),
    )(*arrays)


def _run_reduce_bm(kernel_fn, arrays, rows_n, C, B):
    """Batch-minor runner: arrays are (H*W, C, B) transpose views."""
    rows = _block_rows(C * B, len(arrays))
    grid = pl.cdiv(rows_n, rows)
    kern = functools.partial(kernel_fn, rows=rows, n_valid=rows_n)
    return pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, C, B), lambda i: (i, _I0, _I0),
                         memory_space=pltpu.VMEM)
            for _ in arrays
        ],
        out_specs=pl.BlockSpec((2, C), lambda i: (_I0, _I0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, C), jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, C), jnp.float32)],
        interpret=_interpret(),
    )(*arrays)


def _bm_view(x):
    """Free (H*W, C, B) view of a batch-minor (B, H, W, C) activation.

    With operand layout {0,3,2,1} the transpose is a bitcast and the
    reshape merges adjacent major dims — no data movement."""
    B, H, W, C = x.shape
    return x.transpose(1, 2, 3, 0).reshape(H * W, C, B)


def channel_sums(x) -> tuple:
    """(sum, sum of squares) over all but the last axis, f32."""
    C = x.shape[-1]
    if _batch_minor(x):
        xt = _bm_view(x)
        out = _run_reduce_bm(_sums_kernel_bm, [xt], xt.shape[0], C,
                             x.shape[0])
        return tuple(out)
    xf, G = _fold(x.reshape(-1, C))
    out = _run_reduce(_sums_kernel, [xf], xf.shape[1], xf.shape[0])
    return tuple(out.reshape(2, G, C).sum(axis=1))


def grad_channel_sums(g, x) -> tuple:
    """(sum g, sum g*x) over all but the last axis, f32, one pass."""
    C = x.shape[-1]
    if _batch_minor(x):
        gt, xt = _bm_view(g), _bm_view(x)
        out = _run_reduce_bm(_gsums_kernel_bm, [gt, xt], xt.shape[0], C,
                             x.shape[0])
        return tuple(out)
    gf, G = _fold(g.reshape(-1, C))
    xf, _ = _fold(x.reshape(-1, C))
    out = _run_reduce(_gsums_kernel, [gf, xf], xf.shape[1], xf.shape[0])
    return tuple(out.reshape(2, G, C).sum(axis=1))


# ----------------------------------------------------------- bn_train

@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(x, gamma, beta, eps: float = 1e-5):
    """Train-mode batch norm; returns (y, mean, biased var).

    y is in x.dtype; mean/var are f32 (for the running-stat update,
    which is not differentiated — its cotangents are discarded).
    """
    y, mean, var, _ = _bn_fwd_impl(x, gamma, beta, eps)
    return y, mean, var


def _bn_fwd_impl(x, gamma, beta, eps):
    n = x.size // x.shape[-1]
    s1, s2 = channel_sums(x)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    r = jax.lax.rsqrt(var + eps)
    inv = gamma.astype(jnp.float32) * r
    off = beta.astype(jnp.float32) - mean * inv
    # elementwise normalize stays jnp: XLA fuses it with the relu /
    # residual add that consumes y
    y = (x * inv.astype(x.dtype) + off.astype(x.dtype)).astype(x.dtype)
    return y, mean, var, r


def _bn_fwd(x, gamma, beta, eps):
    y, mean, var, r = _bn_fwd_impl(x, gamma, beta, eps)
    return (y, mean, var), (x, gamma, mean, r)


def _bn_bwd(eps, res, cts):
    g = cts[0]  # cotangents of (mean, var) are zero: state not diff'd
    x, gamma, mean, r = res
    n = x.size // x.shape[-1]
    S1, S2 = grad_channel_sums(g, x)
    dbeta = S1
    dgamma = r * (S2 - mean * S1)
    # dx = gamma*r*(g - S1/n - xhat * dgamma/n) with xhat = (x-mean)*r
    #    = A*g + B*x + D  (per-channel scalars; elementwise part fuses
    #      with the upstream relu-backward in XLA)
    gr = gamma.astype(jnp.float32) * r
    m = dgamma / n
    A = gr
    B = -gr * r * m
    D = -gr * S1 / n + gr * r * m * mean
    dx = (g.astype(jnp.float32) * A + x.astype(jnp.float32) * B + D).astype(x.dtype)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(gamma.dtype)


bn_train.defvjp(_bn_fwd, _bn_bwd)


def use_pallas_bn() -> bool:
    """Opt-in (PRIMIA_PALLAS_BN=1): correct on the chip but the bench
    A/B showed 5,894 vs 8,053 img/s @ batch 512 — splitting the stats
    out of XLA's BN fusions costs more in lost fusion than the one-pass
    reductions save. Kept for the redesign."""
    return (jax.default_backend() == "tpu"
            and os.environ.get("PRIMIA_PALLAS_BN", "0") == "1")
