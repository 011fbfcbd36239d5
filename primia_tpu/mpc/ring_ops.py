"""Ring (Z_{2^64}) matmul and conv2d that run on the TPU MXU.

TPU XLA compiles elementwise int64 fine but rejects int64 dot/conv
(verified empirically on v5e: ``lax.dot``/``conv`` with s64 operands or
s64 accumulation fail to compile, while int8 x int8 -> int32 dot/conv
lower to the MXU). The share-space convolutions and matmuls are the MPC
hot path, so exact mod-2^64 products are built from **signed byte
limbs**:

    v = sum_i b_i * 2^(8 i),  b_i in [-128, 127]   (carry-adjusted)

    A @ B mod 2^64 = sum_{i+j <= 7} (A_i @ B_j) << 8(i+j)

Each limb product is an int8 x int8 -> int32 MXU op (exact: |products|
< 2^14, accumulation depth up to 2^17 fits int32), recombined with
elementwise int64 shifts. 36 MXU passes replace one impossible s64 op —
and at int8 MXU throughput this still beats the reference's CPU-side
int64 torch ops by orders of magnitude.

On CPU (tests / simulation) the native int64 path is used directly.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

N_LIMBS = 8


def _use_native_int64() -> bool:
    return jax.default_backend() == "cpu"


def to_limbs(v: jnp.ndarray) -> jnp.ndarray:
    """int64 (...,) -> int8 limbs (N_LIMBS, ...), signed-digit base 256."""
    u = v.astype(jnp.uint64)
    limbs = []
    carry = jnp.zeros_like(u, dtype=jnp.int32)
    for i in range(N_LIMBS):
        raw = ((u >> jnp.uint64(8 * i)) & jnp.uint64(0xFF)).astype(jnp.int32) + carry
        high = (raw >= 128).astype(jnp.int32)
        limbs.append((raw - 256 * high).astype(jnp.int8))
        carry = high
    return jnp.stack(limbs)


def from_limb_products(products) -> jnp.ndarray:
    """{(i, j): int32 array} -> int64 result, sum of (p << 8(i+j))."""
    out = None
    for (i, j), p in products.items():
        term = p.astype(jnp.int64) << jnp.int64(8 * (i + j))
        out = term if out is None else out + term
    return out


def _limb_bilinear(f_i8, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Generic exact mod-2^64 bilinear op via byte limbs.

    f_i8(a_i8, b_i8) must compute the int32-accumulated bilinear op of
    two int8 operands.
    """
    la = to_limbs(a)
    lb = to_limbs(b)
    products = {}
    for i in range(N_LIMBS):
        for j in range(N_LIMBS - i):
            products[(i, j)] = f_i8(la[i], lb[j])
    return from_limb_products(products)


def ring_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Exact (a @ b) mod 2^64 for int64 operands."""
    if _use_native_int64():
        return a @ b

    def dot_i8(x, y):
        return jax.lax.dot_general(
            x, y,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return _limb_bilinear(dot_i8, a, b)


def ring_conv2d(x: jnp.ndarray, w: jnp.ndarray, stride: int, padding: int) -> jnp.ndarray:
    """Exact NHWC/HWIO conv mod 2^64 for int64 operands."""
    dn = ("NHWC", "HWIO", "NHWC")
    pad = ((padding, padding), (padding, padding))
    if _use_native_int64():
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad, dimension_numbers=dn
        )

    def conv_i8(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, (stride, stride), pad,
            dimension_numbers=dn, preferred_element_type=jnp.int32,
        )

    return _limb_bilinear(conv_i8, x, w)


def ring_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise ring product (int64 elementwise works on all backends)."""
    return a * b


def ring_conv_general(
    x: jnp.ndarray,
    w: jnp.ndarray,
    *,
    strides=(1, 1),
    padding=((0, 0), (0, 0)),
    lhs_dilation=None,
    rhs_dilation=None,
    dn=("NHWC", "HWIO", "NHWC"),
) -> jnp.ndarray:
    """Exact mod-2^64 ``conv_general_dilated`` — the general form needed
    by the share-space convolution *gradients* (input grad = dilated
    transposed conv, weight grad = batch-contracting conv with
    rhs_dilation). Same limb decomposition as :func:`ring_conv2d`; the
    int32 accumulation bound holds for the small-batch encrypted
    training shapes (contraction depth < 2^17)."""
    kw = dict(window_strides=strides, padding=padding,
              lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
              dimension_numbers=dn)
    if _use_native_int64():
        return jax.lax.conv_general_dilated(x, w, **kw)

    def conv_i8(xi, wi):
        return jax.lax.conv_general_dilated(
            xi, wi, preferred_element_type=jnp.int32, **kw)

    return _limb_bilinear(conv_i8, x, w)
