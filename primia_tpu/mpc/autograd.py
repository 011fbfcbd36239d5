"""Autograd over secret shares — encrypted *training*.

Reference: ``syft/.../interpreters/autograd.py`` (AutogradTensor)
re-implements backward functions per op so ``.backward()`` works on
FixedPrecision/AdditiveSharing chains — gradients themselves stay in
share space, enabling training where neither data, activations, nor
gradients are ever revealed.

TPU redesign: a tiny reverse-mode tape over :class:`AShare` values.
Every op records a share-space VJP; since weights AND activations are
both private during training, every product in the backward pass is
itself a Beaver-triple product (the reference pays the same). The tape
is plain Python over jnp ops, so an entire forward+backward+SGD step
traces into ONE XLA program under ``jax.jit`` — the graph structure is
static, only share values flow.

Supported op surface (matches what the reference's AutogradTensor backs
for its CNN/MLP paths): matmul/linear, conv2d, relu, avg_pool, flatten,
add, sub, mul, and an MSE loss head. Example:

    vars = {k: ag.Var(v) for k, v in param_shares.items()}
    loss, grads = ag.value_and_grad(forward)(ctx, vars, x_share, y_share)
    new = {k: ag.sgd_update(v.value, grads[k], lr, ctx.frac_bits) ...}
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from primia_tpu.mpc import beaver, fixed, ring_ops
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.engine import MpcContext
from primia_tpu.mpc.shares import AShare


class Var:
    """A share-space tensor tracked by the tape."""

    __slots__ = ("value", "parents", "vjp")

    def __init__(self, value: AShare, parents: Tuple["Var", ...] = (),
                 vjp: Optional[Callable] = None):
        self.value = value
        self.parents = parents
        self.vjp = vjp  # grad_out -> tuple of parent grads (AShare or None)

    @property
    def shape(self):
        return self.value.shape


def _accumulate(into: Optional[AShare], g: AShare) -> AShare:
    return g if into is None else S.add(into, g)


def backward(root: Var, seed_grad: AShare) -> Dict[int, AShare]:
    """Reverse topological sweep; returns {id(var): grad_share} for every
    tape node (callers look up their leaves)."""
    order: List[Var] = []
    seen = set()

    def topo(v: Var):
        if id(v) in seen:
            return
        seen.add(id(v))
        for p in v.parents:
            topo(p)
        order.append(v)

    topo(root)
    grads: Dict[int, AShare] = {id(root): seed_grad}
    for v in reversed(order):
        g = grads.get(id(v))
        if g is None or v.vjp is None:
            continue
        for parent, pg in zip(v.parents, v.vjp(g)):
            if pg is not None:
                grads[id(parent)] = _accumulate(grads.get(id(parent)), pg)
    return grads


# ---------------------------------------------------------------- ops

def add(x: Var, y: Var) -> Var:
    return Var(S.add(x.value, y.value), (x, y), lambda g: (g, g))


def sub(x: Var, y: Var) -> Var:
    return Var(S.sub(x.value, y.value), (x, y), lambda g: (g, S.neg(g)))


def mul(ctx: MpcContext, x: Var, y: Var) -> Var:
    """Elementwise private product (both grads are Beaver products)."""
    fb = ctx.frac_bits
    out = AShare(fixed.truncate_shares(
        beaver.mul(ctx.next_key(), x.value, y.value).data, fb))

    def vjp(g):
        gx = AShare(fixed.truncate_shares(
            beaver.mul(ctx.next_key(), g, y.value).data, fb))
        gy = AShare(fixed.truncate_shares(
            beaver.mul(ctx.next_key(), g, x.value).data, fb))
        return gx, gy

    return Var(out, (x, y), vjp)


def _matmul_t(ctx: MpcContext, a: AShare, b: AShare, ta=False, tb=False) -> AShare:
    """Beaver matmul with optional local transposes + truncation."""
    av = AShare(jnp.swapaxes(a.data, -1, -2)) if ta else a
    bv = AShare(jnp.swapaxes(b.data, -1, -2)) if tb else b
    z = beaver.matmul(ctx.next_key(), av, bv)
    return AShare(fixed.truncate_shares(z.data, ctx.frac_bits))


def linear(ctx: MpcContext, x: Var, w: Var, b: Optional[Var] = None) -> Var:
    """y = x @ w (+ b); x: (B, in), w: (in, out)."""
    y = _matmul_t(ctx, x.value, w.value)
    if b is not None:
        y = AShare(y.data + b.value.data.reshape(2, 1, -1))

    def vjp(g):
        gx = _matmul_t(ctx, g, w.value, tb=True)  # g @ w^T
        gw = _matmul_t(ctx, x.value, g, ta=True)  # x^T @ g
        gb = AShare(jnp.sum(g.data, axis=1)) if b is not None else None
        return (gx, gw, gb) if b is not None else (gx, gw)

    return Var(y, (x, w, b) if b is not None else (x, w), vjp)


def conv2d(ctx: MpcContext, x: Var, w: Var, stride: int = 1, padding: int = 0) -> Var:
    """NHWC x HWIO share-space conv with share-space gradients."""
    fb = ctx.frac_bits
    z = beaver.conv2d(ctx.next_key(), x.value, w.value, stride, padding)
    out = AShare(fixed.truncate_shares(z.data, fb))
    kh, kw = w.shape[0], w.shape[1]
    H, W = x.shape[1], x.shape[2]
    # when (dim + 2p - k) % stride != 0 the forward conv discards a
    # partial window; the gradient convs must account for the remainder
    rem_h = (H + 2 * padding - kh) % stride
    rem_w = (W + 2 * padding - kw) % stride

    def vjp(g):
        # input grad: transposed conv = conv of the stride-dilated g
        # with the spatially-flipped, IO-swapped kernel
        f_gx = lambda gd, wd: ring_ops.ring_conv_general(
            gd,
            jnp.swapaxes(wd[::-1, ::-1], 2, 3),
            padding=((kh - 1 - padding, kh - 1 - padding + rem_h),
                     (kw - 1 - padding, kw - 1 - padding + rem_w)),
            lhs_dilation=(stride, stride),
        )
        t = beaver.gen_triple(ctx.next_key(), f_gx, g.shape, w.shape)
        gx = beaver.bilinear(f_gx, g, w.value, t)
        gx = AShare(fixed.truncate_shares(gx.data, fb))

        # weight grad: contract over batch+output-space — x as
        # (Cin, H, W, B) "images", g as (Ho, Wo, B, Cout) "kernels"
        # dilated by the stride; output (Cin, KH, KW, Cout) -> HWIO,
        # sliced to the kernel extent when a partial window remains
        f_gw = lambda xd, gd: jnp.transpose(
            ring_ops.ring_conv_general(
                jnp.transpose(xd, (3, 1, 2, 0)),
                jnp.transpose(gd, (1, 2, 0, 3)),
                padding=((padding, padding), (padding, padding)),
                rhs_dilation=(stride, stride),
            ),
            (1, 2, 0, 3),
        )[:kh, :kw]
        t2 = beaver.gen_triple(ctx.next_key(), f_gw, x.shape, g.shape)
        gw = beaver.bilinear(f_gw, x.value, g, t2)
        gw = AShare(fixed.truncate_shares(gw.data, fb))
        return gx, gw

    return Var(out, (x, w), vjp)


def bias_add(x: Var, b: Var) -> Var:
    """Channelwise bias on NHWC activations."""
    bd = b.value.data.reshape(
        (2,) + (1,) * (x.value.ndim - len(b.shape)) + b.shape)

    def vjp(g):
        axes = tuple(range(1, g.data.ndim - len(b.shape)))
        return g, AShare(jnp.sum(g.data, axis=axes))

    return Var(AShare(x.value.data + bd), (x, b), vjp)


def relu(ctx: MpcContext, x: Var) -> Var:
    """One private comparison; the positive-mask shares are reused by
    the backward pass (the reference's relu_deriv does the same)."""
    sign = ctx.sign_shares(x.value)
    pos = S.add_public(S.neg(sign), 1)  # shares of 1{x >= 0}
    y = beaver.mul(ctx.next_key(), x.value, pos)  # bit product: no truncation

    def vjp(g):
        return (beaver.mul(ctx.next_key(), g, pos),)

    return Var(y, (x,), vjp)


def avg_pool(ctx: MpcContext, x: Var, window: int, stride: Optional[int] = None) -> Var:
    """Non-overlapping average pool (stride defaults to window)."""
    stride = stride or window
    if stride != window:
        raise NotImplementedError("encrypted avg_pool is non-overlapping")
    d = x.value.data
    _, B, H, W, C = d.shape
    inv = fixed.encode(1.0 / (window * window), ctx.frac_bits)
    summed = jax.lax.reduce_window(
        d, jnp.zeros((), d.dtype), jax.lax.add,
        (1, 1, window, window, 1), (1, 1, stride, stride, 1), "VALID")
    out = AShare(fixed.truncate_shares(summed * inv, ctx.frac_bits))

    def vjp(g):
        scaled = fixed.truncate_shares(g.data * inv, ctx.frac_bits)
        up = jnp.repeat(jnp.repeat(scaled, window, axis=2), window, axis=3)
        # VALID pooling drops partial windows when H/W are not multiples
        # of the window; those input positions get zero gradient, so
        # zero-pad back to (H, W) rather than returning a smaller share
        # (a bare slice would shape-mismatch the upstream VJP at trace).
        ph, pw = H - up.shape[2], W - up.shape[3]
        up = jnp.pad(up, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)))
        return (AShare(up),)

    return Var(out, (x,), vjp)


def flatten(x: Var) -> Var:
    shp = x.shape

    def vjp(g):
        return (AShare(g.data.reshape((2, *shp))),)

    return Var(S.reshape(x.value, (shp[0], -1)), (x,), vjp)


def mse_loss(ctx: MpcContext, pred: Var, target: AShare) -> Tuple[Var, AShare]:
    """Mean squared error over all elements; returns (loss_var,
    loss_share). ``backward(loss_var, seed)`` expects the seed 1.0
    encoded, matching d(loss)/d(loss)=1."""
    n = 1
    for s in pred.shape:
        n *= s
    diff = S.sub(pred.value, target)
    sq = beaver.mul(ctx.next_key(), diff, diff)
    total = AShare(jnp.sum(sq.data, axis=tuple(range(1, sq.data.ndim))))
    inv_n = fixed.encode(1.0 / n, ctx.frac_bits)
    # two pending scale-downs: the product's frac_bits and the 1/n
    loss = AShare(fixed.truncate_shares(
        fixed.truncate_shares(total.data * inv_n, ctx.frac_bits), ctx.frac_bits))

    two_over_n = fixed.encode(2.0 / n, ctx.frac_bits)

    def vjp(g):
        # g is ~encode(1); dL/dpred = 2/n * diff (elementwise public scale)
        gd = fixed.truncate_shares(diff.data * two_over_n, ctx.frac_bits)
        return (AShare(gd),)

    return Var(loss, (pred,), vjp), loss


def value_and_grad(forward: Callable):
    """forward(ctx, params: dict[str, Var], *args) -> (loss_var, aux)
    becomes f(ctx, param_shares, *args) -> (loss_share, grads dict)."""

    def f(ctx: MpcContext, param_shares: Dict[str, AShare], *args):
        pvars = {k: Var(v) for k, v in param_shares.items()}
        loss_var, loss_share = forward(ctx, pvars, *args)
        seed = S.share(ctx.next_key(),
                       jnp.full(loss_var.shape, fixed.encode(1.0, ctx.frac_bits),
                                jnp.int64))
        grads = backward(loss_var, seed)
        gdict = {k: grads.get(id(v), S.zeros_like(v.value))
                 for k, v in pvars.items()}
        return loss_share, gdict

    return f


def sgd_update(w: AShare, g: AShare, lr: float,
               frac_bits: int = fixed.DEFAULT_FRAC_BITS) -> AShare:
    """w - lr * g entirely in share space (public lr)."""
    step = fixed.truncate_shares(g.data * fixed.encode(lr, frac_bits), frac_bits)
    return AShare(w.data - step)
