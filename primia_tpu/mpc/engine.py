"""MPC engine: the nn.core op protocol over additive shares.

The same model graphs that run in plaintext (``primia_tpu.nn``) run over
secret shares by passing this engine — the TPU-native replacement for
the reference's share-space ``nn.functional``
(``syft/frameworks/torch/nn/functional.py:204-560``):

- conv2d / linear: Beaver triples with *conv-shaped* correlations (no
  im2col round-trips); truncation after every fixed-point product.
- relu: one DCF sign extraction + one Beaver product
  (``relu(x) = x * (1 - msb(x))``), batched over the whole activation.
- max_pool: window unfold (local, per party) + tournament max, each
  round a single batched comparison (reference: pairwise AST max,
  ``functional.py:420-527``).
- avg_pool: local window sum + public-reciprocal rescale.
- affine: folded inference batch norm (the reference's private Newton
  inverse-sqrt batch norm becomes an exact offline fold +
  one Beaver product).

Dealer randomness comes from a per-forward PRNG context, tracing the
offline phase into the same XLA program (the crypto provider is a
colocated party, as in the reference's VirtualWorker setup).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from primia_tpu.mpc import beaver, compare, fixed
from primia_tpu.mpc import shares as S
from primia_tpu.mpc.shares import AShare

# Ring padding value for max pooling: decodes to -2^14 at frac_bits=16,
# far below any activation but inside the 32-bit comparison domain.
_PAD_NEG = -(1 << 30)


class MpcContext:
    """Per-forward PRNG stream for the simulated dealer.

    ``protocol`` picks the private-comparison backend, mirroring the
    reference's ``@crypto_protocol`` dispatch (``mpc/__init__.py:4-39``):
    "snn" (SecureNN bit circuit — hardware-right for mesh-colocated
    parties, ~100x cheaper per element) or "fss" (AriaNN DCF — one
    online round, right for genuinely-remote parties). Both produce
    identical shares.
    """

    def __init__(self, key, frac_bits: int = fixed.DEFAULT_FRAC_BITS,
                 protocol: str = "snn", debug_domains: bool = None):
        if protocol not in ("snn", "fss"):
            raise ValueError(f"unknown MPC protocol {protocol!r}")
        self._key = key
        self.frac_bits = frac_bits
        self.protocol = protocol
        # Debug-only domain guard for the FPT approximation functions
        # (mpc/functions.py): out-of-domain inputs fail loudly instead
        # of silently corrupting shares. Reconstructs the operand to
        # check it — a deliberate privacy breach, debug mode only.
        # (The reference shares the silent posture, precision.py:476-520.)
        if debug_domains is None:
            import os

            debug_domains = os.environ.get(
                "PRIMIA_MPC_DEBUG_DOMAINS", "0") == "1"
        self.debug_domains = debug_domains

    def next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def sign_shares(self, x: AShare) -> AShare:
        """Protocol-dispatched shares of 1{x < 0}."""
        if self.protocol == "fss":
            return compare.sign_shares(self.next_key(), x)
        from primia_tpu.mpc import securenn

        return securenn.sign_shares(self.next_key(), x)


class MpcEngine:
    name = "mpc"

    def __init__(self, ctx: MpcContext):
        self.ctx = ctx

    # ------------------------------------------------------------ helpers

    def _truncate(self, z: AShare) -> AShare:
        return AShare(fixed.truncate_shares(z.data, self.ctx.frac_bits))

    def _mul(self, x: AShare, y: AShare, *, truncate: bool = True) -> AShare:
        z = beaver.mul(self.ctx.next_key(), x, y)
        return self._truncate(z) if truncate else z

    def _max_pair(self, a: AShare, b: AShare) -> AShare:
        """max(a, b) = a + (b - a) * (1 - msb(b - a)); one comparison +
        one (un-truncated: the bit is an integer) product."""
        d = S.sub(b, a)
        sign = self.ctx.sign_shares(d)
        pos = S.add_public(S.neg(sign), 1)  # 1 - msb
        return S.add(a, beaver.mul(self.ctx.next_key(), d, pos))

    # ---------------------------------------------------------------- ops

    def conv2d(self, x: AShare, w: AShare, stride: int = 1, padding: int = 0) -> AShare:
        z = beaver.conv2d(self.ctx.next_key(), x, w, stride, padding)
        return self._truncate(z)

    def bias_add(self, x: AShare, b: AShare) -> AShare:
        bd = b.data.reshape((2,) + (1,) * (x.ndim - 1) + b.shape)
        return AShare(x.data + bd)

    def affine(self, x: AShare, scale: AShare, offset: AShare) -> AShare:
        """Channelwise x * scale + offset (folded batch norm)."""
        shp = (1,) * (x.ndim - 1) + scale.shape
        scale_b = AShare(jnp.broadcast_to(
            scale.data.reshape((2,) + shp), x.data.shape))
        y = self._mul(x, scale_b)
        return self.bias_add(y, offset)

    def batch_norm(self, x: AShare, mean: AShare, var: AShare,
                   weight: AShare, bias: AShare, eps: float = 1e-5) -> AShare:
        """*Private* inference batch norm: rsqrt(var + eps) computed in
        share space (``mpc.functions.inverse_sqrt`` Newton iterations)
        — the alternative to the exact offline fold (``affine``) when
        the BN statistics themselves are secret. Same math as the
        reference's share-space batch_norm
        (``syft/frameworks/torch/nn/functional.py:44-77``), whose
        ``reciprocal(method="newton")`` call is actually an
        inverse-sqrt iteration (see ``functions.reciprocal``); here it
        is a quadratic Newton rsqrt instead of 80 damped steps. All
        per-channel vectors, so the iterations are tiny."""
        from primia_tpu.mpc import functions as F

        inv_std = F.inverse_sqrt(self.ctx, S.add_public(
            var, fixed.encode(eps, self.ctx.frac_bits)))
        scale = self._mul(weight, inv_std)  # per-channel
        shp = (1,) * (x.ndim - 1) + scale.shape
        scale_b = AShare(jnp.broadcast_to(
            scale.data.reshape((2,) + shp), x.data.shape))
        mean_b = AShare(jnp.broadcast_to(
            mean.data.reshape((2,) + shp), x.data.shape))
        y = self._mul(S.sub(x, mean_b), scale_b)
        return self.bias_add(y, bias)

    def group_norm(self, x: AShare, gamma: AShare, beta: AShare,
                   groups: int = 32, eps: float = 1e-5) -> AShare:
        """*Private* GroupNorm: per-example group statistics computed
        entirely in share space. Serves models trained with
        ``normalization=group`` (the DP-trainable variant) encrypted —
        closing the train-private/serve-private loop; the reference can
        neither DP-train (torchdp rejects its BN models) nor serve such
        a model. Mechanism: group sums are linear over shares; the
        1/n mean and (x-mu)^2 variance use one public product and one
        Beaver square; rsqrt(var+eps) runs the same Newton iteration
        as the private batch_norm above (``functions.inverse_sqrt``,
        accurate for var in ~[1e-2, 200] — activation variances of
        GN-sandwiched layers sit comfortably inside); the trainable
        affine is the standard private channelwise scale+offset."""
        from primia_tpu.mpc import functions as F

        _, B, Hh, Ww, C = x.data.shape
        G = min(groups, C)
        n = Hh * Ww * (C // G)
        xg = AShare(x.data.reshape(2, B, Hh * Ww, G, C // G))
        mean = F.mul_public(
            self.ctx, AShare(jnp.sum(xg.data, axis=(2, 4))), 1.0 / n)
        mean_b = AShare(jnp.broadcast_to(
            mean.data.reshape(2, B, 1, G, 1), xg.data.shape))
        xc = S.sub(xg, mean_b)
        sq = self._mul(xc, xc)
        var = F.mul_public(
            self.ctx, AShare(jnp.sum(sq.data, axis=(2, 4))), 1.0 / n)
        inv = F.inverse_sqrt(
            self.ctx, S.add_public(var, fixed.encode(eps, self.ctx.frac_bits)))
        inv_b = AShare(jnp.broadcast_to(
            inv.data.reshape(2, B, 1, G, 1), xg.data.shape))
        xhat = AShare(self._mul(xc, inv_b).data.reshape(x.data.shape))
        return self.affine(xhat, gamma, beta)

    def relu(self, x: AShare) -> AShare:
        sign = self.ctx.sign_shares(x)
        pos = S.add_public(S.neg(sign), 1)
        return beaver.mul(self.ctx.next_key(), x, pos)  # bit product: no truncation

    def max_pool(self, x: AShare, window: int, stride: int, padding: int = 0) -> AShare:
        d = x.data  # (2, B, H, W, C)
        if padding:
            # public pad constant enters party 0's share only (padding both
            # shares would reconstruct to 2*_PAD_NEG = -2^31, outside the
            # 32-bit comparison domain)
            spatial = ((0, 0), (padding, padding), (padding, padding), (0, 0))
            d = jnp.stack([
                jnp.pad(d[0], spatial, constant_values=_PAD_NEG),
                jnp.pad(d[1], spatial, constant_values=0),
            ])
        _, B, H, W, C = d.shape
        Ho = (H - window) // stride + 1
        Wo = (W - window) // stride + 1
        views = []
        for di in range(window):
            for dj in range(window):
                views.append(
                    AShare(jax.lax.slice(
                        d,
                        (0, 0, di, dj, 0),
                        (2, B, di + (Ho - 1) * stride + 1, dj + (Wo - 1) * stride + 1, C),
                        (1, 1, stride, stride, 1),
                    ))
                )
        # tournament max: pair up, batched comparison per round
        while len(views) > 1:
            half = len(views) // 2
            a = S.stack(views[:half], axis=0)
            b = S.stack(views[half : 2 * half], axis=0)
            merged = self._max_pair(a, b)
            views = [
                AShare(merged.data[:, i]) for i in range(half)
            ] + views[2 * half :]
        return views[0]

    def avg_pool(self, x: AShare, window: int, stride: int, padding: int = 0) -> AShare:
        d = x.data
        if padding:
            d = jnp.pad(
                d,
                ((0, 0), (0, 0), (padding, padding), (padding, padding), (0, 0)),
            )
        summed = jax.lax.reduce_window(
            d, jnp.zeros((), d.dtype), jax.lax.add,
            window_dimensions=(1, 1, window, window, 1),
            window_strides=(1, 1, stride, stride, 1),
            padding="VALID",
        )
        # public division: multiply by encode(1/w^2) then truncate
        inv = fixed.encode(1.0 / (window * window), self.ctx.frac_bits)
        return self._truncate(AShare(summed * inv))

    def linear(self, x: AShare, w: AShare, b: Optional[AShare] = None) -> AShare:
        z = beaver.matmul(self.ctx.next_key(), x, w)
        z = self._truncate(z)
        if b is not None:
            z = self.bias_add(z, b)
        return z

    def add(self, x: AShare, y: AShare) -> AShare:
        return S.add(x, y)

    def flatten(self, x: AShare) -> AShare:
        return S.reshape(x, (x.shape[0], -1))

    def dropout(self, x: AShare, rate, key=None) -> AShare:
        return x  # inference mode

    # ---- elementwise / structural ops for the RNN library (nn.rnn) ----

    def sigmoid(self, x: AShare) -> AShare:
        from primia_tpu.mpc import functions as F

        return F.sigmoid(self.ctx, x)

    def tanh(self, x: AShare) -> AShare:
        from primia_tpu.mpc import functions as F

        return F.tanh(self.ctx, x)

    def mul(self, x: AShare, y: AShare) -> AShare:
        return self._mul(x, y)

    def split_last(self, x: AShare, k: int):
        if x.shape[-1] % k != 0:
            raise ValueError(  # PlainEngine's jnp.split raises too
                f"split_last: last dim {x.shape[-1]} not divisible by {k}")
        h = x.shape[-1] // k
        return tuple(
            AShare(x.data[..., i * h:(i + 1) * h]) for i in range(k))

    def concat_last(self, xs):
        return AShare(jnp.concatenate([x.data for x in xs], axis=-1))

    def zeros(self, shape, like: AShare) -> AShare:
        return AShare(jnp.zeros((2,) + tuple(shape), like.data.dtype))

    def time_slice(self, x: AShare, t: int) -> AShare:
        return AShare(x.data[:, t])

    def stack_time(self, xs):
        return S.stack(xs, axis=0)

    def swap_time_batch(self, x: AShare) -> AShare:
        return AShare(jnp.swapaxes(x.data, 1, 2))


# ----------------------------------------------------------- sharing utils

def encode_and_share(key, tree, frac_bits: int = fixed.DEFAULT_FRAC_BITS):
    """float pytree -> pytree of AShare leaves (fixed-point encode +
    2-party split). Reference: ``nn.Module.fix_precision().share(...)``
    (``hook.py:700-760``)."""
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    shared = [
        S.share(k, fixed.encode(leaf, frac_bits)) for k, leaf in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, shared)


def reveal_and_decode(x: AShare, frac_bits: int = fixed.DEFAULT_FRAC_BITS):
    """reconstruct + fixed-point decode (reference ``.get().float_prec()``)."""
    return fixed.decode(S.reconstruct(x), frac_bits)
