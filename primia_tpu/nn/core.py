"""Engine-generic NN primitives.

The reference makes one model definition run in plaintext, on remote
pointers, and in MPC share-space by monkey-patching torch and chaining
tensor wrappers (``syft/frameworks/torch/hook/hook.py:82-246``). That is
anti-idiomatic under XLA. Here the architecture graph is written once
against a small explicit *engine* protocol, and the engine decides how
each op executes:

- :data:`PLAIN` — jnp/XLA ops (float32/bfloat16), used for training and
  plain inference.
- ``primia_tpu.mpc.engine.MPC_ENGINE`` — the same ops over additive
  secret shares in Z_{2^64} (fixed-point), used for encrypted inference.

Data layout is NHWC (TPU-native); conv weights are HWIO; linear weights
are (in, out). Parameters are nested dicts of arrays (a pytree).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


# ======================================================================
# Plaintext engine
# ======================================================================

class PlainEngine:
    """jnp-backed engine. All ops are jit-traceable pure functions."""

    name = "plain"

    @staticmethod
    def conv2d(x, w, stride: int = 1, padding: int = 0):
        """NHWC conv with HWIO weights, symmetric int padding.

        3x3/s1/p1 bf16 convs route through ``ops.pallas_wgrad.
        conv3x3_s1p1`` on TPU: identical forward/data-grad (XLA's own
        convs), but the weight-grad runs on the Pallas one-read kernel
        (the train step's largest sub-roofline bucket, BASELINE.md).
        """
        if (stride == 1 and padding == 1 and w.shape[:2] == (3, 3)
                and x.dtype == jnp.bfloat16 and w.dtype == jnp.bfloat16
                and x.ndim == 4 and x.shape[0] > 1
                # C >= 128 only: smaller activations live batch-minor
                # ({0,3,2,1}) and the kernel's row-major operands would
                # force whole-tensor layout copies (round-4 trace)
                and x.shape[-1] >= 128 and w.shape[-1] >= 128):
            from primia_tpu.ops.pallas_wgrad import conv3x3_s1p1, use_pallas_wgrad

            if use_pallas_wgrad():
                return conv3x3_s1p1(x, w)
        return jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=((padding, padding), (padding, padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    @staticmethod
    def bias_add(x, b):
        return x + b

    @staticmethod
    def affine(x, scale, offset):
        """Channelwise y = x * scale + offset (inference-mode batch norm)."""
        return x * scale + offset

    @staticmethod
    def relu(x):
        return jnp.maximum(x, 0)

    @staticmethod
    def max_pool(x, window: int, stride: int, padding: int = 0):
        return jax.lax.reduce_window(
            x,
            -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
            jax.lax.max,
            window_dimensions=(1, window, window, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
        )

    @staticmethod
    def avg_pool(x, window: int, stride: int, padding: int = 0):
        if stride == window and padding == 0 and x.shape[1] % window == 0 \
                and x.shape[2] % window == 0:
            # non-overlapping pool (the ResNet input/32 head): a reshape
            # mean — cheaper than reduce_window and, unlike the summed
            # reduce_window, reverse-differentiable in bfloat16
            B, H, W, C = x.shape
            return jnp.mean(
                x.reshape(B, H // window, window, W // window, window, C),
                axis=(2, 4),
            )
        summed = jax.lax.reduce_window(
            x,
            jnp.zeros((), x.dtype),
            jax.lax.add,
            window_dimensions=(1, window, window, 1),
            window_strides=(1, stride, stride, 1),
            padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
        )
        # torch's AvgPool2d(count_include_pad=True) divides by window^2
        # everywhere, which is what the reference model uses.
        return summed / (window * window)

    @staticmethod
    def linear(x, w, b=None):
        y = x @ w
        if b is not None:
            y = y + b
        return y

    @staticmethod
    def add(x, y):
        return x + y

    @staticmethod
    def flatten(x):
        return x.reshape(x.shape[0], -1)

    @staticmethod
    def dropout(x, rate, key=None):
        if key is None or rate == 0.0:
            return x
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x / (1.0 - rate), 0)

    # ---- elementwise / structural ops for the RNN library (nn.rnn) ----

    @staticmethod
    def sigmoid(x):
        return jax.nn.sigmoid(x)

    @staticmethod
    def tanh(x):
        return jnp.tanh(x)

    @staticmethod
    def mul(x, y):
        return x * y

    @staticmethod
    def split_last(x, k: int):
        return tuple(jnp.split(x, k, axis=-1))

    @staticmethod
    def concat_last(xs):
        return jnp.concatenate(xs, axis=-1)

    @staticmethod
    def zeros(shape, like):
        return jnp.zeros(shape, like.dtype)

    @staticmethod
    def time_slice(x, t: int):
        return x[t]

    @staticmethod
    def stack_time(xs):
        return jnp.stack(xs, axis=0)

    @staticmethod
    def swap_time_batch(x):
        return jnp.swapaxes(x, 0, 1)


PLAIN = PlainEngine()


# ======================================================================
# Batch norm (stateful; training path is plaintext-only)
# ======================================================================

def bn_init(c: int, dtype=jnp.float32) -> Tuple[Params, Params]:
    params = {"gamma": jnp.ones((c,), dtype), "beta": jnp.zeros((c,), dtype)}
    state = {
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
        # torch tracks num_batches; the reference's secure aggregation
        # explicitly skips this key (torchlib/utils.py:1049)
        "count": jnp.zeros((), jnp.int64),
    }
    return params, state


def bn_fold(params: Params, state: Params, eps: float = 1e-5) -> Params:
    """Fold trained BN into an inference-mode channelwise affine.

    Done in plaintext by the model owner before sharing — replaces the
    reference's private Newton inverse-sqrt batch norm
    (``syft/frameworks/torch/nn/functional.py:44-77``) with an exact
    offline computation.
    """
    inv = params["gamma"] / jnp.sqrt(state["var"] + eps)
    return {"scale": inv, "offset": params["beta"] - state["mean"] * inv}


def batch_norm(
    E,
    x,
    params: Optional[Params],
    state: Optional[Params],
    train: bool,
    momentum: float = 0.1,
    eps: float = 1e-5,
):
    """Apply batch norm; returns (y, new_state).

    * ``train=True``: plaintext only — batch statistics, running-stat
      update with torch momentum semantics (new = (1-m)*old + m*batch).
    * ``train=False``: if params contain a pre-folded {scale, offset}
      (MPC path), apply the engine affine; else compute the affine from
      running stats.
    """
    if params is not None and "scale" in params:
        return E.affine(x, params["scale"], params["offset"]), state
    if train:
        if x.ndim == 4 and x.dtype == jnp.bfloat16:
            from primia_tpu.ops.pallas_bn import bn_train, use_pallas_bn

            if use_pallas_bn():
                # Pallas bf16-read f32-accumulate reductions for the
                # stats (fwd) and dgamma/dbeta (bwd); elementwise parts
                # stay jnp so XLA keeps fusing them (ops/pallas_bn.py)
                y, mean, var = bn_train(x, params["gamma"], params["beta"], eps)
                n = x.size // x.shape[-1]
                unbiased = var * (n / max(n - 1, 1))
                return y, {
                    "mean": (1 - momentum) * state["mean"] + momentum * mean,
                    "var": (1 - momentum) * state["var"] + momentum * unbiased,
                    "count": state["count"] + 1,
                }
        # statistics always in float32 — with bfloat16 compute the
        # reductions would otherwise lose ~8 bits of the batch mean.
        # mean and E[x^2] are INDEPENDENT reductions over the same
        # input, so XLA fuses them into one traversal (jnp.var's
        # two-pass form re-reads the activations: measured ~2 ms/step
        # on ResNet-18@224x256); the f32 converts fuse into the reduce.
        axes = tuple(range(x.ndim - 1))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axes)
        msq = jnp.mean(jnp.square(xf), axes)
        var = jnp.maximum(msq - jnp.square(mean), 0.0)
        n = x.size // x.shape[-1]
        inv = params["gamma"].astype(jnp.float32) * jax.lax.rsqrt(var + eps)
        # per-channel affine: elementwise work stays in the compute
        # dtype; only the channel-sized scalars are f32
        off = params["beta"].astype(jnp.float32) - mean * inv
        y = (x * inv.astype(x.dtype) + off.astype(x.dtype)).astype(x.dtype)
        # torch stores the *unbiased* variance in running stats
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - momentum) * state["mean"] + momentum * mean,
            "var": (1 - momentum) * state["var"] + momentum * unbiased,
            "count": state["count"] + 1,
        }
        return y, new_state
    # channel-scalar math in f32, then cast the affine to the activation
    # dtype — otherwise f32 running stats promote a bfloat16 forward to
    # f32 and the next conv trips on mixed dtypes (the DP step runs its
    # per-example forwards in eval mode under the compute dtype)
    r = jax.lax.rsqrt(state["var"].astype(jnp.float32) + eps)
    inv = params["gamma"].astype(jnp.float32) * r
    off = params["beta"].astype(jnp.float32) - state["mean"] * inv
    y = E.affine(x, inv.astype(x.dtype), off.astype(x.dtype))
    if hasattr(E, "bn_meta"):
        # ghost-norm DP needs (mean, rsqrt(var+eps)) to chain the affine
        # cotangents back to the trainable (gamma, beta) — see train/dp.py
        E.bn_meta(state["mean"].astype(jnp.float32), r,
                  params["gamma"], params["beta"])
    return y, state


def group_norm(E, x, params: Params, groups: int = 32, eps: float = 1e-5):
    """GroupNorm (Wu & He 2018), torch ``nn.GroupNorm`` semantics:
    per-example statistics over (H, W, C/G) within each of ``groups``
    channel groups, then the trainable channelwise affine.

    This is the DP-compatible normalization: statistics never couple
    examples, so per-sample gradients stay exact and nothing is frozen
    (DP-SGD must freeze BatchNorm's running stats, which for a
    from-scratch model means no normalization at all — measured: the
    canonical DP run collapses to one class). The reference cannot
    DP-train any of its models (torchdp rejects BN, ``train.py:308``).

    The trainable affine is emitted through ``E.affine(x_hat, gamma,
    beta)`` so the ghost-DP engine's existing affine record yields the
    exact per-example (gamma, beta) gradient norms and weighted grads;
    the normalization itself is plain per-example jnp math on the tap
    cotangent chain. Share-space engines are rejected: GN's statistics
    depend on the private input, so its rsqrt cannot be folded offline
    the way inference BN is (``bn_fold``).
    """
    ename = getattr(E, "name", "")
    if hasattr(E, "group_norm"):
        # share-space engines compute the per-example statistics
        # privately (mpc/engine.py:group_norm): GN cannot be folded
        # offline like inference BN, but the Newton-rsqrt machinery
        # runs it over shares — DP-trained models serve encrypted
        return E.group_norm(x, params["gamma"], params["beta"],
                            groups=groups, eps=eps)
    if ename not in ("plain", "ghost"):
        raise NotImplementedError(
            f"GroupNorm is not implemented for engine {ename!r}")
    B, C = x.shape[0], x.shape[-1]
    G = min(groups, C)
    assert C % G == 0, f"channels {C} not divisible by groups {G}"
    xf = x.astype(jnp.float32).reshape(B, -1, G, C // G)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    msq = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True)
    var = jnp.maximum(msq - jnp.square(mean), 0.0)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(x.shape)
    return E.affine(xhat.astype(x.dtype), params["gamma"], params["beta"])


# ======================================================================
# Initializers (torch-equivalent)
# ======================================================================

def kaiming_normal_conv(key, kh, kw, cin, cout, dtype=jnp.float32):
    """He-normal, fan_out mode, relu gain — reference models.py:409-411."""
    fan_out = kh * kw * cout
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (kh, kw, cin, cout), dtype) * std


def torch_linear_init(key, cin, cout, dtype=jnp.float32):
    """torch.nn.Linear default: U(-1/sqrt(in), 1/sqrt(in)) for w and b."""
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(cin)
    w = jax.random.uniform(k1, (cin, cout), dtype, -bound, bound)
    b = jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return {"w": w, "b": b}


def torch_conv_init(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    """torch.nn.Conv2d default init (uniform, fan_in)."""
    k1, k2 = jax.random.split(key)
    fan_in = kh * kw * cin
    bound = 1.0 / math.sqrt(fan_in)
    out = {"w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound)}
    if bias:
        out["b"] = jax.random.uniform(k2, (cout,), dtype, -bound, bound)
    return out


# ======================================================================
# Pytree helpers
# ======================================================================

def param_count(params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))


def tree_cast(tree, dtype):
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )
