"""ResNet-18/34 with the reference's MPC-compatibility quirks.

Mirrors PriMIA ``torchlib/models.py:345-516``:
- configurable stem pooling (max or avg, 3x3/s2/p1) via ``pooling_type``;
- **fixed** ``AvgPool(input_size / 32)`` head instead of adaptive pooling
  (``adptpool=False`` in the reference — adaptive pools don't exist in
  share space);
- 1- or 3-channel stem, final fc replaced with ``num_classes`` outputs;
- optional pool<->relu swap in the stem used by encrypted inference to
  quarter the number of private ReLUs (``inference.py:289``) — valid
  because max-pool and ReLU commute.

Written once against the engine protocol (see ``primia_tpu.nn.core``);
the same graph runs in plaintext and over secret shares.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from primia_tpu.nn import core
from primia_tpu.nn.core import (PLAIN, batch_norm, bn_init, group_norm,
                                kaiming_normal_conv, torch_linear_init)


def _norm(E, x, p, s, train, norm):
    """batch (reference) or group (the DP-compatible variant; same
    {gamma, beta} params + untouched BN-shaped state, so checkpoints,
    secure aggregation and the serve surface are layout-identical)."""
    if norm == "group":
        return group_norm(E, x, p), s
    return batch_norm(E, x, p, s, train)


def _conv(key, kh, kw, cin, cout, dtype):
    return {"w": kaiming_normal_conv(key, kh, kw, cin, cout, dtype)}


def _basic_block_init(key, cin, planes, stride, dtype):
    ks = jax.random.split(key, 3)
    p: Dict[str, Any] = {}
    s: Dict[str, Any] = {}
    p["conv1"] = _conv(ks[0], 3, 3, cin, planes, dtype)
    p["bn1"], s["bn1"] = bn_init(planes, dtype)
    p["conv2"] = _conv(ks[1], 3, 3, planes, planes, dtype)
    p["bn2"], s["bn2"] = bn_init(planes, dtype)
    if stride != 1 or cin != planes:
        p["down_conv"] = _conv(ks[2], 1, 1, cin, planes, dtype)
        p["down_bn"], s["down_bn"] = bn_init(planes, dtype)
    return p, s


def resnet_init(
    key,
    layers: List[int],
    num_classes: int = 3,
    in_channels: int = 3,
    dtype=jnp.float32,
    zero_init_fc: bool = False,
) -> Tuple[Dict, Dict]:
    ks = jax.random.split(key, 6)
    params: Dict[str, Any] = {}
    state: Dict[str, Any] = {}
    params["conv1"] = _conv(ks[0], 7, 7, in_channels, 64, dtype)
    params["bn1"], state["bn1"] = bn_init(64, dtype)
    cin = 64
    for li, (planes, blocks) in enumerate(zip((64, 128, 256, 512), layers)):
        stride = 1 if li == 0 else 2
        bkeys = jax.random.split(ks[1 + li], blocks)
        bp, bs = [], []
        for bi in range(blocks):
            p, s = _basic_block_init(
                bkeys[bi], cin if bi == 0 else planes, planes, stride if bi == 0 else 1, dtype
            )
            bp.append(p)
            bs.append(s)
            cin = planes
        params[f"layer{li + 1}"] = bp
        state[f"layer{li + 1}"] = bs
    params["fc"] = torch_linear_init(ks[5], 512, num_classes, dtype)
    if zero_init_fc:
        # zero classifier: logits start at 0 => calibrated ln(C) loss and
        # no giant common gradient mode from init miscalibration — the
        # standard DP-from-scratch posture (measured: per-example grad
        # norms at init were ~36 and near-identical across examples,
        # i.e. one shared "shrink the logits" direction)
        params["fc"] = {"w": jnp.zeros_like(params["fc"]["w"]),
                        "b": jnp.zeros_like(params["fc"]["b"])}
    return params, state


def _basic_block_forward(p, s, x, *, E, train, stride, norm="batch"):
    identity = x
    out = E.conv2d(x, p["conv1"]["w"], stride=stride, padding=1)
    out, s1 = _norm(E, out, p["bn1"], s.get("bn1"), train, norm)
    out = E.relu(out)
    out = E.conv2d(out, p["conv2"]["w"], stride=1, padding=1)
    out, s2 = _norm(E, out, p["bn2"], s.get("bn2"), train, norm)
    new_s = {"bn1": s1, "bn2": s2}
    if "down_conv" in p:
        identity = E.conv2d(x, p["down_conv"]["w"], stride=stride, padding=0)
        identity, sd = _norm(E, identity, p["down_bn"], s.get("down_bn"), train, norm)
        new_s["down_bn"] = sd
    out = E.add(out, identity)
    out = E.relu(out)
    return out, new_s


def _stem_s2d_conv(x, w1):
    """conv1 as a space-to-depth conv (MLPerf-ResNet TPU stem trick):
    the 7x7/s2/p3 conv equals a 4x4/s1 conv over the 2x2
    space-to-depth input with the kernel zero-padded to 8x8 at the
    top-left (y[i,j] = sum_a x[2i+a-4] w8[a], a=2p+q => one s1 conv
    with asymmetric (2,1) padding on the s2d grid). Identical
    arithmetic, but the weight-gradient conv becomes unit-stride —
    XLA lowers strided wgrads as dilated convs that run far below the
    HBM roof (BASELINE.md round-2: conv1 wgrad 2.1 ms at 41%)."""
    B, H, W, C = x.shape
    x2 = (x.reshape(B, H // 2, 2, W // 2, 2, C)
          .transpose(0, 1, 3, 2, 4, 5)
          .reshape(B, H // 2, W // 2, 4 * C))
    w8 = jnp.pad(w1, ((1, 0), (1, 0), (0, 0), (0, 0)))
    w2 = (w8.reshape(4, 2, 4, 2, C, w1.shape[-1])
          .transpose(0, 2, 1, 3, 4, 5)
          .reshape(4, 4, 4 * C, w1.shape[-1]))
    return jax.lax.conv_general_dilated(
        x2, w2, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def resnet_forward(
    params,
    state,
    x,
    *,
    E=PLAIN,
    train: bool = False,
    layers: List[int] = (2, 2, 2, 2),
    pooling: str = "max",
    input_size: int = 224,
    swap_pool_relu: bool = False,
    stem_s2d: bool = False,
    norm: str = "batch",
    rng=None,
):
    """Returns (logits, new_state). x is NHWC.

    ``stem_s2d``: plaintext-only exact rewrite of conv1 for the
    training hot path (see ``_stem_s2d_conv``); requires even spatial
    dims and is ignored for share-space engines (the Beaver conv
    correlations are already op-shaped).
    """
    del rng  # no dropout in resnet
    w1 = params["conv1"]["w"]
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(w1.dtype)  # x64 mode makes f64 the default literal dtype
    new_state: Dict[str, Any] = {}
    if (stem_s2d and getattr(E, "name", "") == "plain"
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
        out = _stem_s2d_conv(x, w1)
    else:
        out = E.conv2d(x, w1, stride=2, padding=3)
    out, new_state["bn1"] = _norm(E, out, params["bn1"], state.get("bn1"),
                                  train, norm)

    def stem_pool(t):
        if pooling == "max":
            return E.max_pool(t, window=3, stride=2, padding=1)
        return E.avg_pool(t, window=3, stride=2, padding=1)

    if swap_pool_relu:
        # pool before relu: 4x fewer private ReLU elements under MPC;
        # identical output for max pooling (relu/maxpool commute).
        out = stem_pool(out)
        out = E.relu(out)
    else:
        out = E.relu(out)
        out = stem_pool(out)

    for li, blocks in enumerate(layers):
        lname = f"layer{li + 1}"
        lstate = []
        for bi in range(blocks):
            stride = 2 if (li > 0 and bi == 0) else 1
            bs = state.get(lname)
            out, ns = _basic_block_forward(
                params[lname][bi],
                bs[bi] if bs is not None else {},
                out,
                E=E,
                train=train,
                stride=stride,
                norm=norm,
            )
            lstate.append(ns)
        new_state[lname] = lstate

    # fixed (input/32) average pool, reference models.py:402-406 adptpool=False
    win = input_size // 32
    out = E.avg_pool(out, window=win, stride=win, padding=0)
    out = E.flatten(out)
    out = E.linear(out, params["fc"]["w"], params["fc"]["b"])
    return out, new_state


def resnet18_init(key, num_classes=3, in_channels=3, dtype=jnp.float32,
                  zero_init_fc=False):
    return resnet_init(key, [2, 2, 2, 2], num_classes, in_channels, dtype,
                       zero_init_fc=zero_init_fc)


def resnet18_forward(params, state, x, **kw):
    return resnet_forward(params, state, x, layers=(2, 2, 2, 2), **kw)
