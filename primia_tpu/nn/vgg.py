"""VGG-16 (configuration D, no batch norm) per the reference variant.

Mirrors PriMIA ``torchlib/models.py:88-216``: configurable M-pooling
(max or avg, 2x2/s2), fixed ``AvgPool(input/32)`` head (adptpool=False),
and — for ``num_classes != 1000`` — the reduced 512-512-512 classifier
the reference swaps in (``models.py:186-196``).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from primia_tpu.nn.core import PLAIN, kaiming_normal_conv

VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M")


def _conv_init(key, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    return {
        "w": kaiming_normal_conv(k1, 3, 3, cin, cout, dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def _classifier_linear_init(key, cin, cout, dtype):
    # reference VGG._initialize_weights: normal(0, 0.01) w, zero bias
    return {
        "w": jax.random.normal(key, (cin, cout), dtype) * 0.01,
        "b": jnp.zeros((cout,), dtype),
    }


def vgg16_init(key, num_classes=3, in_channels=3, dtype=jnp.float32) -> Tuple[Dict, Dict]:
    convs = [c for c in VGG16_CFG if c != "M"]
    ks = jax.random.split(key, len(convs) + 3)
    params: Dict[str, Any] = {"features": []}
    cin = in_channels
    ki = 0
    for c in VGG16_CFG:
        if c == "M":
            continue
        params["features"].append(_conv_init(ks[ki], cin, c, dtype))
        cin = c
        ki += 1
    params["classifier"] = [
        _classifier_linear_init(ks[ki], 512, 512, dtype),
        _classifier_linear_init(ks[ki + 1], 512, 512, dtype),
        _classifier_linear_init(ks[ki + 2], 512, num_classes, dtype),
    ]
    return params, {}


def vgg16_forward(
    params,
    state,
    x,
    *,
    E=PLAIN,
    train: bool = False,
    pooling: str = "max",
    input_size: int = 224,
    swap_pool_relu: bool = False,
    rng=None,
):
    del swap_pool_relu  # stem-swap only applies to resnet
    w1 = params["features"][0]["w"]
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(w1.dtype)
    ci = 0
    for c in VGG16_CFG:
        if c == "M":
            if pooling == "max":
                x = E.max_pool(x, window=2, stride=2, padding=0)
            else:
                x = E.avg_pool(x, window=2, stride=2, padding=0)
        else:
            p = params["features"][ci]
            x = E.conv2d(x, p["w"], stride=1, padding=1)
            x = E.bias_add(x, p["b"])
            x = E.relu(x)
            ci += 1
    win = input_size // 32
    x = E.avg_pool(x, window=win, stride=win, padding=0)
    x = E.flatten(x)
    drop_keys = jax.random.split(rng, 2) if (train and rng is not None) else (None, None)
    for i, lin in enumerate(params["classifier"]):
        x = E.linear(x, lin["w"], lin["b"])
        if i < 2:
            x = E.relu(x)
            if train:
                x = E.dropout(x, 0.5, drop_keys[i])
    return x, state
