"""The three "simpleconv" CNNs at 28/224/512 px input resolution.

Mirrors PriMIA ``torchlib/models.py:558-719`` (``ConvNetMNIST``,
``ConvNet224``, ``ConvNet512``): 3x3 valid convs, 2x2 pools (max or avg
per ``pooling_type``), 512-512-classes MLP head. ConvNet224 interleaves
batch norms after pools 1, 2 and 4 exactly like the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from primia_tpu.nn.core import (
    PLAIN,
    batch_norm,
    bn_init,
    group_norm,
    kaiming_normal_conv,
    torch_linear_init,
)

# channel progressions (reference models.py)
_CHANNELS = (8, 32, 64, 128, 256, 512)


def _conv_init(key, cin, cout, dtype):
    k1, _ = jax.random.split(key)
    return {
        "w": kaiming_normal_conv(k1, 3, 3, cin, cout, dtype),
        "b": jnp.zeros((cout,), dtype),
    }


def simpleconv_init(
    key, resolution: int, num_classes=3, in_channels=1, dtype=jnp.float32,
    zero_init_fc: bool = False,
) -> Tuple[Dict, Dict]:
    if resolution not in (28, 224, 512):
        raise ValueError(f"simpleconv supports 28/224/512 px, got {resolution}")
    ks = jax.random.split(key, 9)
    params: Dict[str, Any] = {"convs": []}
    state: Dict[str, Any] = {}
    cin = in_channels
    for i, c in enumerate(_CHANNELS):
        params["convs"].append(_conv_init(ks[i], cin, c, dtype))
        cin = c
    if resolution == 224:
        state["bns"] = {}
        params["bns"] = {}
        for i in (0, 1, 3):  # BN after pools of conv1, conv2, conv4
            params["bns"][str(i)], state["bns"][str(i)] = bn_init(_CHANNELS[i], dtype)
    params["classifier"] = [
        torch_linear_init(ks[6], 512, 512, dtype),
        torch_linear_init(ks[7], 512, 512, dtype),
        torch_linear_init(ks[8], 512, num_classes, dtype),
    ]
    if zero_init_fc:
        # DP posture (see nn/resnet.py): calibrated ln(C) start, no
        # init-miscalibration gradient common mode
        params["classifier"][-1] = {
            "w": jnp.zeros_like(params["classifier"][-1]["w"]),
            "b": jnp.zeros_like(params["classifier"][-1]["b"])}
    return params, state


def _pool(E, x, pooling):
    if pooling == "max":
        return E.max_pool(x, window=2, stride=2, padding=0)
    return E.avg_pool(x, window=2, stride=2, padding=0)


def simpleconv_forward(
    params,
    state,
    x,
    *,
    E=PLAIN,
    resolution: int = 224,
    train: bool = False,
    pooling: str = "max",
    input_size: int = None,
    swap_pool_relu: bool = False,
    norm: str = "batch",
    rng=None,
):
    del input_size, swap_pool_relu, rng
    w1 = params["convs"][0]["w"]
    if isinstance(x, jax.Array) and jnp.issubdtype(x.dtype, jnp.floating):
        x = x.astype(w1.dtype)
    new_state: Dict[str, Any] = {}

    def conv(i, t):
        p = params["convs"][i]
        t = E.conv2d(t, p["w"], stride=1, padding=0)
        t = E.bias_add(t, p["b"])
        return E.relu(t)

    if resolution == 28:
        # ConvNetMNIST: conv1-4 (no pool between 1-3), pools after 4,5,6
        for i in range(4):
            x = conv(i, x)
        x = _pool(E, x, pooling)
        x = conv(4, x)
        x = _pool(E, x, pooling)
        x = conv(5, x)
        x = _pool(E, x, pooling)
    elif resolution == 224:
        new_state["bns"] = {}
        for i in range(6):
            x = conv(i, x)
            x = _pool(E, x, pooling)
            if i in (0, 1, 3):
                if norm == "group":
                    x = group_norm(E, x, params["bns"][str(i)])
                    s = state.get("bns", {}).get(str(i))
                else:
                    x, s = batch_norm(
                        E, x, params["bns"][str(i)], state.get("bns", {}).get(str(i)), train
                    )
                new_state["bns"][str(i)] = s
    else:  # 512
        x = conv(0, x)
        x = _pool(E, x, pooling)
        x = _pool(E, x, pooling)
        for i in range(1, 6):
            x = conv(i, x)
            x = _pool(E, x, pooling)
        x = _pool(E, x, pooling)

    x = E.flatten(x)
    for i, lin in enumerate(params["classifier"]):
        x = E.linear(x, lin["w"], lin["b"])
        if i < 2:
            x = E.relu(x)
    return x, new_state
