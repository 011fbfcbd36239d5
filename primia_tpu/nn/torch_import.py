"""Import torch/torchvision state_dicts into our NHWC pytrees.

The reference downloads ImageNet weights via ``torch.hub``
(``torchlib/models.py:499-516``). TPU hosts here have no egress, so
``pretrained=yes`` resolves a local file instead:

1. ``$PRIMIA_PRETRAINED`` (path to a ``.pt``/``.pth`` state_dict), else
2. ``model_weights/<model>-imagenet.pt`` relative to cwd, else
3. warn and fall back to He initialization.

Conversion: torch conv OIHW -> HWIO, linear (out,in) -> (in,out),
NCHW running stats map 1:1 (BN vectors are layout-free).
"""

from __future__ import annotations

import os
import warnings
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax.numpy as jnp


def _t2j_conv(w) -> jnp.ndarray:
    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))  # OIHW->HWIO


def _t2j_linear(w) -> jnp.ndarray:
    return jnp.asarray(np.asarray(w).T)


def _t2j_vec(v) -> jnp.ndarray:
    return jnp.asarray(np.asarray(v))


def resnet18_from_torch_state_dict(sd: Dict[str, Any], params, state):
    """Overlay a torchvision resnet18 state_dict onto (params, state).

    The final fc is NOT copied when shapes differ (the reference loads
    the 1000-class checkpoint then swaps in a fresh num_classes head,
    ``models.py:497-500``).
    """
    def bn(prefix):
        return (
            {"gamma": _t2j_vec(sd[f"{prefix}.weight"]),
             "beta": _t2j_vec(sd[f"{prefix}.bias"])},
            {"mean": _t2j_vec(sd[f"{prefix}.running_mean"]),
             "var": _t2j_vec(sd[f"{prefix}.running_var"]),
             "count": jnp.asarray(
                 np.asarray(sd.get(f"{prefix}.num_batches_tracked", 0)), jnp.int64)},
        )

    params = dict(params)
    state = dict(state)
    params["conv1"] = {"w": _t2j_conv(sd["conv1.weight"])}
    params["bn1"], state["bn1"] = bn("bn1")
    for li in range(1, 5):
        blocks_p, blocks_s = [], []
        for bi in range(len(params[f"layer{li}"])):
            pre = f"layer{li}.{bi}"
            p: Dict[str, Any] = {
                "conv1": {"w": _t2j_conv(sd[f"{pre}.conv1.weight"])},
                "conv2": {"w": _t2j_conv(sd[f"{pre}.conv2.weight"])},
            }
            s: Dict[str, Any] = {}
            p["bn1"], s["bn1"] = bn(f"{pre}.bn1")
            p["bn2"], s["bn2"] = bn(f"{pre}.bn2")
            if f"{pre}.downsample.0.weight" in sd:
                p["down_conv"] = {"w": _t2j_conv(sd[f"{pre}.downsample.0.weight"])}
                p["down_bn"], s["down_bn"] = bn(f"{pre}.downsample.1")
            blocks_p.append(p)
            blocks_s.append(s)
        params[f"layer{li}"] = blocks_p
        state[f"layer{li}"] = blocks_s
    fc_w = _t2j_linear(sd["fc.weight"])
    if fc_w.shape == params["fc"]["w"].shape:
        params["fc"] = {"w": fc_w, "b": _t2j_vec(sd["fc.bias"])}
    return params, state


def try_load_pretrained(model_def, args) -> Optional[Callable]:
    """Return an init fn seeded with pretrained weights, or None."""
    candidates = []
    if os.environ.get("PRIMIA_PRETRAINED"):
        candidates.append(os.environ["PRIMIA_PRETRAINED"])
    candidates.append(os.path.join("model_weights", f"{model_def.name}-imagenet.pt"))
    path = next((c for c in candidates if os.path.isfile(c)), None)
    if path is None:
        warnings.warn(
            f"pretrained=yes but no local weights found for {model_def.name} "
            "(no network egress; set $PRIMIA_PRETRAINED). Using He init.",
        )
        return None
    if model_def.name != "resnet-18":
        warnings.warn(f"pretrained import not implemented for {model_def.name}")
        return None

    def init(key):
        import torch  # local import: torch is only needed on this path

        params, state = model_def.init(key)
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return resnet18_from_torch_state_dict(sd, params, state)

    return init
