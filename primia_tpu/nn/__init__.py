"""Model zoo: ResNet-18, VGG-16, simpleconv@{28,224,512}.

``create_model(args)`` reproduces the reference's model-construction
logic (``train.py:237-276``): model family + pooling from the config,
``in_channels = 1 if data_dir == "mnist" or not pretrained else 3``,
3-class (or dataset-derived) head, fixed-pool variants for MPC compat.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, replace
from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax.numpy as jnp

from primia_tpu.nn import core  # noqa: F401
from primia_tpu.nn.core import PLAIN
from primia_tpu.nn.resnet import resnet18_forward, resnet18_init
from primia_tpu.nn.simpleconv import simpleconv_forward, simpleconv_init
from primia_tpu.nn.vgg import vgg16_forward, vgg16_init


@dataclass(frozen=True)
class ModelDef:
    """A model family bound to its hyperparameters.

    ``init(key) -> (params, state)``;
    ``forward(params, state, x, *, E=PLAIN, train=False,
    swap_pool_relu=False, rng=None) -> (logits, new_state)``.
    """

    name: str
    init: Callable
    forward: Callable
    input_size: int
    in_channels: int
    num_classes: int
    pooling: str


def create_model(args, num_classes: int = None, dtype=jnp.float32) -> ModelDef:
    num_classes = num_classes or args.num_classes
    in_channels = 1 if (args.data_dir == "mnist" or not args.pretrained) else 3
    res = args.inference_resolution
    pooling = args.pooling_type

    if args.pretrained:
        # No network egress on TPU hosts: ImageNet weights must be
        # provided as a local file (see nn.torch_import); otherwise we
        # fall back to He init.
        from primia_tpu.nn.torch_import import try_load_pretrained  # lazy

    # getattr: checkpoints from before the field existed unpickle an
    # Arguments without it
    norm = getattr(args, "normalization", "batch")
    if norm != "batch" and args.model not in ("resnet-18", "simpleconv"):
        raise ValueError(
            "normalization=group is only wired for resnet-18/simpleconv")

    if args.model == "resnet-18":
        init = partial(
            resnet18_init, num_classes=num_classes, in_channels=in_channels,
            dtype=dtype,
            # the GN variant exists for DP training; start it calibrated
            # (see resnet_init docnote on the init gradient common mode)
            zero_init_fc=(norm == "group"),
        )
        fwd = partial(resnet18_forward, pooling=pooling, input_size=res, norm=norm)
        md = ModelDef("resnet-18", init, fwd, res, in_channels, num_classes, pooling)
    elif args.model == "vgg16":
        init = partial(
            vgg16_init, num_classes=num_classes, in_channels=in_channels, dtype=dtype
        )
        fwd = partial(vgg16_forward, pooling=pooling, input_size=res)
        md = ModelDef("vgg16", init, fwd, res, in_channels, num_classes, pooling)
    elif args.model == "simpleconv":
        res = args.train_resolution
        init = partial(
            simpleconv_init,
            resolution=res,
            num_classes=num_classes,
            in_channels=in_channels,
            dtype=dtype,
            zero_init_fc=(norm == "group"),
        )
        fwd = partial(simpleconv_forward, resolution=res, pooling=pooling,
                      norm=norm)
        md = ModelDef("simpleconv", init, fwd, res, in_channels, num_classes, pooling)
    else:
        raise ValueError(f"unknown model {args.model!r}")

    if args.pretrained:
        loaded_init = try_load_pretrained(md, args)
        if loaded_init is not None:
            md = replace(md, init=loaded_init)
    return md
