"""Model-zoo tests: shapes, jit, BN semantics, and exact parity vs torch.

The torch parity test rebuilds the reference's ResNet-18 topology with
plain torch.nn (BasicBlock [2,2,2,2], configurable stem pool, fixed
input/32 avg pool — reference torchlib/models.py:345-516), loads OUR
randomly-initialized params into it, and checks logits agree. This
validates conv padding/stride, BN eval semantics, pooling and layout
conversions end to end.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from primia_tpu.config import Arguments
from primia_tpu.nn import create_model
from primia_tpu.nn.core import PLAIN, batch_norm, bn_init
from primia_tpu.nn.resnet import resnet18_forward, resnet18_init


def _args(**kw):
    d = dict(model="resnet-18", pretrained=False, data_dir="x",
             train_resolution=64, inference_resolution=64)
    d.update(kw)
    return Arguments(**d)


@pytest.mark.parametrize(
    "model,res,pool",
    [("resnet-18", 32, "max"), ("resnet-18", 64, "avg"),
     ("vgg16", 32, "max"), ("simpleconv", 28, "max"),
     # the reference's high-res inference option (configs allow
     # inference_resolution 512; ConvNet512, models.py:558)
     ("simpleconv", 512, "max"), ("resnet-18", 512, "max")],
)
def test_forward_shapes(model, res, pool):
    args = _args(model=model, train_resolution=res, inference_resolution=res,
                 pooling_type=pool)
    md = create_model(args)
    params, state = md.init(jax.random.key(0))
    x = jnp.zeros((2, md.input_size, md.input_size, md.in_channels), jnp.float32)
    logits, _ = md.forward(params, state, x)
    assert logits.shape == (2, 3)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_jit_and_train_state_update():
    args = _args()
    md = create_model(args)
    params, state = md.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 1), jnp.float32)

    fwd = jax.jit(lambda p, s, x: md.forward(p, s, x, train=True, input_size=32))
    logits, new_state = fwd(params, state, x)
    assert logits.shape == (4, 3)
    # running stats actually moved
    assert not np.allclose(np.asarray(new_state["bn1"]["mean"]),
                           np.asarray(state["bn1"]["mean"]))
    assert int(new_state["bn1"]["count"]) == 1


def test_param_count_matches_torch_resnet18():
    import torch
    import torch.nn as nn

    # 3-channel, 3-class resnet18: torchvision count minus 1000-class fc
    params, _ = resnet18_init(jax.random.key(0), num_classes=3, in_channels=3)
    ours = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    expected = 11689512 - (512 * 1000 + 1000) + (512 * 3 + 3)
    assert ours == expected


def test_bn_train_matches_torch():
    import torch

    c = 5
    p, s = bn_init(c)
    x = np.random.default_rng(0).normal(size=(8, 6, 6, c)).astype(np.float32)
    y, ns = batch_norm(PLAIN, jnp.asarray(x), p, s, train=True)

    tbn = torch.nn.BatchNorm2d(c)
    tbn.train()
    ty = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y), ty.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(ns["mean"]), tbn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ns["var"]), tbn.running_var.numpy(), atol=1e-5
    )


def test_group_norm_matches_torch():
    """normalization=group (DP-trainable variant) vs torch.nn.GroupNorm:
    per-example group statistics + trainable channelwise affine."""
    import torch

    from primia_tpu.nn.core import group_norm

    c, g = 64, 32
    p, _ = bn_init(c)
    p = dict(p, gamma=jnp.asarray(
        np.random.default_rng(1).normal(1.0, 0.1, c).astype(np.float32)),
        beta=jnp.asarray(
        np.random.default_rng(2).normal(0.0, 0.1, c).astype(np.float32)))
    x = np.random.default_rng(0).normal(size=(4, 6, 6, c)).astype(np.float32)
    y = group_norm(PLAIN, jnp.asarray(x), p, groups=g)

    tgn = torch.nn.GroupNorm(g, c)
    with torch.no_grad():
        tgn.weight.copy_(torch.from_numpy(np.asarray(p["gamma"])))
        tgn.bias.copy_(torch.from_numpy(np.asarray(p["beta"])))
    ty = tgn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y), ty.detach().numpy().transpose(0, 2, 3, 1), atol=1e-5
    )


def _torch_resnet18(pooling="max", input_size=32, num_classes=3, in_channels=1):
    """Reference topology (torchlib/models.py:345-516) in plain torch.nn."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, planes, stride=1, down=False):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.down = (
                nn.Sequential(nn.Conv2d(cin, planes, 1, stride, bias=False),
                              nn.BatchNorm2d(planes))
                if down else None
            )
            self.relu = nn.ReLU()

        def forward(self, x):
            idt = self.down(x) if self.down is not None else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(in_channels, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.pool = (nn.MaxPool2d(3, 2, 1) if pooling == "max"
                         else nn.AvgPool2d(3, 2, 1))
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2, True), BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2, True), BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2, True), BasicBlock(512, 512))
            self.avgpool = nn.AvgPool2d(input_size // 32)
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            x = self.pool(self.relu(self.bn1(x := self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return Net()


@pytest.mark.parametrize("pooling", ["max", "avg"])
def test_resnet18_parity_vs_torch(pooling):
    import torch

    params, state = resnet18_init(jax.random.key(3), num_classes=3, in_channels=1)
    net = _torch_resnet18(pooling=pooling)
    net.eval()

    def copy_conv(dst, w):
        dst.weight.data = torch.from_numpy(np.asarray(w).transpose(3, 2, 0, 1).copy())

    def copy_bn(dst, p, s):
        dst.weight.data = torch.from_numpy(np.asarray(p["gamma"]).copy())
        dst.bias.data = torch.from_numpy(np.asarray(p["beta"]).copy())
        dst.running_mean.data = torch.from_numpy(np.asarray(s["mean"]).copy())
        dst.running_var.data = torch.from_numpy(np.asarray(s["var"]).copy())

    copy_conv(net.conv1, params["conv1"]["w"])
    copy_bn(net.bn1, params["bn1"], state["bn1"])
    for li in range(1, 5):
        for bi in range(2):
            p, s = params[f"layer{li}"][bi], state[f"layer{li}"][bi]
            tb = getattr(net, f"layer{li}")[bi]
            copy_conv(tb.conv1, p["conv1"]["w"])
            copy_conv(tb.conv2, p["conv2"]["w"])
            copy_bn(tb.bn1, p["bn1"], s["bn1"])
            copy_bn(tb.bn2, p["bn2"], s["bn2"])
            if "down_conv" in p:
                copy_conv(tb.down[0], p["down_conv"]["w"])
                copy_bn(tb.down[1], p["down_bn"], s["down_bn"])
    net.fc.weight.data = torch.from_numpy(np.asarray(params["fc"]["w"]).T.copy())
    net.fc.bias.data = torch.from_numpy(np.asarray(params["fc"]["b"]).copy())

    x = np.random.default_rng(7).normal(size=(2, 32, 32, 1)).astype(np.float32)
    ours, _ = resnet18_forward(params, state, jnp.asarray(x),
                               pooling=pooling, input_size=32)
    with torch.no_grad():
        theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    # fp32 accumulation-order drift through 18 layers (folded BN affine
    # vs torch's divide) reaches a few 1e-3 on logits; structure errors
    # would be O(1).
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-2)


def test_swap_pool_relu_identity_for_maxpool():
    params, state = resnet18_init(jax.random.key(5), num_classes=3, in_channels=1)
    x = jax.random.normal(jax.random.key(6), (2, 32, 32, 1), jnp.float32)
    a, _ = resnet18_forward(params, state, x, pooling="max", input_size=32,
                            swap_pool_relu=False)
    b, _ = resnet18_forward(params, state, x, pooling="max", input_size=32,
                            swap_pool_relu=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stem_s2d_exact_rewrite():
    """The space-to-depth stem (training hot path) is an arithmetic
    identity for conv1: logits must match the strided formulation, in
    train mode too (BN batch stats see the same conv output)."""
    params, state = resnet18_init(jax.random.key(7), num_classes=3, in_channels=3)
    x = jax.random.normal(jax.random.key(8), (2, 64, 64, 3), jnp.float32)
    a, sa = resnet18_forward(params, state, x, pooling="max", input_size=64,
                             train=True, stem_s2d=False)
    b, sb = resnet18_forward(params, state, x, pooling="max", input_size=64,
                             train=True, stem_s2d=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sa["bn1"]["mean"]),
                               np.asarray(sb["bn1"]["mean"]), rtol=1e-5, atol=1e-6)
