"""End-to-end pretrained-weights path: a REAL torch-format ResNet-18
state_dict (torchvision key naming) round-trips through
``nn/torch_import.py`` into a forward-parity model.

Reference contract: ``torchlib/models.py:499-516`` pulls torchvision
ImageNet weights, then swaps in a fresh ``num_classes`` head. Here the
weights come from a local file ($PRIMIA_PRETRAINED); pretrained=yes
with no file must warn loudly and fall back to He init.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from primia_tpu.config import Arguments
from primia_tpu.nn import create_model


def _torchvision_named_resnet18(num_classes=1000):
    """A torch ResNet-18 whose state_dict keys EXACTLY match
    torchvision's (conv1/bn1/layerN.M.{conv,bn}{1,2}/
    layerN.0.downsample.{0,1}/fc) — the file format users would bring."""
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, planes, stride=1, down=False):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = (
                nn.Sequential(nn.Conv2d(cin, planes, 1, stride, bias=False),
                              nn.BatchNorm2d(planes))
                if down else None
            )
            self.relu = nn.ReLU()

        def forward(self, x):
            idt = self.downsample(x) if self.downsample is not None else x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            return self.relu(out + idt)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU()
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2, True),
                                        BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2, True),
                                        BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2, True),
                                        BasicBlock(512, 512))
            self.avgpool = nn.AvgPool2d(7)
            self.fc = nn.Linear(512, num_classes)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x).flatten(1)
            return self.fc(x)

    return Net()


@pytest.fixture(scope="module")
def torch_ckpt(tmp_path_factory):
    """A saved torchvision-format state_dict with non-trivial weights
    and running stats (as a downloaded ImageNet file would have)."""
    import torch

    torch.manual_seed(11)
    net = _torchvision_named_resnet18()
    # non-default running stats: catch mean/var mix-ups
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 1.5)
                m.num_batches_tracked.fill_(42)
    path = tmp_path_factory.mktemp("weights") / "resnet-18-imagenet.pt"
    torch.save(net.state_dict(), str(path))
    return net, str(path)


def _args(**over):
    base = dict(model="resnet-18", pretrained=True, train_resolution=224,
                inference_resolution=224)
    base.update(over)
    return Arguments(**base)


class TestPretrainedEndToEnd:
    def test_forward_parity_with_head_swap(self, torch_ckpt, monkeypatch):
        """create_model(pretrained=yes) + $PRIMIA_PRETRAINED: every
        backbone tensor matches torch's forward; the 1000-class fc is
        replaced by a fresh 3-class head (reference models.py:497-500)."""
        import torch

        net, path = torch_ckpt
        monkeypatch.setenv("PRIMIA_PRETRAINED", path)
        md = create_model(_args(), num_classes=3)
        assert md.in_channels == 3  # pretrained forces 3-channel stem
        params, state = md.init(jax.random.PRNGKey(0))
        # head was NOT copied (shape mismatch) -> fresh 3-class fc
        assert params["fc"]["w"].shape == (512, 3)

        # backbone parity: compare pre-fc features by using a probe fc
        x = np.random.default_rng(5).normal(size=(2, 224, 224, 3)).astype(np.float32)
        probe_w = np.eye(512, 3, dtype=np.float32)
        params_probe = dict(params)
        params_probe["fc"] = {"w": jnp.asarray(probe_w),
                              "b": jnp.zeros(3, jnp.float32)}
        ours, _ = md.forward(params_probe, state, jnp.asarray(x), train=False)

        net.eval()
        old_fc = net.fc
        try:
            with torch.no_grad():
                net.fc = torch.nn.Identity()
                feats = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        finally:
            net.fc = old_fc  # module-scoped fixture: leave it intact
        np.testing.assert_allclose(np.asarray(ours), feats[:, :3],
                                   rtol=1e-3, atol=1e-3)

    def test_full_logit_parity_when_heads_match(self, torch_ckpt, monkeypatch):
        """With a matching 1000-class head, the fc IS copied and full
        logits agree."""
        import torch

        net, path = torch_ckpt
        monkeypatch.setenv("PRIMIA_PRETRAINED", path)
        md = create_model(_args(), num_classes=1000)
        params, state = md.init(jax.random.PRNGKey(0))
        x = np.random.default_rng(6).normal(size=(2, 224, 224, 3)).astype(np.float32)
        ours, _ = md.forward(params, state, jnp.asarray(x), train=False)
        net.eval()
        with torch.no_grad():
            theirs = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-3)

    def test_missing_file_warns_loudly_and_uses_he(self, monkeypatch):
        monkeypatch.delenv("PRIMIA_PRETRAINED", raising=False)
        monkeypatch.chdir("/tmp")  # no model_weights/ fallback here
        with pytest.warns(UserWarning, match="no local weights"):
            md = create_model(_args(), num_classes=3)
        params, _ = md.init(jax.random.PRNGKey(0))
        # He init, not zeros/garbage
        w = np.asarray(params["conv1"]["w"])
        assert np.isfinite(w).all() and 0.01 < w.std() < 1.0
