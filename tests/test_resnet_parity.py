"""Golden parity: Flax FrameEncoder vs a torch ResNet18 (torchvision is not
installed, so the golden is a minimal torch reimplementation with
torchvision-compatible state_dict keys) + the reference's dilation surgery
(vision_net.py:96-109) and forward_multiframe semantics (vision_net.py:126-147).
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as TF

import jax.numpy as jnp

from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.torch_import import resnet_from_torch

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier


# ---- minimal torchvision-compatible resnet18 golden -------------------------

class TBasicBlock(tnn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(cout)
        self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(cout)
        self.downsample = None
        if stride != 1 or cin != cout:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, cout, 1, stride, bias=False),
                tnn.BatchNorm2d(cout))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = TF.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return TF.relu(y + idt)


class TResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        self.layer1 = tnn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64))
        self.layer2 = tnn.Sequential(TBasicBlock(64, 128, 2),
                                     TBasicBlock(128, 128))
        self.layer3 = tnn.Sequential(TBasicBlock(128, 256, 2),
                                     TBasicBlock(256, 256))
        self.layer4 = tnn.Sequential(TBasicBlock(256, 512, 2),
                                     TBasicBlock(512, 512))

    def forward(self, x):
        y = TF.relu(self.bn1(self.conv1(x)))
        y = self.maxpool(y)
        return self.layer4(self.layer3(self.layer2(self.layer1(y))))


def _nostride_dilate(m, dilate):
    # mirrors reference vision_net.py:96-109
    if isinstance(m, tnn.Conv2d):
        if m.stride == (2, 2):
            m.stride = (1, 1)
            if m.kernel_size == (3, 3):
                m.dilation = (dilate // 2, dilate // 2)
                m.padding = (dilate // 2, dilate // 2)
        else:
            if m.kernel_size == (3, 3):
                m.dilation = (dilate, dilate)
                m.padding = (dilate, dilate)


@pytest.fixture(scope="module")
def torch_resnet():
    torch.manual_seed(0)
    net = TResNet18()
    # randomize BN running stats so eval-mode parity is meaningful
    for m in net.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.normal_(0, 0.1)
            m.running_var.uniform_(0.7, 1.5)
    net.eval()
    return net


def _jax_apply(variables, x_nchw, dilate_scale, fc_dim=0, pool=True,
               pool_type="maxpool"):
    enc = FrameEncoder(fc_dim=fc_dim or 512, pool_type=pool_type,
                       dilate_scale=dilate_scale)
    xj = jnp.asarray(np.moveaxis(x_nchw, 1, -1))
    return enc.apply(variables, xj, pool=pool, train=False)


def test_trunk_parity_plain(torch_resnet):
    x = np.random.RandomState(0).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = torch_resnet(torch.from_numpy(x)).numpy()
    params, stats = resnet_from_torch(torch_resnet.state_dict(),
                                      with_fc=False)
    from avsep_tpu.models.resnet import ResNet18Features
    trunk = ResNet18Features(dilate_scale=0)
    ours = trunk.apply({"params": params["features"],
                        "batch_stats": stats["features"]},
                       jnp.asarray(np.moveaxis(x, 1, -1)), False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               rtol=1e-3, atol=1e-3)


def test_trunk_parity_dilated16(torch_resnet):
    import copy
    tnet = copy.deepcopy(torch_resnet)
    tnet.layer4.apply(lambda m: _nostride_dilate(m, 2))
    tnet.eval()
    x = np.random.RandomState(1).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    params, stats = resnet_from_torch(tnet.state_dict(), with_fc=False)
    from avsep_tpu.models.resnet import ResNet18Features
    trunk = ResNet18Features(dilate_scale=16)
    ours = trunk.apply({"params": params["features"],
                        "batch_stats": stats["features"]},
                       jnp.asarray(np.moveaxis(x, 1, -1)), False)
    # dilated: stride 16 -> 4x4 maps from 64px input
    assert ours.shape == (1, 4, 4, 512)
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               rtol=1e-3, atol=1e-3)


def test_frame_encoder_multiframe_and_pools(torch_resnet):
    """forward_multiframe: fold B*T, fc conv, temporal mean / global pools
    (reference vision_net.py:126-147)."""
    fc_dim = 32
    torch.manual_seed(3)
    fc = tnn.Conv2d(512, fc_dim, 3, padding=1)
    sd = dict(torch_resnet.state_dict())
    sd["fc.weight"] = fc.weight.data
    sd["fc.bias"] = fc.bias.data
    params, stats = resnet_from_torch(sd, with_fc=True)
    variables = {"params": params, "batch_stats": stats}

    B, T = 2, 3
    x = np.random.RandomState(2).randn(B, 3, T, 64, 64).astype(np.float32)

    # torch forward_multiframe, pool=False (the CoLoc path)
    with torch.no_grad():
        xt = torch.from_numpy(x).permute(0, 2, 1, 3, 4).reshape(B * T, 3,
                                                                64, 64)
        feats = fc(torch_resnet(xt))
        _, C, H, W = feats.shape
        feats = feats.view(B, T, C, H, W).permute(0, 2, 1, 3, 4)
        ref_map = feats.mean(dim=2).numpy()           # B, C, H, W
        ref_max = feats.amax(dim=(2, 3, 4)).numpy()   # B, C

    enc = FrameEncoder(fc_dim=fc_dim, pool_type="maxpool", dilate_scale=0)
    # our layout: [B, T, H, W, 3]
    xj = jnp.asarray(np.moveaxis(x, 1, -1))  # B, T, 64, 64, 3
    got_map = enc.apply(variables, xj, pool=False, train=False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(got_map), -1, 1),
                               ref_map, rtol=1e-3, atol=1e-3)
    got_vec = enc.apply(variables, xj, pool=True, train=False)
    np.testing.assert_allclose(np.asarray(got_vec), ref_max, rtol=1e-3,
                               atol=1e-3)


def test_fetch_tool_and_weights_frame_bootstrap(torch_resnet, tmp_path):
    """ImageNet bootstrap path end-to-end (reference models/__init__.py:61-78
    always starts pretrained): a torchvision-format .pth goes through
    tools/fetch_resnet18.py --src validation, then init_state(--weights_frame)
    imports it and the resulting trunk features match the torch golden."""
    import subprocess
    import sys as _sys
    import os as _os

    src = tmp_path / "resnet18-golden.pth"
    # torchvision dicts carry an fc we don't use; include one to prove the
    # validator/converter tolerate it (fc.weight is 2D -> skipped)
    sd = dict(torch_resnet.state_dict())
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)
    torch.save(sd, src)

    out = tmp_path / "resnet18-imagenet.pth"
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, _os.path.join(repo, "tools", "fetch_resnet18.py"),
         "--src", str(src), "--out", str(out)],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stderr
    assert "convert cleanly" in r.stdout
    assert out.exists()

    # the train-start import consumes it via --weights_frame
    from avsep_tpu.config import Config
    from avsep_tpu.engine import build_nets
    from avsep_tpu.train import init_state
    import jax
    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", one_frame=True,
                 imgSize=64, weights_frame=str(out))
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))

    # the import keeps the fresh conv-fc head (torchvision has none): the
    # full encoder must still forward
    feats = nets.frame.apply(
        {"params": state.params["frame"],
         "batch_stats": state.batch_stats["frame"]},
        jnp.zeros((1, 1, 64, 64, 3)), pool=False, train=False)
    assert feats.shape[-1] == 256 and np.isfinite(np.asarray(feats)).all()

    x = np.random.RandomState(2).randn(1, 3, 64, 64).astype(np.float32)
    import copy as _copy
    tnet = _copy.deepcopy(torch_resnet)
    tnet.layer4.apply(lambda m: _nostride_dilate(m, 2))
    tnet.eval()
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()
    from avsep_tpu.models.resnet import ResNet18Features
    trunk = ResNet18Features(dilate_scale=16)
    ours = trunk.apply(
        {"params": state.params["frame"]["features"],
         "batch_stats": state.batch_stats["frame"]["features"]},
        jnp.asarray(np.moveaxis(x, 1, -1)), False)
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1), ref,
                               rtol=1e-3, atol=1e-3)


def test_fetch_tool_rejects_wrong_dict(tmp_path):
    """The validator names the offending key instead of failing at
    train-start."""
    import subprocess
    import sys as _sys
    import os as _os
    bad = tmp_path / "bad.pth"
    torch.save({"conv1.weight": torch.zeros(64, 3, 7, 7)}, bad)
    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    r = subprocess.run(
        [_sys.executable, _os.path.join(repo, "tools", "fetch_resnet18.py"),
         "--src", str(bad), "--out", str(tmp_path / "o.pth")],
        capture_output=True, text=True, cwd=repo)
    assert r.returncode != 0
    assert "layer4.1.conv2.weight" in r.stderr
