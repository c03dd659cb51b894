"""torch_export: the exact inverse of torch_import.

Fast tier: export -> import round-trips are the identity on the Flax trees.
Slow tier: exported dicts strict-load into the LIVE reference torch modules
(key-completeness incl. the num_batches_tracked buffers) and reproduce the
imported weights bit-for-bit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.models.builder import ModelBuilder
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.synthesizer import InnerProd
from avsep_tpu.models.torch_export import (
    resnet_to_torch, synthesizer_to_torch, unet_to_torch)
from avsep_tpu.models.torch_import import (
    resnet_from_torch, synthesizer_from_torch, unet_from_torch)


def _assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        np.testing.assert_array_equal(np.asarray(leaf),
                                      np.asarray(lb[path]), err_msg=str(path))


def _init_unet(num_downs=5, fc_dim=2):
    net = ModelBuilder.build_sound(arch=f"unet{num_downs}", fc_dim=fc_dim,
                                   fusion_type="hidsep", att_type="sig")
    # CoLoc attention needs vis dim == bottleneck chunk (ngf*8 / C = 256)
    v = net.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 2 ** num_downs * 8, 2 ** num_downs * 8, 1)),
                 jnp.zeros((fc_dim, 1, 4, 4, 256)), train=False)
    return net, v["params"], v["batch_stats"]


def test_unet_roundtrip():
    _, params, stats = _init_unet()
    sd = unet_to_torch(params, stats, num_downs=5)
    p2, s2 = unet_from_torch(sd, num_downs=5)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)


def test_resnet_roundtrip():
    net = FrameEncoder(fc_dim=32, pool_type="maxpool", dilate_scale=16)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 64, 64, 3)),
                 pool=False, train=False)
    params, stats = v["params"], v["batch_stats"]
    sd = resnet_to_torch(params, stats)
    p2, s2 = resnet_from_torch(sd)
    _assert_trees_equal(params, p2)
    _assert_trees_equal(stats, s2)


def test_synthesizer_roundtrip():
    net = InnerProd(fc_dim=2)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 2)),
                 jnp.zeros((1, 8, 8, 2)))
    sd = synthesizer_to_torch(v["params"])
    p2 = synthesizer_from_torch(sd)
    _assert_trees_equal(v["params"], p2)


@pytest.mark.slow
def test_export_strict_loads_into_reference_unet():
    import torch
    from tests.reference_loader import load_reference_models
    audio_net = load_reference_models()[0]
    torch.manual_seed(3)
    tnet = audio_net.Unet(fc_dim=2, num_downs=7, fusion_type="hidsep",
                          att_type="sig").eval()
    params, stats = unet_from_torch(tnet.state_dict(), num_downs=7)
    sd = unet_to_torch(params, stats, num_downs=7)
    tnet2 = audio_net.Unet(fc_dim=2, num_downs=7, fusion_type="hidsep",
                           att_type="sig").eval()
    missing, unexpected = tnet2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=False)
    # fusion-module params live outside the export surface (they have no
    # state_dict in our tree: CoLoc is parameter-free); everything torch
    # tracks for the U-Net itself must be covered exactly
    assert not [k for k in missing if "fusion" not in k], missing
    assert not unexpected, unexpected
    for k, v in tnet.state_dict().items():
        if "num_batches_tracked" in k or "fusion" in k:
            continue
        np.testing.assert_array_equal(v.numpy(),
                                      tnet2.state_dict()[k].numpy(),
                                      err_msg=k)


def _ref_frame_net(seed: int):
    """Reference FrameEncoder layout (``features.N...`` + ``fc.*``,
    vision_net.py:26-30/:88-92) over the torchvision-compatible golden
    trunk (torchvision itself is not installed here)."""
    import torch
    import torch.nn as tnn
    from tests.test_resnet_parity import TResNet18

    torch.manual_seed(seed)
    trunk = TResNet18()

    class RefFrame(tnn.Module):
        def __init__(self):
            super().__init__()
            # same Sequential numbering as torchvision children()[:-2]
            self.features = tnn.Sequential(
                trunk.conv1, trunk.bn1, tnn.ReLU(inplace=True),
                trunk.maxpool, trunk.layer1, trunk.layer2, trunk.layer3,
                trunk.layer4)
            self.fc = tnn.Conv2d(512, 32, 3, padding=1)

    return RefFrame().eval()


@pytest.mark.slow
def test_export_strict_loads_into_reference_resnet():
    import torch
    tnet = _ref_frame_net(seed=5)
    params, stats = resnet_from_torch(tnet.state_dict())
    sd = resnet_to_torch(params, stats)
    tnet2 = _ref_frame_net(seed=6)
    tnet2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in sd.items()}, strict=True)
    for k, v in tnet.state_dict().items():
        np.testing.assert_array_equal(v.numpy(),
                                      tnet2.state_dict()[k].numpy(),
                                      err_msg=k)
