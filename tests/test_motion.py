"""Motion branch (ResNet3dFastOnly) + clip pipeline tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.models.motion import ResNet3dFastOnly

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier


def test_resnet3d_fast_shapes():
    net = ResNet3dFastOnly(base_channels=8)
    clips = jnp.zeros((1, 4, 64, 64, 3))
    variables = net.init(jax.random.PRNGKey(0), clips, train=False)
    out = net.apply(variables, clips, train=False)
    # stride 32 spatially, temporal preserved; 8 * 4 * 2^3 = 256 channels
    assert out.shape == (1, 4, 2, 2, 256)
    n_params = sum(x.size for x in
                   jax.tree_util.tree_leaves(variables["params"]))
    assert 0.4e6 < n_params < 1.5e6  # fast pathway is ~0.5M params


# ---- mmaction-layout importer: structure + torch-functional parity ---------
#
# The reference loads Kinetics-400 SlowFast weights through mmaction's
# ResNet3d (models/__init__.py:94-118: strip "backbone.", drop cls_head /
# slow_path, load_state_dict(strict=True)).  mmaction isn't installed here,
# so the golden is a torch-functional replay of the fast pathway driven by
# the SAME synthetic state_dict the importer consumes — this pins the key
# mapping, the OIDHW->DHWIO transpose, BN running-stat wiring, and the
# conv/pool padding conventions end-to-end.

_STAGES = (3, 4, 6, 3)


def _rand_mmaction_sd(rng, base=8):
    """Synthetic fast-pathway state_dict (post backbone.-strip key layout)."""
    sd = {}

    def conv(key, cout, cin, kd, kh, kw):
        sd[key] = (0.1 * rng.standard_normal((cout, cin, kd, kh, kw))
                   ).astype(np.float32)

    def bn(prefix, c):
        sd[prefix + ".weight"] = rng.uniform(0.5, 1.5, c).astype(np.float32)
        sd[prefix + ".bias"] = (0.1 * rng.standard_normal(c)
                                ).astype(np.float32)
        sd[prefix + ".running_mean"] = (0.1 * rng.standard_normal(c)
                                        ).astype(np.float32)
        sd[prefix + ".running_var"] = rng.uniform(0.5, 1.5, c).astype(
            np.float32)

    conv("conv1.conv.weight", base, 3, 5, 7, 7)
    bn("conv1.bn", base)
    cin = base
    for li, n_blocks in enumerate(_STAGES):
        planes = base * 2 ** li
        for bi in range(n_blocks):
            src = f"layer{li + 1}.{bi}"
            conv(f"{src}.conv1.conv.weight", planes, cin, 3, 1, 1)
            bn(f"{src}.conv1.bn", planes)
            conv(f"{src}.conv2.conv.weight", planes, planes, 1, 3, 3)
            bn(f"{src}.conv2.bn", planes)
            conv(f"{src}.conv3.conv.weight", planes * 4, planes, 1, 1, 1)
            bn(f"{src}.conv3.bn", planes * 4)
            if bi == 0:  # channel (and, past layer1, stride) change
                conv(f"{src}.downsample.conv.weight", planes * 4, cin,
                     1, 1, 1)
                bn(f"{src}.downsample.bn", planes * 4)
            cin = planes * 4
    return sd


def _torch_fast_pathway(sd, x):
    """Eval-mode fast-pathway forward in torch (x is NCDHW float32)."""
    import torch
    import torch.nn.functional as TF

    t = lambda k: torch.from_numpy(sd[k])

    def bn(y, p):
        return TF.batch_norm(y, t(p + ".running_mean"),
                             t(p + ".running_var"), t(p + ".weight"),
                             t(p + ".bias"), False, 0.0, 1e-5)

    y = TF.conv3d(x, t("conv1.conv.weight"), stride=(1, 2, 2),
                  padding=(2, 3, 3))
    y = TF.relu(bn(y, "conv1.bn"))
    y = TF.max_pool3d(y, (1, 3, 3), stride=(1, 2, 2), padding=(0, 1, 1))
    for li, n_blocks in enumerate(_STAGES):
        for bi in range(n_blocks):
            src = f"layer{li + 1}.{bi}"
            s = (2 if li > 0 else 1) if bi == 0 else 1
            idt = y
            z = TF.relu(bn(TF.conv3d(y, t(f"{src}.conv1.conv.weight"),
                                     padding=(1, 0, 0)), f"{src}.conv1.bn"))
            z = TF.relu(bn(TF.conv3d(z, t(f"{src}.conv2.conv.weight"),
                                     stride=(1, s, s), padding=(0, 1, 1)),
                           f"{src}.conv2.bn"))
            z = bn(TF.conv3d(z, t(f"{src}.conv3.conv.weight")),
                   f"{src}.conv3.bn")
            if f"{src}.downsample.conv.weight" in sd:
                idt = bn(TF.conv3d(y, t(f"{src}.downsample.conv.weight"),
                                   stride=(1, s, s)),
                         f"{src}.downsample.bn")
            y = TF.relu(z + idt)
    return y


@pytest.mark.parametrize("layout", ["bare", "fast_path", "raw_ckpt"])
def test_motion_from_torch_structure_and_parity(layout):
    import flax
    from flax.traverse_util import flatten_dict
    from avsep_tpu.models.motion import motion_from_torch

    rng = np.random.default_rng(0)
    sd = _rand_mmaction_sd(rng)
    if layout == "fast_path":
        # the post-backbone.-strip layout of the real mmaction SlowFast
        # checkpoint: fast-pathway keys keep their fast_path. prefix
        fed = {"fast_path." + k: v for k, v in sd.items()}
    elif layout == "raw_ckpt":
        # the on-disk state_dict layout the reference loads
        # (models/__init__.py:114-116) incl. entries its filter drops
        fed = {"backbone.fast_path." + k: v for k, v in sd.items()}
        fed["backbone.slow_path.conv1.conv.weight"] = np.zeros(
            (1,), np.float32)
        fed["cls_head.fc_cls.weight"] = np.zeros((1,), np.float32)
    else:
        fed = sd
    params, stats = motion_from_torch(fed)

    net = ResNet3dFastOnly(base_channels=8)
    x = rng.standard_normal((1, 4, 32, 32, 3)).astype(np.float32)
    ref_vars = flax.core.unfreeze(
        net.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False))

    # strict=True equivalence: imported tree covers EXACTLY init's shapes
    got = {k: tuple(np.shape(v)) for k, v in flatten_dict(
        {"params": params, "batch_stats": stats}).items()}
    want = {k: tuple(np.shape(v)) for k, v in flatten_dict(
        {"params": ref_vars["params"],
         "batch_stats": ref_vars["batch_stats"]}).items()}
    assert got == want

    ours = net.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x), train=False)
    ref = _torch_fast_pathway(sd, __import__("torch").from_numpy(
        x.transpose(0, 4, 1, 2, 3)))
    np.testing.assert_allclose(np.moveaxis(np.asarray(ours), -1, 1),
                               ref.numpy(), rtol=1e-3, atol=1e-3)


def test_clip_pipeline(tmp_path):
    from tests.test_dataset import make_cfg
    from avsep_tpu.data.dataset import MusicMixDataset
    from avsep_tpu.data.audio_io import write_wav
    from PIL import Image
    import os
    # tiny manifest with clips enabled
    root = tmp_path
    wav = (0.3 * np.sin(np.arange(11025 * 12) / 30)).astype(np.float32)
    apath = root / "a.wav"
    write_wav(str(apath), wav, 11025)
    fdir = root / "a.mp4"
    os.makedirs(fdir)
    for i in range(64):
        Image.fromarray(np.full((60, 80, 3), i, np.uint8)).save(
            fdir / "{:06d}.jpg".format(i))
    row = [str(apath), str(fdir), "60", "5.0", "12.0", "cello"]
    cfg = make_cfg(load_clips=True, clip_len=8, imgSize=64, rate_sv=1.0,
                   rate_dc=0.0, rate_sc=0.0)
    ds = MusicMixDataset([row, row], cfg, split="train")
    s = ds[0]
    assert s["clips"].shape == (2, 8, 64, 64, 3)
    assert s["frames"].shape[0] == 2
    assert np.isfinite(s["clips"]).all()
