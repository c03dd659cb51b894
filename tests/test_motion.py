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
