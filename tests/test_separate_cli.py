"""separate_cli loaders + dataset save_sample debug dumper."""

import os

import numpy as np

from avsep_tpu.data.audio_io import write_wav
from avsep_tpu.separate_cli import load_frame_dir, load_mixture
from tests.test_dataset import make_cfg, manifest  # noqa: F401


def test_load_mixture_pads_and_clips(tmp_path):
    cfg = make_cfg()
    x = (np.sin(np.arange(5000) / 10) * 2).astype(np.float32)
    p = str(tmp_path / "m.wav")
    write_wav(p, x, cfg.audRate)
    out = load_mixture(p, cfg)
    assert out.shape == (cfg.audLen,)
    assert np.abs(out).max() <= 1.0


def test_load_frame_dir(tmp_path):
    from PIL import Image
    cfg = make_cfg()
    d = tmp_path / "f"
    os.makedirs(d)
    Image.fromarray(np.zeros((50, 60, 3), np.uint8)).save(d / "000001.jpg")
    out = load_frame_dir(str(d), cfg)
    assert out.shape == (2, 1, cfg.imgSize, cfg.imgSize, 3)
    assert load_frame_dir(None, cfg) is None


def test_save_sample(manifest, tmp_path):  # noqa: F811
    from avsep_tpu.data.dataset import MusicMixDataset
    cfg = make_cfg()
    ds = MusicMixDataset(manifest, cfg, split="val")
    ds.save_sample([0], str(tmp_path / "dump"))
    files = os.listdir(tmp_path / "dump")
    assert any(f.endswith("_mix.wav") for f in files)
    assert any(f.endswith("_aud_0.wav") for f in files)
