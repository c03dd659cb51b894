"""Inference demo pipeline tests on the synthetic manifest: vis_video
(batched attention videos) and synthesis_demo (reference inference.py
vis_video :537-578, get_sythesis_audio :237-252)."""

import os

import numpy as np
import pytest

import jax

from avsep_tpu.data.dataset import read_manifest
from avsep_tpu.inference import (
    attention_overlay, get_demo_audio, synthesis_demo, vis_video)
from tests.test_dataset import manifest  # noqa: F401 (fixture)
from tests.test_eval_e2e import small_setup  # noqa: F401 (fixture)


def test_get_demo_audio(manifest):  # noqa: F811
    from tests.test_dataset import make_cfg
    cfg = make_cfg()
    rows = read_manifest(manifest)
    wav, c_t = get_demo_audio(rows[0][0], rows[0][2], float(rows[0][3]),
                              rows[0][4], cfg)
    assert wav.shape == (cfg.audLen,)
    assert np.abs(wav).max() <= 1.0
    # deterministic draw (seed 8, reference inference.py:202)
    wav2, c_t2 = get_demo_audio(rows[0][0], rows[0][2], float(rows[0][3]),
                                rows[0][4], cfg)
    assert c_t == c_t2


def test_attention_overlay_shape():
    frame = np.random.RandomState(0).randn(64, 64, 3).astype(np.float32)
    att = np.random.RandomState(1).rand(4, 4).astype(np.float32)
    out = attention_overlay(frame, att)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_vis_video_end_to_end(small_setup, manifest, tmp_path):  # noqa: F811
    cfg, nets, state = small_setup
    rows = read_manifest(manifest)
    save = str(tmp_path / "demo")
    vis_video(cfg, nets, state.params, state.batch_stats, rows[0], save)
    assert os.path.exists(os.path.join(save, "mix.wav"))
    assert os.path.exists(os.path.join(save, "pred1.wav"))
    assert os.path.exists(os.path.join(save, "predmask1.jpg"))


def test_synthesis_demo(small_setup, manifest, tmp_path):  # noqa: F811
    cfg, nets, state = small_setup
    rows = read_manifest(manifest)
    save = str(tmp_path / "syn")
    synthesis_demo(cfg, nets, state.params, state.batch_stats, rows[0],
                   rows[2], save)
    for f in ("mix.wav", "pred1.wav", "pred2.wav", "gt1.wav", "gt2.wav"):
        assert os.path.exists(os.path.join(save, f))


def test_share_demo_blank_frames(small_setup, manifest, tmp_path):  # noqa: F811
    """share mode: blank-frame separation writes wavs + masks (reference
    share_forward, inference.py:88-107)."""
    from avsep_tpu.inference import share_demo
    cfg, nets, state = small_setup
    rows = read_manifest(manifest)
    save = str(tmp_path / "share")
    share_demo(cfg, nets, state.params, state.batch_stats, rows[0], save)
    for f in ("mix.wav", "pred1.wav", "pred2.wav", "predmask1.jpg"):
        assert os.path.exists(os.path.join(save, f)), f


def test_duet_sweep_all_rows(small_setup, manifest, tmp_path):  # noqa: F811
    """sweep mode visits every manifest row (reference inference.py:421-426)."""
    from avsep_tpu.inference import duet_sweep
    cfg, nets, state = small_setup
    rows = read_manifest(manifest)[:2]
    duet_sweep(cfg, nets, state.params, state.batch_stats, rows,
               str(tmp_path))
    for i in range(2):
        assert os.path.exists(os.path.join(str(tmp_path), f"duet_{i}",
                                           "pred1.wav"))


def test_duet_sweep_vis_rate(small_setup, manifest, tmp_path,  # noqa: F811
                             monkeypatch):
    """--duet_vis_rate r rate-limits the attention-mp4 dumps to the first
    of every round(1/r) rows; wavs/masks are written for ALL rows (the
    flag the reference scripts pass but never consume,
    scripts/inference.sh:63)."""
    import avsep_tpu.inference as inf
    cfg, nets, state = small_setup
    cfg = cfg.replace(duet_vis_rate=0.5)  # stride 2
    rows = read_manifest(manifest)[:3]
    rendered = []
    monkeypatch.setattr(inf, "save_video",
                        lambda path, *a, **k: rendered.append(path))
    monkeypatch.setattr(inf, "combine_video_audio", lambda *a, **k: None)
    inf.duet_sweep(cfg, nets, state.params, state.batch_stats, rows,
                   str(tmp_path))
    for i in range(3):  # audio artifacts for every row
        assert os.path.exists(os.path.join(str(tmp_path), f"duet_{i}",
                                           "pred1.wav"))
    dirs = {os.path.basename(os.path.dirname(p)) for p in rendered}
    assert dirs == {"duet_0", "duet_2"}  # mp4s only at the stride


def test_pixelwise_sound_map(manifest, tmp_path):  # noqa: F811
    """pixelwise mode exercises InnerProd.forward_pixelwise end-to-end
    (reference synthesizer_net.py:29-38)."""
    from avsep_tpu.inference import pixelwise_demo
    from tests.test_dataset import make_cfg
    cfg = make_cfg().replace(num_channels=2, vis_channels=2,
                             arch_sound="unet5", imgSize=64,
                             att_type="sig", img_activation="relu",
                             one_frame=True)
    rows = read_manifest(manifest)
    save = str(tmp_path / "pix")
    pixelwise_demo(cfg, rows[0], save)
    assert os.path.exists(os.path.join(save, "sound_map.jpg"))
    assert os.path.exists(os.path.join(save, "sound_map_raw.jpg"))
    masks = np.load(os.path.join(save, "pixel_masks.npy"))
    assert masks.ndim == 4 and np.isfinite(masks).all()

    # mismatched channel config is rejected with a precise message
    with pytest.raises(SystemExit, match="vis_channels"):
        pixelwise_demo(cfg.replace(vis_channels=8), rows[0], save)
