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
