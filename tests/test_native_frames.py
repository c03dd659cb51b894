"""Native frame decode (native/avsep_frames.cpp) parity with the PIL path.

The C++ fast path replaces the reference's per-frame PIL decode in Python
workers (reference dataset/music.py:132-156) and must be BIT-IDENTICAL to
the pure-Python pipeline: same libjpeg decode output, a faithful
reimplementation of Pillow's fixed-point separable resampling, the same
crop geometry, and the same rng draw order (so a run is reproducible
regardless of which path executed).
"""

import os

import numpy as np
import pytest
from PIL import Image

from avsep_tpu.data import native

pytestmark = pytest.mark.skipif(
    not native.frames_available(),
    reason="libavsep_frames.so unavailable (no libjpeg / compiler)")


# --------------------------------------------------------- kernel parity

@pytest.mark.parametrize("filt,pil_filt", [("bicubic", Image.BICUBIC),
                                           ("bilinear", Image.BILINEAR)])
@pytest.mark.parametrize("ih,iw,oh,ow", [
    (120, 160, 70, 94),    # downscale
    (64, 48, 224, 224),    # upscale
    (100, 100, 110, 110),  # the train path's 1.1x
    (90, 130, 90, 60),     # width-only
    (90, 130, 40, 130),    # height-only
])
def test_resize_bit_exact_vs_pil(filt, pil_filt, ih, iw, oh, ow):
    rng = np.random.default_rng(ih * 1000 + ow)
    a = rng.integers(0, 256, (ih, iw, 3), dtype=np.uint8)
    want = np.asarray(Image.fromarray(a).resize((ow, oh), pil_filt))
    got = native.resize_rgb(a, oh, ow, filt)
    np.testing.assert_array_equal(got, want)


def test_jpeg_decode_bit_exact_vs_pil(tmp_path):
    rng = np.random.default_rng(7)
    for q in (70, 85, 95):
        a = rng.integers(0, 256, (90, 130, 3), dtype=np.uint8)
        p = str(tmp_path / f"t{q}.jpg")
        Image.fromarray(a).save(p, quality=q)
        want = np.asarray(Image.open(p).convert("RGB"))
        assert native.jpeg_probe_dims(p) == (130, 90)
        got = native.frame_pipeline_batch([p], 90, 130)
        np.testing.assert_array_equal(got[0], want)


def test_probe_rejects_non_jpeg(tmp_path):
    p = str(tmp_path / "not.jpg")
    with open(p, "wb") as f:
        f.write(b"definitely not a jpeg")
    assert native.jpeg_probe_dims(p) is None
    assert native.jpeg_probe_dims(str(tmp_path / "missing.jpg")) is None


def test_pipeline_crop_flip_matches_pil(tmp_path):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (120, 150, 3), dtype=np.uint8)
    p = str(tmp_path / "x.jpg")
    Image.fromarray(a).save(p, quality=92)

    img = Image.open(p).convert("RGB")
    want = img.resize((165, 132), Image.BICUBIC) \
              .crop((10, 5, 10 + 96, 5 + 96)) \
              .transpose(Image.FLIP_LEFT_RIGHT)
    got = native.frame_pipeline_batch(
        [p, p], 96, 96, resize=(165, 132), crop=(10, 5, 96, 96),
        hflip=True)
    np.testing.assert_array_equal(got[0], np.asarray(want))
    np.testing.assert_array_equal(got[1], np.asarray(want))

    # with a second resize (the clips path: crop -> resize(size,size))
    want2 = img.resize((165, 132), Image.BICUBIC) \
               .crop((20, 12, 20 + 80, 12 + 70)) \
               .resize((64, 64), Image.BICUBIC)
    got2 = native.frame_pipeline_batch(
        [p], 64, 64, resize=(165, 132), crop=(20, 12, 80, 70),
        final=(64, 64))
    np.testing.assert_array_equal(got2[0], np.asarray(want2))


def test_pipeline_crop_pads_black_outside(tmp_path):
    """PIL crop outside the image yields black; the native crop must too
    (val center-crop when imgSize exceeds the resized frame)."""
    a = np.full((40, 50, 3), 200, np.uint8)
    p = str(tmp_path / "s.jpg")
    Image.fromarray(a).save(p, quality=95)
    img = Image.open(p).convert("RGB")
    want = np.asarray(img.crop((-10, -5, 54, 59)))  # 64x64 padded
    got = native.frame_pipeline_batch([p], 64, 64, crop=(-10, -5, 64, 64))
    np.testing.assert_array_equal(got[0], want)


def test_pipeline_fuzz_windows_vs_pil(tmp_path):
    """Random resize targets x crop windows x flips must stay bit-exact:
    the fused windowed resample + margin-padded windowed decode cover
    many boundary alignments (iMCU column alignment, edge crops, crops
    touching the image border)."""
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, (110, 170, 3), dtype=np.uint8)
    p = str(tmp_path / "f.jpg")
    Image.fromarray(a).save(p, quality=88)
    img = Image.open(p).convert("RGB")
    for trial in range(25):
        rw = int(rng.integers(60, 240))
        rh = int(rng.integers(60, 240))
        cw = int(rng.integers(16, min(rw, 128)))
        ch = int(rng.integers(16, min(rh, 128)))
        left = int(rng.integers(0, rw - cw + 1))
        top = int(rng.integers(0, rh - ch + 1))
        flip = bool(rng.integers(0, 2))
        want = img.resize((rw, rh), Image.BICUBIC).crop(
            (left, top, left + cw, top + ch))
        if flip:
            want = want.transpose(Image.FLIP_LEFT_RIGHT)
        got = native.frame_pipeline_batch(
            [p], ch, cw, resize=(rw, rh), crop=(left, top, cw, ch),
            hflip=flip)
        np.testing.assert_array_equal(
            got[0], np.asarray(want),
            err_msg=f"trial {trial}: rw={rw} rh={rh} box="
                    f"({left},{top},{cw},{ch}) flip={flip}")


def test_fast_mode_close_not_exact(tmp_path):
    """--frame_decode fast: DCT-scaled decode is approximate but close
    (it must stay a plausible augmentation, not a different image)."""
    rng = np.random.default_rng(5)
    # smooth image: fast-mode error should be small
    base = rng.integers(60, 196, (12, 16, 3), dtype=np.uint8)
    a = np.asarray(Image.fromarray(base).resize((640, 360), Image.BICUBIC))
    p = str(tmp_path / "big.jpg")
    Image.fromarray(a).save(p, quality=92)
    # 4/8 DCT scale engages: 640x360 -> 320x180 covers the 300x168 target
    exact = native.frame_pipeline_batch(
        [p], 128, 128, resize=(300, 168), crop=(30, 10, 128, 128))
    fast = native.frame_pipeline_batch(
        [p], 128, 128, resize=(300, 168), crop=(30, 10, 128, 128),
        fast=True)
    err = np.abs(exact[0].astype(int) - fast[0].astype(int))
    assert err.mean() < 3.0 and err.max() < 60
    assert err.max() > 0  # it IS approximate (scaled decode engaged)

    # a target no power-of-two scale covers falls back to the exact decode
    exact2 = native.frame_pipeline_batch(
        [p], 224, 224, resize=(437, 246), crop=(30, 10, 224, 224))
    fast2 = native.frame_pipeline_batch(
        [p], 224, 224, resize=(437, 246), crop=(30, 10, 224, 224),
        fast=True)
    np.testing.assert_array_equal(exact2[0], fast2[0])


# ------------------------------------------------- dataset path equality

def _make_rows(root, hw_list):
    """Synthetic manifest rows with jpg frame dirs of the given sizes."""
    from avsep_tpu.data.audio_io import write_wav
    rs = np.random.RandomState(0)
    rows = []
    for vi, (h, w) in enumerate(hw_list):
        cls = ["cello", "flute"][vi % 2]
        os.makedirs(root / cls, exist_ok=True)
        dur, fps, sr = 12.0, 5.0, 11025
        t = np.arange(int(sr * dur)) / sr
        wav = 0.4 * np.sin(2 * np.pi * (220 + 40 * vi) * t)
        apath = root / cls / f"v{vi}.wav"
        write_wav(str(apath), wav.astype(np.float32), sr)
        fdir = root / cls / f"v{vi}.mp4"
        os.makedirs(fdir, exist_ok=True)
        for fi in range(int(dur * fps) + 2):
            Image.fromarray(rs.randint(0, 255, (h, w, 3), np.uint8)).save(
                fdir / "{:06d}.jpg".format(fi), quality=90)
        rows.append([str(apath), str(fdir), str(int(dur * fps)), str(fps),
                     str(dur), cls])
    return rows


@pytest.mark.parametrize("split", ["train", "val"])
def test_dataset_native_equals_pil(tmp_path, split):
    from tests.test_dataset import make_cfg
    from avsep_tpu.data.dataset import MusicMixDataset

    rows = _make_rows(tmp_path, [(80, 100), (70, 120)])
    cfg_pil = make_cfg(frame_decode="pil")
    cfg_nat = make_cfg(frame_decode="native")
    for idx in range(3):
        a = MusicMixDataset(rows, cfg_pil, split=split)[idx]
        b = MusicMixDataset(rows, cfg_nat, split=split)[idx]
        assert a["id"] == b["id"]
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_allclose(a["audio_mix"], b["audio_mix"])


@pytest.mark.parametrize("split", ["train", "val"])
def test_dataset_clips_native_equals_pil(tmp_path, split):
    from tests.test_dataset import make_cfg
    from avsep_tpu.data.dataset import MusicMixDataset

    rows = _make_rows(tmp_path, [(80, 100), (70, 120)])
    kw = dict(load_clips=True, clip_len=4, imgSize=48)
    cfg_pil = make_cfg(frame_decode="pil", **kw)
    cfg_nat = make_cfg(frame_decode="native", **kw)
    for idx in range(3):
        a = MusicMixDataset(rows, cfg_pil, split=split)[idx]
        b = MusicMixDataset(rows, cfg_nat, split=split)[idx]
        assert a["id"] == b["id"]
        np.testing.assert_array_equal(a["frames"], b["frames"])
        np.testing.assert_array_equal(a["clips"], b["clips"])


def test_dataset_falls_back_on_unreadable_frame(tmp_path):
    """A non-jpeg frame file: probe fails -> pure PIL path handles it
    (here PIL can read the PNG-in-.jpg; native decode cannot)."""
    from tests.test_dataset import make_cfg
    from avsep_tpu.data.dataset import MusicMixDataset

    rows = _make_rows(tmp_path, [(80, 100), (70, 120)])
    # overwrite one video's frames with PNG bytes under .jpg names
    fdir = rows[0][1]
    for fi in range(62):
        Image.fromarray(np.full((80, 100, 3), 90, np.uint8)).save(
            os.path.join(fdir, "{:06d}.jpg".format(fi)), format="PNG")
    cfg = make_cfg(frame_decode="native")
    s = MusicMixDataset(rows, cfg, split="val")[0]
    assert s["frames"].dtype == np.uint8
    assert np.isfinite(s["audio_mix"]).all()


def test_frame_decode_native_raises_when_unavailable(monkeypatch, tmp_path):
    from tests.test_dataset import make_cfg
    from avsep_tpu.data.dataset import MusicMixDataset

    rows = _make_rows(tmp_path, [(40, 50), (40, 50)])
    monkeypatch.setattr(native, "frames_available", lambda: False)
    ds = MusicMixDataset(rows, make_cfg(frame_decode="native"), split="val")
    with pytest.raises(RuntimeError, match="frame_decode native"):
        ds[0]
    # auto degrades silently
    ds2 = MusicMixDataset(rows, make_cfg(frame_decode="auto"), split="val")
    assert ds2[0]["frames"].dtype == np.uint8
