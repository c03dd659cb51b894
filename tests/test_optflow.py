"""Numerical tests for the TV-L1 optical-flow prep script.

The reference extracts dense flow per frame pair and stores the x/y
components as bounded uint8 jpgs under ``optical/`` (reference
``data/scripts/extract_optflow.py``).  These tests verify our equivalent
recovers a known synthetic translation and that the uint8 encoding is
invertible to the stated bound.
"""

import glob
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from avsep_tpu.data.scripts.extract_optflow import flow_to_u8, process_dir


def _decode(path, bound):
    u8 = cv2.imread(path, cv2.IMREAD_GRAYSCALE).astype(np.float32)
    return u8 / 255.0 * (2 * bound) - bound


def test_flow_to_u8_round_trip():
    bound = 15.0
    comp = np.linspace(-20, 20, 64, dtype=np.float32).reshape(8, 8)
    dec = flow_to_u8(comp, bound).astype(np.float32) / 255.0 * (2 * bound) - bound
    # clipping to +/-bound, then 8-bit quantization: the uint8 cast
    # truncates, so worst-case error is one full step = 2*bound/255 ~ 0.118
    np.testing.assert_allclose(dec, np.clip(comp, -bound, bound), atol=0.125)


def test_process_dir_recovers_translation(tmp_path):
    """A textured patch shifted +4 px in x between two frames must yield
    x-flow ~ +4 and y-flow ~ 0 inside the patch, written as uint8 jpgs
    with the reference's NNNNNN_{x,y}.jpg naming under optical/."""
    bound = 15.0
    rng = np.random.default_rng(0)
    h = w = 96
    texture = rng.integers(0, 255, (40, 40), np.uint8)
    frames = []
    for shift in (0, 4):
        img = np.full((h, w), 30, np.uint8)
        img[28:68, 20 + shift:60 + shift] = texture
        frames.append(img)

    frame_dir = tmp_path / "frames" / "violin" / "vid0"
    frame_dir.mkdir(parents=True)
    for i, img in enumerate(frames, start=1):
        cv2.imwrite(str(frame_dir / f"{i:06d}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_GRAY2BGR))

    process_dir((str(frame_dir), bound))

    out_dir = str(frame_dir).replace("/frames/", "/optical/")
    xs = sorted(glob.glob(os.path.join(out_dir, "*_x.jpg")))
    ys = sorted(glob.glob(os.path.join(out_dir, "*_y.jpg")))
    assert [os.path.basename(p) for p in xs] == ["000002_x.jpg"]
    assert [os.path.basename(p) for p in ys] == ["000002_y.jpg"]

    fx = _decode(xs[0], bound)
    fy = _decode(ys[0], bound)
    # interior of the moving patch in frame 2 (avoid boundary fringes)
    region = (slice(36, 60), slice(32, 56))
    assert 2.0 < np.median(fx[region]) < 6.0, np.median(fx[region])
    assert abs(np.median(fy[region])) < 1.5, np.median(fy[region])
    # static background stays near zero flow
    bg = np.median(np.abs(fx[:12, :12]))
    assert bg < 1.0, bg


def test_process_dir_single_frame_noop(tmp_path):
    """Directories with <2 frames are skipped without writing anything
    (reference behavior: flow needs a pair)."""
    frame_dir = tmp_path / "frames" / "cello" / "vid1"
    frame_dir.mkdir(parents=True)
    cv2.imwrite(str(frame_dir / "000001.jpg"), np.zeros((32, 32, 3), np.uint8))
    process_dir((str(frame_dir), 15.0))
    out_dir = str(frame_dir).replace("/frames/", "/optical/")
    assert not glob.glob(os.path.join(out_dir, "*.jpg"))
