"""Golden parity: warpgrid + grid_sample vs torch F.grid_sample
(reference utils.py:12-26, main.py:61-66, main.py:217-220)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from avsep_tpu.ops.warp import (
    warpgrid, warp_spectrogram, unwarp_mask, grid_sample)


def _ref_warpgrid(bs, HO, WO, warp=True):
    # literal re-statement of reference utils.py:12-26
    x = np.linspace(-1, 1, WO)
    y = np.linspace(-1, 1, HO)
    xv, yv = np.meshgrid(x, y)
    grid = np.zeros((bs, HO, WO, 2))
    if warp:
        gy = (np.power(21, (yv + 1) / 2) - 11) / 10
    else:
        gy = np.log(yv * 10 + 11) / np.log(21) * 2 - 1
    grid[..., 0] = xv
    grid[..., 1] = gy
    return grid.astype(np.float32)


def test_warpgrid_values():
    for warp in (True, False):
        np.testing.assert_allclose(
            warpgrid(2, 256, 64, warp), _ref_warpgrid(2, 256, 64, warp),
            rtol=0, atol=1e-6)


def _torch_warp(x_nchw, HO, warp):
    g = torch.from_numpy(_ref_warpgrid(x_nchw.shape[0], HO, x_nchw.shape[-1],
                                       warp))
    return F.grid_sample(torch.from_numpy(x_nchw), g,
                         align_corners=False).numpy()


def test_warp_spectrogram_matches_torch_gridsample():
    rs = np.random.RandomState(0)
    x = rs.rand(3, 1, 512, 256).astype(np.float32) * 10
    ref = _torch_warp(x, 256, True)
    ours = np.asarray(warp_spectrogram(jnp.asarray(x[:, 0]), HO=256))
    np.testing.assert_allclose(ours, ref[:, 0], rtol=1e-4, atol=2e-4)


def test_unwarp_matches_torch_gridsample():
    rs = np.random.RandomState(1)
    m = rs.rand(2, 1, 256, 256).astype(np.float32)
    ref = _torch_warp(m, 512, False)
    ours = np.asarray(unwarp_mask(jnp.asarray(m[:, 0]), HO=512))
    np.testing.assert_allclose(ours, ref[:, 0], rtol=1e-4, atol=2e-4)


def test_general_grid_sample_matches_torch():
    rs = np.random.RandomState(2)
    x = rs.rand(2, 3, 20, 17).astype(np.float32)
    grid = (rs.rand(2, 9, 11, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    ref = F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                        align_corners=False).numpy()
    ours = np.asarray(grid_sample(jnp.asarray(x), jnp.asarray(grid)))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=2e-4)


def test_warp_time_axis_not_identity():
    # align_corners=False resamples the time axis too (x = linspace(-1,1,W)
    # is NOT the identity); make sure we reproduce that subtlety.
    x = np.zeros((1, 1, 512, 256), np.float32)
    x[..., 100] = 1.0
    ref = _torch_warp(x, 256, True)
    ours = np.asarray(warp_spectrogram(jnp.asarray(x[:, 0]), HO=256))
    np.testing.assert_allclose(ours, ref[:, 0], rtol=1e-4, atol=2e-4)
    assert not np.allclose(ours[0, :, 100].sum(), ref[:, 0][0, :, 100].sum() + 1)


def test_prepare_matches_reference_math():
    """prepare() equals reference NetWrapper.prepare (main.py:51-95)."""
    from avsep_tpu.ops.prepare import prepare
    rs = np.random.RandomState(3)
    B, F_, T, N = 2, 512, 256, 2
    mag_mix = rs.rand(B, 1, F_, T).astype(np.float32) * 5
    mags = [rs.rand(B, 1, F_, T).astype(np.float32) * 3 for _ in range(N)]

    # reference math in torch
    tm = torch.from_numpy(mag_mix) + 1e-10
    g = torch.from_numpy(_ref_warpgrid(B, 256, T, True))
    tm_w = F.grid_sample(tm, g, align_corners=False)
    mags_w = [F.grid_sample(torch.from_numpy(m), g, align_corners=False)
              for m in mags]
    weights = torch.clamp(torch.log1p(tm_w), 1e-3, 10)
    gt = [(m > 0.5 * tm_w).float() for m in mags_w]
    log_mag = torch.log(tm_w)

    out = prepare(jnp.asarray(mag_mix[:, 0]),
                  jnp.asarray(np.stack([m[:, 0] for m in mags], axis=1)),
                  log_freq=True, weighted_loss=True, binary_mask=True)
    np.testing.assert_allclose(np.asarray(out.mag_mix), tm_w[:, 0].numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.weights), weights[:, 0].numpy(),
                               rtol=1e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.log_mag_mix),
                               log_mag[:, 0].numpy(), rtol=1e-3, atol=1e-3)
    for n in range(N):
        # binary masks: identical except at exact grid-sample ties
        diff = np.abs(np.asarray(out.gt_masks[:, n]) - gt[n][:, 0].numpy())
        assert diff.mean() < 1e-4


def test_ratio_mask_mode():
    from avsep_tpu.ops.prepare import prepare
    rs = np.random.RandomState(4)
    mag_mix = rs.rand(1, 512, 64).astype(np.float32)
    mags = rs.rand(1, 2, 512, 64).astype(np.float32) * 10
    out = prepare(jnp.asarray(mag_mix), jnp.asarray(mags), binary_mask=False)
    arr = np.asarray(out.gt_masks)
    assert arr.max() <= 5.0 and arr.min() >= 0.0
