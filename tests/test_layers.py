"""Direct unit tests for avsep_tpu.models.layers building blocks.

Pins upsample2x_align_corners against torch.nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True) — the op the U-Net decoder uses at
every level (reference models/audio_net.py:68-69) — so a pass-order or
accumulation change is caught here, not three layers deep in the U-Net
golden (ADVICE r4)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from avsep_tpu.models.layers import upsample2x_align_corners


@pytest.mark.parametrize("shape", [(2, 4, 4, 3), (1, 7, 5, 2),
                                   (3, 16, 16, 1), (1, 1, 6, 2)])
def test_upsample2x_matches_torch(shape):
    rs = np.random.RandomState(0)
    x = rs.randn(*shape).astype(np.float32)
    up = torch.nn.Upsample(scale_factor=2, mode="bilinear",
                           align_corners=True)
    want = up(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want,
                               rtol=0, atol=1e-5)


def test_upsample2x_bf16_stays_bf16_and_close():
    rs = np.random.RandomState(1)
    x = rs.randn(2, 8, 8, 4).astype(np.float32)
    got = upsample2x_align_corners(jnp.asarray(x, jnp.bfloat16))
    assert got.dtype == jnp.bfloat16
    ref = np.asarray(upsample2x_align_corners(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=0.02, atol=0.02)
