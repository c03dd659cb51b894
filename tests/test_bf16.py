"""bfloat16 compute-path smoke test: the MXU-friendly dtype option
(cfg.dtype='bfloat16') must produce finite masks close to the f32 path."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from avsep_tpu.engine import Nets, forward
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.unet import AudioUnet
from tests.test_train_step import tiny_batch, tiny_cfg

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier


def test_bf16_forward_close_to_f32():
    cfg32 = tiny_cfg()
    cfg16 = cfg32.replace(dtype="bfloat16")

    def make_nets(dtype):
        return Nets(
            AudioUnet(fc_dim=2, num_downs=5, ngf=8, fusion_type="hidsep",
                      att_type="sig", dtype=dtype),
            FrameEncoder(fc_dim=32, pool_type="maxpool", dilate_scale=16,
                         dtype=dtype))

    nets32 = make_nets(jnp.float32)
    nets16 = make_nets(jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jnp.zeros((2, 256, 64, 1))
    v = jnp.zeros((2, 2, 4, 4, 32))
    sound_vars = nets32.sound.init(k1, x, v, train=False)
    frames0 = jnp.zeros((2, 1, 64, 64, 3))
    frame_vars = nets32.frame.init(k2, frames0, pool=False, train=False)
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}

    batch = tiny_batch(cfg32, B=4)
    err32, (_, out32) = forward(nets32, params, stats, batch, cfg32,
                                jax.random.PRNGKey(1), True, False)
    err16, (_, out16) = forward(nets16, params, stats, batch, cfg16,
                                jax.random.PRNGKey(1), True, False)
    assert np.isfinite(float(err16))
    # masks agree to bf16 precision
    d = np.abs(np.asarray(out32["pred_masks"], np.float32)
               - np.asarray(out16["pred_masks"], np.float32))
    assert d.mean() < 0.05
    assert abs(float(err16) - float(err32)) < 0.1
