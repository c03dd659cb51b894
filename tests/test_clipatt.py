"""Live motion branch: fusion_type=CoLoc_ClipAtt trains end-to-end.

The reference builds/checkpoints net_motion under --load_clips but never
calls it in a live forward, and CoLoc_ClipAtt asserts in its fusion
dispatch (reference fusion_net.py:18, main.py:624-625).  Here the clip
stream drives CoLoc attention through ResNet3dFastOnly — these tests pin
that the branch is genuinely live: gradients reach the motion params in
the AV step and do not in the AO step.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.engine import Nets, build_nets, forward
from avsep_tpu.models.motion import ResNet3dFastOnly
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.unet import AudioUnet
from avsep_tpu.train import init_state, make_train_step

AUDLEN = 64 * 256 - 1


def clip_cfg(**kw):
    base = dict(arch_sound="unet5", num_channels=2, vis_channels=32,
                fusion_type="CoLoc_ClipAtt", att_type="sig", loss="bce",
                not_pool_vis=False, binary_mask=1, weighted_loss=1,
                log_freq=1, num_mix=2, audLen=AUDLEN, imgSize=64,
                one_frame=True, load_clips=True, clip_len=4,
                output_activation="sigmoid", img_activation="relu",
                lr_sound=1e-3, lr_frame=1e-4, lr_motion=1e-3,
                lr_steps=(50,), match_weight=0.1)
    base.update(kw)
    return Config(**base)


def tiny_clip_nets(cfg):
    # unet5/ngf8 bottleneck = 64 -> chunk 32 == tiny fast pathway's
    # 4 * 8 * base_channels=1 = 32 output channels
    sound = AudioUnet(fc_dim=cfg.num_channels, num_downs=5, ngf=8,
                      fusion_type=cfg.fusion_type, att_type=cfg.att_type)
    frame = FrameEncoder(fc_dim=cfg.vis_channels, pool_type="maxpool",
                         dilate_scale=16)
    motion = ResNet3dFastOnly(base_channels=1, stage_blocks=(1, 1, 1, 1))
    return Nets(sound, frame, motion)


def clip_batch(cfg, B=4, seed=0):
    rs = np.random.RandomState(seed)
    audios = rs.randn(B, 2, cfg.audLen).astype(np.float32) * 0.1
    return {
        "audios": jnp.asarray(audios),
        "frames": jnp.asarray(rs.rand(B, 2, 1, cfg.imgSize, cfg.imgSize,
                                      3), dtype=jnp.float32),
        "clips": jnp.asarray(rs.rand(B, 2, cfg.clip_len, cfg.imgSize,
                                     cfg.imgSize, 3), dtype=jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = clip_cfg()
    nets = tiny_clip_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    return cfg, nets, state


def _delta(a, b):
    return max(float(jnp.max(jnp.abs(x - y))) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_av_step_trains_motion(setup):
    cfg, nets, state = setup
    assert "motion" in state.params
    step = make_train_step(cfg, nets, use_vis=True)
    before = jax.tree_util.tree_map(lambda x: np.asarray(x),
                                    state.params["motion"])
    new_state, metrics = step(
        jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), state),
        clip_batch(cfg), jax.random.PRNGKey(1))
    err = float(metrics["err"])
    assert np.isfinite(err) and err > 0
    # gradients reached the motion net: its params moved
    assert _delta(before, new_state.params["motion"]) > 0
    # and the sound net too
    assert _delta(state.params["sound"], new_state.params["sound"]) > 0


def test_ao_step_leaves_motion_untouched(setup):
    cfg, nets, state = setup
    step = make_train_step(cfg, nets, use_vis=False)
    new_state, metrics = step(
        jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), state),
        clip_batch(cfg), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["err"]))
    assert _delta(state.params["motion"], new_state.params["motion"]) == 0


def test_eval_forward_and_att_maps(setup):
    cfg, nets, state = setup
    err, (_, outputs) = forward(nets, state.params, state.batch_stats,
                                clip_batch(cfg), cfg,
                                jax.random.PRNGKey(2), use_vis=True,
                                train=False)
    assert np.isfinite(float(err))
    # attention ran against the motion maps (2x2 spatial at 64px/32)
    assert outputs["att_maps"] is not None
    assert outputs["att_maps"].shape[-2:] == (2, 2)


def test_clipatt_requires_load_clips():
    with pytest.raises(ValueError, match="load_clips"):
        build_nets(clip_cfg(load_clips=False))
