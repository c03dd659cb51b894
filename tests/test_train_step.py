"""End-to-end train-step and sharding tests on the 8-device CPU mesh.

Covers the reference's joint AV+AO training loop semantics (main.py:557-601)
at toy scale: a small U-Net (ngf=8) + the real dilated ResNet18 on 64px
frames, batch sharded over the data axis, SGD param groups, LR decay.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.engine import Nets, forward
from avsep_tpu.models.builder import ModelBuilder
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.unet import AudioUnet
from avsep_tpu.parallel.mesh import make_mesh, shard_batch, shard_tree
from avsep_tpu.train import (
    TrainState, batch_scheduler, init_state,
    make_optimizer, make_train_step)

AUDLEN = 64 * 256 - 1  # -> 64 STFT frames


def clone(tree):
    """Deep-copy arrays so donation in a step can't delete fixture buffers
    (device_put may alias instead of copying)."""
    return jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True), tree)


def tiny_cfg(**kw):
    base = dict(arch_sound="unet5", num_channels=2, vis_channels=32,
                fusion_type="hidsep", att_type="sig", loss="bce",
                not_pool_vis=False,
                binary_mask=1, weighted_loss=1, log_freq=1, num_mix=2,
                audLen=AUDLEN, imgSize=64, one_frame=True,
                output_activation="sigmoid", img_activation="relu",
                lr_sound=1e-3, lr_frame=1e-4, lr_steps=(5,),
                match_weight=0.1, batch_size_per_gpu=2)
    base.update(kw)
    return Config(**base)


def tiny_nets(cfg):
    sound = AudioUnet(fc_dim=cfg.num_channels, num_downs=5, ngf=8,
                      fusion_type=cfg.fusion_type, att_type=cfg.att_type)
    frame = FrameEncoder(fc_dim=cfg.vis_channels, pool_type="maxpool",
                         dilate_scale=16)
    return Nets(sound, frame)


def tiny_batch(cfg, B=8, seed=0):
    rs = np.random.RandomState(seed)
    audios = rs.randn(B, 2, cfg.audLen).astype(np.float32) * 0.1
    return {
        "audios": jnp.asarray(audios),
        "audio_mix": jnp.asarray(audios.sum(1)),
        "frames": jnp.asarray(
            rs.rand(B, 2, 1, cfg.imgSize, cfg.imgSize, 3),
            dtype=jnp.float32),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    nets = tiny_nets(cfg)
    # init with matching toy shapes (vis bottleneck Dv = ngf*8/C = 32)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jnp.zeros((2, 256, 64, 1))
    v = jnp.zeros((2, 2, 4, 4, 32))
    sound_vars = nets.sound.init(k1, x, v, train=False)
    frames = jnp.zeros((2, 1, 64, 64, 3))
    frame_vars = nets.frame.init(k2, frames, pool=False, train=False)
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    opt = make_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, stats,
                       opt.init(params))
    return cfg, nets, state


def test_forward_av_shapes_and_finiteness(setup):
    cfg, nets, state = setup
    batch = tiny_batch(cfg)
    err, (new_stats, outputs) = forward(
        nets, state.params, state.batch_stats, batch, cfg,
        jax.random.PRNGKey(1), use_vis=True, train=False)
    assert np.isfinite(float(err))
    assert outputs["pred_masks"].shape == (8, 2, 256, 64)
    assert outputs["gt_masks"].shape == (8, 2, 256, 64)
    assert np.isfinite(float(outputs["match_loss"]))


def test_forward_ao_shapes(setup):
    cfg, nets, state = setup
    batch = tiny_batch(cfg)
    err, (_, outputs) = forward(
        nets, state.params, state.batch_stats, batch, cfg,
        jax.random.PRNGKey(2), use_vis=False, train=False)
    assert np.isfinite(float(err))
    assert outputs["pred_masks"].shape == (8, 2, 256, 64)


def test_train_step_sharded_av_and_ao(setup):
    cfg, nets, state0 = setup
    mesh = make_mesh(8)
    sharded = shard_tree(clone(state0), mesh)

    step_av = make_train_step(cfg, nets, use_vis=True)
    step_ao = make_train_step(cfg, nets, use_vis=False)

    batch = shard_batch(tiny_batch(cfg), mesh)
    rng = jax.random.PRNGKey(3)

    state1, m1 = step_av(sharded, batch, rng)  # donates `sharded`
    assert np.isfinite(float(m1["err"]))
    state2, m2 = step_ao(state1, batch, jax.random.PRNGKey(4))
    assert np.isfinite(float(m2["err"]))
    assert int(state2.step) == 2

    # params actually changed vs the original (undonated) state
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state0.params["sound"], state2.params["sound"])
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_loss_decreases_on_repeated_batch(setup):
    cfg, nets, state0 = setup
    mesh = make_mesh(8)
    state = shard_tree(clone(state0), mesh)
    cfg2 = cfg.replace(lr_sound=1e-2, lr_steps=())
    step = make_train_step(cfg2, nets, use_vis=False)
    batch = shard_batch(tiny_batch(cfg), mesh)
    errs = []
    for i in range(6):
        state, m = step(state, batch, jax.random.PRNGKey(7))
        errs.append(float(m["err"]))
    assert errs[-1] < errs[0]


def test_fix_vis_freezes_frame_params(setup):
    cfg, nets, state0 = setup
    cfg2 = cfg.replace(fix_vis=True)
    copy = clone(state0)  # donation-safe copy
    opt = make_optimizer(cfg2, copy.params)
    state = TrainState(copy.step, copy.params, copy.batch_stats,
                       opt.init(copy.params))
    step = make_train_step(cfg2, nets, use_vis=True)
    batch = tiny_batch(cfg)
    state1, _ = step(state, batch, jax.random.PRNGKey(5))
    # frame.features unchanged, frame.fc (sound group) updated
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state0.params["frame"]["features"],
        state1.params["frame"]["features"])
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_batch_scheduler_matches_reference_gating():
    cfg = tiny_cfg(start_av_first=True, num_fsteps=3, iter_per_av=2)
    use_vis = batch_scheduler(cfg)
    # start_av_first: AV while i < num_fsteps or every iter_per_av
    assert [use_vis(i) for i in range(8)] == [
        True, True, True, False, True, False, True, False]
    cfg = tiny_cfg(start_av_first=False, num_fsteps=3, iter_per_av=2)
    use_vis = batch_scheduler(cfg)
    assert [use_vis(i) for i in range(8)] == [
        False, False, False, False, True, False, True, False]


@pytest.mark.slow
def test_mixvis_and_sel_train_steps():
    """MixVis (forward_avmiximg, reference main.py:162-192) and CoLoc_Sel
    fusion variants train end-to-end."""
    for fusion in ("MixVis", "CoLoc_Sel"):
        cfg = tiny_cfg(fusion_type=fusion)
        nets = tiny_nets(cfg)
        rng = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((2, 256, 64, 1))
        if fusion == "MixVis":
            v = jnp.zeros((1, 2, 4, 8, 32))  # one mixture map, width 2W
        else:
            v = jnp.zeros((2, 2, 4, 4, 32))
        sound_vars = nets.sound.init(k1, x, v, train=False)
        frames = jnp.zeros((2, 1, 64, 64, 3))
        frame_vars = nets.frame.init(k2, frames, pool=False, train=False)
        params = {"sound": sound_vars["params"],
                  "frame": frame_vars["params"]}
        stats = {"sound": sound_vars["batch_stats"],
                 "frame": frame_vars["batch_stats"]}
        opt = make_optimizer(cfg, params)
        state = TrainState(jnp.zeros((), jnp.int32), params, stats,
                           opt.init(params))
        step = make_train_step(cfg, nets, use_vis=True)
        state, m = step(state, tiny_batch(cfg, B=4), jax.random.PRNGKey(1))
        assert np.isfinite(float(m["err"])), fusion
        assert np.isfinite(float(m["match_loss"])), fusion


def test_per_sample_losses_mean_to_scalar(setup):
    """outputs['err_ps']/['match_ps'] are per-sample losses whose mean is
    exactly the scalar loss — the contract evaluate() relies on to exclude
    padded rows from the meters."""
    cfg, nets, state = setup
    batch = tiny_batch(cfg, B=4)
    for use_vis in (True, False):
        err, (_, out) = forward(
            nets, state.params, state.batch_stats, batch, cfg,
            jax.random.PRNGKey(1), use_vis=use_vis, train=False)
        assert out["err_ps"].shape == (4,)
        np.testing.assert_allclose(float(err),
                                   float(jnp.mean(out["err_ps"])),
                                   rtol=1e-5)
        if use_vis:
            np.testing.assert_allclose(float(out["match_loss"]),
                                       float(jnp.mean(out["match_ps"])),
                                       rtol=1e-5)
def test_mixvis_per_sample_loss_contract():
    """MixVis path: err_ps/match_ps mean to the scalars too."""
    cfg = tiny_cfg(fusion_type="MixVis")
    nets = tiny_nets(cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sound_vars = nets.sound.init(k1, jnp.zeros((2, 256, 64, 1)),
                                 jnp.zeros((1, 2, 4, 8, 32)), train=False)
    frame_vars = nets.frame.init(k2, jnp.zeros((2, 1, 64, 64, 3)),
                                 pool=False, train=False)
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    err, (_, out) = forward(nets, params, stats, tiny_batch(cfg, B=4), cfg,
                            jax.random.PRNGKey(1), use_vis=True, train=False)
    np.testing.assert_allclose(float(err), float(jnp.mean(out["err_ps"])),
                               rtol=1e-5)
    np.testing.assert_allclose(float(out["match_loss"]),
                               float(jnp.mean(out["match_ps"])), rtol=1e-5)


@pytest.mark.slow
def test_train_step_1_vs_8_device_equivalence(setup):
    """Same global batch, same rng: one AV train step on a 1-device mesh and
    an 8-device mesh must produce the same updated params/metrics (catches
    sharding regressions; SURVEY.md §4 mesh-test mandate)."""
    cfg, nets, state0 = setup
    batch = tiny_batch(cfg, B=8, seed=5)
    rng = jax.random.PRNGKey(11)
    step = make_train_step(cfg, nets, use_vis=True)

    mesh1, mesh8 = make_mesh(1), make_mesh(8)
    s1, m1 = step(shard_tree(clone(state0), mesh1),
                  shard_batch(dict(batch), mesh1), rng)
    s8, m8 = step(shard_tree(clone(state0), mesh8),
                  shard_batch(dict(batch), mesh8), rng)

    np.testing.assert_allclose(float(m1["err"]), float(m8["err"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.batch_stats),
                    jax.tree_util.tree_leaves(s8.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_uint8_wire_frames_match_float(setup):
    """uint8 wire-format frames (normalized on device by
    engine.normalize_frames) must produce the same loss as host-normalized
    float32 frames."""
    from avsep_tpu.data.video_transforms import IMAGENET_MEAN, IMAGENET_STD

    cfg, nets, state = setup
    batch = tiny_batch(cfg)
    u8 = np.asarray(
        np.round(np.asarray(batch["frames"]) * 255.0), np.uint8)
    normed = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    err_f, (_, out_f) = forward(
        nets, state.params, state.batch_stats,
        {**batch, "frames": jnp.asarray(normed)}, cfg,
        jax.random.PRNGKey(3), use_vis=True, train=False)
    err_u, (_, out_u) = forward(
        nets, state.params, state.batch_stats,
        {**batch, "frames": jnp.asarray(u8)}, cfg,
        jax.random.PRNGKey(3), use_vis=True, train=False)
    assert abs(float(err_f) - float(err_u)) < 1e-5
    np.testing.assert_allclose(np.asarray(out_f["pred_masks"]),
                               np.asarray(out_u["pred_masks"]),
                               rtol=1e-4, atol=1e-5)


def test_device_rebuilt_audio_mix_bit_equal(setup):
    """Dropping audio_mix from the device batch (to_device wire cut) is
    BIT-exact: the on-device sum of the 1/N-scaled sources equals the
    host np.sum mixture, so losses and masks match exactly."""
    cfg, nets, state = setup
    batch = tiny_batch(cfg)
    mix = np.sum(np.asarray(batch["audios"]), axis=1)
    np.testing.assert_array_equal(
        np.asarray(jnp.sum(jnp.asarray(batch["audios"]), axis=1)), mix)

    with_mix = {**batch, "audio_mix": jnp.asarray(mix)}
    without = {k: v for k, v in with_mix.items() if k != "audio_mix"}
    err_w, (_, out_w) = forward(nets, state.params, state.batch_stats,
                                with_mix, cfg, jax.random.PRNGKey(5),
                                use_vis=True, train=False)
    err_o, (_, out_o) = forward(nets, state.params, state.batch_stats,
                                without, cfg, jax.random.PRNGKey(5),
                                use_vis=True, train=False)
    assert float(err_w) == float(err_o)
    np.testing.assert_array_equal(np.asarray(out_w["pred_masks"]),
                                  np.asarray(out_o["pred_masks"]))


def test_num_mix_three_end_to_end():
    """num_mix=3 trains and evaluates end-to-end — beyond the reference,
    whose CoLoc permutation stack is hard-coded to C=2 (fusion_net.py:
    44-46 builds only the pair swap; its tensor_split stacking also
    requires the bottleneck to divide evenly, which it never checks).
    Here the fusion generalizes to any C with bottleneck % C == 0
    (unet5/ngf12 -> 96, 96 % 3 == 0): _perm_stack scores all C! = 6
    chunk<->visual assignments, AO PIT scans all 3! orders, and the
    eval step's BSS-eval + perm-correct handle 3 sources."""
    from avsep_tpu.models.fusion import _perm_stack

    blocks = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    stacked = _perm_stack(blocks)
    assert stacked.shape == (2, 6, 3, 4)  # P = 3! orderings
    import itertools
    for pi, perm in enumerate(itertools.permutations(range(3))):
        np.testing.assert_array_equal(np.asarray(stacked[:, pi]),
                                      np.asarray(blocks[:, list(perm)]))
    from avsep_tpu.evaluate import make_eval_step

    cfg = tiny_cfg(num_mix=3, num_channels=3)
    nets = Nets(
        AudioUnet(fc_dim=3, num_downs=5, ngf=12, fusion_type="hidsep",
                  att_type="sig", num_sources=3),
        FrameEncoder(fc_dim=cfg.vis_channels, pool_type="maxpool",
                     dilate_scale=16))
    rs = np.random.RandomState(0)
    B = 4
    batch = {
        "audios": jnp.asarray(
            rs.randn(B, 3, cfg.audLen).astype(np.float32) * 0.1),
        "frames": jnp.asarray(rs.rand(B, 3, 1, cfg.imgSize, cfg.imgSize,
                                      3), dtype=jnp.float32),
    }
    for use_vis in (True, False):
        state = init_state(cfg, nets, jax.random.PRNGKey(0))
        state, m = make_train_step(cfg, nets, use_vis=use_vis)(
            state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["err"])), use_vis

    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    metrics, outputs, preds = make_eval_step(cfg, nets, True)(
        state.params, state.batch_stats, batch, jax.random.PRNGKey(2))
    assert preds.shape[:2] == (B, 3)
    for k in ("sdr", "sir", "sar", "si_sdr"):
        assert np.isfinite(np.asarray(metrics[k])).all(), k
    assert set(np.unique(np.asarray(metrics["perm_correct"]))) <= {0.0, 1.0}


def test_fusion_indivisible_bottleneck_clear_error():
    """bottleneck % num_mix != 0 must raise the intent-revealing
    ValueError, not a reshape TypeError (unet5/ngf8 -> 64, 64 % 3 != 0)."""
    cfg = tiny_cfg(num_mix=3, num_channels=3)  # tiny_nets: ngf=8 -> D=64
    nets = tiny_nets(cfg)
    with pytest.raises(ValueError, match="divisible by num_mix"):
        init_state(cfg, nets, jax.random.PRNGKey(0))


def test_mixvis_requires_two_sources():
    """MixVis is inherently two-source (one duet image, two bottleneck
    chunks); num_mix=3 must raise the clear error, not a shape mismatch."""
    cfg = tiny_cfg(num_mix=3, num_channels=3, fusion_type="MixVis")
    nets = Nets(
        AudioUnet(fc_dim=3, num_downs=5, ngf=12, fusion_type="MixVis",
                  att_type="sig"),
        FrameEncoder(fc_dim=cfg.vis_channels, pool_type="maxpool",
                     dilate_scale=16))
    rs = np.random.RandomState(0)
    batch = {
        "audios": jnp.asarray(
            rs.randn(2, 3, cfg.audLen).astype(np.float32) * 0.1),
        "frames": jnp.asarray(rs.rand(2, 3, 1, cfg.imgSize, cfg.imgSize,
                                      3), dtype=jnp.float32),
    }
    from avsep_tpu.engine import forward_avmiximg
    with pytest.raises(ValueError, match="num_mix=2 only"):
        forward_avmiximg(nets, {}, {}, batch, cfg, jax.random.PRNGKey(0),
                         train=False)


def test_mesh_from_config():
    """--mesh_shape picks the 1-axis data-mesh width; multi-axis shapes
    and oversubscription raise clearly (both were silently ignored dead
    config before — review finding)."""
    from avsep_tpu.parallel.mesh import mesh_from_config

    cfg = tiny_cfg()
    m = mesh_from_config(cfg.replace(mesh_shape=(4,)))
    assert m.devices.size == 4 and m.axis_names == ("data",)
    m2 = mesh_from_config(cfg.replace(mesh_shape=(), data_axis="dp"), 2)
    assert m2.devices.size == 2 and m2.axis_names == ("dp",)
    with pytest.raises(ValueError, match="1-axis"):
        mesh_from_config(cfg.replace(mesh_shape=(2, 2)))
    with pytest.raises(ValueError, match="exceeds"):
        mesh_from_config(cfg.replace(mesh_shape=(512,)))


def test_unused_visual_streams_dropped():
    """The AV iterator ships exactly one visual stream: clips for
    CoLoc_ClipAtt, frames otherwise (review finding: both streams
    crossed the wire under --load_clips)."""
    from avsep_tpu.engine import unused_visual_streams
    from avsep_tpu.main import to_device
    from avsep_tpu.parallel.mesh import make_mesh

    cfg = tiny_cfg(load_clips=True, clip_len=2)
    assert unused_visual_streams(cfg) == ("clips",)
    assert unused_visual_streams(
        cfg.replace(fusion_type="CoLoc_ClipAtt")) == ("frames",)

    mesh = make_mesh(1)
    batch = {"audios": np.zeros((2, 2, 64), np.float32),
             "frames": np.zeros((2, 2, 1, 8, 8, 3), np.uint8),
             "clips": np.zeros((2, 2, 2, 8, 8, 3), np.uint8)}
    dev = to_device(batch, mesh, drop=unused_visual_streams(cfg), cfg=cfg)
    assert set(dev) == {"audios", "frames"}
    dev2 = to_device(batch, mesh,
                     drop=unused_visual_streams(
                         cfg.replace(fusion_type="CoLoc_ClipAtt")),
                     cfg=cfg)
    assert set(dev2) == {"audios", "clips"}


def test_ao_forward_chunks_match_source_count():
    """The audio-only fusion branch must chunk the bottleneck into the
    SAME n_sources chunks as the AV branch (review finding: AO silently
    used C=2 regardless).  With C=3, the broadcast guidance must be a
    permutation of the three distinct chunk vectors."""
    from avsep_tpu.models.fusion import _ao_forward

    B, h, w, D = 2, 2, 2, 12
    x = np.zeros((B, h, w, D), np.float32)
    for c in range(3):  # chunk c filled with value c+1
        x[..., c * 4:(c + 1) * 4] = c + 1
    out = _ao_forward(jnp.asarray(x), jax.random.PRNGKey(0), C=3)
    guidance = np.asarray(out.features[..., :D])  # [B, h, w, D]
    for b in range(B):
        vec = guidance[b, 0, 0]
        chunks = [tuple(vec[c * 4:(c + 1) * 4]) for c in range(3)]
        assert sorted(set(c[0] for c in chunks)) == [1.0, 2.0, 3.0], chunks
