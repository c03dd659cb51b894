"""SoP++ train-step smoke test across all 3 stages + AO, sharded."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.parallel.mesh import make_mesh, shard_batch, shard_tree
from avsep_tpu.sop_main import (
    build_sop_nets, init_sop_state, make_sop_train_step)

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier

AUDLEN = 64 * 256 - 1


def test_sop_train_steps_all_stages():
    cfg = Config(arch_sound="unet5", num_channels=16, vis_channels=16,
                 fusion_type="Base", att_type="cos", loss="bce",
                 binary_mask=1, weighted_loss=1, num_mix=2, audLen=AUDLEN,
                 imgSize=64, one_frame=True, not_pool_vis=False,
                 img_activation="relu", sound_activation="no",
                 output_activation="sigmoid", match_weight=0.1,
                 lr_sound=1e-3, lr_synthesizer=1e-3, lr_frame=1e-4,
                 lr_steps=())
    # shrink the U-Net for test speed
    from avsep_tpu.models.sop import BasisUnet
    from avsep_tpu.models.resnet import FrameEncoder
    from avsep_tpu.models.synthesizer import InnerProd
    from avsep_tpu.sop_engine import SopNets
    nets = SopNets(BasisUnet(fc_dim=16, num_downs=5, ngf=8, extra_size=16),
                   FrameEncoder(fc_dim=16, dilate_scale=16),
                   InnerProd(fc_dim=16), None)

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    sound_vars = nets.sound.init(k1, jnp.zeros((1, 256, 64, 1)),
                                 train=False)
    frame_vars = nets.frame.init(k2, jnp.zeros((1, 1, 64, 64, 3)),
                                 pool=False, train=False)
    synth_vars = nets.synthesizer.init(k3, jnp.zeros((1, 16)),
                                       jnp.zeros((1, 8, 8, 16)))
    from avsep_tpu.sop_main import make_sop_optimizer
    from avsep_tpu.train import TrainState
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"],
              "synthesizer": synth_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    opt = make_sop_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, stats,
                       opt.init(params))

    mesh = make_mesh(8)
    state = shard_tree(jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), state), mesh)

    rs = np.random.RandomState(0)
    batch = shard_batch({
        "audios": jnp.asarray(rs.randn(8, 2, AUDLEN).astype(np.float32)
                              * 0.1),
        "audio_mix": jnp.asarray(rs.randn(8, AUDLEN).astype(np.float32)
                                 * 0.1),
        "frames": jnp.asarray(rs.rand(8, 2, 1, 64, 64, 3)
                              .astype(np.float32)),
    }, mesh)

    for use_vis, stage in ((True, 1), (True, 2), (True, 3), (False, 1)):
        step = make_sop_train_step(cfg, nets, use_vis, stage)
        state, m = step(state, batch, jax.random.PRNGKey(stage))
        assert np.isfinite(float(m["err"])), (use_vis, stage)
    assert int(state.step) == 4


def _tiny_sop_setup():
    cfg = Config(arch_sound="unet5", num_channels=16, vis_channels=16,
                 fusion_type="Base", att_type="cos", loss="bce",
                 binary_mask=1, weighted_loss=1, num_mix=2, audLen=AUDLEN,
                 imgSize=64, one_frame=True, not_pool_vis=False,
                 img_activation="relu", sound_activation="no",
                 output_activation="sigmoid", match_weight=0.1,
                 lr_sound=1e-3, lr_synthesizer=1e-3, lr_frame=1e-4,
                 lr_steps=())
    from avsep_tpu.models.sop import BasisUnet
    from avsep_tpu.models.resnet import FrameEncoder
    from avsep_tpu.models.synthesizer import InnerProd
    from avsep_tpu.sop_engine import SopNets
    nets = SopNets(BasisUnet(fc_dim=16, num_downs=5, ngf=8, extra_size=16),
                   FrameEncoder(fc_dim=16, dilate_scale=16),
                   InnerProd(fc_dim=16), None)
    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    sound_vars = nets.sound.init(k1, jnp.zeros((1, 256, 64, 1)),
                                 train=False)
    frame_vars = nets.frame.init(k2, jnp.zeros((1, 1, 64, 64, 3)),
                                 pool=False, train=False)
    synth_vars = nets.synthesizer.init(k3, jnp.zeros((1, 16)),
                                       jnp.zeros((1, 8, 8, 16)))
    from avsep_tpu.sop_main import make_sop_optimizer
    from avsep_tpu.train import TrainState
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"],
              "synthesizer": synth_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    opt = make_sop_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, stats,
                       opt.init(params))
    return cfg, nets, state


def _ragged_loader(sizes=(4, 2)):
    """List of batches with a ragged final batch (val-set tail)."""
    rs = np.random.RandomState(1)
    batches = []
    start = 0
    for bs in sizes:
        batches.append({
            "id": [f"s{start + j}" for j in range(bs)],
            "audios": (rs.randn(bs, 2, AUDLEN) * 0.1).astype(np.float32),
            "audio_mix": (rs.randn(bs, AUDLEN) * 0.1).astype(np.float32),
            "frames": rs.rand(bs, 2, 1, 64, 64, 3).astype(np.float32),
        })
        start += bs
    return batches


def test_sop_evaluate_mesh_padding_clean(tmp_path):
    """VERDICT weak #6: SoP eval meters must be identical on 1 device vs
    the 8-device mesh (padded rows excluded), with per-sample results.csv
    written for both branches."""
    import os

    from avsep_tpu.sop_main import _sop_evaluate
    from avsep_tpu.utils.meters import new_history

    cfg, nets, state = _tiny_sop_setup()
    cfg = cfg.replace(ckpt=str(tmp_path))
    loader = _ragged_loader()

    h1 = new_history()
    _sop_evaluate(cfg, nets, state, loader, h1, 0, mesh=None)

    mesh = make_mesh(8)
    state8 = shard_tree(jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), state), mesh)
    h8 = new_history()
    _sop_evaluate(cfg, nets, state8, loader, h8, 0, mesh=mesh)

    for key in ("val_av", "val_ao"):
        for metric in ("err", "sdr", "sir", "sar", "si_sdr"):
            a, b = h1[key][metric][-1], h8[key][metric][-1]
            assert np.isfinite(a) and abs(a - b) < 1e-3, (key, metric, a, b)

    for branch in ("sop_av", "sop_ao"):
        path = os.path.join(str(tmp_path), "visualization", branch,
                            "results.csv")
        with open(path) as f:
            rows = f.read().strip().splitlines()
        assert len(rows) == 1 + 6  # header + all 6 real samples, no pads
