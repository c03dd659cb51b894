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


def test_bf16_train_step_learns():
    """The bf16 compute path must train, not just infer: finite loss,
    f32 params actually updated, and loss decreasing over a few steps on
    a fixed batch (the +21% train-throughput option in BENCH_NOTES must
    be numerically usable)."""
    from tests.test_train_step import clone
    from avsep_tpu.train import TrainState, make_optimizer, make_train_step

    cfg = tiny_cfg().replace(dtype="bfloat16")
    nets = Nets(
        AudioUnet(fc_dim=2, num_downs=5, ngf=8, fusion_type="hidsep",
                  att_type="sig", dtype=jnp.bfloat16),
        FrameEncoder(fc_dim=32, pool_type="maxpool", dilate_scale=16,
                     dtype=jnp.bfloat16))

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    sound_vars = nets.sound.init(k1, jnp.zeros((2, 256, 64, 1)),
                                 jnp.zeros((2, 2, 4, 4, 32)), train=False)
    frame_vars = nets.frame.init(k2, jnp.zeros((2, 1, 64, 64, 3)),
                                 pool=False, train=False)
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    # Flax keeps params f32 under a bf16 compute dtype (mixed precision)
    leaves = jax.tree_util.tree_leaves(params)
    assert all(a.dtype == jnp.float32 for a in leaves)

    opt = make_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, stats,
                       opt.init(params))
    p0 = clone(params)

    step = make_train_step(cfg, nets, use_vis=True)
    batch = tiny_batch(cfg, B=4)
    rng = jax.random.PRNGKey(1)
    errs = []
    for i in range(8):
        rng, sub = jax.random.split(rng)
        state, m = step(state, dict(batch), sub)
        errs.append(float(m["err"]))
    assert all(np.isfinite(e) for e in errs), errs
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a, np.float32)
                                  - np.asarray(b, np.float32)).max()),
        p0, jax.device_get(state.params))
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
    assert errs[-1] < errs[0], errs


def test_bf16_saturated_logits_keep_finite_grads():
    """Regression: bf16 sigmoid saturates to exactly 1.0 at logits ~6
    (2^-8 resolution near 1), which made the BCE input clip a no-op and
    the log(1-p) VJP inf*0=NaN — observed as a NaN blow-up between iters
    50-100 of the bf16 AVPROOF run.  `activate` now upcasts logits to
    f32 (the mixed-precision boundary), so a bf16 network emitting
    saturated logits must yield finite loss AND finite gradients."""
    from avsep_tpu.models import criterion as crit
    from avsep_tpu.models.builder import activate

    logits = jnp.asarray(
        np.array([[-40.0, -8.0, 0.0, 8.0, 40.0]], np.float32),
        jnp.bfloat16)
    gt = jnp.asarray(np.array([[1.0, 0.0, 1.0, 0.0, 1.0]], np.float32))
    w = jnp.ones_like(gt)

    def loss(lg):
        pred = activate(lg, "sigmoid")
        assert pred.dtype == jnp.float32  # upcast happened
        return crit.weighted_loss(pred, gt, w, kind="bce")

    val, grad = jax.value_and_grad(loss)(logits)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad, np.float32)).all()
