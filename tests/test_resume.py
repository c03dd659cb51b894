"""Resume equivalence: checkpoint mid-training and restoring reproduces the
uninterrupted trajectory exactly (params + SGD momentum + LR position).
The reference loses optimizer state and LR position on resume
(SURVEY.md §5); this guards the fix."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.checkpoint import restore_checkpoint, save_checkpoint
from avsep_tpu.train import make_train_step
from avsep_tpu.utils.meters import new_history
from tests.test_train_step import clone, tiny_batch, tiny_cfg, tiny_nets


@pytest.fixture(scope="module")
def setup():
    import tests.test_train_step as tts
    cfg = tiny_cfg(lr_steps=(3,))  # LR decays mid-run: resume must keep it
    nets = tiny_nets(cfg)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jnp.zeros((2, 256, 64, 1))
    v = jnp.zeros((2, 2, 4, 4, 32))
    sound_vars = nets.sound.init(k1, x, v, train=False)
    frames = jnp.zeros((2, 1, 64, 64, 3))
    frame_vars = nets.frame.init(k2, frames, pool=False, train=False)
    from avsep_tpu.train import TrainState, make_optimizer
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    opt = make_optimizer(cfg, params)
    state = TrainState(jnp.zeros((), jnp.int32), params, stats,
                       opt.init(params))
    return cfg, nets, state


def test_resume_trajectory_identical(setup, tmp_path):
    cfg, nets, state0 = setup
    step = make_train_step(cfg, nets, use_vis=False)
    batch = tiny_batch(cfg, B=4)
    keys = [jax.random.PRNGKey(i) for i in range(4)]

    # uninterrupted: 4 steps
    s = clone(state0)
    for k in keys:
        s, _ = step(s, batch, k)
    final_direct = jax.device_get(s.params)

    # interrupted: 2 steps -> save -> restore -> 2 steps
    s = clone(state0)
    for k in keys[:2]:
        s, _ = step(s, batch, k)
    save_checkpoint(str(tmp_path), s, new_history(), "latest")
    template = jax.tree_util.tree_map(jnp.zeros_like, clone(state0))
    restored = restore_checkpoint(str(tmp_path), template, "latest")
    assert int(restored.step) == 2
    for k in keys[2:]:
        restored, _ = step(restored, batch, k)
    final_resumed = jax.device_get(restored.params)

    for a, b in zip(jax.tree_util.tree_leaves(final_direct),
                    jax.tree_util.tree_leaves(final_resumed)):
        np.testing.assert_array_equal(a, b)
