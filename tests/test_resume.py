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


def test_resume_after_decay_boundary_keeps_decayed_lr(setup, tmp_path):
    """Save AFTER the lr_steps boundary, restore, continue: the restored
    run must consume the DECAYED lr, not the base lr, and stay on the
    unbroken trajectory bit-exactly (VERDICT r3 #5).  The reference
    recomputes LR from scratch each run (main.py:550-555 mutates args in
    place), so a resumed reference run past a boundary restarts at the
    base LR until it re-crosses the boundary — this pins our fix."""
    import optax
    from avsep_tpu.train import _lr_schedule

    cfg, nets, state0 = setup           # lr_steps=(3,): decay after step 3
    step = make_train_step(cfg, nets, use_vis=False)
    batch = tiny_batch(cfg, B=4)
    keys = [jax.random.PRNGKey(100 + i) for i in range(5)]

    # uninterrupted: 5 steps (boundary crossed inside)
    s = clone(state0)
    for k in keys:
        s, _ = step(s, batch, k)
    final_direct = jax.device_get(s.params)

    # interrupted AFTER the boundary: 4 steps -> save -> restore -> 1 step
    s = clone(state0)
    for k in keys[:4]:
        s, _ = step(s, batch, k)
    save_checkpoint(str(tmp_path), s, new_history(), "latest")
    template = jax.tree_util.tree_map(jnp.zeros_like, clone(state0))
    restored = restore_checkpoint(str(tmp_path), template, "latest")
    assert int(restored.step) == 4

    # (a) the restored schedule position is past the boundary: the sound
    # group's schedule count survived the round trip at 4 (the frame
    # group's stays 0 — AO steps freeze it, matching torch where only
    # nets passed to the step optimize), and the schedule evaluated
    # there gives the DECAYED lr
    counts = [int(leaf) for leaf in
              jax.tree_util.tree_leaves(jax.device_get(restored.opt_state))
              if np.ndim(leaf) == 0 and np.issubdtype(
                  np.asarray(leaf).dtype, np.integer)]
    assert counts and max(counts) == 4, counts
    lr_now = _lr_schedule(cfg.lr_sound, cfg.lr_steps)(max(counts))
    np.testing.assert_allclose(float(lr_now), 0.1 * cfg.lr_sound, rtol=1e-6)

    # (b) post-resume step == unbroken step, bit-exact
    restored, _ = step(restored, batch, keys[4])
    for a, b in zip(jax.tree_util.tree_leaves(final_direct),
                    jax.tree_util.tree_leaves(
                        jax.device_get(restored.params))):
        np.testing.assert_array_equal(a, b)


def _leaves_equal(a, b):
    for x, y in zip(jax.tree_util.tree_leaves(jax.device_get(a)),
                    jax.tree_util.tree_leaves(jax.device_get(b))):
        np.testing.assert_array_equal(x, y)


def test_mesh_checkpoint_roundtrip(setup, tmp_path):
    """A TrainState saved from an 8-device mesh restores onto 1 device AND
    onto a fresh 8-device mesh, with identical params/opt-state, and
    training continues on the same trajectory either way (the standard
    production wrinkle of the DataParallel->mesh migration, SURVEY.md §5;
    VERDICT r2 missing #4)."""
    from avsep_tpu.parallel.mesh import make_mesh, shard_batch, shard_tree

    cfg, nets, state0 = setup
    assert len(jax.devices()) >= 8  # conftest forces 8 virtual CPU devices
    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    step = make_train_step(cfg, nets, use_vis=False)
    batch = tiny_batch(cfg, B=8)  # divisible by both mesh widths
    keys = [jax.random.PRNGKey(i) for i in range(3)]

    # two sharded steps on the 8-device mesh, then save
    s = shard_tree(clone(state0), mesh8)
    b8 = shard_batch(dict(batch), mesh8)
    for k in keys[:2]:
        s, _ = step(s, b8, k)
    save_checkpoint(str(tmp_path), s, new_history(), "latest")

    template = jax.tree_util.tree_map(jnp.zeros_like, clone(state0))

    # restore onto ONE device
    r1 = restore_checkpoint(str(tmp_path), template, "latest", mesh=mesh1)
    assert int(r1.step) == 2
    _leaves_equal(s, r1)
    b1 = shard_batch(dict(batch), mesh1)
    r1_next, m1 = step(r1, b1, keys[2])

    # restore onto a FRESH 8-device mesh
    r8 = restore_checkpoint(str(tmp_path), template, "latest", mesh=mesh8)
    _leaves_equal(s, r8)
    for leaf in jax.tree_util.tree_leaves(
            r8.params, is_leaf=lambda x: hasattr(x, "sharding")):
        assert len(leaf.sharding.device_set) == 8  # actually replicated
    r8_next, m8 = step(r8, b8, keys[2])

    # same trajectory regardless of restore topology (cross-mesh-width
    # reduction order differs, so tolerances match
    # test_train_step_1_vs_8_device_equivalence)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(r1_next.params)),
                    jax.tree_util.tree_leaves(jax.device_get(r8_next.params))):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(m1["err"]), float(m8["err"]),
                               rtol=1e-5)


def test_best_err_persists_across_resume(setup, tmp_path):
    """A worse post-resume eval must NOT clobber the best checkpoint:
    best_err is persisted in the history json (improves on the reference,
    which resets its tracker every run, main.py:797)."""
    from avsep_tpu.checkpoint import checkpoint, load_history
    cfg, nets, state = setup
    ckpt = str(tmp_path)

    # run 1: good eval -> promoted to best
    h = new_history()
    h["val_ao"]["iter"].append(1)
    h["val_ao"]["si_sdr"].append(10.0)       # best_err = -10
    holder = {"best_err": float("inf")}
    s1 = clone(state)._replace(step=jnp.asarray(1, jnp.int32))
    checkpoint(ckpt, s1, h, holder)
    assert holder["best_err"] == -10.0

    # "resume": fresh process state, holder rebuilt from history json
    h2 = load_history(ckpt)
    holder2 = {"best_err": float(h2.get("best_err", float("inf")))}
    assert holder2["best_err"] == -10.0

    # run 2: WORSE eval -> latest updated, best untouched
    h2["val_ao"]["iter"].append(2)
    h2["val_ao"]["si_sdr"].append(3.0)       # worse (err -3 > -10)
    s2 = clone(state)._replace(step=jnp.asarray(2, jnp.int32))
    checkpoint(ckpt, s2, h2, holder2)
    assert holder2["best_err"] == -10.0

    template = jax.tree_util.tree_map(jnp.zeros_like, clone(state))
    best = restore_checkpoint(ckpt, template, "best")
    latest = restore_checkpoint(ckpt, template, "latest")
    assert int(best.step) == 1               # still run-1's state
    assert int(latest.step) == 2

    # run 3: better eval -> best re-promoted
    h2["val_ao"]["iter"].append(3)
    h2["val_ao"]["si_sdr"].append(20.0)
    s3 = clone(state)._replace(step=jnp.asarray(3, jnp.int32))
    checkpoint(ckpt, s3, h2, holder2)
    best = restore_checkpoint(ckpt, template, "best")
    assert int(best.step) == 3
    assert load_history(ckpt)["best_err"] == -20.0
