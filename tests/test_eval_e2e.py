"""End-to-end eval + checkpoint round-trip on the synthetic manifest
(reference flow: main.py:684-686 eval mode; checkpoint :506-533)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.data.loader import BatchLoader
from avsep_tpu.evaluate import evaluate
from avsep_tpu.train import TrainState, init_state, make_optimizer
from avsep_tpu.utils.meters import new_history
from tests.test_dataset import manifest, make_cfg  # noqa: F401  (fixture)
from tests.test_train_step import tiny_cfg, tiny_nets, AUDLEN


@pytest.fixture(scope="module")
def small_setup(manifest, tmp_path_factory):  # noqa: F811
    ckpt = tmp_path_factory.mktemp("ckpt")
    cfg = tiny_cfg(audLen=AUDLEN, imgSize=64, num_frames=1, one_frame=True,
                   margin=1.0, val_repeat=1, num_vis=1,
                   batch_size_per_gpu=4, num_gpus=1,
                   ckpt=str(ckpt), train_repeat=1,
                   list_val=(manifest,))
    nets = tiny_nets(cfg)
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


def test_evaluate_end_to_end(small_setup, manifest):  # noqa: F811
    cfg, nets, state = small_setup
    from avsep_tpu.data.dataset import MusicMixDataset
    ds = MusicMixDataset(manifest, cfg, split="val")
    loader = BatchLoader(ds, 4, shuffle=False, num_workers=2)
    history = new_history()
    evaluate(cfg, nets, state.params, state.batch_stats, loader, history, 0,
             use_vis_eval=True, write_visuals=False)
    evaluate(cfg, nets, state.params, state.batch_stats, loader, history, 0,
             use_vis_eval=False, write_visuals=False)
    assert len(history["val_av"]["sdr"]) == 1
    assert len(history["val_ao"]["si_sdr"]) == 1
    assert np.isfinite(history["val_av"]["sdr"][0])
    # results.csv written per branch
    for branch in ("av", "ao"):
        p = os.path.join(cfg.ckpt, "visualization", branch, "results.csv")
        assert os.path.exists(p)
        assert len(open(p).readlines()) == len(ds) + 1


def test_checkpoint_roundtrip(small_setup, tmp_path):
    cfg, nets, state = small_setup
    from avsep_tpu.checkpoint import (
        restore_checkpoint, save_checkpoint, load_history)
    history = new_history()
    history["train"]["iter"].append(7)
    save_checkpoint(str(tmp_path), state, history, "latest")
    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored = restore_checkpoint(str(tmp_path), template, "latest")
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    h = load_history(str(tmp_path))
    assert h["train"]["iter"] == [7]


def test_separate_pipeline(small_setup):
    """Waveform in -> separated waveforms out (reference inference flow)."""
    cfg, nets, state = small_setup
    from avsep_tpu.engine import separate
    rs = np.random.RandomState(0)
    mix = jnp.asarray(rs.randn(2, cfg.audLen).astype(np.float32) * 0.1)
    frames = jnp.asarray(rs.rand(2, 2, 1, 64, 64, 3).astype(np.float32))
    out = separate(nets, state.params, state.batch_stats, mix, frames, cfg)
    L = cfg.stft_hop * ((cfg.audLen + 1) // cfg.stft_hop - 1)
    assert out["wavs"].shape == (2, 2, L)
    assert np.isfinite(np.asarray(out["wavs"])).all()
    assert out["masks_linear"].shape == (2, 2, cfg.HS, cfg.WS)
    # AO path
    out_ao = separate(nets, state.params, state.batch_stats, mix, None, cfg,
                      rng=jax.random.PRNGKey(0))
    assert out_ao["wavs"].shape == (2, 2, L)
    # duet path: single visual stream
    out_duet = separate(nets, state.params, state.batch_stats, mix,
                        frames[:, :1], cfg)
    assert out_duet["wavs"].shape == (2, 2, L)


def test_evaluate_mesh_matches_single_device(small_setup, manifest):  # noqa: F811
    """Eval sharded over the 8-device mesh gives the same meters as
    single-device, including with a ragged (padded) final batch — padded
    rows are excluded via the per-sample losses (VERDICT r1 item 2)."""
    from avsep_tpu.data.dataset import MusicMixDataset
    from avsep_tpu.parallel.mesh import make_mesh
    cfg, nets, state = small_setup
    ds = MusicMixDataset(manifest, cfg, split="val")
    bs = max(2, len(ds) - 1)  # force a ragged final batch
    h1, h8 = new_history(), new_history()
    loader1 = BatchLoader(ds, bs, shuffle=False, num_workers=2)
    evaluate(cfg, nets, state.params, state.batch_stats, loader1, h1, 0,
             use_vis_eval=True, write_visuals=False)
    loader8 = BatchLoader(ds, bs, shuffle=False, num_workers=2)
    evaluate(cfg, nets, state.params, state.batch_stats, loader8, h8, 0,
             use_vis_eval=True, write_visuals=False, mesh=make_mesh(8))
    for k in ("err", "sdr", "sir", "sar", "si_sdr"):
        np.testing.assert_allclose(h1["val_av"][k][0], h8["val_av"][k][0],
                                   rtol=2e-4, atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_evaluate_meters_independent_of_batch_size(small_setup, manifest):  # noqa: F811
    """Padding-clean meters: the AV eval summary must not depend on how the
    val set is batched (the padded duplicate rows used to bias err/match)."""
    from avsep_tpu.data.dataset import MusicMixDataset
    cfg, nets, state = small_setup
    ds = MusicMixDataset(manifest, cfg, split="val")
    hists = []
    for bs in (len(ds), max(2, len(ds) - 1)):
        h = new_history()
        loader = BatchLoader(ds, bs, shuffle=False, num_workers=2)
        evaluate(cfg, nets, state.params, state.batch_stats, loader, h, 0,
                 use_vis_eval=True, write_visuals=False)
        hists.append(h)
    for k in ("err", "sdr", "sir", "sar", "si_sdr"):
        np.testing.assert_allclose(hists[0]["val_av"][k][0],
                                   hists[1]["val_av"][k][0],
                                   rtol=2e-4, atol=1e-5, err_msg=k)


def test_perm_correct_catches_three_cycles():
    """perm_correct must test identity against ALL N! assignments: for
    num_mix=3 a cyclic misassignment (pred n carries source n+1) leaves
    the full reversal worse than identity, so the old pairwise
    identity-vs-reversal check scored it correct (review finding)."""
    from avsep_tpu.evaluate import perm_correct

    rs = np.random.RandomState(0)
    B, N, F, T = 2, 3, 6, 5
    gts = rs.rand(B, N, F, T).astype(np.float32)
    preds = gts.copy()
    preds[0] = gts[0, [1, 2, 0]]  # sample 0: 3-cycle; sample 1: identity
    w = np.ones((B, F, T), np.float32)
    out = np.asarray(perm_correct(jnp.asarray(preds), jnp.asarray(gts),
                                  jnp.asarray(w), kind="l2"))
    np.testing.assert_array_equal(out, [0.0, 1.0])
    # num_mix=2 semantics unchanged: swap -> 0, identity -> 1
    gts2 = rs.rand(B, 2, F, T).astype(np.float32)
    preds2 = gts2.copy()
    preds2[0] = gts2[0, ::-1]
    out2 = np.asarray(perm_correct(jnp.asarray(preds2), jnp.asarray(gts2),
                                   jnp.asarray(np.ones((B, F, T),
                                                       np.float32)),
                                   kind="bce"))
    np.testing.assert_array_equal(out2, [0.0, 1.0])


def test_validate_global_batch_messages(monkeypatch):
    """Multi-host batch misconfiguration must raise the clear ValueError,
    not silently floor the per-process batch (review finding: sop_main
    skipped the validation main() performed)."""
    import avsep_tpu.parallel.distributed as dist
    from tests.test_train_step import tiny_cfg

    monkeypatch.setattr(dist.jax, "process_count", lambda: 4)
    monkeypatch.setattr(
        dist.jax, "devices",
        lambda *a: [object()] * 8)
    cfg = tiny_cfg(batch_size_per_gpu=3, num_gpus=1, dist_data="shard")
    assert cfg.batch_size == 3
    with pytest.raises(ValueError, match="divide"):
        dist.validate_global_batch(cfg)
    cfg8 = tiny_cfg(batch_size_per_gpu=8, num_gpus=1, dist_data="shard")
    dist.validate_global_batch(cfg8)  # 8 % 8 devices, 8 % 4 procs: ok
    cfg12 = tiny_cfg(batch_size_per_gpu=12, num_gpus=1, dist_data="replicate")
    with pytest.raises(ValueError, match="divide"):
        dist.validate_global_batch(cfg12)  # 12 % 8 devices != 0


def test_eval_step_cache_survives_host_field_changes(small_setup):
    """cfg copies differing only in host-side fields (ckpt dir, id, loop
    cadence) must reuse the cached compiled eval step — keying on id(cfg)
    made every cfg.replace(...) pay the 20-40 s recompile (review
    finding); compute-relevant changes must still rebuild."""
    from avsep_tpu.evaluate import make_eval_step

    cfg, nets, state = small_setup
    s1 = make_eval_step(cfg, nets, True)
    s2 = make_eval_step(cfg.replace(ckpt="/tmp/elsewhere", id="other",
                                    num_vis=3, disp_iter=7), nets, True)
    assert s1 is s2
    s3 = make_eval_step(cfg.replace(mask_thres=0.25), nets, True)
    assert s3 is not s1
    # branch split still respected
    assert make_eval_step(cfg, nets, False) is not s1
