"""Train / eval orchestration CLI — ``python -m avsep_tpu.main --mode train``.

Reference-compatible entry point (reference ``main.py:604-801``): same flags
(scripts/train_MUSIC.sh strings parse unchanged), same loop structure —
AV/AO batch interleaving, disp/eval/checkpoint cadence, per-iteration
iter/data timing meters, history dict, latest/best checkpoints — but the
step itself is a jit-compiled SPMD program over the device mesh and the
checkpoint carries optimizer state (fixing the reference's resume gap,
SURVEY.md §5).
"""

from __future__ import annotations

import os
import time

import jax
import numpy as np

# NOTE: multi-host bring-up (`--dist_nprocs N`) requires that NOTHING
# touches the XLA backend before main() calls maybe_initialize — no
# module-level jnp constants (the one offender was engine.py's ImageNet
# stats, now plain numpy) and, as defense-in-depth, the heavyweight
# orbax import (avsep_tpu.checkpoint) stays lazy inside main()/
# _train_loop.  Regression guard: tests/test_multihost.py's runner uses
# this exact shipped entry path with no early initialize.
from avsep_tpu.config import Config, parse_args
from avsep_tpu.data.dataset import MusicMixDataset
from avsep_tpu.data.wire import encode_audio_wire
from avsep_tpu.data.loader import (
    BatchLoader, ConcatDataset, DevicePrefetcher, ProcessBatchLoader,
    iter_forever)
from avsep_tpu.engine import build_nets, unused_visual_streams
from avsep_tpu.evaluate import evaluate
from avsep_tpu.parallel.mesh import (
    make_mesh, mesh_from_config, shard_batch)
from avsep_tpu.train import (
    batch_scheduler, init_state, make_train_step)
from avsep_tpu.utils.meters import AverageMeter, new_history
from avsep_tpu.utils.media import makedirs


def build_loaders(cfg: Config, val_only: bool = False):
    """AV / AO / val loaders (reference main.py:633-657).  ``val_only``
    skips the train datasets so eval mode needs no train manifests.

    Multi-host: in ``dist_data=replicate`` every process runs these
    loaders identically (deterministic datasets + order-preserving
    loaders) and ships only its own rows; in ``shard`` each process's
    TRAIN loaders draw from a DISJOINT ``1/P`` partition of the dataset
    (``ShardDataset`` stride view — a global batch can never contain a
    sample twice, and every sample appears once per global epoch) at
    ``batch/P`` rows per process — val stays replicated either way so
    eval meters are process-independent (parallel/distributed.py)."""
    n_proc = jax.process_count()
    shard_hosts = n_proc > 1 and cfg.dist_data == "shard"
    train_bs = cfg.batch_size // n_proc if shard_hosts else cfg.batch_size

    def maybe_shard(ds):
        if not shard_hosts:
            return ds
        from avsep_tpu.data.loader import ShardDataset
        sh = ShardDataset(ds, jax.process_index(), n_proc)
        if len(sh) < train_bs:
            raise ValueError(
                f"dist_data=shard: {len(ds)} samples / {n_proc} processes "
                f"leaves {len(sh)} per process — fewer than the "
                f"per-process batch {train_bs} (raise train_repeat or "
                f"use dist_data=replicate)")
        return sh

    val_cls = ProcessBatchLoader if int(cfg.workers) > 0 else BatchLoader
    val_ds = ConcatDataset([MusicMixDataset(p, cfg, split="val")
                            for p in cfg.list_val])
    # the reference hardcodes 4 val workers regardless of --workers
    # (main.py:656), so --workers 0 must not serialize the val sweep
    val_loader = val_cls(val_ds, cfg.batch_size, shuffle=False,
                         num_workers=4, seed=cfg.seed)
    if val_only:
        return None, None, val_loader
    av_ds = ConcatDataset([MusicMixDataset(p, cfg, split="train")
                           for p in cfg.av_list_train])
    ao_ds = ConcatDataset([MusicMixDataset(p, cfg, split="train", seed=10)
                           for p in cfg.ao_list_train])
    # process workers for the train loaders (reference DataLoader
    # num_workers, main.py:633-657): GIL-free producers keep batches
    # flowing while the main thread blocks in device dispatch.
    # workers=0 -> in-process thread loader (torch's workers=0 analogue).
    cls = ProcessBatchLoader if int(cfg.workers) > 0 else BatchLoader
    mk = lambda ds, sh: cls(maybe_shard(ds), train_bs, shuffle=sh,
                            num_workers=max(1, int(cfg.workers)),
                            seed=cfg.seed, drop_last=True)
    return mk(av_ds, True), mk(ao_ds, True), val_loader


def to_device(batch, mesh, drop=(), cfg=None):
    # audio_mix never crosses the wire: it is the exact f32 sum of the
    # per-source waveforms and is rebuilt on device
    # (engine.audio_mix_of) — ~24% fewer host->device bytes per batch.
    # `drop` trims branch-unused tensors (the AO iterators drop frames:
    # forward_ao / the SoP AO stage never read them, and the wire is the
    # in-situ bottleneck on tunneled chips, BENCH_NOTES.md)
    skip = ("class", "audio_mix") + tuple(drop)
    dev = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)
           and v.dtype != object and k not in skip}
    if cfg is not None:  # opt-in int16 audio wire (data/wire.py)
        dev = encode_audio_wire(dev, cfg)
    if jax.process_count() > 1:  # multi-host: per-process rows -> global
        from avsep_tpu.parallel.distributed import device_put_global
        return device_put_global(
            dev, mesh, mode=cfg.dist_data if cfg is not None
            else "replicate")
    return shard_batch(dev, mesh)


def main(cfg: Config):
    # multi-host (DCN) bring-up must precede the first device query
    from avsep_tpu.parallel.distributed import maybe_initialize
    maybe_initialize(cfg)
    from avsep_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    print("Model ID: {}".format(cfg.id))
    ckpt_root = os.path.join(cfg.ckpt, cfg.id)
    cfg = cfg.replace(ckpt=ckpt_root)
    makedirs(cfg.ckpt, remove=False)

    if jax.process_count() > 1:
        # a multi-host job spans the whole slice: every process's devices
        # must be in the mesh (all processes participate in every SPMD
        # program), so num_gpus cannot subset it
        n_dev = len(jax.devices())
        from avsep_tpu.parallel.distributed import validate_global_batch
        validate_global_batch(cfg)
    else:
        # data-parallel width = num_gpus (reference main.py:661
        # DataParallel over range(num_gpus)), clamped to the devices
        # actually present
        n_dev = max(1, min(cfg.num_gpus, len(jax.devices())))
    mesh = mesh_from_config(cfg, n_dev)
    nets = build_nets(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = init_state(cfg, nets, init_rng, mesh=mesh)

    from avsep_tpu.checkpoint import load_history, restore_checkpoint

    history = new_history()
    start_i = 0
    if cfg.load_ckpt:
        h = load_history(cfg.ckpt)
        if h is not None:
            history = h
            start_i = history["train"]["iter"][-1] if history["train"]["iter"] else 0
            state = restore_checkpoint(cfg.ckpt, state, "latest",
                                        mesh=mesh)
            print("Recovered from history.")

    av_loader, ao_loader, val_loader = build_loaders(
        cfg, val_only=cfg.mode == "eval")

    if cfg.mode == "eval":
        if not cfg.load_ckpt:
            try:
                state = restore_checkpoint(cfg.ckpt, state, "best",
                                            mesh=mesh)
            except Exception:
                print("WARNING: no best checkpoint found; evaluating "
                      "current params")
        try:
            evaluate(cfg, nets, state.params, state.batch_stats, val_loader,
                     history, 0, True, mesh=mesh)
            evaluate(cfg, nets, state.params, state.batch_stats, val_loader,
                     history, 0, False, mesh=mesh)
        finally:
            val_loader.close()  # reap worker processes (torch DataLoader
            # teardown semantics, reference main.py:633-657)
        print("Evaluation Done!")
        return

    step_av = make_train_step(cfg, nets, use_vis=True)
    step_ao = make_train_step(cfg, nets, use_vis=False)
    use_vis_fn = batch_scheduler(cfg)
    # device-side prefetch: batch i+1's host->device transfer rides under
    # batch i's step instead of showing up in data_time
    av_iter = DevicePrefetcher(
        iter_forever(av_loader),
        lambda b: to_device(b, mesh, drop=unused_visual_streams(cfg),
                            cfg=cfg))
    ao_iter = DevicePrefetcher(iter_forever(ao_loader),
                               lambda b: to_device(b, mesh,
                                                   drop=("frames", "clips"),
                                                   cfg=cfg))

    iter_time, data_time = AverageMeter(), AverageMeter()
    match_meter = AverageMeter()
    # best_err survives resume via the history json (the reference resets
    # it every run, main.py:797, letting a worse post-resume eval clobber
    # the best checkpoint)
    best_holder = {"best_err": float(history.get("best_err", float("inf")))}

    try:
        _train_loop(cfg, nets, state, history, best_holder, start_i, rng,
                    mesh, step_av, step_ao, use_vis_fn, av_iter, ao_iter,
                    val_loader, iter_time, data_time, match_meter)
    finally:
        # release prefetch threads + loader worker processes even when the
        # loop raises (VERDICT r2: close() was never called; daemon workers
        # leaked until process exit)
        av_iter.close()
        ao_iter.close()
        for ld in (av_loader, ao_loader, val_loader):
            ld.close()

    print("Training Done!")


def _train_loop(cfg, nets, state, history, best_holder, start_i, rng, mesh,
                step_av, step_ao, use_vis_fn, av_iter, ao_iter, val_loader,
                iter_time, data_time, match_meter):
    from avsep_tpu.checkpoint import checkpoint

    err_total = err_av = err_ao = 0.0
    av_count = ao_count = 0
    trace_active = False

    def _stop_trace():
        nonlocal trace_active
        if trace_active:
            jax.profiler.stop_trace()
            trace_active = False
            print(f"profiler trace written to {cfg.profile_dir}")

    try:
      for i in range(start_i + 1, cfg.num_iters):
        # on-demand device trace capture (the reference only has wall-clock
        # meters, main.py:703-714; this adds real profiler traces)
        if cfg.profile_dir and i == cfg.profile_start:
            jax.profiler.start_trace(cfg.profile_dir)
            trace_active = True
        if trace_active and i == cfg.profile_start + cfg.profile_steps:
            _stop_trace()

        tic = time.perf_counter()
        use_vis = use_vis_fn(i)
        batch = next(av_iter if use_vis else ao_iter)
        data_time.update(time.perf_counter() - tic)

        rng, sub = jax.random.split(rng)
        step = step_av if use_vis else step_ao
        state, metrics = step(state, batch, sub)
        err = float(metrics["err"])
        match_loss = float(metrics["match_loss"]) if use_vis else None
        iter_time.update(time.perf_counter() - tic)

        err_total += err
        if use_vis:
            match_meter.update(match_loss)
            err_av += err - match_loss * cfg.match_weight
            av_count += 1
        else:
            err_ao += err
            ao_count += 1

        if i % cfg.disp_iter == 0 and i != 0:
            # the live (decayed) LRs — the optax schedule scales x0.1 past
            # each lr_steps boundary (reference prints the mutated args
            # values, main.py:551-555 + :726-737)
            # `>`, not `>=`: the reference decays at the END of iteration
            # s (main.py:762-763), so the decayed LR is first CONSUMED at
            # i = s+1 — which is exactly when optax's schedule kicks in
            # here too (the update at iteration i uses count i-1, and
            # piecewise_constant_schedule scales at count >= s).  `>= s`
            # would print the decayed LR one iteration before either
            # optimizer applies it.
            decay = 0.1 ** sum(i > s for s in cfg.lr_steps)
            print("iter: [{}/{}], Time: {:.2f}, Data: {:.2f}, "
                  "lr_sound: {}, lr_frame: {}, loss: {:.3f}, "
                  "loss_ao: {:.3f}, loss_av: {:.3f} loss_match {:.3f}"
                  .format(i, cfg.num_iters, iter_time.average(),
                          data_time.average(), cfg.lr_sound * decay,
                          cfg.lr_frame * decay,
                          err_total / cfg.disp_iter,
                          err_ao / ao_count if ao_count else 0.0,
                          err_av / av_count if av_count else 0.0,
                          match_meter.average() if use_vis else 0))
            history["train"]["iter"].append(i)
            history["train"]["err"].append(err_total / cfg.disp_iter)
            if ao_count:
                history["train_ao"]["iter"].append(i)
                history["train_ao"]["err"].append(err_ao / ao_count)
            if av_count:
                history["train_av"]["iter"].append(i)
                history["train_av"]["err"].append(err_av / av_count)
            err_total = err_av = err_ao = 0.0
            av_count = ao_count = 0
            match_meter.initialize(0, 0)

        if i % cfg.eval_iter == 0 and i > 1:
            evaluate(cfg, nets, state.params, state.batch_stats, val_loader,
                     history, i, True, mesh=mesh)
            evaluate(cfg, nets, state.params, state.batch_stats, val_loader,
                     history, i, False, mesh=mesh)
            checkpoint(cfg.ckpt, state, history, best_holder)
        # LR decay happens inside the optax schedule at cfg.lr_steps.
    finally:
        # flush a live trace if the loop ends or raises inside the
        # profiled window (review finding: stop_trace only ran at the
        # exact boundary iteration, so a short run never wrote the trace)
        _stop_trace()


if __name__ == "__main__":
    cfg = parse_args()
    np.random.seed(cfg.seed)
    main(cfg)
