"""SoP++ train/eval CLI — ``python -m avsep_tpu.sop_main --mode train``.

Equivalent of reference ``SoP++/main.py`` (:723-928): 4-net decomposition
(basis U-Net with ``extra_size == num_channels``, frame encoder, InnerProd
synthesizer, parameter-free PIT attention module), SGD groups
(sound/synthesizer/frame.fc/frame.features; ``create_optimizer`` :743-756),
3-stage curriculum switched on ``--train_steps`` (:670-688), AV/AO batch
interleaving, and latest/best checkpoints of the full state.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# checkpoint (-> orbax) is imported lazily inside main() so multi-host
# bring-up (maybe_initialize) stays ahead of heavyweight imports — the
# hard rule is that no module-level code touches the XLA backend before
# it (see avsep_tpu/main.py)
from avsep_tpu.config import Config, parse_args
from avsep_tpu.data.loader import DevicePrefetcher, iter_forever
from avsep_tpu.data.wire import audios_of, encode_audio_wire
from avsep_tpu.main import build_loaders, to_device
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.sop import BasisUnet
from avsep_tpu.models.synthesizer import Bias, InnerProd
from avsep_tpu.parallel.mesh import mesh_from_config, shard_tree
from avsep_tpu.utils.jit_cache import JitStepCache
from avsep_tpu.sop_engine import SopNets, sop_forward, stage_for_iter
from avsep_tpu.train import TrainState, _lr_schedule, batch_scheduler
from avsep_tpu.utils.meters import AverageMeter, new_history
from avsep_tpu.utils.media import makedirs

_UNET_DOWNS = {"unet5": 5, "unet6": 6, "unet7": 7}


def build_sop_nets(cfg: Config) -> SopNets:
    sound = BasisUnet(fc_dim=cfg.num_channels,
                      num_downs=_UNET_DOWNS[cfg.arch_sound],
                      extra_size=cfg.num_channels,  # SoP++/main.py:731
                      n_sources=cfg.num_mix)
    frame = FrameEncoder(fc_dim=cfg.vis_channels, pool_type=cfg.img_pool,
                         dilate_scale=16 if "dilated" in cfg.arch_frame
                         else 0)
    synth = (InnerProd(fc_dim=cfg.num_channels)
             if cfg.arch_synthesizer == "linear" else Bias())
    return SopNets(sound, frame, synth, None)


def init_sop_state(cfg: Config, nets: SopNets, rng) -> TrainState:
    k1, k2, k3 = jax.random.split(rng, 3)
    sound_vars = nets.sound.init(k1, jnp.zeros((1, 256, 256, 1)),
                                 train=False)
    frame_vars = nets.frame.init(
        k2, jnp.zeros((1, 1, cfg.imgSize, cfg.imgSize, 3)), pool=False,
        train=False)
    synth_vars = nets.synthesizer.init(
        k3, jnp.zeros((1, cfg.num_channels)),
        jnp.zeros((1, 8, 8, cfg.num_channels)))
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"],
              "synthesizer": synth_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}

    # reference .pth warm starts (SoP++/main.py:727-748 weights_* args)
    from avsep_tpu.models.torch_import import (
        load_torch_checkpoint, resnet_from_torch, synthesizer_from_torch,
        unet_from_torch)
    if cfg.weights_sound.endswith(".pth"):
        p, s = unet_from_torch(load_torch_checkpoint(cfg.weights_sound),
                               num_downs=_UNET_DOWNS[cfg.arch_sound])
        params["sound"], stats["sound"] = p, s
    if cfg.weights_frame.endswith(".pth"):
        p, s = resnet_from_torch(load_torch_checkpoint(cfg.weights_frame))
        # torchvision ImageNet dicts carry no conv fc head (the converter
        # skips their 2-D linear) — merge so the freshly initialized fc
        # survives, as in train.py:113-121
        params["frame"] = {**params["frame"], **p}
        stats["frame"] = {**stats["frame"], **s}
    if cfg.weights_synthesizer.endswith(".pth"):
        params["synthesizer"] = synthesizer_from_torch(
            load_torch_checkpoint(cfg.weights_synthesizer))

    opt = make_sop_optimizer(cfg, params)
    return TrainState(jnp.zeros((), jnp.int32), params, stats,
                      opt.init(params))


def make_sop_optimizer(cfg: Config, params):
    """SGD param groups (reference SoP++/main.py:743-756)."""
    def group(lr):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(_lr_schedule(lr, cfg.lr_steps), momentum=cfg.beta1))

    def frame_label(key):
        return "sound" if key == "fc" else "frame"

    labels = {
        "sound": jax.tree_util.tree_map(lambda _: "sound", params["sound"]),
        "synthesizer": jax.tree_util.tree_map(lambda _: "synth",
                                              params["synthesizer"]),
        "frame": {k: jax.tree_util.tree_map(lambda _: frame_label(k), v)
                  for k, v in params["frame"].items()},
    }
    return optax.multi_transform(
        {"sound": group(cfg.lr_sound), "synth": group(cfg.lr_synthesizer),
         "frame": (optax.set_to_zero() if cfg.fix_vis
                   else group(cfg.lr_frame))}, labels)


def make_sop_train_step(cfg: Config, nets: SopNets, use_vis: bool,
                        stage: int):
    def loss_fn(params, batch_stats, batch, rng):
        err, (new_stats, outputs) = sop_forward(
            nets, params, batch_stats, batch, cfg, rng, use_vis, True,
            stage)
        return err, (new_stats, outputs["match_loss"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng):
        (err, (new_stats, match)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        opt = make_sop_optimizer(cfg, state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        if not use_vis:
            # torch SGD skips grad-is-None params: the SoP++ AO step never
            # touches net_frame (sop_engine.sop_forward AO branch;
            # reference SoP++/main.py:215-246), so the reference applies
            # no weight decay / momentum to it there.  Zero its update
            # and carry its optimizer state unchanged (same fix as
            # train.make_train_step; net_frame.fc rides the "sound"
            # group, its param is frozen via the zeroed update).
            updates = {k: (u if k != "frame" else
                           jax.tree_util.tree_map(jnp.zeros_like, u))
                       for k, u in updates.items()}
            opt_state = opt_state._replace(inner_states={
                k: (v if k != "frame"
                    else state.opt_state.inner_states[k])
                for k, v in opt_state.inner_states.items()})
        params = optax.apply_updates(state.params, updates)
        return (TrainState(state.step + 1, params, new_stats, opt_state),
                {"err": err, "match_loss": match})

    return step


def main(cfg: Config):
    # multi-host (DCN) bring-up must precede the first device query;
    # build_loaders/to_device (imported from avsep_tpu.main) are already
    # process-aware, checkpoint writes are primary-gated
    from avsep_tpu.parallel.distributed import (
        maybe_initialize, validate_global_batch)
    maybe_initialize(cfg)
    validate_global_batch(cfg)
    from avsep_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    print("Model ID: {}".format(cfg.id))
    cfg = cfg.replace(ckpt=os.path.join(cfg.ckpt, cfg.id))
    makedirs(cfg.ckpt, remove=False)

    from avsep_tpu.checkpoint import (
        checkpoint, load_history, restore_checkpoint)

    mesh = mesh_from_config(cfg)
    nets = build_sop_nets(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    rng, init_rng = jax.random.split(rng)
    state = shard_tree(init_sop_state(cfg, nets, init_rng), mesh)

    history = new_history()
    start_i = 0
    if cfg.load_ckpt or cfg.restart_from_latest:
        h = load_history(cfg.ckpt)
        if h is not None:
            history = h
            start_i = (history["train"]["iter"][-1]
                       if history["train"]["iter"] else 0)
            state = restore_checkpoint(cfg.ckpt, state, "latest",
                                        mesh=mesh)
            print("Recovered from history.")

    av_loader, ao_loader, val_loader = build_loaders(
        cfg, val_only=cfg.mode == "eval")

    if cfg.mode == "eval":
        if not cfg.load_ckpt:
            # restore the best checkpoint like main.py's eval path
            # (reference loads *_best.pth, main.py:789-793)
            try:
                state = restore_checkpoint(cfg.ckpt, state, "best",
                                            mesh=mesh)
            except Exception:
                print("WARNING: no best checkpoint found; evaluating "
                      "current params")
        try:
            _sop_evaluate(cfg, nets, state, val_loader, history, 0,
                          mesh=mesh)
        finally:
            val_loader.close()  # reap worker processes
        print("Evaluation Done!")
        return

    use_vis_fn = batch_scheduler(cfg)
    # device-side prefetch over GIL-free process loaders (main.py parity);
    # constructed only in train mode — DevicePrefetcher starts pulling
    # batches (and forking loader workers) the moment it is built
    av_iter = DevicePrefetcher(iter_forever(av_loader),
                               lambda b: to_device(b, mesh, cfg=cfg))
    ao_iter = DevicePrefetcher(iter_forever(ao_loader),
                               lambda b: to_device(b, mesh,
                                                   drop=("frames", "clips"),
                                                   cfg=cfg))

    steps: Dict[Tuple[bool, int], object] = {}
    iter_time, data_time = AverageMeter(), AverageMeter()
    # best_err survives resume via the history json (main.py parity)
    best_holder = {"best_err": float(history.get("best_err",
                                                 float("inf")))}

    try:
        for i in range(start_i + 1, cfg.num_iters):
            tic = time.perf_counter()
            use_vis = use_vis_fn(i)
            stage = stage_for_iter(i, cfg.train_steps) if use_vis else 0
            batch = next(av_iter if use_vis else ao_iter)
            data_time.update(time.perf_counter() - tic)

            key = (use_vis, stage)
            if key not in steps:
                steps[key] = make_sop_train_step(cfg, nets, use_vis,
                                                 max(stage, 1))
            rng, sub = jax.random.split(rng)
            state, metrics = steps[key](state, batch, sub)
            iter_time.update(time.perf_counter() - tic)

            if i % cfg.disp_iter == 0 and i != 0:
                print("iter: [{}/{}], stage: {}, Time: {:.2f}, "
                      "Data: {:.2f}, loss: {:.3f}".format(
                          i, cfg.num_iters, stage, iter_time.average(),
                          data_time.average(), float(metrics["err"])))
                history["train"]["iter"].append(i)
                history["train"]["err"].append(float(metrics["err"]))

            if i % cfg.eval_iter == 0 and i > 1:
                _sop_evaluate(cfg, nets, state, val_loader, history, i,
                              mesh=mesh)
                checkpoint(cfg.ckpt, state, history, best_holder)
    finally:
        # release prefetch threads + loader worker processes (main.py
        # parity; VERDICT r2 loader-lifecycle fix)
        av_iter.close()
        ao_iter.close()
        for ld in (av_loader, ao_loader, val_loader):
            ld.close()

    print("Training Done!")


_SOP_EVAL_STEPS = JitStepCache()


def make_sop_eval_step(cfg, nets, use_vis: bool):
    """One jitted program: forward -> unwarp -> iSTFT -> BSS metrics.
    Cached per (cfg, nets, branch) — see ``utils.jit_cache`` — so repeated
    ``_sop_evaluate`` calls inside the train loop reuse the compiled
    executable (same cache as ``evaluate.make_eval_step``)."""
    return _SOP_EVAL_STEPS.get_or_build(
        (nets,), (cfg.jit_signature(), use_vis),
        lambda: _build_sop_eval_step(cfg, nets, use_vis))


def _build_sop_eval_step(cfg, nets, use_vis: bool):
    from avsep_tpu.ops.metrics import eval_metrics
    from avsep_tpu.ops.stft import istft, stft_magphase
    from avsep_tpu.ops.warp import unwarp_mask

    @jax.jit
    def eval_step(params, batch_stats, dev, sub):
        err, (_, outputs) = sop_forward(nets, params, batch_stats, dev,
                                        cfg, sub, use_vis, False, 3)
        from avsep_tpu.engine import audio_mix_of
        mag_mix, phase_mix = stft_magphase(audio_mix_of(dev), cfg.stft_frame,
                                           cfg.stft_hop,
                                           use_pallas=cfg.use_pallas,
                                           dft=cfg.dft)
        pred = outputs["pred_masks"]
        if cfg.log_freq:
            pred = unwarp_mask(pred, HO=cfg.HS)
        if cfg.binary_mask:
            pred = (pred > cfg.mask_thres).astype(jnp.float32)
        spec = (mag_mix[:, None] * pred).astype(jnp.complex64) * \
            jnp.exp(1j * phase_mix[:, None].astype(jnp.complex64))
        wavs = jnp.clip(istft(spec, cfg.stft_hop, use_pallas=cfg.use_pallas,
                              dft=cfg.dft), -1, 1)
        # all-zero predictions -> noise floor so a dead mask scores a
        # large negative SDR instead of a spurious 0 dB (main harness /
        # reference main.py:248-249 parity)
        allzero = jnp.all(wavs == 0, axis=-1, keepdims=True)
        wavs = jnp.where(allzero,
                         0.01 * jax.random.uniform(sub, wavs.shape), wavs)
        m = eval_metrics(audios_of(dev)[..., :wavs.shape[-1]], wavs)
        m["err_ps"] = outputs["err_ps"]  # [B]
        return m

    return eval_step


def _sop_evaluate(cfg, nets, state, loader, history, itera, mesh=None):
    """val sweep for both branches using the SoP++ forward.

    Mirrors the main harness (``evaluate.evaluate``): batches are padded
    to one static mesh-divisible shape (no shape-change retraces on the
    ragged final batch), sharded across ``mesh`` when given, padded rows
    are excluded from every meter via the per-sample ``err_ps`` losses,
    and a per-sample results.csv is written per branch.
    """
    import csv

    from avsep_tpu.parallel.mesh import shard_batch

    n_shard = mesh.devices.size if mesh is not None else 1
    for use_vis in (True, False):
        meters = {k: AverageMeter() for k in
                  ("err", "sdr", "sir", "sar", "si_sdr")}
        eval_step = make_sop_eval_step(cfg, nets, use_vis)
        csv_ls = []

        rng = jax.random.PRNGKey(cfg.seed)
        pad_to = None
        for batch in loader:
            rng, sub = jax.random.split(rng)
            true_bs = len(batch["id"])
            if pad_to is None:
                pad_to = -(-true_bs // n_shard) * n_shard
            dev = {}
            for k, v in batch.items():
                # audio_mix is rebuilt on device (engine.audio_mix_of)
                if not isinstance(v, np.ndarray) or k == "audio_mix":
                    continue
                if v.shape[0] < pad_to:  # pad ragged batch; padded rows
                    # are trimmed from the meters below
                    reps = np.repeat(v[-1:], pad_to - v.shape[0], axis=0)
                    v = np.concatenate([v, reps], axis=0)
                dev[k] = v
            dev = encode_audio_wire(dev, cfg)
            if jax.process_count() > 1:
                # multi-host eval is replicate-mode: identical val loader
                # on every process, each ships its own rows
                from avsep_tpu.parallel.distributed import \
                    device_put_global
                dev = device_put_global(dev, mesh, mode="replicate")
            else:
                dev = (shard_batch(dev, mesh) if mesh is not None
                       else {k: jnp.asarray(v) for k, v in dev.items()})
            from avsep_tpu.parallel.distributed import fetch
            m = fetch(eval_step(state.params, state.batch_stats,
                                dev, sub))
            m = {k: v[:true_bs] for k, v in m.items()}
            meters["err"].update(float(np.mean(m["err_ps"])),
                                 weight=true_bs)
            for k in ("sdr", "sir", "sar", "si_sdr"):
                meters[k].update(float(np.mean(m[k])), weight=true_bs)
            for n in range(true_bs):
                csv_ls.append({"id": batch["id"][n],
                               "sdr": float(m["sdr"][n]),
                               "sir": float(m["sir"][n]),
                               "si-snr": float(m["si_sdr"][n])})
        key = "val_av" if use_vis else "val_ao"
        history[key]["iter"].append(itera)
        history[key]["err"].append(meters["err"].average())
        for k in ("sdr", "sir", "sar", "si_sdr"):
            history[key][k].append(meters[k].average())
        print("[SoP++ Eval] {} iter {}: SDR {:.3f} SIR {:.3f} SAR {:.3f} "
              "SI-SDR {:.3f}".format(key, itera, meters["sdr"].average(),
                                     meters["sir"].average(),
                                     meters["sar"].average(),
                                     meters["si_sdr"].average()))

        # per-sample results.csv (main harness parity, evaluate.py:162-168);
        # primary-only under multi-host
        from avsep_tpu.parallel.distributed import is_primary
        if is_primary():
            save_dir = os.path.join(cfg.ckpt, "visualization",
                                    "sop_av" if use_vis else "sop_ao")
            makedirs(save_dir, remove=False)
            with open(os.path.join(save_dir, "results.csv"), "w") as f:
                writer = csv.DictWriter(
                    f, fieldnames=["id", "sdr", "sir", "si-snr"])
                writer.writeheader()
                writer.writerows(csv_ls)


if __name__ == "__main__":
    cfg = parse_args()
    if cfg.fusion_type not in ("Base", "MatchAtt"):
        cfg = cfg.replace(fusion_type="Base")
    main(cfg)
