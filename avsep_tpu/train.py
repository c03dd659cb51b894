"""Training: optimizer, train state, jit-compiled train steps.

Reference semantics reproduced (``main.py:536-601``):

* SGD, momentum 0.9, weight decay 1e-4, per-group LRs — ``net_sound`` and
  ``net_frame.fc`` at ``lr_sound``, ``net_frame.features`` at ``lr_frame``
  (frozen if ``fix_vis``), all decayed x0.1 at each step in ``lr_steps``
  (``create_optimizer`` main.py:536-547, ``adjust_learning_rate`` :550-555).
* One train step = forward (AV or AO), backward, SGD update
  (``train_step`` main.py:557-569).
* AV/AO interleaving: an AV batch every ``iter_per_av`` iterations with
  ``start_av_first``/``num_fsteps`` gating (``get_av_ao_batch``
  main.py:572-601).

TPU-first: the step is one jit program per branch (AV / AO — static batch
shapes, no data-dependent control flow), parameters replicated over the
mesh, batch sharded on the ``data`` axis; XLA inserts the gradient psum.
Unlike the reference, optimizer state and LR-schedule position live in the
checkpointed TrainState (the reference loses both on resume, SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from avsep_tpu.config import Config
from avsep_tpu.engine import Nets, build_nets, forward
from avsep_tpu.models.torch_import import (
    resnet_from_torch, unet_from_torch)


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    opt_state: Any


def _lr_schedule(base: float, lr_steps) -> optax.Schedule:
    """base * 0.1^(steps passed) — reference adjust_learning_rate."""
    if not lr_steps:
        return optax.constant_schedule(base)
    return optax.piecewise_constant_schedule(
        base, {int(s): 0.1 for s in lr_steps})


def _param_labels(params) -> Dict:
    """sound/* and frame/fc -> 'sound' group; frame/features -> 'frame';
    optional motion/* -> 'motion' (reference create_optimizer,
    main.py:536-547)."""
    def frame_label(path_key):
        return "sound" if path_key == "fc" else "frame"
    labels = {
        "sound": jax.tree_util.tree_map(lambda _: "sound", params["sound"]),
        "frame": {k: jax.tree_util.tree_map(lambda _: frame_label(k), v)
                  for k, v in params["frame"].items()},
    }
    if "motion" in params:
        labels["motion"] = jax.tree_util.tree_map(lambda _: "motion",
                                                  params["motion"])
    return labels


def make_optimizer(cfg: Config, params) -> optax.GradientTransformation:
    def group(lr):
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(_lr_schedule(lr, cfg.lr_steps), momentum=cfg.beta1))

    transforms = {"sound": group(cfg.lr_sound),
                  "frame": (optax.set_to_zero() if cfg.fix_vis
                            else group(cfg.lr_frame))}
    if "motion" in params:
        transforms["motion"] = group(cfg.lr_motion)
    return optax.multi_transform(transforms, _param_labels(params))


def init_state(cfg: Config, nets: Nets, rng: jax.Array,
               mesh=None) -> TrainState:
    """Initialize params (+ optional reference .pth import) and optimizer."""
    B = 2  # init shapes are batch-size independent
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jnp.zeros((B, 256, 256, 1), jnp.float32)
    v = jnp.zeros((cfg.num_mix, B, 14, 14, cfg.vis_channels), jnp.float32)
    sound_vars = nets.sound.init(k1, x, v, train=False)
    frames = jnp.zeros((B, 3 if not cfg.one_frame else 1, cfg.imgSize,
                        cfg.imgSize, 3), jnp.float32)
    frame_vars = nets.frame.init(k2, frames, pool=cfg.not_pool_vis,
                                 train=False)

    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}

    if cfg.load_clips:
        # motion branch: vestigial in the reference (built/checkpointed but
        # never called, main.py:624-625); LIVE here when
        # fusion_type=CoLoc_ClipAtt (engine._motion_features)
        if nets.motion is not None:
            motion = nets.motion
        else:
            from avsep_tpu.models.motion import ResNet3dFastOnly
            motion = ResNet3dFastOnly()
        mvars = motion.init(k3, jnp.zeros((1, 4, 64, 64, 3)), train=False)
        params["motion"] = mvars["params"]
        stats["motion"] = mvars["batch_stats"]

    if cfg.weights_sound and cfg.weights_sound.endswith(".pth"):
        from avsep_tpu.models.torch_import import load_torch_checkpoint
        p, s = unet_from_torch(load_torch_checkpoint(cfg.weights_sound),
                               num_downs=int(cfg.arch_sound[-1]))
        params["sound"], stats["sound"] = p, s
    if cfg.weights_frame and cfg.weights_frame.endswith(".pth"):
        from avsep_tpu.models.torch_import import load_torch_checkpoint
        p, s = resnet_from_torch(load_torch_checkpoint(cfg.weights_frame))
        # torchvision ImageNet dicts carry no conv fc head (theirs is the 2D
        # 1000-class linear, skipped by the converter) — keep the freshly
        # initialized fc, like the reference which only pretrains the trunk
        # (models/__init__.py:65-78)
        params["frame"] = {**params["frame"], **p}
        stats["frame"] = {**stats["frame"], **s}

    opt = make_optimizer(cfg, params)
    opt_state = opt.init(params)
    state = TrainState(jnp.zeros((), jnp.int32), params, stats, opt_state)
    if mesh is not None:
        from avsep_tpu.parallel.mesh import shard_tree
        state = shard_tree(state, mesh)
    return state


def make_train_step(cfg: Config, nets: Nets, use_vis: bool):
    """Returns a jitted (state, batch, rng) -> (state, metrics) step."""

    def loss_fn(params, batch_stats, batch, rng):
        err, (new_stats, outputs) = forward(
            nets, params, batch_stats, batch, cfg, rng, use_vis, train=True)
        return err, (new_stats, outputs["match_loss"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, batch, rng) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (err, (new_stats, match_loss)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng)
        opt = make_optimizer(cfg, state.params)
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        # torch SGD skips parameters whose grad is None: nets outside the
        # step's graph receive NO weight decay or momentum advance in the
        # reference (torch/optim/sgd "if p.grad is None: continue").
        # jax.grad instead returns zeros for unused params, which optax's
        # add_decayed_weights would turn into a slow decay of the
        # (ImageNet-pretrained) visual backbone over the ~50% of
        # iterations that are audio-only (reference main.py:97-111,
        # 557-569).  Zero the dead nets' updates and carry their optimizer
        # state through unchanged.  (Residual inexactness: net_frame.fc
        # rides the "sound" label group (reference main.py:544), so its
        # momentum buffer still advances by the decay term in AO steps —
        # its PARAM stays exactly frozen like the reference's.)
        if use_vis:
            live = ({"sound", "motion"}
                    if cfg.fusion_type == "CoLoc_ClipAtt"
                    else {"sound", "frame"})
        else:
            live = {"sound"}
        if set(updates) - live:
            updates = {k: (u if k in live else
                           jax.tree_util.tree_map(jnp.zeros_like, u))
                       for k, u in updates.items()}
            opt_state = opt_state._replace(inner_states={
                k: (v if k in live
                    else state.opt_state.inner_states[k])
                for k, v in opt_state.inner_states.items()})
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(state.step + 1, params, new_stats, opt_state)
        return new_state, {"err": err, "match_loss": match_loss}

    return step


def batch_scheduler(cfg: Config):
    """use_vis decision per iteration (reference get_av_ao_batch,
    main.py:572-601): AV every ``iter_per_av`` iters, with the
    ``start_av_first``/``num_fsteps`` warm-up gate."""
    def use_vis(i: int) -> bool:
        if cfg.start_av_first:
            return i % cfg.iter_per_av == 0 or i < cfg.num_fsteps
        return i % cfg.iter_per_av == 0 and i > cfg.num_fsteps
    return use_vis
