"""SoP++ forward engine: 3-stage curriculum + audio-only PIT.

Equivalent of reference ``SoP++/main.py`` NetWrapper (:39-246): a 4-net
decomposition — basis U-Net (``net_sound``), frame encoder (``net_frame``),
InnerProd synthesizer (``net_synthesizer``), PIT attention module
(``net_pit``) — trained with a 3-stage curriculum:

1. SoP-style: per-source pooled visual vectors drive the synthesizer
   (``train_av_forward1`` :94-127).
2. + frozen separated visual features; ``net_pit`` on the concatenated duet
   image adds a regularization loss (``train_av_forward2`` :129-170).
3. ``net_pit`` context features drive the synthesizer; match + reg losses
   (``train_av_forward3`` :172-213).

AO: ``net_pit`` slots from the bottleneck feature weights + PIT BCE
(``ao_forward`` :215-246).  Stage switching per ``train_steps``
(``train_step_3stage`` :670-688).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.engine import _prepare, normalize_frames
from avsep_tpu.models import criterion as crit
from avsep_tpu.models.builder import activate
from avsep_tpu.models.sop import get_attmodule


class SopNets(NamedTuple):
    sound: Any        # BasisUnet
    frame: Any        # FrameEncoder
    synthesizer: Any  # InnerProd / Bias
    pit: Any          # att_model / match_att (pure fn via get_attmodule)


def stage_for_iter(i: int, train_steps) -> int:
    """Reference train_step_3stage (SoP++/main.py:670-688)."""
    if i < train_steps[0]:
        return 1
    if train_steps[0] <= i < train_steps[1]:
        return 2
    return 3


def _apply_frame(nets: SopNets, params, stats, frames_n, cfg: Config,
                 train: bool, stop_grad: bool = False):
    frames_n = normalize_frames(frames_n)  # uint8 wire format -> float32
    variables = {"params": params["frame"], "batch_stats": stats["frame"]}
    kw = dict(pool=cfg.not_pool_vis, train=train and not stop_grad)
    if train and not stop_grad:
        out, upd = nets.frame.apply(variables, frames_n,
                                    mutable=["batch_stats"], **kw)
    else:
        out, upd = nets.frame.apply(variables, frames_n, **kw), None
    out = activate(out, cfg.img_activation, upcast=False)
    if stop_grad:
        out = jax.lax.stop_gradient(out)
    return out, upd


def _apply_sound(nets: SopNets, params, stats, log_mag, cfg: Config,
                 train: bool):
    variables = {"params": params["sound"], "batch_stats": stats["sound"]}
    x = log_mag[..., None]
    if train:
        (basis, fw), upd = nets.sound.apply(variables, x, train=True,
                                            mutable=["batch_stats"])
    else:
        (basis, fw), upd = nets.sound.apply(variables, x, train=False), None
    basis = activate(basis, cfg.sound_activation, upcast=False)
    return basis, fw, upd


def _split_feat_weights(fw: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B, h, w, extra*C] -> [C, B, h, w, extra] (tensor_split dim=1,
    SoP++/main.py:103)."""
    B, h, w, D = fw.shape
    per = D // n
    return jnp.stack([fw[..., i * per:(i + 1) * per] for i in range(n)])


def _synthesize(nets: SopNets, params, ctx_n: jnp.ndarray,
                basis: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """InnerProd mask for one source (SoP++/main.py:119-121)."""
    mask = nets.synthesizer.apply({"params": params["synthesizer"]},
                                  ctx_n, basis)
    return activate(mask[..., 0], cfg.output_activation)  # [B, H, W]


def sop_forward(nets: SopNets, params, batch_stats, batch, cfg: Config,
                rng, use_vis: bool, train: bool, stage: int = 3):
    """Dispatch (reference SoP++/main.py:249-260)."""
    prep = _prepare(batch, cfg)
    N = cfg.num_mix
    att = get_attmodule(cfg.fusion_type) if cfg.fusion_type in (
        "Base", "MatchAtt") else get_attmodule("Base")

    basis, fw, supd = _apply_sound(nets, params, batch_stats,
                                   prep.log_mag_mix, cfg, train)
    feat_weights = _split_feat_weights(fw, N)     # [C, B, h, w, extra]

    new_stats = dict(batch_stats)
    if supd is not None:
        new_stats["sound"] = supd["batch_stats"]

    if not use_vis:
        # ---------------- AO: net_pit slots + PIT BCE (:215-246)
        out = att(feat_weights, None, None, att_type=cfg.att_type)
        preds = jnp.stack(
            [_synthesize(nets, params, out.ctx_feats[:, n], basis, cfg)
             for n in range(N)], axis=-1)          # [B, H, W, C]
        gt = jnp.moveaxis(prep.gt_masks, 1, -1)
        w = jnp.stack([prep.weights] * N, axis=-1)
        losses, perms = crit.pit_loss(preds, gt, w, kind="bce")
        err = jnp.mean(losses)
        ordered = crit.reorder_sources(preds, perms)
        outputs = {"pred_masks": jnp.moveaxis(ordered, -1, 1),
                   "gt_masks": prep.gt_masks, "mag_mix": prep.mag_mix,
                   "mags": prep.mags, "weight": prep.weights,
                   "match_loss": jnp.zeros(()),
                   "err_ps": losses}  # [B] per-sample PIT losses
        return err, (new_stats, outputs)

    # ---------------- AV stages
    frames = batch["frames"]                       # [B, N, T, H, W, 3]
    stop_sep = stage in (2, 3)  # sep feats frozen in stages 2/3 (:139-143)
    sep_feats = []
    fupd = None
    for n in range(N):
        f, u = _apply_frame(nets, params, new_stats, frames[:, n], cfg,
                            train, stop_grad=stop_sep)
        sep_feats.append(f)
        if u is not None:
            fupd = u
            new_stats = dict(new_stats)
            new_stats["frame"] = u["batch_stats"]
    sep_vis = jnp.stack(sep_feats)                 # [C, B, H, W, D]

    match_loss = jnp.zeros(())
    if stage == 1:
        ctx = jnp.moveaxis(jnp.mean(sep_vis, axis=(2, 3)), 0, 1)  # [B,C,D]
        ctx = activate(ctx, cfg.output_activation)
        extra_loss = jnp.zeros(())
    else:
        # mixture image: frames concatenated along width (:147-149)
        mix_frames = jnp.concatenate([frames[:, n] for n in range(N)],
                                     axis=-2)
        mix_vis, u = _apply_frame(nets, params, new_stats, mix_frames, cfg,
                                  train)
        if u is not None:
            new_stats = dict(new_stats)
            new_stats["frame"] = u["batch_stats"]
        out = att(feat_weights, mix_vis, sep_vis, att_type=cfg.att_type)
        reg = out.reg_loss if out.reg_loss is not None else jnp.zeros(())
        mtc = out.match_loss if out.match_loss is not None else jnp.zeros(())
        if stage == 2:
            ctx = jnp.moveaxis(jnp.mean(sep_vis, axis=(2, 3)), 0, 1)
            ctx = activate(ctx, cfg.output_activation)
            extra_loss = reg * cfg.match_weight
            match_loss = reg
        else:  # stage 3: pit ctx drives the synthesizer (:193-206)
            ctx = activate(out.ctx_feats, cfg.output_activation)
            extra_loss = (reg + mtc) * cfg.match_weight
            match_loss = reg + mtc

    preds = jnp.stack(
        [_synthesize(nets, params, ctx[:, n], basis, cfg)
         for n in range(N)], axis=1)               # [B, N, H, W]
    # [B] per-sample losses whose mean equals the batch scalar (padding-
    # clean eval meters; the scalar extra_loss is shared across samples)
    err_ps = crit.multi_source_loss(
        jnp.moveaxis(preds, 1, 0), jnp.moveaxis(prep.gt_masks, 1, 0),
        prep.weights, kind=cfg.loss, per_sample=True)
    err = jnp.mean(err_ps)
    if stage > 1:
        err = err + extra_loss
        err_ps = err_ps + extra_loss
    outputs = {"pred_masks": preds, "gt_masks": prep.gt_masks,
               "mag_mix": prep.mag_mix, "mags": prep.mags,
               "weight": prep.weights, "match_loss": match_loss,
               "err_ps": err_ps}
    return err, (new_stats, outputs)
