"""Forward engines: training losses and end-to-end separation.

TPU-native equivalent of the reference ``NetWrapper`` (``main.py:39-160``)
and the inference wrapper (``inference.py:29-136``), as pure jit-compiled
functions:

* STFT runs *inside* the jit region (the reference does per-sample librosa
  STFT in DataLoader workers, ``dataset/base.py:142-147``) — batches of raw
  waveforms stream to the device and the whole chain
  stft -> warp -> log -> U-Net -> masks -> unwarp -> iSTFT is one XLA program.
* ``forward_av`` reproduces the symmetric double pass: the U-Net runs once
  with the visual order reversed and once forward, losses averaged and match
  losses summed (``main.py:113-148``).
* ``forward_ao`` is the PIT path (``main.py:97-111``).
* ``forward_avmiximg`` is the MixVis duet path (``main.py:162-192``).

Batch layout (all batch-leading so dim 0 shards on the mesh 'data' axis):
  audio_mix [B, L], audios [B, N, L], frames [B, N, T, H, W, 3]
  (precomputed ``mag_mix``/``mags``/``phase_mix`` are accepted too).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avsep_tpu.config import Config
from avsep_tpu.data.wire import audios_of
from avsep_tpu.models.builder import ModelBuilder, activate
from avsep_tpu.models import criterion as crit
from avsep_tpu.ops.prepare import PreparedBatch, prepare
from avsep_tpu.ops.stft import istft, stft_magphase
from avsep_tpu.ops.warp import unwarp_mask


class Nets(NamedTuple):
    """Model definitions (reference builds (net_sound, net_frame) and,
    under --load_clips, a net_motion, main.py:608-625)."""
    sound: Any
    frame: Any
    motion: Any = None


def build_nets(cfg: Config) -> Nets:
    import flax.linen as nn
    import jax.numpy as _jnp
    dtype = {"float32": _jnp.float32, "bfloat16": _jnp.bfloat16}[cfg.dtype]
    sound = ModelBuilder.build_sound(
        arch=cfg.arch_sound, fc_dim=cfg.num_channels,
        fusion_type=cfg.fusion_type, att_type=cfg.att_type,
        num_sources=cfg.num_mix, att_temp=cfg.att_temp, dtype=dtype)
    frame = ModelBuilder.build_frame(
        arch=cfg.arch_frame, fc_dim=cfg.vis_channels,
        pool_type=cfg.img_pool, dtype=dtype)
    motion = None
    if cfg.fusion_type == "CoLoc_ClipAtt" and not cfg.load_clips:
        # the reference CRASHES here (get_fusion_net asserts,
        # fusion_net.py:18); we make the live clip-attention path work,
        # but it needs the clip stream
        raise ValueError("fusion_type=CoLoc_ClipAtt requires --load_clips "
                         "(the visual stream is the motion net over clips)")
    if cfg.load_clips:
        motion = ModelBuilder.build_motion(dtype=dtype)
    return Nets(sound, frame, motion)


# ------------------------------------------------------------------ helpers


def unused_visual_streams(cfg: Config) -> tuple:
    """Visual batch keys ``forward()`` never reads for this fusion config.

    The AV forward consumes exactly ONE visual stream — clips when
    fusion_type=CoLoc_ClipAtt, frames otherwise (engine.forward_av) — so
    loaders drop the other from the device dict like the AO iterator
    drops both (the host->device wire is the in-situ bottleneck on
    tunneled chips, BENCH_NOTES.md)."""
    if cfg.fusion_type == "CoLoc_ClipAtt":
        return ("frames",)
    return ("clips",)


def audio_mix_of(batch: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Mixture waveform: shipped, or reconstructed on device.

    The host mixes with ``np.sum`` over the N (=2) per-source waveforms
    already scaled by 1/N (dataset/music.py:120,127 semantics), so
    summing ``audios`` on device is bit-equal in float32 — the loaders
    drop ``audio_mix`` from the device dict to cut ~24% of the
    host->device bytes (the wire is the in-situ bottleneck on tunneled
    chips, BENCH_NOTES.md).  Under the opt-in int16 wire the sum is of
    the dequantized sources (lossy by the wire's ~90 dB SNR, see
    data/wire.py)."""
    if "audio_mix" in batch:
        return batch["audio_mix"]
    return jnp.sum(audios_of(batch), axis=1)


def batch_spectrograms(batch: Dict[str, jnp.ndarray], cfg: Config):
    """Magnitudes from waveforms on device, or pass through precomputed.

    Reproduces ``_mix_n_and_stft`` (dataset/base.py:174-189): the mixture is
    already the sum of per-source waveforms (each divided by N on the host,
    dataset/music.py:120).
    """
    if "mag_mix" in batch:
        return batch["mag_mix"], batch["mags"]
    mag_mix, _ = stft_magphase(audio_mix_of(batch), cfg.stft_frame,
                               cfg.stft_hop, use_pallas=cfg.use_pallas,
                               dft=cfg.dft)
    mags, _ = stft_magphase(audios_of(batch), cfg.stft_frame, cfg.stft_hop,
                            use_pallas=cfg.use_pallas, dft=cfg.dft)
    return mag_mix, mags


def _prepare(batch, cfg: Config) -> PreparedBatch:
    mag_mix, mags = batch_spectrograms(batch, cfg)
    return prepare(mag_mix, mags, log_freq=bool(cfg.log_freq),
                   weighted_loss=bool(cfg.weighted_loss),
                   binary_mask=bool(cfg.binary_mask))


def _maybe_remat(fn, cfg: Config):
    """Rematerialize a net forward during the backward pass when
    cfg.remat — trades FLOPs for HBM at large per-chip batch.  All static
    arguments are closed over; only arrays pass positionally."""
    return jax.checkpoint(fn) if cfg.remat else fn


# plain numpy on purpose: jnp.asarray at module scope would initialize
# the XLA backend at import time, breaking multi-host bring-up (jax.
# distributed.initialize must precede any backend touch — see main.py);
# inside traced code these become compile-time constants either way
_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """(x - ImageNet mean) / std for float RGB in [0, 1] (public helper —
    the single place the training-time normalization constants are
    applied; serve.py reuses it so the serving path cannot drift)."""
    return (x - _IMAGENET_MEAN) / _IMAGENET_STD


def normalize_frames(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 wire-format frames -> ImageNet-normalized float32, on device.

    The datasets ship frames as uint8 (4x fewer host->device bytes than
    float32; the /255-mean-std math rides the TPU's VPU inside the jit
    program instead of burning loader CPU).  Float inputs (demo paths,
    parity tests feeding pre-normalized arrays) pass through unchanged —
    the dtype dispatch is static under jit.
    """
    if x.dtype == jnp.uint8:
        return imagenet_normalize(x.astype(jnp.float32) * (1.0 / 255.0))
    return x


def _frame_features(nets: Nets, variables, frames_n, cfg: Config,
                    train: bool):
    """One source's frames -> activated feature map/vector
    (reference main.py:120-122)."""
    frames_n = normalize_frames(frames_n)
    kw = dict(pool=cfg.not_pool_vis, train=train)
    if train:
        def fwd(variables, frames_n):
            return nets.frame.apply(variables, frames_n,
                                    mutable=["batch_stats"], **kw)
        feats, updates = _maybe_remat(fwd, cfg)(variables, frames_n)
    else:
        feats, updates = nets.frame.apply(variables, frames_n, **kw), None
    return activate(feats, cfg.img_activation, upcast=False), updates


def _motion_features(nets: Nets, variables, clips_n, cfg: Config,
                     train: bool):
    """One source's clip -> activated spatio-temporal feature map, temporal
    mean over the fast-pathway output (mirrors ``forward_multiframe``'s
    pool=False reduction, reference vision_net.py:126-147).

    This is the LIVE motion branch: the reference builds/checkpoints
    net_motion under --load_clips but never calls it in a forward, and its
    CoLoc_ClipAtt fusion type asserts (reference fusion_net.py:18,
    main.py:624-625).  Here ``fusion_type=CoLoc_ClipAtt`` runs CoLoc
    attention against these motion maps instead of static frame features
    (the fast pathway's 256 output channels match the flagship U-Net's
    256-dim bottleneck chunks).
    """
    clips_n = normalize_frames(clips_n)
    if train:
        def fwd(variables, clips_n):
            return nets.motion.apply(variables, clips_n, train=True,
                                     mutable=["batch_stats"])
        feats, updates = _maybe_remat(fwd, cfg)(variables, clips_n)
    else:
        feats, updates = nets.motion.apply(variables, clips_n,
                                           train=False), None
    feats = jnp.mean(feats, axis=1)  # [B, T, h, w, C] -> [B, h, w, C]
    return activate(feats, cfg.img_activation, upcast=False), updates


def _sound_forward(nets: Nets, variables, log_mag, v, cfg: Config,
                   train: bool, rng=None, option=None):
    kw = dict(train=train, option=option)
    x = log_mag[..., None]  # [B, F, T] -> NHWC
    if train:
        def fwd(variables, x, v, rng):
            return nets.sound.apply(variables, x, v, fusion_rng=rng,
                                    mutable=["batch_stats"], **kw)
        (pred, meta), updates = _maybe_remat(fwd, cfg)(variables, x, v, rng)
    else:
        (pred, meta), updates = nets.sound.apply(
            variables, x, v, fusion_rng=rng, **kw), None
    return pred, meta, updates


# ------------------------------------------------------------ forward passes


def forward_ao(nets: Nets, params, batch_stats, batch, cfg: Config,
               rng: jax.Array, train: bool):
    """Audio-only PIT forward (reference main.py:97-111)."""
    prep = _prepare(batch, cfg)
    sound_vars = {"params": params["sound"],
                  "batch_stats": batch_stats["sound"]}
    pred, _, upd = _sound_forward(nets, sound_vars, prep.log_mag_mix, None,
                                  cfg, train, rng=rng)
    pred_masks = activate(pred, cfg.output_activation)  # [B, H, W, C]

    gt = jnp.moveaxis(prep.gt_masks, 1, -1)             # [B, H, W, N]
    w = jnp.stack([prep.weights] * pred_masks.shape[-1], axis=-1)
    losses, perms = crit.pit_loss(pred_masks, gt, w, kind="bce")
    err = jnp.mean(losses)
    ordered = crit.reorder_sources(pred_masks, perms)

    new_stats = dict(batch_stats)
    if upd is not None:
        new_stats["sound"] = upd["batch_stats"]
    outputs = {"pred_masks": jnp.moveaxis(ordered, -1, 1),  # [B, N, H, W]
               "gt_masks": prep.gt_masks, "mag_mix": prep.mag_mix,
               "mags": prep.mags, "weight": prep.weights,
               "match_loss": jnp.zeros(()),
               "err_ps": losses, "match_ps": jnp.zeros_like(losses)}
    return err, (new_stats, outputs)


def forward_av(nets: Nets, params, batch_stats, batch, cfg: Config,
               rng: jax.Array, train: bool):
    """Audio-visual symmetric double forward (reference main.py:113-148):
    pass 1 with visual order reversed vs reversed GT, pass 2 forward; loss =
    (err1 + err0)/2 + match_weight * (match1 + match0)."""
    prep = _prepare(batch, cfg)
    N = cfg.num_mix

    # visual stream: static frames through the ResNet (default), or — the
    # live motion branch — per-source clips through ResNet3dFastOnly when
    # fusion_type=CoLoc_ClipAtt (see _motion_features)
    use_motion = cfg.fusion_type == "CoLoc_ClipAtt"
    vkey = "motion" if use_motion else "frame"
    vis_features = _motion_features if use_motion else _frame_features
    vstream = batch["clips"] if use_motion else batch["frames"]

    frame_vars = {"params": params[vkey],
                  "batch_stats": batch_stats[vkey]}
    feats = []
    fstats = frame_vars
    for n in range(N):
        f, upd = vis_features(nets, fstats, vstream[:, n], cfg, train)
        feats.append(f)
        if upd is not None:
            fstats = {"params": params[vkey],
                      "batch_stats": upd["batch_stats"]}

    sound_vars = {"params": params["sound"],
                  "batch_stats": batch_stats["sound"]}

    def one_pass(vis_list, gt, svars, pass_rng):
        v = jnp.stack(vis_list)  # [C, B, h, w, Dv]
        pred, meta, upd = _sound_forward(nets, svars, prep.log_mag_mix, v,
                                         cfg, train, rng=pass_rng)
        preds = [activate(pred[..., n], cfg.output_activation)
                 for n in range(N)]
        ps = jnp.stack(preds)
        gts = jnp.moveaxis(gt, 1, 0)
        err_ps = crit.multi_source_loss(ps, gts, prep.weights, kind=cfg.loss,
                                        per_sample=True)
        # scalar == mean of per-sample exactly (equal element counts) —
        # one elementwise BCE pass instead of two
        return preds, jnp.mean(err_ps), err_ps, meta, upd

    r1, r0 = (jax.random.split(rng) if rng is not None else (None, None))
    _, err1, ps1, meta1, upd1 = one_pass(feats[::-1], prep.gt_masks[:, ::-1],
                                         sound_vars, r1)
    svars2 = sound_vars if upd1 is None else {
        "params": params["sound"], "batch_stats": upd1["batch_stats"]}
    preds0, err0, ps0, meta0, upd0 = one_pass(feats, prep.gt_masks, svars2,
                                              r0)

    match_loss = meta1.match_loss + meta0.match_loss
    match_ps = meta1.match_ps + meta0.match_ps
    err = (err1 + err0) / 2.0 + cfg.match_weight * match_loss
    err_ps = (ps1 + ps0) / 2.0 + cfg.match_weight * match_ps

    new_stats = dict(batch_stats)
    if upd0 is not None:
        new_stats["sound"] = upd0["batch_stats"]
        new_stats[vkey] = fstats["batch_stats"]
    outputs = {"pred_masks": jnp.stack([p for p in preds0], axis=1),
               "gt_masks": prep.gt_masks, "mag_mix": prep.mag_mix,
               "mags": prep.mags, "weight": prep.weights,
               "match_loss": match_loss, "att_maps": meta0.att_maps,
               "err_ps": err_ps, "match_ps": match_ps}
    return err, (new_stats, outputs)


def forward_avmiximg(nets: Nets, params, batch_stats, batch, cfg: Config,
                     rng: jax.Array, train: bool):
    """MixVis duet path: frames concatenated along width into one mixture
    image, PIT loss over the masks (reference main.py:162-192)."""
    prep = _prepare(batch, cfg)
    N = cfg.num_mix
    if N != 2:
        # the mixture-visual formulation is inherently two-source (one
        # duet image, two bottleneck chunks — reference
        # fusion_net.py:229-311); CoLoc/hidsep is the N-source path
        raise ValueError(
            f"fusion_type=MixVis supports num_mix=2 only (got {N})")

    frame_vars = {"params": params["frame"],
                  "batch_stats": batch_stats["frame"]}
    # [B, N, T, H, W, 3] -> concat along width
    mix_frames = jnp.concatenate(
        [batch["frames"][:, n] for n in range(N)], axis=-2)
    feat, fupd = _frame_features(nets, frame_vars, mix_frames, cfg, train)

    sound_vars = {"params": params["sound"],
                  "batch_stats": batch_stats["sound"]}
    v = jnp.stack([feat])  # single mixture map
    pred, meta, supd = _sound_forward(nets, sound_vars, prep.log_mag_mix, v,
                                      cfg, train, rng=rng)
    pred_masks = activate(pred, cfg.output_activation)  # [B, H, W, S]

    gt = jnp.moveaxis(prep.gt_masks, 1, -1)
    w = jnp.stack([prep.weights] * N, axis=-1)
    losses, perms = crit.pit_loss(pred_masks, gt, w, kind="bce")
    err = jnp.mean(losses) + meta.match_loss * cfg.match_weight
    err_ps = losses + meta.match_ps * cfg.match_weight
    ordered = crit.reorder_sources(pred_masks, perms)

    new_stats = dict(batch_stats)
    if supd is not None:
        new_stats["sound"] = supd["batch_stats"]
        new_stats["frame"] = fupd["batch_stats"]
    outputs = {"pred_masks": jnp.moveaxis(ordered, -1, 1),
               "gt_masks": prep.gt_masks, "mag_mix": prep.mag_mix,
               "mags": prep.mags, "weight": prep.weights,
               "match_loss": meta.match_loss, "maps": meta.att_maps,
               "err_ps": err_ps, "match_ps": meta.match_ps}
    return err, (new_stats, outputs)


def forward(nets: Nets, params, batch_stats, batch, cfg: Config,
            rng: jax.Array, use_vis: bool, train: bool):
    """Dispatch like reference NetWrapper.forward (main.py:150-160)."""
    if use_vis:
        if cfg.fusion_type == "MixVis":
            return forward_avmiximg(nets, params, batch_stats, batch, cfg,
                                    rng, train)
        return forward_av(nets, params, batch_stats, batch, cfg, rng, train)
    return forward_ao(nets, params, batch_stats, batch, cfg, rng, train)


# --------------------------------------------------------------- separation


def separate(nets: Nets, params, batch_stats, audio_mix: jnp.ndarray,
             frames: Optional[jnp.ndarray], cfg: Config,
             rng: Optional[jax.Array] = None,
             share_blank: bool = False) -> Dict[str, jnp.ndarray]:
    """End-to-end batched separation: waveform mixture -> per-source wavs.

    The fused on-device pipeline of reference ``inference.py``
    (prepare_inferdata :39-52, forward_av/ao :54-86, recover_aud :433-491):
    stft -> +1e-10 -> warp -> log -> U-Net -> sigmoid -> unwarp ->
    binary-threshold -> mask * mag -> iSTFT with mixture phase.

    Args:
      audio_mix: [B, L] mixture waveforms.
      frames: [B, N, T, H, W, 3] (AV), [B, 1, T, H, W, 3] (duet), or None (AO).
    Returns dict with 'wavs' [B, N, L'], 'masks_linear' [B, N, F, T],
    'masks' [B, N, FO, T], 'att_maps' (AV only).
    """
    mag_mix, phase_mix = stft_magphase(audio_mix, cfg.stft_frame,
                                       cfg.stft_hop,
                                       use_pallas=cfg.use_pallas,
                                       dft=cfg.dft)
    prep = prepare(mag_mix, mag_mix[:, None],  # mags unused here
                   log_freq=bool(cfg.log_freq), weighted_loss=False,
                   binary_mask=True)
    sound_vars = {"params": params["sound"],
                  "batch_stats": batch_stats["sound"]}

    # the fusion 'duet' spatial-concat option is dead in the REFERENCE
    # too: fusion_net.py:83-90 implements it but no reference caller ever
    # passes option='duet' (fork drift, like duet_vis_rate).  The live
    # duet demo path instead duplicates the single visual stream below
    # (reference inference.py:65-73).  The implementation is kept (and
    # pinned by tests/test_duet_option.py) for parity with the module
    # surface; this constant records that no production caller draws the
    # reference's host-side concat coin.
    option = None
    if frames is not None:
        # normalize BEFORE any blanking: the reference's blank frame is
        # zeros in normalized space (share_forward zeroes the transformed
        # tensor, inference.py:103-107), not a black RGB image
        frames = normalize_frames(frames)
    if share_blank and frames is not None:
        # 'share' audio-only mode: feed an all-black frame so the shared
        # visual stream carries no information (reference inference.py
        # share_forward :103-107)
        frames = jnp.zeros_like(frames)
    if frames is None:
        v = None
    else:
        frame_vars = {"params": params["frame"],
                      "batch_stats": batch_stats["frame"]}
        n_streams = frames.shape[1]
        duet = n_streams == 1 and cfg.fusion_type != "MixVis"
        feats = []
        for n in range(n_streams):
            if duet and not share_blank:
                # duet: the reference feeds the duplicated frame feature
                # WITHOUT img_activation (inference.py:71-73), unlike the
                # non-duet branch (:76-77) and the share path (:100-107)
                # which both activate.  Almost certainly a reference
                # quirk, matched exactly for demo-output parity.
                f = nets.frame.apply(frame_vars, frames[:, n],
                                     pool=cfg.not_pool_vis, train=False)
            else:
                f, _ = _frame_features(nets, frame_vars, frames[:, n], cfg,
                                       False)
            feats.append(f)
        if duet:
            # one visual stream duplicated (reference inference.py:65-73)
            feats = feats * 2
        v = jnp.stack(feats)

    pred, meta, _ = _sound_forward(nets, sound_vars, prep.log_mag_mix, v,
                                   cfg, False, rng=rng, option=option)
    masks = activate(pred, cfg.output_activation)        # [B, FO, T, C]
    masks = jnp.moveaxis(masks, -1, 1)                   # [B, C, FO, T]
    masks_linear = unwarp_mask(masks, HO=cfg.HS)         # [B, C, F, T]
    if cfg.binary_mask:
        masks_linear = (masks_linear > cfg.mask_thres).astype(jnp.float32)

    pred_mag = mag_mix[:, None] * masks_linear
    wavs = istft(pred_mag.astype(jnp.complex64)
                 * jnp.exp(1j * phase_mix[:, None].astype(jnp.complex64)),
                 hop=cfg.stft_hop, use_pallas=cfg.use_pallas, dft=cfg.dft)
    wavs = jnp.clip(wavs, -1.0, 1.0)
    return {"wavs": wavs, "masks_linear": masks_linear, "masks": masks,
            "mag_mix": mag_mix, "phase_mix": phase_mix,
            "att_maps": meta.att_maps}
