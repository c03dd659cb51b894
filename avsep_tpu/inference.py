"""Single-clip separation demo + attention-overlay videos.

Equivalent of reference ``inference.py`` (NetWrapper :29-136, get_audio
:230-252, vis_video :537-578, recover_aud :433-491, plot_save_att
:493-534): load a checkpoint, take one duet (or synthetic mix) clip, run
separation, and write separated wavs, mask jpgs, attention-overlay videos,
and AV-muxed mp4s.

TPU-first difference: the reference forwards the network once per display
frame in a Python loop (``inference.py:557-569``); here all display frames
of the 6-second window batch into ONE device call — the audio branch is
computed once and the visual branch is batched over frames.
"""

from __future__ import annotations

import os
import random
from typing import List, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config, parse_args
from avsep_tpu.data.audio_io import read_wav, resample, write_wav
from avsep_tpu.data.video_transforms import val_transform
from avsep_tpu.engine import Nets, build_nets, separate
from avsep_tpu.utils.jit_cache import JitStepCache

_SEPARATE_STEPS = JitStepCache()
from avsep_tpu.utils.media import (
    combine_video_audio, magnitude2heatmap, makedirs, save_video)

AUD_SEC = 6  # fixed demo window (reference inference.py:198)


def get_demo_audio(a_path: str, num_f, fps, a_len, cfg: Config,
                   seed: int = 8):
    """Random 6 s window (reference get_audfuncs, inference.py:197-228)."""
    rng = random.Random(seed)
    act_len = min(int(num_f) / float(fps), float(a_len))
    start, end = AUD_SEC / 2, act_len - AUD_SEC / 2
    c_t = rng.uniform(start, end)
    wav = np.zeros(cfg.audLen, np.float32)
    raw, sr = read_wav(a_path, c_t - AUD_SEC / 2, AUD_SEC)
    raw = resample(raw, sr, cfg.audRate)
    center_idx = int((AUD_SEC / 2) * cfg.audRate)
    s = max(0, center_idx - cfg.audLen // 2)
    e = min(len(raw), center_idx + cfg.audLen // 2 + cfg.audLen % 2)
    wav[: e - s] = raw[s:e]
    np.clip(wav, -1.0, 1.0, out=wav)
    return wav, c_t


def load_display_frames(fdir: str, center_t: float, fps: float,
                        cfg: Config, span_sec: float = AUD_SEC
                        ) -> List[np.ndarray]:
    """All display frames over the window (reference vis_video loop)."""
    n = int(round(fps * span_sec))
    start = int(round((center_t - span_sec / 2) * fps))
    frames = []
    for i in range(n):
        p = os.path.join(fdir, "{:06d}.jpg".format(max(start + i, 0)))
        img = Image.open(p).convert("RGB")
        frames.append(val_transform([img], cfg.imgSize)[0])
    return frames


def attention_overlay(frame_norm: np.ndarray, att_map: np.ndarray
                      ) -> np.ndarray:
    """JET heatmap blended 0.4/0.6 over the frame (reference
    plot_save_att, inference.py:509-534)."""
    import cv2
    from avsep_tpu.data.video_transforms import denormalize
    rgb = denormalize(frame_norm)
    H, W = rgb.shape[:2]
    att = np.asarray(att_map, np.float64)
    att = (att - att.min()) / (att.max() - att.min() + 1e-8)
    heat = cv2.applyColorMap((att * 255).astype(np.uint8),
                             cv2.COLORMAP_JET)[:, :, ::-1]
    heat = cv2.resize(heat, (W, H))
    return (0.6 * rgb + 0.4 * heat).astype(np.uint8)


def vis_video(cfg: Config, nets: Nets, params, batch_stats, duet_info,
              save_folder: str, use_vis: bool = True,
              write_att_videos: bool = True) -> None:
    """Attention video demo for one duet clip (reference vis_video,
    inference.py:537-578).  ``write_att_videos=False`` keeps the audio
    artifacts (wavs + mask jpgs) but skips the expensive per-frame
    attention-overlay mp4 rendering — used by ``duet_sweep`` to honor
    ``--duet_vis_rate``."""
    a_path, fdir, num_f, fps, a_len = duet_info[:5]
    fps = float(fps)
    wav, c_t = get_demo_audio(a_path, num_f, fps, a_len, cfg)
    frames = load_display_frames(fdir, c_t, fps, cfg)
    T = len(frames)

    # ONE batched device call: mixture audio replicated across the T frames
    audio_mix = jnp.asarray(np.broadcast_to(wav, (T, cfg.audLen)).copy())
    frames_arr = jnp.asarray(np.stack(frames)[:, None, None])  # [T,1,1,H,W,3]

    # jit the whole pipeline (eager complex ops are unsupported on some
    # TPU runtimes; under jit XLA compiles them fine).  The jitted fn is
    # cached per (cfg, nets, use_vis) — duet_sweep calls vis_video per
    # manifest row, and a fresh closure per row would recompile the whole
    # program every time; params pass as arguments, not baked constants.
    run = _SEPARATE_STEPS.get_or_build(
        (cfg, nets), use_vis, lambda: jax.jit(
            lambda params, batch_stats, a, f: separate(
                nets, params, batch_stats, a, f if use_vis else None, cfg,
                rng=jax.random.PRNGKey(0))))
    out = jax.device_get(run(params, batch_stats, audio_mix, frames_arr))

    makedirs(save_folder, remove=False)
    mid = T // 2
    # separated audio from the mid frame (reference recover_aud :433-491)
    for n in range(cfg.num_mix):
        write_wav(os.path.join(save_folder, f"pred{n + 1}.wav"),
                  out["wavs"][mid, n], cfg.audRate)
        mask_img = (np.clip(out["masks"][mid, n], 0, 1) * 255).astype(
            np.uint8)
        from imageio import imwrite
        imwrite(os.path.join(save_folder, f"predmask{n + 1}.jpg"),
                mask_img[::-1])
    write_wav(os.path.join(save_folder, "mix.wav"), wav, cfg.audRate)
    from imageio import imwrite
    imwrite(os.path.join(save_folder, "mix.jpg"),
            magnitude2heatmap(out["mag_mix"][mid])[::-1])

    if write_att_videos and use_vis and out["att_maps"] is not None:
        att = out["att_maps"]  # [T, C, h, w]
        for n in range(cfg.num_mix):
            overlays = np.stack([
                attention_overlay(frames[t], att[t, n]) for t in range(T)])
            vid = os.path.join(save_folder, f"att{n + 1}.mp4")
            save_video(vid, overlays, fps=fps)
            combine_video_audio(
                vid, os.path.join(save_folder, f"pred{n + 1}.wav"),
                os.path.join(save_folder, f"att_av{n + 1}.mp4"))
    print(f"Saved demo to {save_folder}")


def synthesis_demo(cfg: Config, nets: Nets, params, batch_stats,
                   info_a, info_b, save_folder: str) -> None:
    """Synthetic 2-mix demo: mix two solo clips (sum / N, reference
    get_sythesis_audio, inference.py:237-252), run AV separation with each
    clip's center frame, write separated wavs + masks."""
    wav_a, ct_a = get_demo_audio(info_a[0], info_a[2], float(info_a[3]),
                                 info_a[4], cfg)
    wav_b, ct_b = get_demo_audio(info_b[0], info_b[2], float(info_b[3]),
                                 info_b[4], cfg, seed=9)
    mix = (wav_a + wav_b) / 2.0

    def center_frame(info, ct):
        fdir, fps = info[1], float(info[3])
        p = os.path.join(fdir, "{:06d}.jpg".format(int(round(ct * fps))))
        return val_transform([Image.open(p).convert("RGB")], cfg.imgSize)[0]

    frames = np.stack([center_frame(info_a, ct_a),
                       center_frame(info_b, ct_b)])  # [2, H, W, 3]

    @jax.jit
    def run(a, f):
        return separate(nets, params, batch_stats, a, f, cfg,
                        rng=jax.random.PRNGKey(0))
    out = jax.device_get(run(jnp.asarray(mix[None]),
                             jnp.asarray(frames[None, :, None])))
    makedirs(save_folder, remove=False)
    write_wav(os.path.join(save_folder, "mix.wav"), mix, cfg.audRate)
    for n, gt in enumerate((wav_a, wav_b)):
        write_wav(os.path.join(save_folder, f"pred{n + 1}.wav"),
                  out["wavs"][0, n], cfg.audRate)
        write_wav(os.path.join(save_folder, f"gt{n + 1}.wav"), gt,
                  cfg.audRate)
    print(f"Saved synthetic-mix demo to {save_folder}")


def share_demo(cfg: Config, nets: Nets, params, batch_stats, duet_info,
               save_folder: str) -> None:
    """'share' blank-frame separation: the single shared visual stream is
    replaced by an all-black frame so it carries no information — the
    audio-only ablation of the duet demo (reference share_forward,
    inference.py:88-107)."""
    a_path, fdir, num_f, fps, a_len = duet_info[:5]
    wav, c_t = get_demo_audio(a_path, num_f, float(fps), a_len, cfg)
    p = os.path.join(fdir,
                     "{:06d}.jpg".format(int(round(c_t * float(fps)))))
    frame = val_transform([Image.open(p).convert("RGB")], cfg.imgSize)[0]
    frames = jnp.asarray(frame[None, None, None])      # [1, 1, 1, H, W, 3]

    @jax.jit
    def run(a, f):
        return separate(nets, params, batch_stats, a, f, cfg,
                        rng=jax.random.PRNGKey(0), share_blank=True)
    out = jax.device_get(run(jnp.asarray(wav[None]), frames))

    makedirs(save_folder, remove=False)
    write_wav(os.path.join(save_folder, "mix.wav"), wav, cfg.audRate)
    from imageio import imwrite
    for n in range(cfg.num_mix):
        write_wav(os.path.join(save_folder, f"pred{n + 1}.wav"),
                  out["wavs"][0, n], cfg.audRate)
        mask_img = (np.clip(out["masks"][0, n], 0, 1) * 255).astype(np.uint8)
        imwrite(os.path.join(save_folder, f"predmask{n + 1}.jpg"),
                mask_img[::-1])
    print(f"Saved share (blank-frame) demo to {save_folder}")


def duet_sweep(cfg: Config, nets: Nets, params, batch_stats, rows,
               save_root: str, use_vis: bool = True) -> None:
    """vis_video over every row of a duet manifest (the reference's
    all-real-mixtures sweep, inference.py:421-426).

    ``--duet_vis_rate r`` rate-limits the expensive attention-video dumps:
    0 (the value the reference scripts pass, scripts/inference.sh:63) keeps
    full dumps for every row; 0 < r <= 1 renders attention mp4s for only
    the first of every ``round(1/r)`` rows — the rest still get separated
    wavs + mask jpgs.  (The reference declares the flag in its scripts but
    consumes it nowhere — fork drift, SURVEY.md §5; this is the plausible
    intended semantics, made real.)"""
    r = float(cfg.duet_vis_rate)
    stride = 1 if r <= 0 else max(1, int(round(1.0 / min(r, 1.0))))
    for i, row in enumerate(rows):
        if len(row) < 5:
            continue
        print(f"Processing video {i}.")
        vis_video(cfg, nets, params, batch_stats, row[:5],
                  os.path.join(save_root, f"duet_{i}"), use_vis,
                  write_att_videos=(i % stride == 0))


def pixelwise_demo(cfg: Config, duet_info, save_folder: str) -> None:
    """Per-pixel sound-energy map via ``InnerProd.forward_pixelwise``
    (reference synthesizer_net.py:29-38 — implemented there but reachable
    from nothing; this wires it to a demo).  Uses the SoP nets: every
    visual-map pixel drives the synthesizer against the sound basis, the
    per-pixel masks are reduced to energy, and the map is overlaid on the
    frame.  Requires ``vis_channels == num_channels`` (the SoP setting)."""
    if cfg.vis_channels != cfg.num_channels:
        raise SystemExit(
            f"pixelwise demo needs vis_channels ({cfg.vis_channels}) == "
            f"num_channels ({cfg.num_channels}) — the SoP configuration")
    from avsep_tpu.models.builder import activate
    from avsep_tpu.ops.prepare import prepare
    from avsep_tpu.ops.stft import stft_magphase
    from avsep_tpu.sop_engine import _apply_sound
    from avsep_tpu.sop_main import build_sop_nets, init_sop_state

    nets = build_sop_nets(cfg)
    state = init_sop_state(cfg, nets, jax.random.PRNGKey(cfg.seed))
    # load the trained SoP checkpoint like every other demo mode (random
    # init would render the sound map meaningless noise)
    ckpt_dir = os.path.join(cfg.ckpt, cfg.id)
    if cfg.load_ckpt or os.path.isdir(os.path.join(ckpt_dir, "state_best")):
        from avsep_tpu.checkpoint import restore_checkpoint
        try:
            state = restore_checkpoint(ckpt_dir, state, "best")
        except Exception:
            # training interrupted before any eval promoted a best —
            # fall back like main.py's eval path (main.py:103-110)
            try:
                state = restore_checkpoint(ckpt_dir, state, "latest")
            except Exception:
                print("WARNING: no checkpoint found; pixelwise demo will "
                      "use random-init params")
    params, stats = state.params, state.batch_stats

    a_path, fdir, num_f, fps, a_len = duet_info[:5]
    wav, c_t = get_demo_audio(a_path, num_f, float(fps), a_len, cfg)
    p = os.path.join(fdir,
                     "{:06d}.jpg".format(int(round(c_t * float(fps)))))
    frame = val_transform([Image.open(p).convert("RGB")], cfg.imgSize)[0]

    @jax.jit
    def run(a, f):
        mag_mix, _ = stft_magphase(a, cfg.stft_frame, cfg.stft_hop,
                                   use_pallas=cfg.use_pallas, dft=cfg.dft)
        prep = prepare(mag_mix, mag_mix[:, None],
                       log_freq=bool(cfg.log_freq), weighted_loss=False,
                       binary_mask=True)
        basis, _, _ = _apply_sound(nets, params, stats, prep.log_mag_mix,
                                   cfg, False)               # [1,FO,T,C]
        # always the UNPOOLED spatial map (pool=False), whatever
        # not_pool_vis says — pixelwise needs per-pixel features
        fmap = nets.frame.apply(
            {"params": params["frame"], "batch_stats": stats["frame"]},
            f, pool=False, train=False)                      # [1,HI,WI,C]
        fmap = activate(fmap, cfg.img_activation, upcast=False)
        pix = nets.synthesizer.apply(
            {"params": params["synthesizer"]}, fmap, basis,
            method="forward_pixelwise")       # [1, HI, WI, FO, T]
        masks = jax.nn.sigmoid(pix)
        # sound energy each pixel would claim from the mixture
        energy = jnp.sum(masks * prep.mag_mix[:, None, None], axis=(-2, -1))
        return energy, masks

    energy, masks = jax.device_get(run(jnp.asarray(wav[None]),
                                       jnp.asarray(frame[None, None])))

    makedirs(save_folder, remove=False)
    from imageio import imwrite
    imwrite(os.path.join(save_folder, "sound_map.jpg"),
            attention_overlay(frame, energy[0]))
    e = energy[0]
    e = (e - e.min()) / (e.max() - e.min() + 1e-8)
    imwrite(os.path.join(save_folder, "sound_map_raw.jpg"),
            (e * 255).astype(np.uint8))
    np.save(os.path.join(save_folder, "pixel_masks.npy"),
            masks[0].astype(np.float16))
    print(f"Saved pixelwise sound map to {save_folder}")


def main(cfg: Config):
    from avsep_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()
    if cfg.demo_mode not in ("vis", "share", "sweep", "synthesis",
                             "pixelwise"):
        raise SystemExit(f"unknown --demo_mode {cfg.demo_mode!r} "
                         "(vis | share | sweep | synthesis | pixelwise)")
    from avsep_tpu.data.dataset import read_manifest
    rows = read_manifest(cfg.list_val[0])
    demo_root = os.path.join(cfg.ckpt, cfg.id, "demo")

    if cfg.demo_mode == "pixelwise":
        # SoP nets are built inside (different net family)
        pixelwise_demo(cfg, rows[0], os.path.join(demo_root, "pixelwise"))
        return

    from avsep_tpu.train import init_state
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(cfg.seed))
    if cfg.load_ckpt or (cfg.ckpt and os.path.isdir(
            os.path.join(cfg.ckpt, cfg.id, "state_best"))):
        from avsep_tpu.checkpoint import restore_checkpoint
        state = restore_checkpoint(os.path.join(cfg.ckpt, cfg.id), state,
                                   "best")

    info = rows[0]
    clip = os.path.basename(info[0]).split(".")[0]
    if cfg.demo_mode == "vis":
        vis_video(cfg, nets, state.params, state.batch_stats, info,
                  os.path.join(demo_root, clip))
    elif cfg.demo_mode == "share":
        share_demo(cfg, nets, state.params, state.batch_stats, info,
                   os.path.join(demo_root, f"share_{clip}"))
    elif cfg.demo_mode == "sweep":
        duet_sweep(cfg, nets, state.params, state.batch_stats, rows,
                   demo_root)
    elif cfg.demo_mode == "synthesis":
        if len(rows) < 2:
            raise SystemExit("synthesis demo needs >= 2 rows in the "
                             "manifest (two solo clips to mix)")
        synthesis_demo(cfg, nets, state.params, state.batch_stats,
                       rows[0], rows[1],
                       os.path.join(demo_root, "synthesis"))


if __name__ == "__main__":
    main(parse_args())
