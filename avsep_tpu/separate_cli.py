"""Batch separation serving CLI — ``python -m avsep_tpu.separate_cli``.

Production-style entry point with no reference equivalent: reads wav
mixtures (and optional frame jpgs), runs the jit-compiled separation
pipeline batched on the accelerator, writes per-source wavs.

    python -m avsep_tpu.separate_cli --inputs mix1.wav mix2.wav \
        --out_dir separated/ [--frames dir1 dir2] [--ckpt ckpt --id RUN]
"""

from __future__ import annotations

import argparse
import os
from typing import List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.data.audio_io import read_wav, resample, write_wav
from avsep_tpu.data.video_transforms import val_transform
from avsep_tpu.engine import build_nets, separate
from avsep_tpu.train import init_state


def load_mixture(path: str, cfg: Config) -> np.ndarray:
    wav, sr = read_wav(path)
    wav = resample(wav, sr, cfg.audRate)
    out = np.zeros(cfg.audLen, np.float32)
    n = min(len(wav), cfg.audLen)
    out[:n] = wav[:n]
    return np.clip(out, -1.0, 1.0)


def load_frame_dir(fdir: Optional[str], cfg: Config) -> Optional[np.ndarray]:
    if not fdir:
        return None
    from PIL import Image
    import glob
    jpgs = sorted(glob.glob(os.path.join(fdir, "*.jpg")))[:2]
    if not jpgs:
        return None
    imgs = [val_transform([Image.open(p).convert("RGB")], cfg.imgSize)[0]
            for p in jpgs]
    while len(imgs) < 2:
        imgs.append(imgs[-1])
    return np.stack(imgs)[:, None]  # [2, 1, H, W, 3]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inputs", nargs="+", required=True)
    ap.add_argument("--frames", nargs="*", default=None,
                    help="per-input frame dirs (optional; AO without)")
    ap.add_argument("--out_dir", default="./separated")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--id", default="")
    args = ap.parse_args()
    from avsep_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, log_freq=1, one_frame=True)
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    if args.ckpt:
        from avsep_tpu.checkpoint import restore_checkpoint
        state = restore_checkpoint(os.path.join(args.ckpt, args.id), state,
                                   "best")

    mixes = np.stack([load_mixture(p, cfg) for p in args.inputs])
    frames = None
    if args.frames:
        fs = [load_frame_dir(d, cfg) for d in args.frames]
        if all(f is not None for f in fs):
            frames = np.stack(fs)

    @jax.jit
    def run(a, f):
        return separate(nets, state.params, state.batch_stats, a, f, cfg,
                        rng=jax.random.PRNGKey(0))
    out = jax.device_get(run(
        jnp.asarray(mixes),
        None if frames is None else jnp.asarray(frames)))

    os.makedirs(args.out_dir, exist_ok=True)
    for i, p in enumerate(args.inputs):
        stem = os.path.splitext(os.path.basename(p))[0]
        for n in range(cfg.num_mix):
            write_wav(os.path.join(args.out_dir,
                                   f"{stem}_src{n + 1}.wav"),
                      out["wavs"][i, n], cfg.audRate)
        print(f"{p} -> {args.out_dir}/{stem}_src[12].wav")


if __name__ == "__main__":
    main()
