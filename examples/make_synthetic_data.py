"""Generate a tiny synthetic MUSIC-style dataset + manifest.

Creates per-class tone wavs and frame jpgs under ``--root`` and writes a
manifest CSV with the reference schema, so the full train/eval/inference
stack runs without downloading MUSIC:

    python examples/make_synthetic_data.py --root /tmp/music_toy
    python -m avsep_tpu.main --mode train --id toy \
        --av_list_train /tmp/music_toy/train.csv \
        --ao_list_train /tmp/music_toy/train.csv \
        --list_val /tmp/music_toy/train.csv \
        --arch_sound unet7 --num_channels 2 --vis_channels 256 \
        --fusion_type hidsep --att_type sig --not_pool_vis \
        --img_activation relu --loss bce --binary_mask 1 --weighted_loss 1 \
        --one_frame --margin 1 --train_repeat 2 --val_repeat 1 \
        --batch_size_per_gpu 2 --num_iters 20 --eval_iter 10 --disp_iter 5
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from avsep_tpu.data.audio_io import write_wav  # noqa: E402

SR = 11025


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/music_toy")
    ap.add_argument("--classes", nargs="+",
                    default=["cello", "flute", "violin", "trumpet"])
    ap.add_argument("--videos_per_class", type=int, default=2)
    ap.add_argument("--duration", type=float, default=14.0)
    ap.add_argument("--fps", type=float, default=8.0)
    args = ap.parse_args()

    from PIL import Image
    rs = np.random.RandomState(0)
    rows = []
    for ci, cls in enumerate(args.classes):
        os.makedirs(os.path.join(args.root, cls), exist_ok=True)
        for vid in range(args.videos_per_class):
            n = int(SR * args.duration)
            t = np.arange(n) / SR
            f0 = 180 + 90 * ci + 17 * vid
            wav = (0.35 * np.sin(2 * np.pi * f0 * t)
                   + 0.15 * np.sin(2 * np.pi * 2 * f0 * t)
                   + 0.01 * rs.randn(n)).astype(np.float32)
            apath = os.path.join(args.root, cls, f"v{ci}{vid}.wav")
            write_wav(apath, wav, SR)
            fdir = os.path.join(args.root, cls, f"v{ci}{vid}.mp4")
            os.makedirs(fdir, exist_ok=True)
            n_frames = int(args.duration * args.fps) + 2
            base = rs.randint(0, 200, (120, 160, 3), np.uint8)
            for fi in range(n_frames):
                img = base.copy()
                img[:, (fi * 5) % 150: (fi * 5) % 150 + 10] = 255
                Image.fromarray(img).save(
                    os.path.join(fdir, "{:06d}.jpg".format(fi)))
            rows.append([apath, fdir, str(int(args.duration * args.fps)),
                         str(args.fps), str(args.duration), cls])

    csv_path = os.path.join(args.root, "train.csv")
    with open(csv_path, "w") as f:
        for r in rows:
            f.write(",".join(r) + "\n")
    print(f"wrote {len(rows)} rows to {csv_path}")


if __name__ == "__main__":
    main()
