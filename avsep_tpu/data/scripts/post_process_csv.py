"""Build / post-process CSV manifests.

Equivalent of reference ``data/scripts/post_process_csv.py``: probe each
audio/frames pair for frame count, fps, and audio length, and write rows
``audio_path, frames_dir, num_frames, fps, audio_len_sec, class`` — the
manifest schema consumed by MusicMixDataset (reference dataset row format,
data/train.csv).

Usage:
    python -m avsep_tpu.data.scripts.post_process_csv \
        --audio_root data/audio --frames_root data/frames --out data/all.csv
"""

import argparse
import glob
import os
import wave


def probe_audio_len(path: str) -> float:
    with wave.open(path, "rb") as w:
        return w.getnframes() / w.getframerate()


def probe_frames(frames_dir: str):
    jpgs = glob.glob(os.path.join(frames_dir, "[0-9]" * 6 + ".jpg"))
    return len(jpgs)


def probe_fps(video_path: str) -> float:
    """ffprobe when the source video is available; else caller supplies."""
    import subprocess as sp
    try:
        out = sp.run(["ffprobe", "-v", "quiet", "-select_streams", "v:0",
                      "-show_entries", "stream=r_frame_rate", "-of",
                      "default=nw=1:nk=1", video_path],
                     capture_output=True, text=True, timeout=20).stdout
        num, den = out.strip().split("/")
        return float(num) / float(den)
    except Exception:
        return 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--audio_root", default="./data/audio")
    ap.add_argument("--frames_root", default="./data/frames")
    ap.add_argument("--out", default="./data/all.csv")
    ap.add_argument("--fps", type=float, default=0.0,
                    help="fallback fps when no source video to probe")
    args = ap.parse_args()

    rows = []
    for wav in sorted(glob.glob(os.path.join(args.audio_root, "*",
                                             "*.wav"))):
        cls = os.path.basename(os.path.dirname(wav))
        stem = os.path.splitext(os.path.basename(wav))[0]
        fdir = os.path.join(args.frames_root, cls, stem + ".mp4")
        if not os.path.isdir(fdir):
            continue
        n_frames = probe_frames(fdir)
        a_len = probe_audio_len(wav)
        fps = args.fps or (n_frames / a_len if a_len else 0.0)
        rows.append([wav, fdir, str(n_frames), str(round(fps, 2)),
                     str(round(a_len, 3)), cls])

    with open(args.out, "w") as f:
        for r in rows:
            f.write(",".join(r) + "\n")
    print(f"wrote {len(rows)} rows to {args.out}")


if __name__ == "__main__":
    main()
