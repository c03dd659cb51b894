"""Host input-pipeline throughput microbench (VERDICT round-1 item #4).

Measures the process-pool loader's sustained batches/s on real jpg+wav IO,
to compare against the device step rate.  Usage:
    python tools/bench_loader.py --csv /tmp/toyset224/train.csv [--bs 16]
"""
import argparse
import time

from avsep_tpu.config import Config
from avsep_tpu.data.dataset import MusicMixDataset
from avsep_tpu.data.loader import (
    BatchLoader, ProcessBatchLoader, iter_forever)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True)
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--n", type=int, default=60)
    ap.add_argument("--threads", action="store_true",
                    help="use the thread loader instead of processes")
    ap.add_argument("--frame_decode", default="auto",
                    choices=["auto", "native", "fast", "pil"])
    ap.add_argument("--one_frame", action="store_true")
    ap.add_argument("--load_clips", action="store_true")
    ap.add_argument("--clip_len", type=int, default=8)
    args = ap.parse_args()

    cfg = Config(num_mix=2, num_frames=3, stride_frames=8, frameRate=30,
                 audLen=65535, audRate=11025, imgSize=224,
                 one_frame=args.one_frame, train_repeat=50, rate_dc=1,
                 max_silent=0.87, frame_decode=args.frame_decode,
                 load_clips=args.load_clips, clip_len=args.clip_len)
    ds = MusicMixDataset(args.csv, cfg, split="train")
    cls = BatchLoader if args.threads else ProcessBatchLoader
    ld = cls(ds, args.bs, num_workers=args.workers, seed=0, drop_last=True)
    it = iter_forever(ld)
    for _ in range(10):  # warmup: forkserver spin-up + first wave
        next(it)
    t0 = time.perf_counter()
    for _ in range(args.n):
        next(it)
    dt = time.perf_counter() - t0
    print(f"{'thread' if args.threads else 'process'} loader "
          f"[{args.frame_decode}"
          f"{', clips' if args.load_clips else ''}]: "
          f"{args.n / dt:.1f} batches/s = {args.n * args.bs / dt:.0f} "
          f"clips/s ({dt / args.n * 1000:.0f} ms/batch) at B={args.bs}, "
          f"{args.workers} workers, real jpg+wav IO")
    if hasattr(ld, "close"):
        ld.close()


if __name__ == "__main__":
    main()
