"""Serving-layer benchmark: sustained request throughput + latency.

Drives ``avsep_tpu.serve.SeparationService`` (flagship separation
pipeline, bench.py's model shape) with concurrent client threads issuing
DISTINCT mixtures (the tunnel memoizes repeated identical executions,
BENCH_NOTES.md), and reports requests/s, effective clips/s, mean batch
size, and dispatch latency percentiles.

    python tools/serve_bench.py [--n 256] [--clients 8] [--max_batch 16]
                                [--av] [--frames_wire f32|u8]

Unlike bench.py (pure on-device sweep: the speed-of-light number), this
measures the deployment path: host-generated audio crosses the wire per
request, dispatches are synchronous round trips, and batching is formed
dynamically from concurrent clients — i.e. what a serving user actually
gets, including the tunnel RPC floor on this dev setup.
"""

from __future__ import annotations

import argparse
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402

from avsep_tpu.config import Config  # noqa: E402
from avsep_tpu.engine import build_nets  # noqa: E402
from avsep_tpu.serve import SeparationService  # noqa: E402
from avsep_tpu.train import init_state  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256, help="total requests")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--max_wait_ms", type=float, default=10.0)
    ap.add_argument("--wire", default="f32", choices=["f32", "int16"])
    ap.add_argument("--av", action="store_true",
                    help="visually-guided requests (frames attached)")
    ap.add_argument("--frames_wire", default="f32",
                    choices=["f32", "u8"])
    args = ap.parse_args()

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, log_freq=1, one_frame=True)
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    svc = SeparationService(cfg, nets, state.params, state.batch_stats,
                            max_batch=args.max_batch,
                            max_wait_ms=args.max_wait_ms, wire=args.wire,
                            frames_wire=args.frames_wire)

    rs = np.random.RandomState(0)
    # distinct mixtures per request (tunnel memoization defeats repeats)
    mix_bank = rs.randn(args.n, cfg.audLen).astype(np.float32) * 0.1
    # AV mode: one distinct uint8 frame pair per request (u8 keeps the
    # submit cheap; the f32 wire converts at submit)
    frame_bank = (rs.randint(0, 256, size=(args.n,) + svc.frames_shape,
                             dtype=np.uint8) if args.av else None)

    def req_frames(i):
        return frame_bank[i] if args.av else None

    print("warmup (compile)...")
    svc.submit(mix_bank[0], frames=req_frames(0)).result()

    lat_lock = threading.Lock()
    lats = []
    idx_iter = iter(range(args.n))
    idx_lock = threading.Lock()

    def client():
        while True:
            with idx_lock:
                i = next(idx_iter, None)
            if i is None:
                return
            t0 = time.perf_counter()
            svc.submit(mix_bank[i], frames=req_frames(i)).result()
            with lat_lock:
                lats.append((time.perf_counter() - t0) * 1e3)

    t0 = time.perf_counter()
    threads = [threading.Thread(target=client)
               for _ in range(args.clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    svc.close()

    lats.sort()
    snap = svc.stats.snapshot()
    print(f"requests: {args.n}  clients: {args.clients}  "
          f"max_batch: {args.max_batch}  wall: {wall:.2f}s  "
          f"mode: {'AV' if args.av else 'AO'}"
          + (f"  frames_wire: {args.frames_wire}" if args.av else ""))
    print(f"throughput: {args.n / wall:.1f} req/s "
          f"(= clips/s; {args.n / wall * 60:.0f} clips/min)")
    print(f"mean dynamic batch: {snap['mean_batch']:.2f}  "
          f"dispatches: {snap['dispatches']}")
    print(f"request latency p50/p95: "
          f"{lats[len(lats) // 2]:.1f} / {lats[int(0.95 * len(lats))]:.1f}"
          f" ms  (dispatch p50 {snap['p50_ms']:.1f} ms)")


if __name__ == "__main__":
    main()
