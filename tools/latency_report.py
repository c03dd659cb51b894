"""Single-clip DEVICE latency + serve batching curve (VERDICT r3 #6).

Round-3's p50 of 56 ms for a B=1 ``separate`` is the tunnel RPC floor,
not compute.  This tool separates the two:

1. **B=1 device time**: the compiled flagship separation program
   (``engine.separate``, replacing the reference's per-frame Python loop
   ``inference.py:537-578``) runs N times under ``jax.profiler.trace``;
   the device's "XLA Ops" events are summed per run — the number a
   locally-attached chip would deliver — alongside the wall p50 through
   the tunnel for contrast.

2. **Batching knee**: ``serve.SeparationService`` swept over
   ``max_wait_ms`` at fixed concurrency; each point reports req/s and
   request-latency p50/p95 + mean dynamic batch.  The knee is where
   added waiting stops buying batch size (throughput flattens) and only
   adds latency.

Writes LATENCY_r05.json at the repo root (incrementally, point by
point, so a harness timeout keeps whatever was already measured).

Usage: python tools/latency_report.py [--runs 32] [--sweep_n 128]
                                      [--clients 16]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import threading
import time
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def device_us_from_trace(trace_dir: str) -> float:
    """Total device 'XLA Ops' microseconds in a chrome trace dir."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        return 0.0
    data = json.load(gzip.open(sorted(paths)[-1]))
    ev = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev if e.get("ph") == "M"
                and e.get("name") == "process_name"
                and "TPU" in e["args"].get("name", "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev if e.get("ph") == "M"
               and e.get("name") == "thread_name"
               and e["args"].get("name") == "XLA Ops"
               and e["pid"] in dev_pids}
    per_op = defaultdict(float)
    for e in ev:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            per_op[e["name"]] += e.get("dur", 0.0)
    return sum(per_op.values())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=32)
    ap.add_argument("--sweep_n", type=int, default=128,
                    help="requests per sweep point")
    ap.add_argument("--clients", type=int, default=16)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--waits", type=float, nargs="*",
                    default=[0.0, 2.0, 5.0, 10.0, 25.0, 50.0])
    ap.add_argument("--skip_sweep", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "LATENCY_r05.json"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from avsep_tpu.config import Config
    from avsep_tpu.engine import build_nets, separate
    from avsep_tpu.train import init_state

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, log_freq=1, one_frame=True)
    nets = build_nets(cfg)
    try:
        cpu = jax.local_devices(backend="cpu")
    except Exception:
        cpu = []
    if cpu:  # init is not under test; skip minutes of remote compile
        with jax.default_device(cpu[0]):
            state = init_state(cfg, nets, jax.random.PRNGKey(0))
    else:
        state = init_state(cfg, nets, jax.random.PRNGKey(0))
    print(f"# device: {jax.devices()[0]}")

    @jax.jit
    def sep1(params, stats, audio_mix, frames):
        out = separate(nets, params, stats, audio_mix, frames, cfg)
        return out["wavs"]

    rs = np.random.RandomState(0)
    mixes = [jnp.asarray(rs.randn(1, cfg.audLen).astype(np.float32) * 0.1)
             for _ in range(args.runs)]
    frames = [jnp.asarray(rs.rand(1, 2, 1, 224, 224, 3).astype(np.float32))
              for _ in range(args.runs)]
    t0 = time.time()
    np.asarray(sep1(state.params, state.batch_stats, mixes[0], frames[0]))
    print(f"# compile+first {time.time() - t0:.1f}s")

    # wall latency per dispatch (tunnel RPC floor included)
    walls = []
    for i in range(args.runs):
        t0 = time.perf_counter()
        np.asarray(sep1(state.params, state.batch_stats, mixes[i],
                        frames[i]))
        walls.append((time.perf_counter() - t0) * 1e3)
    walls.sort()

    # device time per dispatch from the profiler
    trace_dir = tempfile.mkdtemp(prefix="avsep_lat_")
    with jax.profiler.trace(trace_dir):
        for i in range(args.runs):
            y = sep1(state.params, state.batch_stats, mixes[i], frames[i])
        np.asarray(y)
    dev_us = device_us_from_trace(trace_dir)
    dev_ms = dev_us / args.runs / 1e3 if dev_us else None

    report = {
        "b1_separate": {
            "runs": args.runs,
            "wall_p50_ms": walls[len(walls) // 2],
            "wall_p95_ms": walls[int(0.95 * len(walls))],
            "device_ms_per_call": dev_ms,
            "note": ("device_ms is XLA-op busy time per call: what a "
                     "locally-attached chip delivers; wall includes the "
                     "tunnel RPC round trip"),
        },
        "batching_sweep": [],
    }
    p50 = report["b1_separate"]["wall_p50_ms"]
    print(f"B=1 separate: wall p50 {p50:.1f} ms, device "
          + (f"{dev_ms:.2f} ms/call" if dev_ms else "n/a (no TPU trace)"))

    def flush():
        # written after every milestone so a timeout/kill mid-sweep keeps
        # the points already measured (a 900 s harness timeout once ate
        # the whole report because this write only happened at the end)
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
    flush()

    if not args.skip_sweep:
        from avsep_tpu.serve import SeparationService
        bank = rs.randn(args.sweep_n, cfg.audLen).astype(np.float32) * 0.1
        for wait in args.waits:
            svc = SeparationService(cfg, nets, state.params,
                                    state.batch_stats,
                                    max_batch=args.max_batch,
                                    max_wait_ms=wait)
            svc.submit(bank[0]).result()  # warm (compile cached across
            # svc instances via the jit cache)
            lats, lock = [], threading.Lock()
            it, ilock = iter(range(args.sweep_n)), threading.Lock()

            def client():
                while True:
                    with ilock:
                        i = next(it, None)
                    if i is None:
                        return
                    t0 = time.perf_counter()
                    svc.submit(bank[i]).result()
                    with lock:
                        lats.append((time.perf_counter() - t0) * 1e3)

            t0 = time.perf_counter()
            ts = [threading.Thread(target=client)
                  for _ in range(args.clients)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            wall = time.perf_counter() - t0
            snap = svc.stats.snapshot()
            svc.close()
            lats.sort()
            pt = {"max_wait_ms": wait,
                  "req_per_s": args.sweep_n / wall,
                  "p50_ms": lats[len(lats) // 2],
                  "p95_ms": lats[int(0.95 * len(lats))],
                  "mean_batch": snap["mean_batch"]}
            report["batching_sweep"].append(pt)
            flush()
            print(f"wait {wait:5.1f} ms: {pt['req_per_s']:6.1f} req/s  "
                  f"p50 {pt['p50_ms']:6.1f}  p95 {pt['p95_ms']:6.1f}  "
                  f"mean batch {pt['mean_batch']:.1f}")

    flush()
    print(f"report written to {args.out}")


if __name__ == "__main__":
    main()
