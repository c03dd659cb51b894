"""In-situ training-loop decomposition (VERDICT r3 #1).

Round-3's TRACE_REPORT showed the chip busy only 28% of wall in the
per-step-dispatched train loop, with the loader blamed but not isolated.
This tool separates the three costs at identical config (flagship unet7 +
resnet18dilated, same batch, dtype, dft) so the residual is attributable:

  A. **scan sweep** — ONE dispatch executes N steps on a pre-staged
     device batch: wall/step == device-bound floor (no dispatch, no host
     data).  Methodology of bench.py / BENCH_NOTES.md.
  B. **dispatch loop** — N separate dispatches of the production
     ``make_train_step`` on the SAME pre-staged device batch: adds the
     per-dispatch host->device RPC cost (the axon tunnel round-trip on
     this setup) with ZERO host data work.
  C. **in-situ loop** — N dispatches fed by the real pipeline:
     ``MusicMixDataset`` (native JPEG decode + audio) -> ``BatchLoader``
     -> ``DevicePrefetcher`` -> ``to_device`` — the actual train loop
     (reference hot path replaced: ``dataset/music.py:132-156`` PIL
     loads + ``main.py:701-737`` iteration loop).

``B - A`` is pure dispatch/tunnel RPC, unreachable by any loader work;
``C - B`` is the un-hidden host-data cost — the number VERDICT r3 #1
asks to drive to ~0.  Arm C additionally runs under
``jax.profiler.trace`` to report measured device-busy time.

Writes INSITU_r05.json at the repo root.

Usage: python tools/insitu_report.py [--batch 32] [--n 16]
           [--dtype bfloat16] [--dft matmul] [--root /tmp/insitu_set]
           [--workers 0] [--frame_decode auto]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--dft", default="matmul")
    ap.add_argument("--root", default="/tmp/insitu_set",
                    help="synthetic dataset root (examples/"
                         "make_synthetic_data.py); train.csv must exist")
    ap.add_argument("--workers", type=int, default=0)
    ap.add_argument("--frame_decode", default="auto")
    ap.add_argument("--no_profile", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from avsep_tpu.config import Config
    from avsep_tpu.data.dataset import MusicMixDataset
    from avsep_tpu.data.loader import (
        BatchLoader, DevicePrefetcher, iter_forever)
    from avsep_tpu.engine import build_nets, forward, unused_visual_streams
    from avsep_tpu.main import to_device
    from avsep_tpu.parallel.mesh import make_mesh
    from avsep_tpu.train import init_state, make_optimizer, make_train_step

    csv = os.path.join(args.root, "train.csv")
    assert os.path.exists(csv), (
        f"{csv} missing — generate with: python examples/"
        f"make_synthetic_data.py --root {args.root} --img_size 360 640")

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, weighted_loss=1, log_freq=1, loss="bce",
                 one_frame=True, match_weight=0.1,
                 dtype=args.dtype, dft=args.dft,
                 av_list_train=(csv,), ao_list_train=(csv,),
                 list_val=(csv,),
                 batch_size_per_gpu=args.batch, num_gpus=1,
                 workers=args.workers, frame_decode=args.frame_decode,
                 train_repeat=200)
    mesh = make_mesh(1)
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0), mesh=mesh)
    step = make_train_step(cfg, nets, use_vis=True)
    dev = jax.devices()[0]
    print(f"# device: {dev}  dtype={args.dtype} dft={args.dft} "
          f"B={args.batch} n={args.n}")

    ds = MusicMixDataset(csv, cfg, split="train")
    loader = BatchLoader(ds, cfg.batch_size, shuffle=True,
                         num_workers=cfg.workers, seed=cfg.seed)
    drop = unused_visual_streams(cfg)
    put = lambda b: to_device(b, mesh, drop=drop, cfg=cfg)  # noqa: E731

    # one host batch, staged once — the shared input of arms A and B
    host_iter = iter_forever(loader)
    staged = put(next(host_iter))

    # ---------------- arm A: scan sweep (device floor) ----------------
    def loss_fn(params, stats, bd, rng):
        err, (new_stats, _) = forward(nets, params, stats, bd, cfg, rng,
                                      use_vis=True, train=True)
        return err, new_stats

    n = args.n

    @jax.jit
    def scan_sweep(params, stats, opt_state, bd, seed):
        opt = make_optimizer(cfg, params)

        def body(carry, key):
            params, stats, opt_state = carry
            (err, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, bd, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), err
        keys = jax.random.split(jax.random.PRNGKey(seed[0]), n)
        (params, stats, opt_state), errs = jax.lax.scan(
            body, (params, stats, opt_state), keys)
        return jnp.sum(errs)

    t0 = time.time()
    float(scan_sweep(state.params, state.batch_stats, state.opt_state,
                     staged, jnp.asarray([1])))
    print(f"# arm A compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    float(scan_sweep(state.params, state.batch_stats, state.opt_state,
                     staged, jnp.asarray([2])))
    a_ms = (time.time() - t0) / n * 1e3
    print(f"A scan sweep      : {a_ms:8.1f} ms/step (device floor)")

    # ------------- arm B: dispatch loop, pre-staged batch -------------
    # production step (donated state); compile + warm first
    rngs = [jax.random.PRNGKey(100 + i) for i in range(n + 1)]
    st = state
    t0 = time.time()
    st, _ = step(st, staged, rngs[0])
    jax.block_until_ready(st.params)
    print(f"# arm B compile+first {time.time() - t0:.1f}s")
    t0 = time.time()
    for i in range(n):
        st, m = step(st, staged, rngs[i + 1])
    jax.block_until_ready(st.params)
    b_ms = (time.time() - t0) / n * 1e3
    print(f"B dispatch loop   : {b_ms:8.1f} ms/step "
          f"(+{b_ms - a_ms:.1f} dispatch/RPC)")

    # ------------- arm C: in-situ (real loader + prefetch) ------------
    pre = DevicePrefetcher(host_iter, put)
    trace_dir = tempfile.mkdtemp(prefix="avsep_insitu_")
    data_waits = []
    next(iter(pre))  # let the prefetcher fill before the clock starts

    def run_c():
        nonlocal st
        t0 = time.time()
        for i in range(n):
            td = time.time()
            bd = next(iter(pre))
            data_waits.append(time.time() - td)
            st, m = step(st, bd, rngs[i % (n + 1)])
        jax.block_until_ready(st.params)
        return (time.time() - t0) / n * 1e3

    if args.no_profile:
        c_ms = run_c()
        busy_ms = None
    else:
        with jax.profiler.trace(trace_dir):
            c_ms = run_c()
        from tools.latency_report import device_us_from_trace
        try:
            busy_us = device_us_from_trace(trace_dir)
            busy_ms = busy_us / n / 1e3 if busy_us else None
        except Exception as e:  # CPU backend / no device events
            print(f"# profiler parse failed ({e}); busy time unavailable")
            busy_ms = None
    pre.close()
    loader.close()
    data_ms = float(np.mean(data_waits)) * 1e3
    print(f"C in-situ loop    : {c_ms:8.1f} ms/step "
          f"(+{c_ms - b_ms:.1f} un-hidden host data; "
          f"data wait {data_ms:.1f} ms)")
    if busy_ms is not None:
        print(f"  device busy     : {busy_ms:8.1f} ms/step "
              f"({100 * busy_ms / c_ms:.0f}% of in-situ wall, "
              f"{100 * busy_ms / a_ms:.0f}% of the scanned floor)")

    report = {
        "batch": args.batch, "n_steps": n,
        "dtype": args.dtype, "dft": args.dft,
        "frame_decode": args.frame_decode, "workers": args.workers,
        "device": str(dev), "dataset_root": args.root,
        "arm_a_scan_ms_per_step": a_ms,
        "arm_b_dispatch_ms_per_step": b_ms,
        "arm_c_insitu_ms_per_step": c_ms,
        "dispatch_rpc_ms": b_ms - a_ms,
        "unhidden_host_data_ms": c_ms - b_ms,
        "mean_data_wait_ms": data_ms,
        "device_busy_ms_per_step": busy_ms,
        "device_busy_frac_of_insitu_wall": (
            busy_ms / c_ms if busy_ms else None),
        "clips_per_s_insitu": args.batch / (c_ms / 1e3),
        "clips_per_s_scan_floor": args.batch / (a_ms / 1e3),
    }
    out = os.path.join(REPO, "INSITU_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report written to {out}")


if __name__ == "__main__":
    main()
