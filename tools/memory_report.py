"""HBM memory accounting for the flagship AV train step (+ serving path).

The reference never reasons about device memory (it relies on torch's
caching allocator and a 2-GPU DataParallel split, reference
``main.py:661,772``).  On TPU the picture is static: XLA compiles one
program per (shape, dtype) and its peak HBM is known at compile time.
This tool surfaces that number so batch-size / remat / dtype decisions
are made from data instead of OOM retries:

* lowers + compiles the REAL production train step
  (``avsep_tpu.train.make_train_step``, with its ``donate_argnums``
  state aliasing) from abstract ``ShapeDtypeStruct`` inputs — no batch
  data, no step execution, just the compiler;
* reads ``compiled.memory_analysis()``: argument / output / temp
  (activations + workspace) / alias sizes, and reports
  ``peak ≈ args + temp - aliased`` per (batch, dtype, remat) point;
* sweeps batch upward (doubling) until the program no longer fits the
  chip's HBM, for each of the four {f32, bf16} x {remat off, on}
  configurations, so the remat payoff is a measured "max batch that
  fits" delta rather than folklore;
* also reports the batched separation (serving) pipeline at the bench
  batch for capacity-planning the serve layer.

Compile-only: safe over the tunneled single chip (nothing executes) and
meaningful on the CPU platform for plumbing tests (XLA:CPU reports the
same analysis fields; absolute numbers differ from TPU).

Usage: python tools/memory_report.py [hbm_gib] [start_batch]
Writes MEMORY_REPORT.json at the repo root and prints a table.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

V5E_HBM_BYTES = 16 * 1024 ** 3  # TPU v5e (v5 lite): 16 GiB HBM, public spec


def _flagship_cfg(**over):
    from avsep_tpu.config import Config
    return Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                  fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                  img_activation="relu", output_activation="sigmoid",
                  binary_mask=1, weighted_loss=1, log_freq=1, loss="bce",
                  one_frame=True, match_weight=0.1, **over)


def _mem(compiled) -> dict:
    ma = compiled.memory_analysis()
    out = {}
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes",
              "generated_code_size_in_bytes"):
        out[k] = int(getattr(ma, k, 0))
    # Donated state aliases into the output, so live bytes at peak are the
    # (un-aliased) arguments plus XLA's temp allocation.
    out["peak_bytes"] = (out["argument_size_in_bytes"]
                         + out["temp_size_in_bytes"]
                         - out["alias_size_in_bytes"])
    return out


def _gib(n: int) -> float:
    return round(n / 1024 ** 3, 3)


def analyze_train_step(cfg, batch: int) -> dict:
    """Compile the real AV train step at ``batch`` and return its memory
    analysis (raises whatever XLA raises if it cannot be compiled)."""
    import jax
    import jax.numpy as jnp
    from avsep_tpu.engine import build_nets
    from avsep_tpu.train import init_state, make_train_step

    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    step = make_train_step(cfg, nets, use_vis=True)
    abstract = {
        "audios": jax.ShapeDtypeStruct((batch, cfg.num_mix, cfg.audLen),
                                       jnp.float32),
        "frames": jax.ShapeDtypeStruct(
            (batch, cfg.num_mix, 1 if cfg.one_frame else 3,
             cfg.imgSize, cfg.imgSize, 3), jnp.uint8),
    }
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = step.lower(state, abstract, rng).compile()
    return _mem(compiled)


def analyze_separation(cfg, batch: int) -> dict:
    import jax
    import jax.numpy as jnp
    from avsep_tpu.engine import build_nets, separate
    from avsep_tpu.train import init_state

    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))

    def run(params, stats, audio, frames, rng):
        return separate(nets, params, stats, audio, frames, cfg, rng=rng)

    audio = jax.ShapeDtypeStruct((batch, cfg.audLen), jnp.float32)
    frames = jax.ShapeDtypeStruct((batch, cfg.num_mix, 1, cfg.imgSize,
                                   cfg.imgSize, 3), jnp.float32)
    rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = jax.jit(run).lower(state.params, state.batch_stats, audio,
                                  frames, rng).compile()
    return _mem(compiled)


def sweep_max_batch(make_cfg, hbm_bytes: int, start_batch: int) -> dict:
    """Double the batch until the compiled step exceeds ``hbm_bytes`` (or
    XLA refuses to compile); record every point."""
    points = {}
    batch, fits_max = start_batch, 0
    while True:
        cfg = make_cfg()
        try:
            m = analyze_train_step(cfg, batch)
        except Exception as e:  # XLA resource exhaustion at compile time
            points[str(batch)] = {"error": type(e).__name__,
                                  "detail": str(e)[:200]}
            break
        m["peak_gib"] = _gib(m["peak_bytes"])
        m["fits"] = m["peak_bytes"] <= hbm_bytes
        points[str(batch)] = m
        if m["fits"]:
            fits_max = batch
        else:
            break
        if batch >= 4096:
            break
        batch *= 2
    return {"max_batch_fitting": fits_max, "points": points}


def main(hbm_gib: float = 16.0, start_batch: int = 32):
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    hbm = int(hbm_gib * 1024 ** 3)
    dev = jax.devices()[0]
    report = {"device": str(dev), "hbm_gib": hbm_gib,
              "configs": {}, "separation": {}}
    print(f"# device: {dev}  (budget {hbm_gib} GiB)")

    variants = {
        "f32": dict(dtype="float32", remat=False),
        "f32+remat": dict(dtype="float32", remat=True),
        "bf16": dict(dtype="bfloat16", remat=False),
        "bf16+remat": dict(dtype="bfloat16", remat=True),
    }
    for name, over in variants.items():
        res = sweep_max_batch(lambda o=over: _flagship_cfg(**o), hbm,
                              start_batch)
        report["configs"][name] = res
        print(f"{name:12s} max batch fitting: {res['max_batch_fitting']}")
        for b, m in res["points"].items():
            if "error" in m:
                print(f"  B={b:>5}: compile refused ({m['error']})")
            else:
                print(f"  B={b:>5}: peak {m['peak_gib']:7.3f} GiB "
                      f"(args {_gib(m['argument_size_in_bytes'])}, "
                      f"temp {_gib(m['temp_size_in_bytes'])}, "
                      f"aliased {_gib(m['alias_size_in_bytes'])})"
                      f"{'' if m['fits'] else '  DOES NOT FIT'}")

    sep = analyze_separation(_flagship_cfg(dft="matmul"), batch=16)
    sep["peak_gib"] = _gib(sep["peak_bytes"])
    report["separation"]["B16_matmul"] = sep
    print(f"separation B=16 (serve): peak {sep['peak_gib']} GiB")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "MEMORY_REPORT.json"), "w") as f:
        json.dump(report, f, indent=1)
    print("wrote MEMORY_REPORT.json")


if __name__ == "__main__":
    main(*(float(a) if i == 0 else int(a)
           for i, a in enumerate(sys.argv[1:3])))
