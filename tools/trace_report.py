"""Profiler-trace breakdown of the flagship AV train step (VERDICT r2 #2).

Captures a real ``jax.profiler`` trace of the compiled train step on the
current accelerator (device-side "XLA Ops" events ARE exposed through the
axon tunnel — verified round-3, correcting the round-2 assumption) and
aggregates device op durations into categories, naming the top time sinks
with percentages.

Methodology: the step is AOT-compiled and warmed up first, then N
individual steps run under ``jax.profiler.trace``; events from the TPU
process's "XLA Ops" thread are summed by fused-op name and bucketed by
kind (convolution / matmul / FFT / elementwise+copy / reduce / other).
Because XLA fusions HIDE their heavy ops behind opaque names
("fusion.1923"), each fusion is resolved against the optimized HLO text
(``compiled.as_text()``): the called fused computation's body is scanned
for convolution/dot/fft/reduce instructions and the fusion is
re-bucketed by the heaviest kind it contains — so a conv wrapped in a
loop fusion counts as convolution, not elementwise.  Output: top-K ops
(annotated with the heavy ops inside), category percentages, and total
device-busy time vs wall time — written to TRACE_REPORT.json.

Usage: python tools/trace_report.py [batch] [n_steps]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import re
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

_CATEGORIES = (
    ("convolution", re.compile(r"convolution|conv[.\d]|%conv")),
    ("matmul", re.compile(r"\bdot\b|dot_general|%dot")),
    ("fft", re.compile(r"fft")),
    ("copy/transpose", re.compile(r"copy|transpose|reshape|bitcast")),
    ("reduce", re.compile(r"reduce|all-reduce|scatter")),
)


def _categorize(name: str, fusion_kinds=None) -> str:
    # Fusions are resolved against the HLO body when available (the name
    # "fusion.12" hides the conv/dot/fft inside); explicit instruction
    # names ("convolution.5"/"dot.3"/"fft.1") match directly.  Fusions
    # with no heavy op land in "fusion/elementwise".
    low = name.lower()
    kinds = (fusion_kinds or {}).get(name)
    if kinds is not None:
        for cat in ("convolution", "matmul", "fft", "reduce"):
            if cat in kinds:
                return cat
        return "fusion/elementwise"
    for cat, pat in _CATEGORIES:
        if pat.search(low):
            return cat
    if "fusion" in low:
        return "fusion/elementwise"
    return "other"


_HEAVY = (("convolution", re.compile(r"\bconvolution\(")),
          ("matmul", re.compile(r"\bdot\(")),
          ("fft", re.compile(r"\bfft\(|custom-call\(.*fft")),
          ("reduce", re.compile(r"\breduce\(|\breduce-window\(")))


def _fusion_kinds_from_hlo(hlo_text: str):
    """Map each fusion instruction name -> set of heavy-op kinds inside
    its called fused computation, parsed from optimized HLO text."""
    # 1. computation name -> heavy kinds present in its body
    comp_kinds = {}
    current = None
    for line in hlo_text.splitlines():
        if ("{" in line and "=" not in line.split("{")[0]
                and (m2 := re.search(r"%?([\w.\-]+)\s*\(", line))):
            current = m2.group(1)
            comp_kinds.setdefault(current, set())
            continue
        if line.strip() == "}":
            current = None
            continue
        if current is not None:
            for kind, pat in _HEAVY:
                if pat.search(line):
                    comp_kinds[current].add(kind)
    # 2. fusion instruction -> called computation
    fusion_kinds = {}
    for m in re.finditer(
            r"%?([\w.\-]+)\s*=\s*\S+\s+fusion\(.*?calls=%?([\w.\-]+)",
            hlo_text):
        fusion_kinds[m.group(1)] = comp_kinds.get(m.group(2), set())
    return fusion_kinds


def main(batch: int = 32, n_steps: int = 8, top_k: int = 12,
         dtype: str = "float32", dft: str = "fft"):
    import jax
    import jax.numpy as jnp
    import optax
    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from avsep_tpu.config import Config
    from avsep_tpu.engine import build_nets, forward
    from avsep_tpu.train import init_state, make_optimizer

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 dtype=dtype, dft=dft,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, weighted_loss=1, log_freq=1, loss="bce",
                 one_frame=True, match_weight=0.1)
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, state.params)
    print(f"# device: {jax.devices()[0]}")

    def loss_fn(params, stats, bd, rng):
        err, (new_stats, _) = forward(nets, params, stats, bd, cfg, rng,
                                      use_vis=True, train=True)
        return err, new_stats

    @jax.jit
    def train_step(params, stats, opt_state, key):
        ka, kf, kr = jax.random.split(key, 3)
        bd = {"audios": 0.1 * jax.random.normal(
                  ka, (batch, 2, cfg.audLen)),
              "frames": jax.random.uniform(
                  kf, (batch, 2, 1, 224, 224, 3))}
        (err, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, stats, bd, kr)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, err

    p, s, o = state.params, state.batch_stats, state.opt_state
    t0 = time.time()
    compiled = train_step.lower(p, s, o, jax.random.PRNGKey(1)).compile()
    fusion_kinds = _fusion_kinds_from_hlo(compiled.as_text())
    train_step = compiled
    p, s, o, err = train_step(p, s, o, jax.random.PRNGKey(1))
    float(err)
    print(f"# compile+first {time.time() - t0:.1f}s "
          f"({len(fusion_kinds)} fusions mapped from HLO)")

    trace_dir = tempfile.mkdtemp(prefix="avsep_trace_")
    t0 = time.time()
    with jax.profiler.trace(trace_dir):
        for i in range(n_steps):
            p, s, o, err = train_step(p, s, o, jax.random.PRNGKey(2 + i))
        float(err)  # sync
    wall = time.time() - t0

    # ---- parse the chrome trace: device pid -> "XLA Ops" thread events
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace written under {trace_dir}"
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
        if (e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids):
            per_op[e["name"]] += e.get("dur", 0.0)  # us

    total_us = sum(per_op.values())
    if total_us == 0:
        # no 'TPU' device process in the trace (e.g. CPU backend): say so
        # instead of dividing by zero after minutes of compile+trace work
        raise SystemExit(
            "no device-op events found in the trace (no 'TPU' process — "
            "running on the CPU backend? trace_report needs a real chip; "
            "use tools/mfu_report.py for platform-independent numbers)")
    per_cat = defaultdict(float)
    for name, us in per_op.items():
        per_cat[_categorize(name, fusion_kinds)] += us
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:top_k]

    report = {
        "batch": batch, "n_steps": n_steps,
        "dtype": dtype, "dft": dft,
        "wall_ms_per_step": wall / n_steps * 1e3,
        "device_busy_ms_per_step": total_us / n_steps / 1e3,
        "device_busy_frac_of_wall": (total_us / 1e6) / wall,
        "category_pct": {k: 100.0 * v / total_us
                         for k, v in sorted(per_cat.items(),
                                            key=lambda kv: -kv[1])},
        "top_ops_pct": [
            {"op": n, "pct": 100.0 * us / total_us,
             "ms_per_step": us / n_steps / 1e3,
             "contains": sorted(fusion_kinds.get(n, ())) or None}
            for n, us in top],
    }

    print(f"\nwall {report['wall_ms_per_step']:.1f} ms/step, device busy "
          f"{report['device_busy_ms_per_step']:.1f} ms/step "
          f"({100 * report['device_busy_frac_of_wall']:.0f}% of wall)")
    print("== device time by category ==")
    for k, v in report["category_pct"].items():
        print(f"  {k:20s} {v:5.1f}%")
    print(f"== top {top_k} ops ==")
    for row in report["top_ops_pct"]:
        inside = (" [" + ",".join(row["contains"]) + "]"
                  if row["contains"] else "")
        print(f"  {row['pct']:5.1f}%  {row['ms_per_step']:7.3f} ms  "
              f"{row['op']}{inside}")

    tag = "" if (dtype, dft) == ("float32", "fft") else f"_{dtype}_{dft}"
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"TRACE_REPORT{tag}.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"report written to {out}")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dt = sys.argv[3] if len(sys.argv) > 3 else "float32"
    df = sys.argv[4] if len(sys.argv) > 4 else "fft"
    main(b, n, dtype=dt, dft=df)
