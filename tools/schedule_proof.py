"""Compressed long-horizon schedule fidelity proof (VERDICT r3 #5).

Nobody had run the reference's 95k-iter training *shape* end-to-end:
LR x0.1 at {50k, 70k, 90k} (reference ``main.py:550-555``), eval/ckpt
cadence (``main.py:736-760``), and resume ACROSS a decay boundary.  This
tool runs the exact shape compressed ~500x through the real CLI on the
attached device:

  phase 1:  iters 1..124,   lr_steps (100, 140, 160)  -> crosses 100
  phase 2:  --load_ckpt, continue 121..200            -> crosses 140, 160

and then proves schedule fidelity from the artifacts, not the logs:

  * the final checkpoint's optax schedule count == total iters (the
    reference recomputes LR from scratch each run, so ITS resume would
    restart at the base LR; ours restores the position — pinned at unit
    level by tests/test_resume.py::test_resume_after_decay_boundary_*),
  * the schedule evaluated at the restored count gives base * 0.001
    (all three decays applied),
  * history json is continuous across the resume (no iter gap/reset),
  * the eval cadence fired at every multiple of eval_iter.

Writes SCHEDULE_r04.json next to the repo root and exits nonzero on any
violated invariant.

Usage:
    python tools/schedule_proof.py [--csv /tmp/toyset/train.csv]
                                   [--ckpt /tmp/sched_proof]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def cli_args(csv: str, ckpt: str, num_iters: int, resume: bool):
    a = [sys.executable, "-u", "-m", "avsep_tpu.main",
         "--mode", "train", "--id", "sched", "--ckpt", ckpt,
         "--av_list_train", csv, "--ao_list_train", csv,
         "--list_val", csv,
         "--arch_sound", "unet5", "--arch_frame", "tinyconv",
         "--arch_synthesizer", "linear",
         "--num_channels", "2", "--vis_channels", "256",
         "--fusion_type", "hidsep", "--att_type", "sig", "--not_pool_vis",
         "--loss", "bce", "--binary_mask", "1", "--weighted_loss", "1",
         "--num_mix", "2", "--log_freq", "1", "--match_weight", "0.1",
         "--one_frame", "--audLen", "16383", "--imgSize", "64",
         "--audRate", "11025", "--num_gpus", "1",
         "--batch_size_per_gpu", "8", "--workers", "0",
         "--train_repeat", "10", "--start_av_first", "--num_fsteps", "0",
         "--iter_per_av", "2",
         "--lr_steps", "100", "140", "160",
         "--num_iters", str(num_iters), "--eval_iter", "40",
         "--disp_iter", "20", "--num_vis", "0", "--num_val", "8"]
    if resume:
        a += ["--load_ckpt", "latest"]
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default="/tmp/toyset/train.csv")
    ap.add_argument("--ckpt", default="/tmp/sched_proof")
    ap.add_argument("--out", default=os.path.join(REPO, "SCHEDULE_r04.json"))
    ap.add_argument("--timeout", type=int, default=3000)
    args = ap.parse_args()

    import shutil
    run_dir = os.path.join(args.ckpt, "sched")
    shutil.rmtree(run_dir, ignore_errors=True)

    logs = {}
    for phase, (iters, resume) in enumerate(
            [(125, False), (201, True)], start=1):
        cmd = cli_args(args.csv, args.ckpt, iters, resume)
        print(f"[phase {phase}] {'resume' if resume else 'fresh'} -> "
              f"iter {iters}", flush=True)
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=args.timeout, cwd=REPO)
        logs[f"phase{phase}"] = r.stdout[-4000:]
        if r.returncode != 0 or "Training Done!" not in r.stdout:
            print(r.stdout[-3000:])
            print(r.stderr[-3000:])
            raise SystemExit(f"phase {phase} failed rc={r.returncode}")

    # ---- verify from artifacts (host CPU: restore + schedule math only)
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    import jax.numpy as jnp
    from avsep_tpu.checkpoint import load_history, restore_checkpoint
    from avsep_tpu.config import parse_args
    from avsep_tpu.engine import build_nets
    from avsep_tpu.train import _lr_schedule, init_state

    cfg = parse_args(cli_args(args.csv, args.ckpt, 201, True)[4:])
    cfg = cfg.replace(ckpt=run_dir)
    nets = build_nets(cfg)
    template = init_state(cfg, nets, jax.random.PRNGKey(0))
    template = jax.tree_util.tree_map(jnp.zeros_like, template)
    state = restore_checkpoint(run_dir, template, "latest")

    failures = []
    counts = [int(x) for x in
              jax.tree_util.tree_leaves(jax.device_get(state.opt_state))
              if np.ndim(x) == 0 and np.issubdtype(
                  np.asarray(x).dtype, np.integer)]
    count = max(counts) if counts else -1
    total = int(state.step)
    if total != 200:
        failures.append(f"final step {total} != 200 (last ckpt = last eval multiple)")
    if count != 200:
        failures.append(f"optax schedule count {count} != 200 "
                        "(LR position lost across resume)")
    lr_final = float(_lr_schedule(cfg.lr_sound, cfg.lr_steps)(count))
    want = cfg.lr_sound * 1e-3
    if not np.isclose(lr_final, want, rtol=1e-6):
        failures.append(f"final lr {lr_final} != base*0.001 {want}")

    hist = load_history(run_dir)
    train_iters = hist["train"]["iter"]
    if sorted(train_iters) != train_iters or len(set(train_iters)) != len(
            train_iters):
        failures.append("history iters non-monotonic across resume")
    evals = hist["val_av"]["iter"]
    want_evals = [i for i in range(40, 201, 40)]
    missing = [i for i in want_evals if i not in evals]
    if missing:
        failures.append(f"eval cadence missed iters {missing}")

    report = {
        "phases": {"1": "fresh 1..125 (lr x0.1 at 100)",
                   "2": "resume 121..200 (x0.1 at 140, 160)"},
        "final_step": total,
        "optax_schedule_count": count,
        "lr_final": lr_final,
        "lr_base": cfg.lr_sound,
        "eval_iters": evals,
        "train_loss_first": hist["train"]["err"][0],
        "train_loss_last": hist["train"]["err"][-1],
        "failures": failures,
        "ok": not failures,
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    raise SystemExit(0 if not failures else 1)


if __name__ == "__main__":
    main()
