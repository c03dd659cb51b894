"""SoP++ audio-visual learning probe (L7 research fork).

Companion of ``tools/av_probe.py`` for the SoP++ tree (reference
``SoP++/main.py:94-246`` + ``SoP++/attention_net.py:75-108``): the
stage-3 forward builds each source's mask from per-source global visual
context selected by the PIT attention, so separation order is visually
grounded only if the attention assigned audio slots to the right visual
streams.  Two metrics over a deterministic val sweep of the BEST
checkpoint:

* **assignment accuracy** (frames-swap probe) — the stage-3 per-sample
  loss scored non-PIT against ground-truth order must RISE when the two
  visual streams are swapped; chance = 0.5 with uninformative vision.
* **AV vs AO SI-SDR / SDR** — held-out separation quality of the
  vision-conditioned branch vs the audio-only branch.

Usage: same flag strings as training::

    python tools/sop_probe.py --id sopproof --ckpt ./ckpt <train flags>

Writes ``<ckpt>/<id>/sop_probe.json`` and prints one summary line.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from avsep_tpu.config import parse_args  # noqa: E402


def run_probe(cfg, tag: str = "best"):
    from avsep_tpu.checkpoint import restore_checkpoint
    from avsep_tpu.data.dataset import MusicMixDataset
    from avsep_tpu.data.loader import BatchLoader, ConcatDataset
    from avsep_tpu.sop_main import (build_sop_nets, init_sop_state,
                                    make_sop_eval_step)

    nets = build_sop_nets(cfg)
    state = init_sop_state(cfg, nets, jax.random.PRNGKey(cfg.seed))
    ckpt_dir = os.path.join(cfg.ckpt, cfg.id)
    # NOTE: `best` tracks the lowest val err (loss), which the 3-stage
    # curriculum pins to an early stage-1 snapshot whose AV path is
    # untrained; probe `latest` for end-of-curriculum AV quality.
    try:
        state = restore_checkpoint(ckpt_dir, state, tag)
        print(f"restored {tag.upper()} checkpoint from {ckpt_dir}")
    except Exception:
        state = restore_checkpoint(ckpt_dir, state, "latest")
        print(f"restored LATEST checkpoint from {ckpt_dir}")

    ds = ConcatDataset([MusicMixDataset(p, cfg, split="val")
                        for p in cfg.list_val])
    loader = BatchLoader(ds, cfg.batch_size, shuffle=False, num_workers=4,
                         seed=cfg.seed)

    steps = {v: make_sop_eval_step(cfg, nets, use_vis=v)
             for v in (True, False)}
    rng = jax.random.PRNGKey(cfg.seed)
    hits = sisdr_hits = total = 0
    acc = {k: [] for k in ("av_si_sdr", "av_sdr", "ao_si_sdr", "ao_sdr")}
    for batch in loader:
        dev = {k: jnp.asarray(v) for k, v in batch.items()
               if isinstance(v, np.ndarray) and v.dtype != object
               and k != "audio_mix"}
        rng, sub = jax.random.split(rng)
        m = jax.device_get(steps[True](state.params, state.batch_stats,
                                       dev, sub))
        swapped = dict(dev)
        swapped["frames"] = dev["frames"][:, ::-1]
        m_swp = jax.device_get(steps[True](state.params, state.batch_stats,
                                           swapped, sub))
        hits += int(np.sum(m["err_ps"] < m_swp["err_ps"]))
        # direct readout: fixed-order per-sample SI-SDR must DROP when the
        # two visual streams are swapped iff vision orders the outputs
        sisdr_hits += int(np.sum(m["si_sdr"] > m_swp["si_sdr"]))
        total += len(m["err_ps"])
        acc["av_si_sdr"].append(m["si_sdr"])
        acc["av_sdr"].append(m["sdr"])
        m_ao = jax.device_get(steps[False](state.params, state.batch_stats,
                                           dev, sub))
        acc["ao_si_sdr"].append(m_ao["si_sdr"])
        acc["ao_sdr"].append(m_ao["sdr"])

    report = {"assign_acc": hits / max(total, 1),
              "assign_acc_sisdr": sisdr_hits / max(total, 1),
              "assign_n": total}
    report.update({k: float(np.mean(np.concatenate(v)))
                   for k, v in acc.items()})
    report["ckpt_tag"] = tag
    out_path = os.path.join(ckpt_dir, f"sop_probe_{tag}.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print("[SoP probe] assign_acc={assign_acc:.3f} "
          "assign_acc_sisdr={assign_acc_sisdr:.3f} (n={assign_n}, "
          "chance 0.5)  AV SI-SDR={av_si_sdr:.2f} dB  "
          "AO SI-SDR={ao_si_sdr:.2f} dB  AV SDR={av_sdr:.2f} dB  "
          "AO SDR={ao_sdr:.2f} dB".format(**report))
    print(f"report written to {out_path}")
    return report


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--probe_ckpt", default="best",
                    choices=("best", "latest"))
    probe_args, rest = ap.parse_known_args()
    run_probe(parse_args(rest), tag=probe_args.probe_ckpt)
