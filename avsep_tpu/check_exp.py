"""Print best-epoch metrics from a run's history (reference check_exp.py).

Usage: python -m avsep_tpu.check_exp ckpt/Exp5_BaseSig
"""

import json
import sys

import numpy as np


def main(ckpt_dir: str):
    with open(f"{ckpt_dir}/history_latest.json") as f:
        history = json.load(f)
    for key in ("val_ao", "val_av"):
        h = history[key]
        if not h["si_sdr"]:
            print(f"{key}: no evals recorded")
            continue
        best = int(np.argmax(h["si_sdr"]))
        print(f"The best {key} epoch is {h['iter'][best]}")
        print(f"sdr: {h['sdr'][best]}")
        print(f"sir: {h['sir'][best]}")
        print(f"si-snr: {h['si_sdr'][best]}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./ckpt/Exp5_BaseSig")
