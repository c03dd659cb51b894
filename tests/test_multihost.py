"""Multi-host (DCN) data parallelism: 2 CPU processes x 2 virtual devices
vs 1 process x 4 devices, through the REAL CLI train path.

The reference's only parallelism is single-process DataParallel
(reference main.py:661; SURVEY.md §2.3) — multi-host is beyond-parity
scale-out (parallel/distributed.py).  These tests validate the three
process seams end-to-end: jax.distributed bring-up from Config flags,
replicate/shard global-batch formation, and collective metric readback +
primary-only file writes.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.test_dataset import manifest  # noqa: F401 (fixture)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AUDLEN = 64 * 256 - 1

# Runs avsep_tpu.main.main in a fresh interpreter on the CPU platform.
# One runner for both the distributed processes and the single-process
# control: dist_nprocs=1 skips jax.distributed entirely.
_RUNNER = r"""
import json, sys
(repo, manifest, ckpt, coord, nprocs, pid, mode, ndev, iters) = sys.argv[1:10]
sys.path.insert(0, repo)
import jax
jax.config.update("jax_platforms", "cpu")
# NO early jax.distributed.initialize here: the shipped entry point must
# bring up multi-host itself (main() calls maybe_initialize before any
# backend touch — avsep_tpu.main defers its orbax import for exactly
# this; a regression re-breaks `python -m avsep_tpu.main --dist_nprocs`)
from avsep_tpu.config import Config
from avsep_tpu.main import main

cfg = Config(
    id="mh", mode="train", arch_sound="unet5", num_channels=2,
    arch_frame="tinyconv",  # ~10x cheaper jit than ResNet18 on CPU
    vis_channels=256, fusion_type="hidsep", att_type="sig",
    not_pool_vis=False, img_activation="relu",
    output_activation="sigmoid", loss="bce", binary_mask=1,
    weighted_loss=1, log_freq=1, num_mix=2, audLen=64 * 256 - 1,
    imgSize=64, one_frame=True, margin=1.0,
    num_gpus=int(ndev), batch_size_per_gpu=1, workers=0,
    train_repeat=1, val_repeat=1, num_iters=int(iters), eval_iter=3,
    disp_iter=1, num_vis=0, iter_per_av=2, start_av_first=True,
    num_fsteps=0, lr_steps=(100,), ckpt=ckpt,
    av_list_train=(manifest,), ao_list_train=(manifest,),
    list_val=(manifest,), max_silent=0.95, rate_dc=1.0,
    dist_coordinator=coord, dist_nprocs=int(nprocs),
    dist_procid=int(pid), dist_data=mode)
main(cfg)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _launch(runner, manifest_path, ckpt, coord, nprocs, pid, mode, ndev,
            iters):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{4 // max(nprocs, 1)}")
    return subprocess.Popen(
        [sys.executable, runner, REPO, manifest_path, ckpt, coord,
         str(nprocs), str(pid), mode, str(ndev), str(iters)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env, cwd=REPO)


def _run_pair(runner, manifest_path, ckpt, mode, iters=5):
    coord = f"127.0.0.1:{_free_port()}"
    procs = [_launch(runner, manifest_path, ckpt, coord, 2, pid, mode,
                     4, iters) for pid in (0, 1)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"process {pid} failed:\n{out[-4000:]}"
    return outs


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    path = tmp_path_factory.mktemp("mh") / "runner.py"
    path.write_text(_RUNNER)
    return str(path)


@pytest.mark.slow
def test_replicate_matches_single_process(runner, manifest, tmp_path):  # noqa: F811
    """dist_data=replicate over 2 procs x 2 devices must reproduce the
    1-proc x 4-device run: identical global batches, same rng, same
    4-wide data mesh — loss trajectory and eval meters match."""
    ck_mh = str(tmp_path / "mh")
    ck_sp = str(tmp_path / "sp")
    _run_pair(runner, manifest, ck_mh, "replicate")
    p = _launch(runner, manifest, ck_sp, "", 1, 0, "replicate", 4, 5)
    out, _ = p.communicate(timeout=1200)
    assert p.returncode == 0, f"control failed:\n{out[-4000:]}"

    h_mh = json.load(open(os.path.join(ck_mh, "mh",
                                       "history_latest.json")))
    h_sp = json.load(open(os.path.join(ck_sp, "mh",
                                       "history_latest.json")))
    assert h_mh["train"]["iter"] == h_sp["train"]["iter"]
    np.testing.assert_allclose(h_mh["train"]["err"], h_sp["train"]["err"],
                               rtol=2e-3, atol=2e-4)
    for branch in ("val_av", "val_ao"):
        np.testing.assert_allclose(h_mh[branch]["si_sdr"],
                                   h_sp[branch]["si_sdr"],
                                   rtol=2e-3, atol=2e-2)
    # primary wrote the checkpoint + eval artifacts exactly once
    assert os.path.isdir(os.path.join(ck_mh, "mh", "state_latest"))
    assert os.path.exists(os.path.join(
        ck_mh, "mh", "visualization", "ao", "results.csv"))


@pytest.mark.slow
def test_shard_mode_trains(runner, manifest, tmp_path):  # noqa: F811
    """dist_data=shard: each process loads a disjoint batch/P stream
    (host work divides across hosts).  Batch content differs from the
    1-proc run by construction — assert the job trains, evals, and
    checkpoints cleanly with finite losses."""
    ck = str(tmp_path / "shard")
    _run_pair(runner, manifest, ck, "shard", iters=4)
    h = json.load(open(os.path.join(ck, "mh", "history_latest.json")))
    assert h["train"]["iter"], "training history recorded"
    assert np.isfinite(h["train"]["err"]).all()
    assert h["val_ao"]["si_sdr"], "eval ran"
    assert os.path.isdir(os.path.join(ck, "mh", "state_latest"))
