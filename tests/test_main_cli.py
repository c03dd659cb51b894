"""End-to-end CLI train loop smoke test (avsep_tpu.main.main) on the
synthetic manifest: a few AV/AO-interleaved iterations, one eval tick,
checkpoint + history round trip — the reference's main() flow
(main.py:604-765) at toy scale."""

import os

import pytest

from avsep_tpu.config import Config
from avsep_tpu.main import main
from tests.test_dataset import manifest  # noqa: F401 (fixture)

AUDLEN = 64 * 256 - 1


@pytest.mark.slow
def test_main_train_loop(manifest, tmp_path):  # noqa: F811
    cfg = Config(
        id="testrun", mode="train", arch_sound="unet5", num_channels=2,
        vis_channels=256, fusion_type="hidsep", att_type="sig",
        not_pool_vis=False, img_activation="relu",
        output_activation="sigmoid", loss="bce", binary_mask=1,
        weighted_loss=1, log_freq=1, num_mix=2, audLen=AUDLEN,
        imgSize=64, one_frame=True, margin=1.0, num_gpus=1,
        batch_size_per_gpu=2, workers=2, train_repeat=1, val_repeat=1,
        num_iters=5, eval_iter=2, disp_iter=2, num_vis=0,
        iter_per_av=2, start_av_first=True, num_fsteps=0,
        lr_steps=(100,), ckpt=str(tmp_path / "ckpt"),
        av_list_train=(manifest,), ao_list_train=(manifest,),
        list_val=(manifest,), max_silent=0.95, rate_dc=1.0,
    )
    main(cfg)
    run_dir = str(tmp_path / "ckpt" / "testrun")
    assert os.path.isdir(os.path.join(run_dir, "state_latest"))
    assert os.path.exists(os.path.join(run_dir, "history_latest.json"))
    # eval artifacts
    for branch in ("av", "ao"):
        assert os.path.exists(os.path.join(
            run_dir, "visualization", branch, "results.csv"))
    import json
    with open(os.path.join(run_dir, "history_latest.json")) as f:
        h = json.load(f)
    assert h["train"]["iter"], "training history recorded"
    assert h["val_ao"]["si_sdr"], "eval ran"


@pytest.mark.slow
def test_main_warm_restart(manifest, tmp_path):  # noqa: F811
    """train_MUSIC+.sh semantics: --load_ckpt resumes from the latest
    checkpoint and history (reference main.py:676-679,783-787)."""
    base = dict(
        id="resume", mode="train", arch_sound="unet5", num_channels=2,
        vis_channels=256, fusion_type="hidsep", att_type="sig",
        not_pool_vis=False, img_activation="relu",
        output_activation="sigmoid", loss="bce", binary_mask=1,
        weighted_loss=1, log_freq=1, num_mix=2, audLen=AUDLEN,
        imgSize=64, one_frame=True, margin=1.0, num_gpus=1,
        batch_size_per_gpu=2, workers=2, train_repeat=1, val_repeat=1,
        eval_iter=3, disp_iter=2, num_vis=0, iter_per_av=2,
        start_av_first=True, num_fsteps=0, lr_steps=(100,),
        ckpt=str(tmp_path / "ck"), av_list_train=(manifest,),
        ao_list_train=(manifest,), list_val=(manifest,),
        max_silent=0.95, rate_dc=1.0)
    main(Config(num_iters=5, **base))
    import json
    run = str(tmp_path / "ck" / "resume")
    h1 = json.load(open(os.path.join(run, "history_latest.json")))
    assert h1["val_ao"]["iter"] == [3]

    main(Config(num_iters=8, load_ckpt="1", **base))
    h2 = json.load(open(os.path.join(run, "history_latest.json")))
    # resumed past the first run's display ticks; both evals recorded
    assert h2["val_ao"]["iter"][-1] == 6
    assert h2["train"]["iter"][-1] > h1["train"]["iter"][-1]


def test_check_exp_reports_best_epoch(tmp_path, capsys):
    """check_exp mirrors the reference's coupled reporting (check_exp.py:
    6-15): at the best-AO epoch it prints BOTH branches' metrics rounded
    to 2 decimals, then both again at the best-AV epoch; an empty branch
    reports gracefully instead of crashing on argmax([])."""
    import json
    from avsep_tpu import check_exp

    hist = {
        "val_ao": {"iter": [100, 200, 300], "err": [1.0, 0.9, 0.95],
                   "sdr": [1.0, 2.513, 2.0], "sir": [3.0, 4.518, 4.0],
                   "sar": [5.0, 6.0, 5.5], "si_sdr": [0.5, 1.5, 1.2]},
        "val_av": {"iter": [100, 200, 300], "err": [1.0, 0.9, 0.95],
                   "sdr": [0.9, 1.1, 3.2], "sir": [2.0, 2.1, 5.25],
                   "sar": [4.0, 4.1, 6.0], "si_sdr": [0.4, 0.6, 2.8]},
    }
    (tmp_path / "history_latest.json").write_text(json.dumps(hist))
    check_exp.main(str(tmp_path))
    out = capsys.readouterr().out
    # best-AO epoch (200) reports the AO row AND the AV row at epoch 200
    assert "Best AO model (epoch 200):" in out
    assert "AO: sir: 4.52, SDR: 2.51, SI-SNR: 1.5" in out
    assert "AV: sir: 2.1, SDR: 1.1, SI-SNR: 0.6" in out
    # best-AV epoch (300) reports both rows at epoch 300
    assert "Best AV model (epoch 300):" in out
    assert "AV: sir: 5.25, SDR: 3.2, SI-SNR: 2.8" in out
    assert "AO: sir: 4.0, SDR: 2.0, SI-SNR: 1.2" in out


def test_check_exp_empty_branch(tmp_path, capsys):
    import json
    from avsep_tpu import check_exp

    hist = {
        "val_ao": {"iter": [100], "err": [1.0], "sdr": [1.0], "sir": [3.0],
                   "sar": [5.0], "si_sdr": [0.5]},
        "val_av": {"iter": [], "err": [], "sdr": [], "sir": [],
                   "sar": [], "si_sdr": []},
    }
    (tmp_path / "history_latest.json").write_text(json.dumps(hist))
    check_exp.main(str(tmp_path))
    out = capsys.readouterr().out
    assert "val_av: no evals recorded" in out
    assert "Best AO model (epoch 100):" in out
    # the coupled AV row at the best-AO epoch is absent, reported as such
    assert "AV: no eval recorded at this epoch" in out
