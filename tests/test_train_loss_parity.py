"""Training-loss composition parity: engine.forward_av / forward_ao loss
values vs the reference NetWrapper math assembled in torch (prepare
main.py:51-95, forward_av :113-148 double pass, forward_ao :97-111 PIT)
with imported weights — catches composition mistakes the per-module parity
tests cannot."""

import pytest

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.engine import Nets, forward
from avsep_tpu.models.builder import ModelBuilder
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.torch_import import resnet_from_torch, unet_from_torch
from avsep_tpu.ops.warp import warpgrid
from tests.reference_loader import load_reference_models
from tests.test_resnet_parity import TResNet18

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier

N_FFT, HOP = 1022, 256


def _torch_stft_mag(x):
    w = torch.hann_window(N_FFT, periodic=True)
    return torch.stft(torch.from_numpy(x), n_fft=N_FFT, hop_length=HOP,
                      window=w, center=True, pad_mode="reflect",
                      return_complex=True).abs()


def _setup():
    audio_net, _, criterion, _, _ = load_reference_models()
    torch.manual_seed(1)
    tunet = audio_net.Unet(fc_dim=2, num_downs=7, fusion_type="hidsep",
                           att_type="sig").eval()
    ttrunk = TResNet18().eval()
    tfc = torch.nn.Conv2d(512, 256, 3, padding=1)

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, weighted_loss=1, log_freq=1, loss="bce",
                 one_frame=True, match_weight=0.1)

    sound_p, sound_s = unet_from_torch(tunet.state_dict(), 7)
    sd = dict(ttrunk.state_dict())
    sd["fc.weight"] = tfc.weight.data
    sd["fc.bias"] = tfc.bias.data
    frame_p, frame_s = resnet_from_torch(sd)
    nets = Nets(ModelBuilder.build_sound("unet7", 2, "hidsep", "sig"),
                FrameEncoder(fc_dim=256, pool_type="maxpool",
                             dilate_scale=0))
    params = {"sound": sound_p, "frame": frame_p}
    stats = {"sound": sound_s, "frame": frame_s}

    rs = np.random.RandomState(2)
    B = 2
    audios = (rs.randn(B, 2, 65535) * 0.1).astype(np.float32)
    mix = audios.sum(1)
    frames = rs.rand(B, 2, 1, 64, 64, 3).astype(np.float32)
    batch = {"audios": jnp.asarray(audios), "audio_mix": jnp.asarray(mix),
             "frames": jnp.asarray(frames)}
    return (cfg, nets, params, stats, batch, tunet, ttrunk, tfc, criterion,
            audios, mix, frames)


def _torch_prepare(mix, audios, B):
    mag_mix = _torch_stft_mag(mix)[:, None] + 1e-10
    mags = [(_torch_stft_mag(audios[:, n]))[:, None] for n in range(2)]
    T = mag_mix.shape[-1]
    grid = torch.from_numpy(warpgrid(B, 256, T, True))
    mag_mix = F.grid_sample(mag_mix, grid, align_corners=False)
    mags = [F.grid_sample(m, grid, align_corners=False) for m in mags]
    weights = torch.clamp(torch.log1p(mag_mix), 1e-3, 10)
    gt = [(m > 0.5 * mag_mix).float() for m in mags]
    return torch.log(mag_mix), gt, weights


def test_forward_av_loss_parity():
    (cfg, nets, params, stats, batch, tunet, ttrunk, tfc, criterion,
     audios, mix, frames) = _setup()
    B = 2

    err, (_, outputs) = forward(nets, params, stats, batch, cfg, None,
                                use_vis=True, train=False)

    with torch.no_grad():
        log_mag, gt, weights = _torch_prepare(mix, audios, B)
        tf = torch.from_numpy(
            frames.reshape(B * 2, 1, 64, 64, 3)[:, 0]).permute(0, 3, 1, 2)
        feat = torch.relu(tfc(ttrunk(tf)))
        feats = [feat[0::2], feat[1::2]]
        bce = criterion.BCELoss()

        def av_pass(vis, gts):
            out, meta = tunet(log_mag, vis)
            preds = [torch.sigmoid(out[:, n]).unsqueeze(1)
                     for n in range(2)]
            return bce(preds, gts, weights), meta[0]

        err1, m1 = av_pass(feats[::-1], gt[::-1])
        err0, m0 = av_pass(feats, gt)
        ref_err = (err1 + err0) / 2 + cfg.match_weight * (m1 + m0)
        ref_match = m1 + m0

    np.testing.assert_allclose(float(err), float(ref_err), rtol=2e-3)
    np.testing.assert_allclose(float(outputs["match_loss"]),
                               float(ref_match), rtol=2e-3, atol=1e-4)


def test_forward_ao_loss_parity():
    (cfg, nets, params, stats, batch, tunet, ttrunk, tfc, criterion,
     audios, mix, frames) = _setup()
    B = 2
    key = jax.random.PRNGKey(5)
    err, (_, outputs) = forward(nets, params, stats, batch, cfg, key,
                                use_vis=False, train=False)

    # pin the slot-shuffle coin to the jax draw (fusion._random_slot_swap)
    coin = np.asarray(jax.random.uniform(key, (B,)))
    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if shape == (B,):
            return torch.from_numpy(coin.copy())
        return real_rand(*shape, **kw)
    torch.rand = fake_rand
    try:
        with torch.no_grad():
            log_mag, gt, weights = _torch_prepare(mix, audios, B)
            out, _ = tunet(log_mag, None)
            pred = torch.sigmoid(out).permute(0, 2, 3, 1)
            gt_st = torch.stack(gt, -1)[:, 0]
            w_st = torch.stack([weights[:, 0]] * 2, -1)
            pit = criterion.PitWrapper(F.binary_cross_entropy)
            losses, perms = pit(pred, gt_st, w_st)
            ref_err = losses.mean()
    finally:
        torch.rand = real_rand

    np.testing.assert_allclose(float(err), float(ref_err), rtol=2e-3)
