"""END-TO-END parity: engine.separate() (wav -> separated wavs, all on
device) vs the reference pipeline assembled in torch — librosa-semantics
STFT, grid_sample warp, reference Unet+CoLoc with imported weights, unwarp,
threshold, iSTFT (reference inference.py:39-86 + recover_aud :433-491).

This is the BASELINE.md parity claim: masks bit-for-bit at float32
tolerance, waveforms within float tolerance post-iSTFT.
"""

import pytest

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.engine import Nets, separate
from avsep_tpu.models.builder import ModelBuilder
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.torch_import import resnet_from_torch, unet_from_torch
from avsep_tpu.ops.warp import warpgrid
from tests.reference_loader import load_reference_models
from tests.test_resnet_parity import TResNet18

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier

N_FFT, HOP = 1022, 256


def _torch_stft(x):
    w = torch.hann_window(N_FFT, periodic=True)
    return torch.stft(torch.from_numpy(x), n_fft=N_FFT, hop_length=HOP,
                      window=w, center=True, pad_mode="reflect",
                      return_complex=True)


def test_separate_matches_reference_pipeline():
    audio_net = load_reference_models()[0]
    torch.manual_seed(0)
    tunet = audio_net.Unet(fc_dim=2, num_downs=7, fusion_type="hidsep",
                           att_type="sig").eval()
    ttrunk = TResNet18().eval()
    tfc = torch.nn.Conv2d(512, 256, 3, padding=1)

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, log_freq=1, one_frame=True)

    # import the same weights into the JAX nets
    sound_p, sound_s = unet_from_torch(tunet.state_dict(), num_downs=7)
    sd = dict(ttrunk.state_dict())
    sd["fc.weight"] = tfc.weight.data
    sd["fc.bias"] = tfc.bias.data
    frame_p, frame_s = resnet_from_torch(sd)
    nets = Nets(ModelBuilder.build_sound("unet7", 2, "hidsep", "sig"),
                FrameEncoder(fc_dim=256, pool_type="maxpool",
                             dilate_scale=0))
    params = {"sound": sound_p, "frame": frame_p}
    stats = {"sound": sound_s, "frame": frame_s}

    rs = np.random.RandomState(0)
    B = 2
    wav = (rs.randn(B, 65535) * 0.1).astype(np.float32)
    frames = rs.rand(B, 2, 1, 64, 64, 3).astype(np.float32)

    # ---------------- reference pipeline in torch
    with torch.no_grad():
        spec = _torch_stft(wav)
        mag = spec.abs()[:, None]                          # B,1,512,256
        phase = spec.angle()
        T = mag.shape[-1]
        grid = torch.from_numpy(warpgrid(B, 256, T, True))
        warped = F.grid_sample(mag + 1e-10, grid, align_corners=False)
        log_mag = torch.log(warped)

        tf = torch.from_numpy(
            frames.reshape(B * 2, 1, 64, 64, 3)[:, 0]).permute(0, 3, 1, 2)
        feat = torch.relu(tfc(ttrunk(tf)))                 # B*2,256,2,2
        v = [feat[0::2], feat[1::2]]
        out, _ = tunet(log_mag, v)
        masks = torch.sigmoid(out)                         # B,2,256,256
        un = torch.from_numpy(warpgrid(B, 512, T, False))
        lin = F.grid_sample(masks, un, align_corners=False)
        lin_bin = (lin > 0.5).float()
        ref_wavs = []
        w = torch.hann_window(N_FFT, periodic=True)
        for n in range(2):
            s = (mag[:, 0] * lin_bin[:, n]) * torch.exp(1j * phase)
            ref_wavs.append(torch.istft(s, n_fft=N_FFT, hop_length=HOP,
                                        window=w, center=True))
        ref_wavs = torch.stack(ref_wavs, 1).clamp(-1, 1).numpy()

    # ---------------- our pipeline (one jit program)
    got = jax.device_get(separate(
        nets, params, stats, jnp.asarray(wav), jnp.asarray(frames), cfg))

    # binary masks: identical except at threshold ties from float noise
    mask_mismatch = np.mean(got["masks_linear"] != lin_bin.numpy())
    assert mask_mismatch < 2e-4, f"mask mismatch rate {mask_mismatch}"

    # waveforms within float tolerance (reference istft length 65280)
    L = min(ref_wavs.shape[-1], got["wavs"].shape[-1])
    err = np.abs(got["wavs"][..., :L] - ref_wavs[..., :L])
    assert err.max() < 5e-3, f"wav max err {err.max()}"
    assert err.mean() < 1e-4, f"wav mean err {err.mean()}"


def test_separate_duet_matches_reference_quirk():
    """Duet (single visual stream): the reference duplicates the frame
    feature WITHOUT img_activation (inference.py:71-73) — unlike the
    non-duet branch (:76-77).  VERDICT weak #7: engine.separate must
    reproduce that quirk exactly."""
    audio_net = load_reference_models()[0]
    torch.manual_seed(1)
    tunet = audio_net.Unet(fc_dim=2, num_downs=7, fusion_type="hidsep",
                           att_type="sig").eval()
    ttrunk = TResNet18().eval()
    tfc = torch.nn.Conv2d(512, 256, 3, padding=1)

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, log_freq=1, one_frame=True)

    sound_p, sound_s = unet_from_torch(tunet.state_dict(), num_downs=7)
    sd = dict(ttrunk.state_dict())
    sd["fc.weight"] = tfc.weight.data
    sd["fc.bias"] = tfc.bias.data
    frame_p, frame_s = resnet_from_torch(sd)
    nets = Nets(ModelBuilder.build_sound("unet7", 2, "hidsep", "sig"),
                FrameEncoder(fc_dim=256, pool_type="maxpool",
                             dilate_scale=0))
    params = {"sound": sound_p, "frame": frame_p}
    stats = {"sound": sound_s, "frame": frame_s}

    rs = np.random.RandomState(1)
    B = 2
    wav = (rs.randn(B, 65535) * 0.1).astype(np.float32)
    frames = rs.rand(B, 1, 1, 64, 64, 3).astype(np.float32)  # ONE stream

    with torch.no_grad():
        spec = _torch_stft(wav)
        mag = spec.abs()[:, None]
        T = mag.shape[-1]
        grid = torch.from_numpy(warpgrid(B, 256, T, True))
        warped = F.grid_sample(mag + 1e-10, grid, align_corners=False)
        log_mag = torch.log(warped)

        tf = torch.from_numpy(frames[:, 0, 0]).permute(0, 3, 1, 2)
        feat = tfc(ttrunk(tf))          # NO img_activation (the quirk)
        out, _ = tunet(log_mag, [feat, feat])
        masks = torch.sigmoid(out)
        un = torch.from_numpy(warpgrid(B, 512, T, False))
        lin_bin = (F.grid_sample(masks, un, align_corners=False)
                   > 0.5).float()

    got = jax.device_get(separate(
        nets, params, stats, jnp.asarray(wav), jnp.asarray(frames), cfg))
    mask_mismatch = np.mean(got["masks_linear"] != lin_bin.numpy())
    assert mask_mismatch < 2e-4, f"duet mask mismatch rate {mask_mismatch}"
