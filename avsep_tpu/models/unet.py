"""Spectrogram U-Net mask decoder with an audio-visual fusion bottleneck.

Functional equivalent of the reference ``models/audio_net.py`` (``Unet`` /
``UnetBlock`` / ``InnerUnetBlock``): a 5/6/7-level encoder-decoder over the
log-magnitude spectrogram whose innermost block hosts the CoLoc fusion and
threads ``(x, v) -> (masks, (match_loss, att_maps))``.

Architecture (unet7, ngf=64, input 256x256x1):
  encoder: conv4x4/s2 features [64,128,256,512,512,512,512] -> 2x2x512
  bottleneck: CoLoc fusion doubles channels -> 2x2x1024
  decoder: ReLU -> bilinear x2 (align_corners=True) -> conv3x3 -> BN,
           skip = channel concat with the same-depth encoder activation
  outermost: no BN, conv has bias, output fc_dim channels, no skip.

Down path d>=1 applies LeakyReLU(0.2) *before* the conv and BatchNorm after
(innermost: no BN) — matching the reference block layouts exactly
(audio_net.py:78-105,184-189).  Input is normalized by a learned
BatchNorm2d(1) (`bn0`, audio_net.py:37).

TPU-first: written iteratively (not recursively) over depth so the whole
model is a single flat Flax module, NHWC layout, and the decoder can be
wrapped in ``jax.checkpoint`` by the trainer for rematerialization.
"""

from __future__ import annotations

from typing import Any, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsep_tpu.models.fusion import FusionOut, get_fusion
from avsep_tpu.models.layers import (
    ConvDown, ConvUp, TorchBatchNorm, leaky_relu, upsample2x_align_corners)


def _down_features(ngf: int, num_downs: int) -> List[int]:
    feats = [ngf, ngf * 2, ngf * 4, ngf * 8]
    feats += [ngf * 8] * (num_downs - 4)
    return feats[:num_downs]


class AudioUnet(nn.Module):
    """U-Net over [B, H, W, 1] log-magnitude, fusion at the bottleneck.

    ``__call__(x, v, train, option, fusion_rng)``:
      x: [B, H, W, 1] log-magnitude spectrogram (H = W = 256 canonical).
      v: stacked visual maps [C, B, Hv, Wv, vis_ch] or None (audio-only).
      fusion_rng: explicit PRNG key for the stochastic fusion paths (the
        audio-only slot shuffle and the duet concat coin); replaces the
        reference's implicit CUDA RNG (fusion_net.py:88,96).
    Returns (masks [B, H, W, fc_dim], FusionOut meta).
    """
    fc_dim: int = 64
    num_downs: int = 5
    ngf: int = 64
    use_dropout: bool = False
    fusion_type: str = "hidsep"
    att_type: str = "cos"
    att_temp: float = 1.0
    # source count for the audio-only fusion branch (the AV branch infers
    # it from v's leading dim; both must chunk the bottleneck identically)
    num_sources: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, v: Optional[jnp.ndarray] = None,
                 train: bool = False, option: Optional[str] = None,
                 fusion_rng: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, FusionOut]:
        nd = self.num_downs
        feats = _down_features(self.ngf, nd)

        x = TorchBatchNorm(dtype=self.dtype, name="bn0")(x, train)

        # ---- encoder ----
        skips = []
        h = x
        for d in range(nd):
            if d > 0:
                h = leaky_relu(h, 0.2)
            h = ConvDown(feats[d], dtype=self.dtype, name=f"down{d}")(h)
            if 0 < d < nd - 1:
                h = TorchBatchNorm(dtype=self.dtype, name=f"down_bn{d}")(
                    h, train)
            skips.append(h)

        # ---- fusion bottleneck (innermost InnerUnetBlock) ----
        if fusion_rng is None and v is None:
            fusion_rng = self.make_rng("fusion")
        fuse = get_fusion(self.fusion_type)
        out: FusionOut = fuse(h.astype(jnp.float32),
                              None if v is None else v.astype(jnp.float32),
                              att_type=self.att_type, rng=fusion_rng,
                              option=option, n_sources=self.num_sources,
                              att_temp=self.att_temp)
        h = out.features.astype(self.dtype)

        # ---- decoder ----
        for d in range(nd - 1, -1, -1):
            h = jax.nn.relu(h)
            h = upsample2x_align_corners(h)
            h = ConvUp(self.fc_dim if d == 0 else feats[d - 1],
                       use_bias=(d == 0), dtype=self.dtype,
                       name=f"up{d}")(h)
            if d > 0:
                h = TorchBatchNorm(dtype=self.dtype, name=f"up_bn{d}")(
                    h, train)
                if self.use_dropout and 4 <= d < nd - 1:
                    h = nn.Dropout(0.5, deterministic=not train)(h)
                h = jnp.concatenate([skips[d - 1], h], axis=-1)

        return h, out._replace(features=None)
