"""Sound-of-Pixels mask synthesizer heads.

Equivalent of reference ``models/synthesizer_net.py``: tiny inner-product
heads combining a visual feature vector with per-pixel sound basis features.

* ``InnerProd`` (synthesizer_net.py:6-38): scale * <img, sound> + bias with a
  learned per-channel scale;
* ``Bias`` (synthesizer_net.py:41-70): plain inner product + bias.

Channels-last: sound features are [B, H, W, C]; image features [B, C] (or
[B, HI, WI, C] for the pixelwise demo path).  These reduce to batched
matmuls and run on the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp




class InnerProd(nn.Module):
    fc_dim: int = 64
    dtype: Any = jnp.float32

    def setup(self):
        self.scale = self.param("scale", nn.initializers.ones, (self.fc_dim,))
        self.bias = self.param("bias", nn.initializers.zeros, (1,))

    def __call__(self, feat_img: jnp.ndarray, feat_sound: jnp.ndarray):
        """[B, C] x [B, H, W, C] -> [B, H, W, 1] masks (forward,
        synthesizer_net.py:12-19)."""
        z = jnp.einsum("bc,bhwc->bhw", feat_img * self.scale, feat_sound)
        return z[..., None] + self.bias

    def forward_nosum(self, feat_img, feat_sound):
        """Per-channel product without the sum (synthesizer_net.py:21-26)."""
        return (feat_img * self.scale)[:, None, None, :] * feat_sound \
            + self.bias

    def forward_pixelwise(self, feats_img, feat_sound):
        """[B, HI, WI, C] x [B, HS, WS, C] -> [B, HI, WI, HS, WS]
        (synthesizer_net.py:29-38)."""
        z = jnp.einsum("bijc,bhwc->bijhw", feats_img * self.scale, feat_sound)
        return z + self.bias


class Bias(nn.Module):
    dtype: Any = jnp.float32

    def setup(self):
        self.bias = self.param("bias", nn.initializers.zeros, (1,))

    def __call__(self, feat_img, feat_sound):
        z = jnp.einsum("bc,bhwc->bhw", feat_img, feat_sound)
        return z[..., None] + self.bias

    def forward_nosum(self, feat_img, feat_sound):
        return feat_img[:, None, None, :] * feat_sound + self.bias

    def forward_pixelwise(self, feats_img, feat_sound):
        z = jnp.einsum("bijc,bhwc->bijhw", feats_img, feat_sound)
        return z + self.bias
