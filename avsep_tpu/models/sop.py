"""SoP++ model family: basis U-Net with an extra-channel bottleneck split
and the PIT attention modules.

TPU-native equivalents of the reference SoP++ experiment tree:

* :class:`BasisUnet` — U-Net whose innermost block emits ``extra_size * C``
  extra bottleneck channels, split off as per-source *feature weights*
  instead of running fusion inside (reference ``SoP++/audio_net.py:151-198``,
  split at :195).  Output is a K-channel sound basis; masks come from the
  InnerProd synthesizer against per-source context vectors.
* :func:`att_model` / :func:`match_att` — the ``AttModel`` / ``MatchAtt``
  cross-modal PIT attention modules (reference ``SoP++/attention_net.py``).
  Parameter-free pure functions; note the reference's ``self.max_pool`` is
  actually an AdaptiveAvgPool3d (attention_net.py:19) — average pooling is
  reproduced faithfully.

Channels-last layout throughout: audio feature-weight maps are
``[C, B, h, w, extra]``; visual maps ``[B, H, W, D]``.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from avsep_tpu.models.layers import (
    ConvDown, ConvUp, TorchBatchNorm, cosine_similarity, leaky_relu,
    upsample2x_align_corners)
from avsep_tpu.models.unet import _down_features


class BasisUnet(nn.Module):
    """Sound-basis U-Net (reference SoP++/audio_net.py:10-43).

    ``__call__(x, train)`` -> (basis [B, H, W, fc_dim],
    feat_weights [B, h2, w2, extra_size * C]).
    """
    fc_dim: int = 64
    num_downs: int = 5
    ngf: int = 64
    extra_size: int = 32
    n_sources: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        nd = self.num_downs
        feats = _down_features(self.ngf, nd)
        extra = self.extra_size * self.n_sources

        x = TorchBatchNorm(dtype=self.dtype, name="bn0")(x, train)

        skips = []
        h = x
        for d in range(nd):
            if d > 0:
                h = leaky_relu(h, 0.2)
            # innermost conv emits the extra feature-weight channels
            width = feats[d] + (extra if d == nd - 1 else 0)
            h = ConvDown(width, dtype=self.dtype, name=f"down{d}")(h)
            if 0 < d < nd - 1:
                h = TorchBatchNorm(dtype=self.dtype, name=f"down_bn{d}")(
                    h, train)
            skips.append(h)

        # bottleneck split (reference SoP++/audio_net.py:195: extra first)
        feat_weights = h[..., :extra]
        h = h[..., extra:]

        for d in range(nd - 1, -1, -1):
            h = jax.nn.relu(h)
            h = upsample2x_align_corners(h)
            h = ConvUp(self.fc_dim if d == 0 else feats[d - 1],
                       use_bias=(d == 0), dtype=self.dtype,
                       name=f"up{d}")(h)
            if d > 0:
                h = TorchBatchNorm(dtype=self.dtype, name=f"up_bn{d}")(
                    h, train)
                h = jnp.concatenate([skips[d - 1], h], axis=-1)
        return h, feat_weights


# ------------------------------------------------------------- attention


class AttOut(NamedTuple):
    ctx_feats: jnp.ndarray                 # [B, C, D]
    match_loss: Optional[jnp.ndarray]
    reg_loss: Optional[jnp.ndarray]
    att_maps: Optional[jnp.ndarray]        # [B, C, H, W]


def _avg_pool_feats(feats: jnp.ndarray) -> jnp.ndarray:
    """[C, B, h, w, D] -> [B, C, D] spatial average (the reference's
    misnamed 'max_pool' = AdaptiveAvgPool3d, attention_net.py:19)."""
    return jnp.moveaxis(jnp.mean(feats, axis=(2, 3)), 0, 1)


def _att_maps(ctx: jnp.ndarray, vis: jnp.ndarray, att_type: str):
    """ctx [B, C, D] x vis [B, H, W, D] -> maps [B, C, H, W]
    (attention_net.py:21-34)."""
    x = ctx[:, :, None, None, :]
    v = vis[:, None]
    if att_type == "cos":
        return cosine_similarity(x, v, axis=-1)
    d = ctx.shape[-1]
    return jax.nn.sigmoid(jnp.sum(x * v / jnp.sqrt(float(d)), axis=-1))


def _infer_forward(aud_vecs: jnp.ndarray, mix_vis: jnp.ndarray,
                   att_type: str):
    """av_infer_forward (attention_net.py:36-57): maps, reg loss, attended
    context features.  aud_vecs [B, C, D], mix_vis [B, H, W, D]."""
    maps = _att_maps(aud_vecs, mix_vis, att_type)            # [B, C, H, W]
    reg = -jnp.mean(jnp.sum(jnp.mean(maps, axis=(2, 3)), axis=-1))
    maps = jnp.clip(maps, 0.0, 1.0)
    ctx = jnp.mean(mix_vis[:, None] * maps[..., None], axis=(2, 3))
    return ctx, reg, maps


def _pit_reorder(query: jnp.ndarray, keys: jnp.ndarray):
    """Best-permutation match of query [B, C, D] against keys [B, C, D]
    by summed cosine scores; returns (reordered query, match_loss, order).
    (attention_net.py:93-107; C=2 special case.)"""
    p1 = query
    p2 = query[:, ::-1]
    qp = jnp.stack([p1, p2], axis=1)                          # [B, P, C, D]
    scores = jnp.sum(cosine_similarity(qp, keys[:, None], axis=-1), -1)
    best = jnp.argmax(scores, axis=1)
    best_score = jnp.take_along_axis(scores, best[:, None], 1)[:, 0]
    match = jnp.mean(-best_score + (jnp.sum(scores, 1) - best_score))
    reordered = jnp.take_along_axis(
        qp, best[:, None, None, None], axis=1)[:, 0]
    return reordered, match, best


def att_model(aud_feats: jnp.ndarray, mix_vis: Optional[jnp.ndarray],
              sep_vis: Optional[jnp.ndarray], att_type: str = "cos"
              ) -> AttOut:
    """Reference ``AttModel`` (attention_net.py:16-119).

    aud_feats: [C, B, h, w, extra] per-source feature-weight maps.
    mix_vis:   [B, H, W, D] mixture visual map or None (AO).
    sep_vis:   [C, B, H, W, D] separated visual maps or None (inference).
    """
    aud_vecs = _avg_pool_feats(aud_feats)                    # [B, C, D]
    if mix_vis is None:
        return AttOut(aud_vecs, None, None, None)
    ctx, reg, maps = _infer_forward(aud_vecs, mix_vis, att_type)
    if sep_vis is None:
        # inference: the reference returns (reg-style match loss, maps)
        return AttOut(ctx, None, reg, maps)
    glb = _avg_pool_feats(sep_vis)                           # [B, C, D]
    ctx_re, match, best = _pit_reorder(ctx, glb)
    maps_p = jnp.stack([maps, maps[:, ::-1]], axis=1)
    maps_re = jnp.take_along_axis(
        maps_p, best[:, None, None, None, None], axis=1)[:, 0]
    return AttOut(ctx_re, match, reg, maps_re)


def match_att(aud_feats: jnp.ndarray, mix_vis: Optional[jnp.ndarray],
              sep_vis: Optional[jnp.ndarray], att_type: str = "cos"
              ) -> AttOut:
    """Reference ``MatchAtt`` (attention_net.py:121-232): permutes the
    *audio* vectors against the separated visual features first, then runs
    the attention inference with the reordered slots."""
    aud_vecs = _avg_pool_feats(aud_feats)                    # [B, C, D]
    if mix_vis is None:
        return AttOut(aud_vecs, None, None, None)
    if sep_vis is None:
        ctx, reg, maps = _infer_forward(aud_vecs, mix_vis, att_type)
        return AttOut(ctx, None, reg, maps)
    glb = _avg_pool_feats(sep_vis)
    aud_re, match, _ = _pit_reorder(aud_vecs, glb)
    ctx, _, maps = _infer_forward(aud_re, mix_vis, att_type)
    return AttOut(ctx, match, None, maps)


def get_attmodule(fusion_type: str):
    """Dispatch (reference SoP++/attention_net.py:8-13)."""
    if fusion_type == "Base":
        return att_model
    if fusion_type == "MatchAtt":
        return match_att
    raise ValueError(f"unknown SoP++ fusion_type {fusion_type}")
