"""Fused mixture preparation: warp -> loss weights -> GT masks -> log.

TPU-native equivalent of reference ``NetWrapper.prepare`` (``main.py:51-95``),
as one jit region so XLA fuses the elementwise chain into the warp matmuls:

1. ``mag_mix += 1e-10``
2. log-frequency warp of the mixture and each source magnitude (512xT ->
   256xT) — ``warpgrid`` + ``grid_sample(align_corners=False)``
3. loss weights: ``clamp(log1p(mag_mix), 1e-3, 10)`` if ``weighted_loss``
4. ground-truth masks computed *after* warping: binary ``mags > 0.5*mag_mix``
   or ratio ``clamp(mags/mag_mix, 0, 5)``
5. ``log(mag_mix)`` as the U-Net input (gradient stopped, reference
   ``main.py:85`` ``.detach()``).

Shapes here are channels-last and batch-leading so every tensor shards on
the mesh's ``data`` axis at dim 0: magnitudes ``[B, F, T]``, sources stacked
at axis 1 ``[B, N, F, T]`` (the reference keeps Python lists of
``[B, 1, F, T]``).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from avsep_tpu.ops.warp import warp_spectrogram


class PreparedBatch(NamedTuple):
    mag_mix: jnp.ndarray    # [B, FO, T] warped mixture magnitude
    mags: jnp.ndarray       # [B, N, FO, T] warped source magnitudes
    log_mag_mix: jnp.ndarray  # [B, FO, T] U-Net input
    gt_masks: jnp.ndarray   # [B, N, FO, T]
    weights: jnp.ndarray    # [B, FO, T]


@functools.partial(
    jax.jit,
    static_argnames=("log_freq", "weighted_loss", "binary_mask", "warp_bins"))
def prepare(mag_mix: jnp.ndarray, mags: jnp.ndarray, *,
            log_freq: bool = True, weighted_loss: bool = True,
            binary_mask: bool = True, warp_bins: int = 256) -> PreparedBatch:
    """See module docstring.  ``mag_mix [B, F, T]``, ``mags [B, N, F, T]``."""
    mag_mix = mag_mix.astype(jnp.float32) + 1e-10
    mags = mags.astype(jnp.float32)

    if log_freq:
        mag_mix = warp_spectrogram(mag_mix, HO=warp_bins)
        mags = warp_spectrogram(mags, HO=warp_bins)

    if weighted_loss:
        weights = jnp.clip(jnp.log1p(mag_mix), 1e-3, 10.0)
    else:
        weights = jnp.ones_like(mag_mix)

    if binary_mask:
        gt_masks = (mags > 0.5 * mag_mix[:, None]).astype(jnp.float32)
    else:
        gt_masks = jnp.clip(mags / mag_mix[:, None], 0.0, 5.0)

    log_mag_mix = jax.lax.stop_gradient(jnp.log(mag_mix))
    return PreparedBatch(mag_mix, mags, log_mag_mix, gt_masks, weights)
