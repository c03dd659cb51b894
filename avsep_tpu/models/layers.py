"""Shared Flax layers with PyTorch-compatible semantics.

The reference's building blocks (``models/audio_net.py:49-122``) are
Conv2d(4x4, stride 2, pad 1) downsamplers, Conv2d(3x3, pad 1) up-projections,
BatchNorm2d, LeakyReLU(0.2)/ReLU, and ``nn.Upsample(scale_factor=2,
mode='bilinear', align_corners=True)``.  All tensors here are channels-last
(NHWC) — the native TPU conv layout.

``upsample2x_align_corners`` reproduces torch's align_corners=True bilinear
resize.  jax.image.resize implements the half-pixel convention instead, so we
build the (separable) interpolation matrices ourselves and apply them as two
tiny matmuls — MXU-friendly and exact.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------- initializers


def normal_init(std: float) -> Callable:
    """Reference ``ModelBuilder.weights_init``: Conv ~ N(0, 0.001), Linear ~
    N(0, 1e-4) (``models/__init__.py:33-41``)."""
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)
    return init


def bn_scale_init(key, shape, dtype=jnp.float32):
    """BatchNorm weight ~ N(1.0, 0.02) (reference ``models/__init__.py:37-39``)."""
    return 1.0 + 0.02 * jax.random.normal(key, shape, dtype)


def torch_conv_bias_init(kernel_shape) -> Callable:
    """PyTorch Conv2d default bias: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    kh, kw, cin, _ = kernel_shape

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(kh * kw * cin)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


# ------------------------------------------------------------------- layers


class ConvDown(nn.Module):
    """4x4 stride-2 pad-1 conv, bias-free (reference audio_net.py:72-74)."""
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (4, 4), strides=(2, 2),
                       padding=((1, 1), (1, 1)), use_bias=False,
                       kernel_init=normal_init(0.001), dtype=self.dtype,
                       name="conv")(x)


class ConvUp(nn.Module):
    """3x3 pad-1 conv (reference audio_net.py:75-76,85-87)."""
    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        return nn.Conv(self.features, (3, 3), padding=((1, 1), (1, 1)),
                       use_bias=self.use_bias,
                       kernel_init=normal_init(0.001),
                       bias_init=torch_conv_bias_init((3, 3, cin,
                                                       self.features)),
                       dtype=self.dtype, name="conv")(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d with torch defaults (eps 1e-5, momentum 0.1 -> flax 0.9)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, scale_init=bn_scale_init,
                            dtype=self.dtype, name="bn")(x)


def leaky_relu(x, slope: float = 0.2):
    return jnp.where(x >= 0, x, slope * x)


# --------------------------------------------------- align_corners upsampling


@functools.lru_cache(maxsize=None)
def _up_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] linear-interp matrix for torch align_corners=True resize."""
    m = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        m[:, 0] = 1.0
        return m
    scale = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        p = i * scale
        lo = int(np.floor(p))
        hi = min(lo + 1, in_size - 1)
        w = p - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def upsample2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC bilinear 2x upsample matching torch ``Upsample(scale_factor=2,
    mode='bilinear', align_corners=True)`` (reference audio_net.py:68-69)."""
    B, H, W, C = x.shape
    Wh = jnp.asarray(_up_matrix(H, 2 * H))
    Ww = jnp.asarray(_up_matrix(W, 2 * W))
    # f32 path: f32 accumulation end-to-end, H-pass then W-pass — the
    # exact order the torch align_corners parity goldens were pinned on
    # (dtype is the ONLY thing that varies below).
    # bf16 path: keep the [B,2H,W,C] intermediate in bf16 — the MXU still
    # accumulates the 2-tap interpolation in f32 internally, and an f32
    # intermediate would double the HBM traffic of the decoder's largest
    # tensors for no parity benefit (the rest of the bf16 pipeline rounds
    # identically).
    acc = jnp.float32 if x.dtype == jnp.float32 else x.dtype
    y = jnp.einsum("oh,bhwc->bowc", Wh.astype(acc), x,
                   preferred_element_type=acc)           # [B, 2H, W, C]
    return jnp.einsum("pw,bhwc->bhpc", Ww.astype(acc), y,
                      preferred_element_type=acc).astype(x.dtype)


def cosine_similarity(a: jnp.ndarray, b: jnp.ndarray, axis: int,
                      eps: float = 1e-8) -> jnp.ndarray:
    """torch.nn.functional.cosine_similarity semantics: each norm clamped
    to ``eps`` separately before the division."""
    na = jnp.maximum(jnp.linalg.norm(a, axis=axis), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=axis), eps)
    return jnp.sum(a * b, axis=axis) / (na * nb)
