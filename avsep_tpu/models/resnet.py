"""ResNet18 frame encoders (plain and dilated) in Flax.

Functional equivalent of reference ``models/vision_net.py``: a torchvision
ResNet18 truncated before the classifier, followed by a 3x3 conv projecting
512 -> ``fc_dim`` channels, with

* ``ResnetFC`` (vision_net.py:20-68): stride-32 backbone -> 7x7 maps;
* ``ResnetDilated`` (vision_net.py:71-147): layer4's strides converted to
  dilation (dilate_scale=16 -> dilation 2) giving stride-16, 14x14 maps;
* ``forward_multiframe`` (vision_net.py:126-147): fold B*T through the 2-D
  CNN, then temporal mean (``pool=False``, the spatial-map path used by
  CoLoc) or global max/avg pooling to a vector.

NHWC layout; BatchNorm uses torch defaults.  ImageNet-pretrained weights are
imported from a torchvision ``state_dict`` file when provided (the reference
always starts from ``torchvision.models.resnet18(pretrained=True)``,
models/__init__.py:65); otherwise He-normal init.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

he_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    """ResNet v1 basic block: 3x3 conv-bn-relu x2 + identity/1x1 downsample."""
    features: int
    strides: int = 1
    dilation: int = 1
    first_dilation: int = 1  # dilation of conv1 (differs in dilated layer4)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        identity = x
        d1 = self.first_dilation
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    padding=((d1, d1), (d1, d1)),
                    kernel_dilation=(d1, d1), use_bias=False,
                    kernel_init=he_init, dtype=self.dtype, name="conv1")(x)
        y = bn("bn1")(y)
        y = jax.nn.relu(y)
        d2 = self.dilation
        y = nn.Conv(self.features, (3, 3), padding=((d2, d2), (d2, d2)),
                    kernel_dilation=(d2, d2), use_bias=False,
                    kernel_init=he_init, dtype=self.dtype, name="conv2")(y)
        y = bn("bn2")(y)

        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               kernel_init=he_init, dtype=self.dtype,
                               name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return jax.nn.relu(y + identity)


class ResNet18Features(nn.Module):
    """torchvision resnet18 trunk (conv1..layer4), optionally dilated.

    ``dilate_scale=16`` applies the reference's ``_nostride_dilate`` surgery
    to layer4 (vision_net.py:96-109): the strided 3x3 conv loses its stride
    and keeps dilation 1 (dilate//2=1), subsequent 3x3 convs get dilation 2;
    ``dilate_scale=8`` additionally dilates layer3.
    """
    dilate_scale: int = 0  # 0 (plain), 8, or 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, kernel_init=he_init, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        # torch MaxPool2d(3, stride=2, padding=1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        def layer(h, name, features, stride, dilate=0):
            """One torchvision layer of two BasicBlocks; ``dilate`` > 0
            applies the _nostride_dilate surgery: the strided conv keeps
            stride 1 with dilation dilate//2, every other 3x3 conv gets
            dilation ``dilate`` (vision_net.py:96-109)."""
            if dilate:
                d_first, d_rest, stride = max(dilate // 2, 1), dilate, 1
            else:
                d_first = d_rest = 1
            h = BasicBlock(features, strides=stride, dilation=d_rest,
                           first_dilation=d_first, dtype=self.dtype,
                           name=f"{name}_0")(h, train)
            h = BasicBlock(features, strides=1, dilation=d_rest,
                           first_dilation=d_rest, dtype=self.dtype,
                           name=f"{name}_1")(h, train)
            return h

        y = layer(y, "layer1", 64, 1)
        y = layer(y, "layer2", 128, 2)
        y = layer(y, "layer3", 256, 2, dilate=2 if self.dilate_scale == 8
                  else 0)
        y = layer(y, "layer4", 512, 2,
                  dilate={8: 4, 16: 2}.get(self.dilate_scale, 0))
        return y


class FrameEncoder(nn.Module):
    """ResnetFC / ResnetDilated: trunk + 3x3 fc conv + pooling modes.

    ``__call__(frames, pool)`` accepts [B, H, W, 3] single frames or
    [B, T, H, W, 3] multi-frame stacks (the reference's
    ``forward_multiframe``).  pool=False -> temporal-mean spatial map
    [B, h, w, fc_dim]; pool=True -> global max/avg-pooled vector [B, fc_dim].
    """
    fc_dim: int = 64
    pool_type: str = "maxpool"
    dilate_scale: int = 16   # 0 => plain ResnetFC
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, pool: bool = True,
                 train: bool = False):
        multiframe = frames.ndim == 5
        if multiframe:
            B, T = frames.shape[:2]
            x = frames.reshape((B * T,) + frames.shape[2:])
        else:
            x = frames

        y = ResNet18Features(dilate_scale=self.dilate_scale,
                             dtype=self.dtype, name="features")(x, train)
        y = nn.Conv(self.fc_dim, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=he_init, dtype=self.dtype, name="fc")(y)

        if multiframe:
            y = y.reshape((B, T) + y.shape[1:])
            if not pool:
                return jnp.mean(y, axis=1)  # temporal mean -> [B, h, w, C]
            if self.pool_type == "maxpool":
                return jnp.max(y, axis=(1, 2, 3))
            return jnp.mean(y, axis=(1, 2, 3))
        else:
            if not pool:
                return y
            if self.pool_type == "maxpool":
                return jnp.max(y, axis=(1, 2))
            return jnp.mean(y, axis=(1, 2))


class _TinyTrunk(nn.Module):
    """3 stride-2 conv-BN-relu blocks (16/32/64 ch) — an 8x downsampling
    stand-in for the ResNet18 trunk."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        for ch in (16, 32, 64):
            x = nn.Conv(ch, (3, 3), strides=(2, 2), kernel_init=he_init,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
        return x


class TinyConvEncoder(nn.Module):
    """Bring-up frame encoder (TPU-native addition, no reference
    equivalent; ``--arch_frame tinyconv``): the FrameEncoder contract
    (same ``__call__(frames, pool, train)`` shapes, same ``features`` /
    ``fc`` parameter scopes so the per-group optimizer labels apply,
    train.py:52-66) with a 3-block conv trunk instead of ResNet18.

    An order of magnitude cheaper to jit-compile — used by the multi-host
    CLI tests (tests/test_multihost.py) and for CPU smoke runs.  NOT a
    parity surface: the reference's frame nets are resnet18fc /
    resnet18dilated only (reference models/__init__.py:61-78).
    """
    fc_dim: int = 64
    pool_type: str = "maxpool"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jnp.ndarray, pool: bool = True,
                 train: bool = False):
        multiframe = frames.ndim == 5
        if multiframe:
            B, T = frames.shape[:2]
            x = frames.reshape((B * T,) + frames.shape[2:])
        else:
            x = frames

        y = _TinyTrunk(dtype=self.dtype, name="features")(x, train)
        y = nn.Conv(self.fc_dim, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=he_init, dtype=self.dtype, name="fc")(y)

        if multiframe:
            y = y.reshape((B, T) + y.shape[1:])
            if not pool:
                return jnp.mean(y, axis=1)
            if self.pool_type == "maxpool":
                return jnp.max(y, axis=(1, 2, 3))
            return jnp.mean(y, axis=(1, 2, 3))
        if not pool:
            return y
        if self.pool_type == "maxpool":
            return jnp.max(y, axis=(1, 2))
        return jnp.mean(y, axis=(1, 2))
