"""Model factory + activation dispatcher.

Equivalent of reference ``models/__init__.py`` (``ModelBuilder`` /
``activate``): builds the sound U-Net, frame encoder, synthesizer, motion
backbone and criteria from config strings, optionally loading weights —
either native Orbax checkpoints or reference ``.pth`` state_dicts
(auto-detected by extension).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from avsep_tpu.models import criterion as crit
from avsep_tpu.models.resnet import FrameEncoder
from avsep_tpu.models.synthesizer import Bias, InnerProd
from avsep_tpu.models.unet import AudioUnet


def activate(x: jnp.ndarray, activation: str,
             upcast: bool = True) -> jnp.ndarray:
    """Activation dispatcher (reference models/__init__.py:16-28).

    ``upcast=True`` (the default, used at every output/loss-side call
    site) casts to f32 first: this is the mixed-precision boundary.
    Under ``--dtype bfloat16`` the U-Net runs in bf16, but bf16 sigmoid
    saturates to exactly 1.0 at logits ~6 (2^-8 resolution near 1), so
    the BCE input clip at 1-1e-7 becomes a no-op and the log1p VJP
    returns inf*0=NaN — measured as a NaN blow-up between iters 50-100
    of the bf16 AVPROOF run.  Casting the logits up keeps every
    loss/mask/metric consumer in f32 while the conv stack stays bf16;
    a no-op for f32 runs (parity envelope unchanged).

    Feature-path call sites (the relu on visual/motion features, the SoP
    basis activation) pass ``upcast=False``: those tensors feed straight
    back into bf16 layers, so an f32 island there only adds HBM traffic
    and convert ops without touching the NaN boundary (ADVICE r4).
    """
    if upcast:
        x = x.astype(jnp.float32)
    if activation == "sigmoid":
        return jax.nn.sigmoid(x)
    if activation == "softmax":
        return jax.nn.softmax(x, axis=-1)
    if activation == "relu":
        return jax.nn.relu(x)
    if activation == "tanh":
        return jnp.tanh(x)
    if activation == "no":
        return x
    raise ValueError("Unknown activation!")


_UNET_DOWNS = {"unet5": 5, "unet6": 6, "unet7": 7}


class ModelBuilder:
    """Builds Flax module *definitions* (params are created by init/import,
    reflecting JAX's functional split vs the reference's stateful builders,
    models/__init__.py:31-132)."""

    @staticmethod
    def build_sound(arch: str = "unet5", fc_dim: int = 64,
                    fusion_type: str = "hidsep", att_type: str = "cos",
                    num_sources: int = 2, att_temp: float = 1.0,
                    dtype: Any = jnp.float32) -> AudioUnet:
        if arch not in _UNET_DOWNS:
            raise ValueError("Architecture undefined!")
        return AudioUnet(fc_dim=fc_dim, num_downs=_UNET_DOWNS[arch],
                         fusion_type=fusion_type, att_type=att_type,
                         num_sources=num_sources, att_temp=att_temp,
                         dtype=dtype)

    @staticmethod
    def build_frame(arch: str = "resnet18dilated", fc_dim: int = 64,
                    pool_type: str = "avgpool",
                    dtype: Any = jnp.float32) -> FrameEncoder:
        if arch == "resnet18fc":
            return FrameEncoder(fc_dim=fc_dim, pool_type=pool_type,
                                dilate_scale=0, dtype=dtype)
        if arch == "resnet18dilated":
            return FrameEncoder(fc_dim=fc_dim, pool_type=pool_type,
                                dilate_scale=16, dtype=dtype)
        if arch == "tinyconv":
            # bring-up/smoke encoder (TPU-native addition; see
            # models/resnet.py::TinyConvEncoder — not a parity surface)
            from avsep_tpu.models.resnet import TinyConvEncoder
            return TinyConvEncoder(fc_dim=fc_dim, pool_type=pool_type,
                                   dtype=dtype)
        raise ValueError("Architecture undefined!")

    @staticmethod
    def build_synthesizer(arch: str, fc_dim: int = 64,
                          dtype: Any = jnp.float32):
        if arch == "linear":
            return InnerProd(fc_dim=fc_dim, dtype=dtype)
        if arch == "bias":
            return Bias(dtype=dtype)
        raise ValueError("Architecture undefined!")

    @staticmethod
    def build_motion(dtype: Any = jnp.float32):
        """SlowFast fast-pathway ResNet3d (reference models/__init__.py:
        94-118).  Kinetics-pretrained weights must be supplied externally —
        the reference hard-codes a private checkpoint path."""
        from avsep_tpu.models.motion import ResNet3dFastOnly
        return ResNet3dFastOnly(dtype=dtype)

    @staticmethod
    def build_criterion(arch: str, use_pit: bool = False):
        """Returns a loss callable.  Like the reference
        (models/__init__.py:121-132), ``use_pit=True`` returns BCE-based PIT
        regardless of ``arch``."""
        if use_pit:
            return lambda preds, targets, weights=None: crit.pit_loss(
                preds, targets, weights, kind="bce")
        if arch not in ("bce", "l1", "l2"):
            raise ValueError("Architecture undefined!")

        def loss(preds, targets, weight=None):
            return crit.multi_source_loss(preds, targets, weight, kind=arch)
        return loss


def init_or_import(module, rng, example_args: Tuple, weights: str = "",
                   importer: Optional[Callable] = None):
    """Initialize module variables, importing a reference ``.pth`` if given.

    Returns a flax variables dict {'params': ..., 'batch_stats': ...}.
    """
    variables = module.init(rng, *example_args, train=False)
    if weights:
        if weights.endswith(".pth"):
            from avsep_tpu.models import torch_import as ti
            sd = ti.load_torch_checkpoint(weights)
            params, stats = importer(sd)
            variables = {"params": params, "batch_stats": stats}
        else:
            import orbax.checkpoint as ocp
            variables = ocp.StandardCheckpointer().restore(
                weights, target=variables)
    return variables
