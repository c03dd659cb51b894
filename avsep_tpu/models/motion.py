"""Motion backbone: SlowFast fast-pathway ResNet3d (depth 50, base 8).

Equivalent of reference ``ModelBuilder.build_motion``
(``models/__init__.py:94-118``): the mmaction ``ResNet3dFastOnly`` fast
pathway — Conv3d(5,7,7) stem with temporal stride 1, four Bottleneck3d
stages [3,4,6,3] at base_channels=8 (channel_ratio 8 vs the slow path),
temporal 3x1x1 inflation on every block's first conv, spatial strides
(1,2,2,2), no lateral connections.

NOTE ON PARITY: in the reference this branch is *vestigial* — it is built,
checkpointed, and given an optimizer group (``main.py:538-540``), but no
live forward ever calls it, and its ``con_motion`` fusion type asserts in
``get_fusion_net`` (fusion_net.py:18).  It is provided here for checkpoint/
API completeness (``--load_clips``); Kinetics-400 weights import from an
mmaction state_dict via :func:`motion_from_torch`.

Layout: clips are [B, T, H, W, 3] (channels-last); convs are NDHWC.
"""

from __future__ import annotations

from typing import Any, Mapping, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

he_init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class Bottleneck3d(nn.Module):
    """mmaction Bottleneck3d with '3x1x1' temporal inflation on conv1."""
    planes: int            # bottleneck width; output = 4 * planes
    spatial_stride: int = 1
    inflate: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        def bn(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        out_ch = self.planes * 4
        identity = x
        k1 = (3, 1, 1) if self.inflate else (1, 1, 1)
        p1 = ((1, 1), (0, 0), (0, 0)) if self.inflate \
            else ((0, 0), (0, 0), (0, 0))
        y = nn.Conv(self.planes, k1, padding=p1, use_bias=False,
                    kernel_init=he_init, dtype=self.dtype, name="conv1")(x)
        y = jax.nn.relu(bn("bn1")(y))
        s = self.spatial_stride
        y = nn.Conv(self.planes, (1, 3, 3), strides=(1, s, s),
                    padding=((0, 0), (1, 1), (1, 1)), use_bias=False,
                    kernel_init=he_init, dtype=self.dtype, name="conv2")(y)
        y = jax.nn.relu(bn("bn2")(y))
        y = nn.Conv(out_ch, (1, 1, 1), use_bias=False, kernel_init=he_init,
                    dtype=self.dtype, name="conv3")(y)
        y = bn("bn3")(y)
        if s != 1 or x.shape[-1] != out_ch:
            identity = nn.Conv(out_ch, (1, 1, 1), strides=(1, s, s),
                               use_bias=False, kernel_init=he_init,
                               dtype=self.dtype, name="downsample_conv")(x)
            identity = bn("downsample_bn")(identity)
        return jax.nn.relu(y + identity)


class ResNet3dFastOnly(nn.Module):
    """Fast pathway: stem (5,7,7)/stride (1,2,2) + [3,4,6,3] bottlenecks."""
    base_channels: int = 8
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, clips: jnp.ndarray, train: bool = False):
        """clips [B, T, H, W, 3] -> features [B, T, H/32, W/32, 32*base]."""
        y = nn.Conv(self.base_channels, (5, 7, 7), strides=(1, 2, 2),
                    padding=((2, 2), (3, 3), (3, 3)), use_bias=False,
                    kernel_init=he_init, dtype=self.dtype,
                    name="conv1")(clips)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = jax.nn.relu(y)
        y = nn.max_pool(y, (1, 3, 3), strides=(1, 2, 2),
                        padding=((0, 0), (1, 1), (1, 1)))
        for li, n_blocks in enumerate(self.stage_blocks):
            planes = self.base_channels * (2 ** li)
            stride = 1 if li == 0 else 2
            for bi in range(n_blocks):
                y = Bottleneck3d(planes, spatial_stride=stride if bi == 0
                                 else 1, dtype=self.dtype,
                                 name=f"layer{li + 1}_{bi}")(y, train)
        return y

    def forward_pooled(self, variables, clips, train: bool = False):
        feats = self.apply(variables, clips, train=train)
        return jnp.max(feats, axis=(1, 2, 3))  # [B, C]


def motion_from_torch(sd: Mapping):
    """Import an mmaction ResNet3d fast-pathway state_dict.

    The reference (models/__init__.py:114-117) filters out ``cls_head`` /
    ``slow_path`` entries and strips ``backbone.``; in the real mmaction
    SlowFast checkpoint the surviving fast-pathway keys then still carry a
    ``fast_path.`` prefix (mmaction names the pathways ``slow_path`` /
    ``fast_path``), i.e. ``fast_path.conv1.conv.weight``.  This importer
    normalizes all three layouts — raw checkpoint keys
    (``backbone.fast_path....``), post-strip keys (``fast_path....``), and
    bare keys (``conv1.conv.weight``) — before mapping, so it accepts both
    the on-disk ``slowfast_r50_..._kinetics400_rgb`` file and any
    already-stripped dict.  (The real checkpoint is not available in this
    environment; the golden test pins the mapping on synthetic dicts in
    both prefixed and bare layouts.)
    """
    import numpy as np

    norm = {}
    for k, v in sd.items():
        if "cls_head" in k or "slow_path" in k:
            continue
        if k.startswith("backbone."):
            k = k[len("backbone."):]
        if k.startswith("fast_path."):
            k = k[len("fast_path."):]
        norm[k] = v
    sd = norm

    def conv(w):
        a = np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach")
                       else w)
        return a.transpose(2, 3, 4, 1, 0)  # OIDHW -> DHWIO

    def bn(prefix):
        g = lambda k: np.asarray(sd[prefix + k].detach().cpu().numpy()
                                 if hasattr(sd[prefix + k], "detach")
                                 else sd[prefix + k])
        return ({"scale": g(".weight"), "bias": g(".bias")},
                {"mean": g(".running_mean"), "var": g(".running_var")})

    params = {"conv1": {"kernel": conv(sd["conv1.conv.weight"])}}
    p, s = bn("conv1.bn")
    params["bn1"], stats = p, {"bn1": s}
    for li, n_blocks in enumerate((3, 4, 6, 3)):
        for bi in range(n_blocks):
            src = f"layer{li + 1}.{bi}"
            dst = f"layer{li + 1}_{bi}"
            bp, bs = {}, {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {
                    "kernel": conv(sd[f"{src}.conv{ci}.conv.weight"])}
                pp, ss = bn(f"{src}.conv{ci}.bn")
                bp[f"bn{ci}"], bs[f"bn{ci}"] = pp, ss
            if f"{src}.downsample.conv.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": conv(sd[f"{src}.downsample.conv.weight"])}
                pp, ss = bn(f"{src}.downsample.bn")
                bp["downsample_bn"], bs["downsample_bn"] = pp, ss
            params[dst], stats[dst] = bp, bs
    return params, stats
