"""Export avsep_tpu Flax checkpoints to reference PyTorch ``state_dict``s.

The exact inverse of :mod:`avsep_tpu.models.torch_import`: a model trained
here can be handed back to the reference codebase's eval/demo tooling
(``{sound,frame}_{latest,best}.pth`` files, reference ``main.py:506-533``
and ``:789-793``), closing the migration loop in both directions.

Conventions (inverse of torch_import): Flax NHWC kernels [kh, kw, in, out]
-> torch Conv2d weights [out, in, kh, kw]; (scale, bias) params +
(mean, var) batch_stats -> BatchNorm (weight, bias, running_mean,
running_var) plus the ``num_batches_tracked`` buffer torch's strict
``load_state_dict`` insists on.

All functions emit plain numpy-valued dicts; :func:`save_torch_checkpoint`
converts to torch tensors at write time (gated import, like
``torch_import.load_torch_checkpoint``).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _conv(k) -> np.ndarray:
    return np.asarray(k).transpose(3, 2, 0, 1)


def _bn(out: Dict, prefix: str, params: Mapping, stats: Mapping) -> None:
    out[prefix + ".weight"] = np.asarray(params["scale"])
    out[prefix + ".bias"] = np.asarray(params["bias"])
    out[prefix + ".running_mean"] = np.asarray(stats["mean"])
    out[prefix + ".running_var"] = np.asarray(stats["var"])
    out[prefix + ".num_batches_tracked"] = np.asarray(0, np.int64)


def unet_to_torch(params: Mapping, stats: Mapping, num_downs: int = 7
                  ) -> Dict[str, np.ndarray]:
    """AudioUnet/BasisUnet (params, batch_stats) -> reference
    ``Unet.state_dict()`` keys (models/audio_net.py:10-43; layer indices
    documented in ``torch_import.unet_from_torch``)."""
    sd: Dict[str, np.ndarray] = {}
    _bn(sd, "bn0", params["bn0"]["bn"], stats["bn0"]["bn"])
    for d in range(num_downs):
        prefix = "unet_block." + "mid_forward." * d
        conv_key = prefix + ("down_forward.0.weight" if d == 0
                             else "down_forward.1.weight")
        sd[conv_key] = _conv(params[f"down{d}"]["conv"]["kernel"])
        if 0 < d < num_downs - 1:
            _bn(sd, prefix + "down_forward.2",
                params[f"down_bn{d}"]["bn"], stats[f"down_bn{d}"]["bn"])
        up = params[f"up{d}"]["conv"]
        sd[prefix + "up_forward.2.weight"] = _conv(up["kernel"])
        if "bias" in up:
            sd[prefix + "up_forward.2.bias"] = np.asarray(up["bias"])
        if d > 0:
            _bn(sd, prefix + "up_forward.3",
                params[f"up_bn{d}"]["bn"], stats[f"up_bn{d}"]["bn"])
    return sd


# inverse of torch_import._RESNET_SEQ: module name -> Sequential index
_RESNET_IDX = {"conv1": "0", "bn1": "1", "layer1": "4", "layer2": "5",
               "layer3": "6", "layer4": "7"}


def resnet_to_torch(params: Mapping, stats: Mapping
                    ) -> Dict[str, np.ndarray]:
    """FrameEncoder (params, batch_stats) -> reference
    ``ResnetFC/ResnetDilated.state_dict()`` keys (``features.N...`` +
    ``fc.*``, vision_net.py:26-30, :88-92)."""
    fp, fs = params["features"], stats["features"]
    flat: Dict[str, np.ndarray] = {}
    flat["conv1.weight"] = _conv(fp["conv1"]["kernel"])
    _bn(flat, "bn1", fp["bn1"], fs["bn1"])
    for li in (1, 2, 3, 4):
        for bi in (0, 1):
            src = f"layer{li}_{bi}"
            dst = f"layer{li}.{bi}"
            bp, bs = fp[src], fs[src]
            flat[dst + ".conv1.weight"] = _conv(bp["conv1"]["kernel"])
            flat[dst + ".conv2.weight"] = _conv(bp["conv2"]["kernel"])
            _bn(flat, dst + ".bn1", bp["bn1"], bs["bn1"])
            _bn(flat, dst + ".bn2", bp["bn2"], bs["bn2"])
            if "downsample_conv" in bp:
                flat[dst + ".downsample.0.weight"] = _conv(
                    bp["downsample_conv"]["kernel"])
                _bn(flat, dst + ".downsample.1",
                    bp["downsample_bn"], bs["downsample_bn"])
    # re-prefix trunk keys into the wrapper's nn.Sequential numbering
    sd: Dict[str, np.ndarray] = {}
    for k, v in flat.items():
        head, rest = k.split(".", 1)
        sd[f"features.{_RESNET_IDX[head]}.{rest}"] = v
    if "fc" in params:
        sd["fc.weight"] = _conv(params["fc"]["kernel"])
        sd["fc.bias"] = np.asarray(params["fc"]["bias"])
    return sd


def synthesizer_to_torch(params: Mapping) -> Dict[str, np.ndarray]:
    """InnerProd/Bias params -> reference state_dict
    (synthesizer_net.py:6-70)."""
    sd: Dict[str, np.ndarray] = {}
    if "scale" in params:
        sd["scale"] = np.asarray(params["scale"])
    sd["bias"] = np.asarray(params["bias"])
    return sd


def save_torch_checkpoint(sd: Mapping, path: str) -> None:
    """Write a numpy-valued state_dict as a torch ``.pth`` (CPU tensors)."""
    import torch
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, path)
