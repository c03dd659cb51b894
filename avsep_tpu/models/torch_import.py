"""Import PyTorch reference checkpoints into avsep_tpu Flax modules.

The reference trains with torch and checkpoints per-net ``state_dict`` files
(``{sound,frame}_{latest,best}.pth``, reference ``main.py:506-533``).  These
converters map those tensors onto our Flax parameter trees so that

* users can migrate trained reference checkpoints, and
* the test-suite can verify bit-level forward parity between the reference
  modules and this framework (SURVEY.md §7 step 1: "weight-import from the
  PyTorch reference for parity testing").

Conventions: torch Conv2d weights [out, in, kh, kw] -> Flax NHWC kernels
[kh, kw, in, out]; BatchNorm (weight, bias, running_mean, running_var) ->
(scale, bias) params + (mean, var) batch_stats.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv(w) -> np.ndarray:
    return _np(w).transpose(2, 3, 1, 0)


def _bn(sd: Mapping, prefix: str):
    params = {"scale": _np(sd[prefix + ".weight"]),
              "bias": _np(sd[prefix + ".bias"])}
    stats = {"mean": _np(sd[prefix + ".running_mean"]),
             "var": _np(sd[prefix + ".running_var"])}
    return params, stats


def unet_from_torch(sd: Mapping, num_downs: int = 7
                    ) -> Tuple[Dict, Dict]:
    """Convert a reference ``Unet.state_dict()`` (models/audio_net.py:10-43)
    into (params, batch_stats) for :class:`avsep_tpu.models.unet.AudioUnet`.

    Reference layer indices: outermost down = ``down_forward.0``; deeper
    downs = ``down_forward.1`` (conv) / ``down_forward.2`` (BN); all ups =
    ``up_forward.2`` (conv) / ``up_forward.3`` (BN).
    """
    params: Dict = {}
    stats: Dict = {}

    p, s = _bn(sd, "bn0")
    params["bn0"] = {"bn": p}
    stats["bn0"] = {"bn": s}

    for d in range(num_downs):
        prefix = "unet_block." + "mid_forward." * d
        conv_key = prefix + ("down_forward.0.weight" if d == 0
                             else "down_forward.1.weight")
        params[f"down{d}"] = {"conv": {"kernel": _conv(sd[conv_key])}}
        if 0 < d < num_downs - 1:
            p, s = _bn(sd, prefix + "down_forward.2")
            params[f"down_bn{d}"] = {"bn": p}
            stats[f"down_bn{d}"] = {"bn": s}

        up = {"kernel": _conv(sd[prefix + "up_forward.2.weight"])}
        if prefix + "up_forward.2.bias" in sd:
            up["bias"] = _np(sd[prefix + "up_forward.2.bias"])
        params[f"up{d}"] = {"conv": up}
        if d > 0:
            p, s = _bn(sd, prefix + "up_forward.3")
            params[f"up_bn{d}"] = {"bn": p}
            stats[f"up_bn{d}"] = {"bn": s}

    return params, stats


_RESNET_SEQ = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3", "7": "layer4"}


def _normalize_resnet_keys(sd: Mapping) -> Dict[str, object]:
    """Accept both reference FrameEncoder dicts (``features.N...``,
    vision_net.py:26-30) and raw torchvision dicts (``conv1.weight``...)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("features."):
            parts = k.split(".")
            parts[1] = _RESNET_SEQ.get(parts[1], parts[1])
            out[".".join(parts[1:])] = v
        else:
            out[k] = v
    return out


def resnet_from_torch(sd: Mapping, with_fc: bool = True
                      ) -> Tuple[Dict, Dict]:
    """Convert reference ``ResnetFC/ResnetDilated.state_dict()``
    (vision_net.py:20-147) or a torchvision resnet18 ``state_dict`` into
    (params, batch_stats) for :class:`avsep_tpu.models.resnet.FrameEncoder`.
    """
    sd = _normalize_resnet_keys(sd)
    fparams: Dict = {}
    fstats: Dict = {}

    fparams["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    p, s = _bn(sd, "bn1")
    fparams["bn1"] = p
    fstats["bn1"] = s

    for li in (1, 2, 3, 4):
        for bi in (0, 1):
            src = f"layer{li}.{bi}"
            dst = f"layer{li}_{bi}"
            bp: Dict = {}
            bs: Dict = {}
            bp["conv1"] = {"kernel": _conv(sd[src + ".conv1.weight"])}
            bp["conv2"] = {"kernel": _conv(sd[src + ".conv2.weight"])}
            p, s = _bn(sd, src + ".bn1")
            bp["bn1"], bs["bn1"] = p, s
            p, s = _bn(sd, src + ".bn2")
            bp["bn2"], bs["bn2"] = p, s
            if src + ".downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[src + ".downsample.0.weight"])}
                p, s = _bn(sd, src + ".downsample.1")
                bp["downsample_bn"], bs["downsample_bn"] = p, s
            fparams[dst] = bp
            fstats[dst] = bs

    params: Dict = {"features": fparams}
    stats: Dict = {"features": fstats}
    if with_fc and "fc.weight" in sd and _np(sd["fc.weight"]).ndim == 4:
        params["fc"] = {"kernel": _conv(sd["fc.weight"]),
                        "bias": _np(sd["fc.bias"])}
    return params, stats


def synthesizer_from_torch(sd: Mapping) -> Dict:
    """Reference InnerProd/Bias state_dict (synthesizer_net.py:6-70)."""
    out = {}
    if "scale" in sd:
        out["scale"] = _np(sd["scale"])
    out["bias"] = _np(sd["bias"])
    return out


def load_torch_checkpoint(path: str) -> Mapping:
    """Load a ``.pth`` state_dict with CPU torch (gated import)."""
    import torch
    return torch.load(path, map_location="cpu")
