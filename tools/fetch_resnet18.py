"""Fetch the ImageNet-pretrained resnet18 checkpoint for the frame encoder.

The reference always bootstraps its frame encoder from
``torchvision.models.resnet18(pretrained=True)`` (reference
``models/__init__.py:61-78``).  This tool obtains the same checkpoint
without requiring torchvision:

  1. ``--src /path/to/resnet18.pth`` — validate and install a local copy of
     a torchvision-format state dict (e.g. from another machine's
     ``~/.cache/torch/hub/checkpoints/resnet18-f37072fd.pth``);
  2. otherwise download the official torchvision weights from
     ``download.pytorch.org`` (needs network access).

The validated dict is written to ``--out`` (default
``data/resnet18-imagenet.pth``); ``scripts/train_MUSIC.sh`` passes that path
as ``--weights_frame`` when it exists, so training starts from ImageNet
features exactly like the reference.  Conversion to Flax happens at
train-start via :func:`avsep_tpu.models.torch_import.resnet_from_torch`.

Usage:
    python tools/fetch_resnet18.py [--src local.pth] [--out data/...]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

URL = "https://download.pytorch.org/models/resnet18-f37072fd.pth"

# (shape) spot checks for a torchvision resnet18 state dict
_EXPECT = {
    "conv1.weight": (64, 3, 7, 7),
    "layer4.1.conv2.weight": (512, 512, 3, 3),
    "layer1.0.bn1.running_mean": (64,),
}


def validate(path: str) -> dict:
    """Load a state dict and check it is a torchvision-format resnet18.

    Returns the loaded dict; raises with a precise message otherwise.
    Also round-trips it through ``resnet_from_torch`` so a train-start
    failure cannot happen later.
    """
    import torch
    from avsep_tpu.models.torch_import import resnet_from_torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    for key, shape in _EXPECT.items():
        if key not in sd:
            raise SystemExit(
                f"{path}: missing key {key!r} — not a torchvision resnet18 "
                "state dict")
        got = tuple(sd[key].shape)
        if got != shape:
            raise SystemExit(
                f"{path}: {key} has shape {got}, expected {shape}")
    params, stats = resnet_from_torch(sd)  # conversion must succeed
    n = sum(x.size for x in _leaves(params))
    print(f"validated {path}: torchvision resnet18, "
          f"{n / 1e6:.1f}M backbone params convert cleanly")
    return sd


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    else:
        yield tree


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--src", default=None,
                    help="local torchvision resnet18 .pth to install "
                         "instead of downloading")
    ap.add_argument("--out", default="data/resnet18-imagenet.pth")
    ap.add_argument("--url", default=URL)
    args = ap.parse_args()

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)

    if args.src:
        src = args.src
    else:
        print(f"downloading {args.url} ...")
        tmp = tempfile.NamedTemporaryFile(suffix=".pth", delete=False)
        tmp.close()
        try:
            urllib.request.urlretrieve(args.url, tmp.name)
        except Exception as e:  # noqa: BLE001 — report, keep tmp clean
            os.unlink(tmp.name)
            raise SystemExit(
                f"download failed ({e}); if this machine has no egress, "
                "copy resnet18-f37072fd.pth from another machine and rerun "
                "with --src /path/to/it")
        src = tmp.name

    import torch
    sd = validate(src)
    torch.save(sd, args.out)
    if not args.src:
        os.unlink(src)
    print(f"wrote {args.out}; scripts/train_MUSIC.sh will now start from "
          "ImageNet-pretrained frame features (pass --weights_frame "
          f"{args.out} to other recipes)")


if __name__ == "__main__":
    main()
