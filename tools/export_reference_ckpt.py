"""Export a trained avsep_tpu Orbax checkpoint to reference ``.pth`` files.

The inverse of the ``--weights_sound/--weights_frame`` import path: writes
``{sound,frame}_{tag}.pth`` (and ``synthesizer_{tag}.pth`` for SoP
checkpoints) in the reference's per-net ``state_dict`` layout (reference
``main.py:506-533``), so a model trained here drops straight into the
reference's eval/demo scripts (``main.py:789-793``).

Usage (same model flags as training, so the param tree shapes match):
    python tools/export_reference_ckpt.py --id Exp5 --ckpt ./ckpt \
        --arch_sound unet7 --fusion_type hidsep --att_type sig ... \
        [--tag best|latest] [--out DIR] [--sop]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    # peel off the tool-only flags; everything else is the standard Config
    # CLI so nets are rebuilt exactly as trained
    ap = argparse.ArgumentParser(add_help=False)
    ap.add_argument("--tag", default="best", choices=("best", "latest"))
    ap.add_argument("--out", default="")
    ap.add_argument("--sop", action="store_true",
                    help="SoP++ checkpoint (sound/frame/synthesizer nets)")
    tool_args, rest = ap.parse_known_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # no TPU needed to export
    import jax

    from avsep_tpu.config import parse_args
    from avsep_tpu.checkpoint import restore_checkpoint
    from avsep_tpu.models.torch_export import (
        resnet_to_torch, save_torch_checkpoint, synthesizer_to_torch,
        unet_to_torch)

    cfg = parse_args(rest)
    ckpt_dir = os.path.join(cfg.ckpt, cfg.id)
    out_dir = tool_args.out or ckpt_dir
    os.makedirs(out_dir, exist_ok=True)

    if tool_args.sop:
        from avsep_tpu.sop_main import build_sop_nets, init_sop_state
        nets = build_sop_nets(cfg)
        state = init_sop_state(cfg, nets, jax.random.PRNGKey(cfg.seed))
    else:
        from avsep_tpu.engine import build_nets
        from avsep_tpu.train import init_state
        nets = build_nets(cfg)
        state = init_state(cfg, nets, jax.random.PRNGKey(cfg.seed))
    state = restore_checkpoint(ckpt_dir, state, tool_args.tag)
    params, stats = jax.device_get((state.params, state.batch_stats))

    num_downs = int(cfg.arch_sound[-1])
    wrote = []
    sd = unet_to_torch(params["sound"], stats["sound"], num_downs=num_downs)
    p = os.path.join(out_dir, f"sound_{tool_args.tag}.pth")
    save_torch_checkpoint(sd, p)
    wrote.append(p)

    sd = resnet_to_torch(params["frame"], stats["frame"])
    p = os.path.join(out_dir, f"frame_{tool_args.tag}.pth")
    save_torch_checkpoint(sd, p)
    wrote.append(p)

    if "synthesizer" in params:
        sd = synthesizer_to_torch(params["synthesizer"])
        p = os.path.join(out_dir, f"synthesizer_{tool_args.tag}.pth")
        save_torch_checkpoint(sd, p)
        wrote.append(p)

    for p in wrote:
        print("wrote", p)


if __name__ == "__main__":
    main()
