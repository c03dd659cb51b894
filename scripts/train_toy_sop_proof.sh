#!/bin/bash
# SoP++ learning proof on the class-token synthetic set: train the real
# SoP++ recipe shape (basis unet7-32 + dilated ResNet18-32 + InnerProd +
# AttModel/cos, 3-stage curriculum — scripts/train_SoPpp.sh, reference
# SoP++/main.py:670-688) on frames that carry a localizable class token,
# evaluating held-out SI-SDR per stage.  Companion to
# scripts/train_toy_av_proof.sh (flagship CoLoc proof).
#
# Deviations from scripts/train_SoPpp.sh, forced by this environment:
# no ImageNet bootstrap (zero egress) so lr_frame 1e-4 -> 1e-3; schedule
# compressed 95k -> 6k iters with the stage boundaries scaled to match
# (21%/21%/58%); one chip instead of two GPUs.
set -e

ROOT=${1:-/tmp/music_tok}
CKPT=${2:-./ckpt}

if [ ! -f "$ROOT/tokens.json" ]; then
  python examples/make_synthetic_data.py --root "$ROOT" \
    --classes cello flute violin trumpet --videos_per_class 6 \
    --duration 14 --fps 8 --class_tokens
  python - "$ROOT" <<'PYEOF'
import sys
root = sys.argv[1]
rows = [l.strip() for l in open(f"{root}/train.csv") if l.strip()]
train = [r for r in rows if not r.split(",")[0].endswith("5.wav")]
val = [r for r in rows if r.split(",")[0].endswith("5.wav")]
open(f"{root}/train_split.csv", "w").write("\n".join(train) + "\n")
open(f"{root}/val_split.csv", "w").write("\n".join(val) + "\n")
print(len(train), "train rows,", len(val), "held-out val rows")
PYEOF
fi

args=(
  --id sopproof
  --ckpt "$CKPT"
  --av_list_train "$ROOT/train_split.csv"
  --ao_list_train "$ROOT/train_split.csv"
  --list_val "$ROOT/val_split.csv"
  --arch_sound unet7 --arch_frame resnet18dilated --arch_synthesizer linear
  --num_channels 32 --vis_channels 32
  --fusion_type Base --att_type cos --not_pool_vis
  --img_pool maxpool --img_activation relu --sound_activation no
  --output_activation sigmoid
  --loss bce --binary_mask 1 --weighted_loss 1 --mask_thres 0.5
  --num_mix 2 --log_freq 1 --match_weight 0.1
  --one_frame --margin 1 --rate_dc 1 --train_repeat 50 --val_repeat 2
  --batch_size_per_gpu 16 --num_gpus 1 --workers 2
  --lr_sound 1e-3 --lr_frame 1e-3 --lr_synthesizer 1e-3
  --lr_steps 4200 5100 --num_iters 6001
  --train_steps 1300 2600 6001
  --iter_per_av 2 --start_av_first --num_fsteps 0
  --eval_iter 650 --disp_iter 50 --num_vis 0
)

python -u -m avsep_tpu.sop_main --mode train "${args[@]}"

# frames-swap assignment accuracy + branch SI-SDR.  `latest` (not `best`):
# best_err tracks the loss, which the 3-stage curriculum pins to an early
# stage-1 snapshot whose AV path is untrained.
python tools/sop_probe.py --probe_ckpt latest --mode eval "${args[@]}" \
  --val_repeat 8
