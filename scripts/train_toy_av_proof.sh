#!/bin/bash
# Audio-visual learning proof on the class-token synthetic set (VERDICT r2
# missing #1): train the flagship recipe shape (unet7 + dilated ResNet18-256
# + CoLoc/sig) on frames that carry a localizable class token, then probe
# permutation accuracy, pointing-game accuracy, and AV-vs-AO SI-SDR on a
# held-out val split.
#
# Deviations from scripts/train_MUSIC.sh, both forced by this environment:
# no ImageNet bootstrap (zero egress), so lr_frame is raised 1e-4 -> 1e-3 to
# train the frame encoder from scratch; 3k iterations instead of 95k (the
# toy set saturates long before that).
#
# SHARED_BG=1 generates the harder variant where EVERY video shares one
# background texture, so the class token is the only class-informative
# visual content — background memorization can't fake the result, and the
# pointing game becomes a sharp localization test (measured: pointing-acc
# 0.984 / attention-mass 1.000 vs 0.25 chance; AVPROOF_r03.json).
set -e

ROOT=${1:-/tmp/music_tok}
CKPT=${2:-./ckpt}
SB_FLAG=""
[ "${SHARED_BG:-0}" = "1" ] && SB_FLAG="--shared_background"

if [ ! -f "$ROOT/tokens.json" ]; then
  python examples/make_synthetic_data.py --root "$ROOT" \
    --classes cello flute violin trumpet --videos_per_class 6 \
    --duration 14 --fps 8 --class_tokens $SB_FLAG
  python - "$ROOT" <<'EOF'
import sys
root = sys.argv[1]
rows = [l.strip() for l in open(f"{root}/train.csv") if l.strip()]
train = [r for r in rows if not r.split(",")[0].endswith("5.wav")]
val = [r for r in rows if r.split(",")[0].endswith("5.wav")]
open(f"{root}/train_split.csv", "w").write("\n".join(train) + "\n")
open(f"{root}/val_split.csv", "w").write("\n".join(val) + "\n")
print(len(train), "train rows,", len(val), "held-out val rows")
EOF
fi

args=(
  --id avproof
  --ckpt "$CKPT"
  --av_list_train "$ROOT/train_split.csv"
  --ao_list_train "$ROOT/train_split.csv"
  --list_val "$ROOT/val_split.csv"
  --arch_sound unet7 --arch_frame resnet18dilated --arch_synthesizer linear
  --num_channels 2 --vis_channels 256
  --fusion_type hidsep --att_type sig --not_pool_vis
  --img_pool maxpool --img_activation relu --output_activation sigmoid
  --loss bce --binary_mask 1 --weighted_loss 1 --mask_thres 0.5
  --num_mix 2 --log_freq 1 --match_weight 0.1
  --one_frame --margin 1 --rate_dc 1 --train_repeat 50 --val_repeat 2
  --batch_size_per_gpu 16 --num_gpus 1 --workers 2
  --lr_sound 1e-3 --lr_frame 1e-3 --lr_steps 2000 2600 --num_iters 3001
  --start_av_first --num_fsteps 0 --iter_per_av 2
  --eval_iter 750 --disp_iter 50 --num_vis 0
)
# EXTRA_ARGS: append e.g. "--dtype bfloat16 --dft matmul" (the validated
# fast training config, BENCH_NOTES) without editing the recipe
[ -n "${EXTRA_ARGS:-}" ] && args+=(${EXTRA_ARGS})

python -u -m avsep_tpu.main --mode train "${args[@]}"

# perm-accuracy + pointing-game + branch SI-SDR from the probed checkpoint
# (PROBE_CKPT=latest probes the final iterate instead of the reference's
# best-by-AO-SI-SDR policy — on the shared-background set "best" lands at
# iter 750 before the match loss converges)
python tools/av_probe.py --tokens_json "$ROOT/tokens.json" \
  --probe_ckpt "${PROBE_CKPT:-best}" --mode eval "${args[@]}"
