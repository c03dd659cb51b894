#!/bin/bash
# Canonical joint AV+AO training config (mirrors reference
# scripts/train_MUSIC.sh hyperparameters; invokes the TPU-native trainer).
OPTS=""
OPTS+="--id Exp5_BaseSig "
OPTS+="--av_list_train data/train.csv "
OPTS+="--ao_list_train data/train.csv "
OPTS+="--list_val data/val.csv "
OPTS+="--start_av_first "
OPTS+="--num_fsteps 0 "
# Models
OPTS+="--arch_sound unet7 "
OPTS+="--arch_synthesizer linear "
OPTS+="--arch_frame resnet18dilated "
OPTS+="--img_pool maxpool "
OPTS+="--num_channels 2 "
OPTS+="--img_activation relu "
OPTS+="--output_activation sigmoid "
OPTS+="--vis_channels 256 "
OPTS+="--fusion_type hidsep "
OPTS+="--not_pool_vis "
OPTS+="--att_type sig "
# binary mask, BCE loss, weighted loss
OPTS+="--binary_mask 1 "
OPTS+="--loss bce "
OPTS+="--weighted_loss 1 "
OPTS+="--num_mix 2 "
OPTS+="--log_freq 1 "
# frames
OPTS+="--num_frames 3 "
OPTS+="--stride_frames 8 "
OPTS+="--frameRate 30 "
# audio
OPTS+="--audLen 65535 "
OPTS+="--audRate 11025 "
# learning (num_gpus maps to data-parallel devices on the mesh)
OPTS+="--num_gpus 2 "
OPTS+="--workers 4 "
OPTS+="--batch_size_per_gpu 16 "
OPTS+="--lr_frame 1e-4 "
OPTS+="--lr_sound 1e-3 "
OPTS+="--lr_synthesizer 1e-3 "
OPTS+="--lr_steps 50000 70000 90000 "
OPTS+="--num_iters 95001 "
OPTS+="--iter_per_av 2 "
OPTS+="--eval_iter 1000 "
OPTS+="--train_repeat 50 "
# display / viz
OPTS+="--disp_iter 20 "
OPTS+="--num_vis 100 "
OPTS+="--num_val 256 "
OPTS+="--rate_dc 1 "
OPTS+="--max_silent 0.87 "
OPTS+="--mask_thres 0.5 "
OPTS+="--match_weight 0.1 "
OPTS+="--one_frame "

python -u -m avsep_tpu.main $OPTS
