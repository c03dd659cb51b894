#!/bin/bash
# Pixelwise sound-map demo: every visual-map pixel drives the InnerProd
# synthesizer against the sound basis (reference synthesizer_net.py:29-38
# forward_pixelwise — implemented but unreachable there); writes a JET
# sound-energy overlay for the first duet clip.  SoP net family:
# vis_channels must equal num_channels.
OPTS=""
OPTS+="--demo_mode pixelwise "
OPTS+="--id Exp_SoPpp "
OPTS+="--list_val data/duet.csv "
OPTS+="--arch_sound unet7 "
OPTS+="--arch_frame resnet18dilated "
OPTS+="--arch_synthesizer linear "
OPTS+="--img_pool maxpool "
OPTS+="--num_channels 32 "
OPTS+="--vis_channels 32 "
OPTS+="--img_activation relu "
OPTS+="--not_pool_vis "
OPTS+="--att_type sig "
OPTS+="--num_mix 2 "
OPTS+="--log_freq 1 "
OPTS+="--audLen 65535 "
OPTS+="--audRate 11025 "
OPTS+="--one_frame "

python -u -m avsep_tpu.inference $OPTS
