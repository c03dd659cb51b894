"""Config/CLI surface: the reference's script flag strings parse unchanged
(reference scripts/train_MUSIC.sh:20-67, arguments.py)."""

from avsep_tpu.config import Config, parse_args

TRAIN_MUSIC_FLAGS = (
    "--id Exp5_BaseSig --av_list_train data/train.csv "
    "--ao_list_train data/train.csv --list_val data/val.csv "
    "--start_av_first --num_fsteps 0 --arch_sound unet7 "
    "--arch_synthesizer linear --arch_frame resnet18dilated "
    "--img_pool maxpool --num_channels 2 --img_activation relu "
    "--output_activation sigmoid --vis_channels 256 --fusion_type hidsep "
    "--not_pool_vis --att_type sig --binary_mask 1 --loss bce "
    "--weighted_loss 1 --num_mix 2 --log_freq 1 --num_frames 3 "
    "--stride_frames 8 --frameRate 30 --audLen 65535 --audRate 11025 "
    "--num_gpus 2 --workers 4 --batch_size_per_gpu 16 --lr_frame 1e-4 "
    "--lr_sound 1e-3 --lr_synthesizer 1e-3 --lr_steps 50000 70000 90000 "
    "--num_iters 95001 --iter_per_av 2 --eval_iter 1000 --train_repeat 50 "
    "--disp_iter 20 --num_vis 100 --num_val 256 --rate_dc 1 "
    "--max_silent 0.87 --mask_thres 0.5 --match_weight 0.1 --one_frame")


def test_reference_train_flags_parse():
    cfg = parse_args(TRAIN_MUSIC_FLAGS.split())
    assert cfg.id == "Exp5_BaseSig"
    assert cfg.arch_sound == "unet7"
    assert cfg.fusion_type == "hidsep"
    assert cfg.att_type == "sig"
    assert cfg.num_channels == 2
    assert cfg.vis_channels == 256
    assert cfg.not_pool_vis is False      # store_false flag passed
    assert cfg.one_frame is True
    assert cfg.start_av_first is True
    assert cfg.lr_steps == (50000, 70000, 90000)
    assert cfg.batch_size == 32           # 2 gpus x 16
    assert cfg.weighted_loss == 1 and cfg.binary_mask == 1
    assert cfg.max_silent == 0.87
    assert cfg.HS == 512 and cfg.WS == 256
    assert abs(cfg.audSec - 5.944) < 1e-2


def test_defaults_match_reference():
    cfg = Config()
    # reference arguments.py defaults
    assert cfg.num_mix == 2 and cfg.arch_sound == "unet7"
    assert cfg.stft_frame == 1022 and cfg.stft_hop == 256
    assert cfg.audLen == 65535 and cfg.audRate == 11025
    assert cfg.not_pool_vis is True       # flag absent
    assert cfg.rate_dc == 1.0 and cfg.rate_sc == 0.05
    assert cfg.margin == 3.0 and cfg.val_repeat == 12
    assert cfg.match_weight == 0.6 and cfg.att_type == "cos"
    assert cfg.lr_steps == (20000, 40000)
    assert cfg.seed == 1234


def test_eval_flags():
    cfg = parse_args(["--mode", "eval", "--batch_size_per_gpu", "16"])
    assert cfg.mode == "eval"
    assert cfg.batch_size == 16


def test_compile_cache_helper(tmp_path):
    """enable_compile_cache points JAX at the dir; 'off' and bad paths
    degrade to no-ops (utils/compile_cache.py)."""
    import jax
    from avsep_tpu.utils.compile_cache import enable_compile_cache
    p = tmp_path / "xla_cache"
    enable_compile_cache(str(p))
    assert p.is_dir()
    assert jax.config.jax_compilation_cache_dir == str(p.resolve())
    enable_compile_cache("off")   # explicit opt-out: early return, no crash
    enable_compile_cache("/proc/definitely/not/writable")  # swallowed
