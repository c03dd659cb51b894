"""Typed configuration for avsep_tpu.

The reference threads a flat ``argparse.Namespace`` of ~60 flags through every
function (reference ``arguments.py``).  Here the same flag surface is a frozen
dataclass: identical flag names and defaults so the reference's
``scripts/*.sh`` option strings parse unchanged, but typed, immutable, and
hashable where jit needs static arguments.

Flag provenance: reference ``arguments.py:6-169``.  Script-only flags the
reference forgot to declare (``--duet_vis_rate``, ``--restart_from_latest``,
``--train_steps``; see SURVEY.md §5 "fork drift") are declared here properly.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional, Sequence, Tuple


@dataclass(frozen=True)
class Config:
    # ---- model (reference arguments.py:9-52) ----
    id: str = ""
    num_mix: int = 2
    arch_sound: str = "unet7"
    arch_frame: str = "resnet18dilated"
    arch_synthesizer: str = "linear"
    fusion_type: str = "con"
    weights_sound: str = ""
    weights_frame: str = ""
    weights_synthesizer: str = ""
    num_channels: int = 32
    num_frames: int = 1
    stride_frames: int = 1
    img_pool: str = "maxpool"
    img_activation: str = "sigmoid"
    sound_activation: str = "no"
    output_activation: str = "sigmoid"
    binary_mask: int = 1
    mask_thres: float = 0.5
    loss: str = "l1"
    weighted_loss: int = 0
    log_freq: int = 1
    vis_channels: int = 512
    # torch argparse quirk: --not_pool_vis stores False; default True means
    # "return the spatial map" in forward_multiframe (reference main.py:120).
    not_pool_vis: bool = True

    # ---- data (reference arguments.py:55-73) ----
    num_gpus: int = 1  # kept for CLI compat; maps to data-parallel devices
    batch_size_per_gpu: int = 32
    workers: int = 32
    num_val: int = -1
    num_vis: int = 40
    audLen: int = 65535
    audRate: int = 11025
    stft_frame: int = 1022
    stft_hop: int = 256

    # ---- video (reference arguments.py:76-83) ----
    imgSize: int = 224
    frameRate: float = 8.0
    load_clips: bool = False
    clip_len: int = 32

    # ---- misc (reference arguments.py:86-93) ----
    seed: int = 1234
    ckpt: str = "./ckpt"
    disp_iter: int = 20
    eval_epoch: int = 1

    # ---- train (reference arguments.py:100-135) ----
    mode: str = "train"
    list_train: Tuple[str, ...] = ("data/train.csv",)
    list_val: Tuple[str, ...] = ("data/val.csv",)
    av_list_train: Tuple[str, ...] = ("data/train_av.csv",)
    ao_list_train: Tuple[str, ...] = ("data/train_ao.csv",)
    num_epoch: int = 100
    num_iters: int = 120000
    eval_iter: int = 7500
    iter_per_av: int = 2
    lr_frame: float = 1e-4
    lr_sound: float = 1e-3
    lr_motion: float = 1e-4
    lr_synthesizer: float = 1e-3
    lr_steps: Tuple[int, ...] = (20000, 40000)
    start_av_first: bool = False
    num_fsteps: int = 40000
    beta1: float = 0.9
    weight_decay: float = 1e-4
    train_repeat: int = 100

    # ---- other (reference arguments.py:145-168) ----
    load_ckpt: str = ""
    use_spec: bool = True
    rate_dc: float = 1.0
    rate_sc: float = 0.05
    rate_sv: float = 0.0
    margin: float = 3.0
    max_silent: float = 0.67
    val_repeat: int = 12
    match_weight: float = 0.6
    one_frame: bool = False
    fix_vis: bool = False
    att_type: str = "cos"

    # ---- script-only / SoP++ flags the reference never declared ----
    # duet_vis_rate is passed by the reference's inference/vis scripts
    # (scripts/{inference,vis_model}.sh:63) but consumed by nothing there
    # (fork drift).  Here it is given its plausible intended semantics:
    # in `--demo_mode sweep`, 0 < r <= 1 renders the expensive
    # attention-overlay mp4s for only the first of every round(1/r) duet
    # rows (wavs + mask jpgs are always written); 0 = full dumps for all
    # rows (the value the reference scripts pass).  See
    # inference.duet_sweep.
    duet_vis_rate: float = 0.0
    restart_from_latest: bool = False
    train_steps: Tuple[int, ...] = (20000, 40000)
    extra_size: int = 32  # SoP++ bottleneck split width (SoP++/audio_net.py:11)

    # ---- TPU-native additions (no reference equivalent) ----
    dtype: str = "float32"          # compute dtype for the model
    audio_wire: str = "f32"         # host->device audio encoding: "f32"
                                    # (bit-exact) or "int16" (+per-source
                                    # gains, ~half the audio bytes; see
                                    # data/wire.py)
    frame_decode: str = "auto"      # host frame decode path: "auto" = C++
                                    # libjpeg + PIL-exact fused
                                    # resample/crop when native/
                                    # libavsep_frames.so loads
                                    # (bit-identical pixels), "native" =
                                    # require it, "fast" = + DCT-scaled
                                    # decode (approximate pixels, fastest),
                                    # "pil" = force the pure-Python path
    data_axis: str = "data"          # mesh axis name for DP
                                     # (parallel.mesh.mesh_from_config)
    mesh_shape: Tuple[int, ...] = ()  # (N,) -> N-device 1-axis data mesh;
                                     # () -> caller default (num_gpus for
                                     # main, all devices for sop_main)
    # multi-host (DCN) data parallelism — parallel/distributed.py.  The
    # reference never exceeds one host (SURVEY §2.3); these extend the
    # same 1-axis data mesh across processes via jax.distributed.
    dist_coordinator: str = ""       # "host:port" of process 0 ("" = off)
    dist_nprocs: int = 1             # total number of processes
    dist_procid: int = 0             # this process's id [0, nprocs)
    dist_data: str = "replicate"     # host data mode: "replicate" (every
                                     # host runs the identical loader,
                                     # ships only its rows — bit-identical
                                     # to 1-process) | "shard" (disjoint
                                     # per-host sample streams, host work
                                     # divides too)
    profile_dir: str = ""            # jax.profiler trace output (off if "")
    profile_start: int = 10          # first profiled iteration
    profile_steps: int = 5           # number of profiled iterations
    remat: bool = False              # rematerialize net forwards in backward
    use_pallas: bool = False         # fused Pallas STFT/iSTFT kernels
    # DFT backend for the on-device STFT/iSTFT (ops/stft.py):
    #   fft          XLA rfft/irfft — bit-exact librosa parity (default).
    #                XLA lowers n_fft=1022 to HIGHEST-precision conv chains
    #                (~25% of separation device time, BENCH_NOTES trace).
    #   matmul       one dense cos/sin einsum at 3-pass-bf16 MXU precision —
    #                ~f32-accurate (>120 dB vs fft), fewer MXU passes.
    #   matmul_fast  same einsum at 1-pass bf16.
    dft: str = "fft"
    # Attention temperature for the CoLoc/MixVis fusion scores
    # (models/fusion.py::_attend).  1.0 = the reference's fixed behavior
    # (fusion_net.py:27-33 has no temperature); <1 sharpens the sig
    # saturation / scales up cos scores.  Diagnostic knob for the
    # pointing-game sweep (VERDICT r4 #5).
    att_temp: float = 1.0
    # (removed) fused_av: the doubled-batch AV pass was measured to save
    # nothing on v5e in two rounds (33.2->33.5 steps/s at B=8, 113->117 ms
    # at B=32 — XLA already overlaps the symmetric passes) and was inexact
    # in train mode (decoder BN over 2B stats).  Deleted per VERDICT r3
    # weak #6; BENCH_NOTES.md keeps the measurements.
    # inference demo selector (python -m avsep_tpu.inference):
    #   vis       attention-overlay video on one duet clip (default)
    #   share     blank-frame 'share' ablation (reference inference.py:88-107)
    #   sweep     vis demo over every row of the duet manifest (:421-426)
    #   synthesis mix two solo clips and separate (:237-252)
    #   pixelwise per-pixel sound map via InnerProd.forward_pixelwise
    #             (reference synthesizer_net.py:29-38, SoP nets)
    demo_mode: str = "vis"

    # -------------------------------------------------------------- helpers
    @property
    def batch_size(self) -> int:
        # reference main.py:772: global batch = num_gpus * per-gpu batch
        return self.num_gpus * self.batch_size_per_gpu

    @property
    def audSec(self) -> float:
        return 1.0 * self.audLen / self.audRate

    @property
    def HS(self) -> int:
        """STFT freq bins (reference dataset/base.py:40)."""
        return self.stft_frame // 2 + 1

    @property
    def WS(self) -> int:
        """STFT frames (reference dataset/base.py:41)."""
        return (self.audLen + 1) // self.stft_hop

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def jit_signature(self) -> tuple:
        """Value key of the compute-relevant fields, for jit-step caches.

        Excludes fields only host-side orchestration/IO reads (paths,
        loader knobs, loop cadence, logging, distributed bring-up, demo
        selectors) so ``cfg.replace(ckpt=...)``-style copies reuse the
        compiled eval step instead of paying a 20-40 s recompile —
        ``JitStepCache`` previously keyed on ``id(cfg)``, which any
        ``replace`` invalidates.  Every excluded field is verified unread
        inside the jitted closures of ``evaluate._build_eval_step`` and
        ``sop_main.make_sop_eval_step`` (batch sizes are excluded too:
        shapes flow from the arrays, and jax.jit re-specializes per
        shape on its own).
        """
        return tuple(
            getattr(self, f.name) for f in dataclasses.fields(self)
            if f.name not in _HOST_ONLY_FIELDS)


# fields never read inside a jitted step closure (host orchestration/IO
# only) — see Config.jit_signature
_HOST_ONLY_FIELDS = frozenset({
    "id", "ckpt", "load_ckpt",
    "weights_sound", "weights_frame", "weights_synthesizer",
    "workers", "num_val", "num_vis", "disp_iter", "eval_epoch", "mode",
    "list_train", "list_val", "av_list_train", "ao_list_train",
    "num_epoch", "num_iters", "eval_iter", "iter_per_av",
    "start_av_first", "num_fsteps", "train_repeat",
    "rate_dc", "rate_sc", "rate_sv", "margin", "max_silent", "val_repeat",
    "restart_from_latest", "duet_vis_rate", "demo_mode",
    "profile_dir", "profile_start", "profile_steps",
    "dist_coordinator", "dist_nprocs", "dist_procid", "dist_data",
    "frameRate", "stride_frames", "seed", "num_gpus", "frame_decode",
    "batch_size_per_gpu", "train_steps",
    # mesh construction happens before any jit; the step programs are
    # sharding-agnostic (shardings ride on the input arrays)
    "mesh_shape", "data_axis",
})


def _build_parser() -> argparse.ArgumentParser:
    """Build an argparse parser accepting the reference's exact flag strings."""
    p = argparse.ArgumentParser(description="avsep_tpu")
    d = Config()
    for f in dataclasses.fields(Config):
        name = "--" + f.name
        default = getattr(d, f.name)
        if f.name == "not_pool_vis":
            # reference arguments.py:52: store_false with default True
            p.add_argument(name, action="store_false", default=True)
        elif f.name in ("load_clips", "one_frame", "fix_vis", "start_av_first",
                        "restart_from_latest"):
            p.add_argument(name, action="store_true", default=False)
        elif f.name == "use_spec":
            p.add_argument(name, action="store_false", default=True)
        elif isinstance(default, tuple):
            elem = int if all(isinstance(x, int) for x in default) else str
            p.add_argument(name, nargs="+", type=elem, default=list(default))
        elif isinstance(default, bool):
            p.add_argument(name, type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=default)
        else:
            p.add_argument(name, type=type(default), default=default)
    return p


def parse_args(argv: Optional[Sequence[str]] = None) -> Config:
    """Parse reference-compatible CLI flags into a Config."""
    ns = _build_parser().parse_args(argv)
    kw = vars(ns)
    for f in dataclasses.fields(Config):
        if isinstance(getattr(Config(), f.name), tuple) and isinstance(kw[f.name], list):
            kw[f.name] = tuple(kw[f.name])
    cfg = Config(**kw)
    print("Input arguments:")  # reference arguments.py:138-141
    for k, v in sorted(dataclasses.asdict(cfg).items()):
        print("{:16} {}".format(k, v))
    return cfg
