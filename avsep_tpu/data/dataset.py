"""MUSIC mixture dataset: manifests, mixing policy, deterministic sampling.

Host-side equivalent of reference ``dataset/base.py`` + ``dataset/music.py``:
CSV manifests (rows ``audio_path, frames_dir, num_frames, fps,
audio_len_sec, class``), on-the-fly N=2 mixing with partner-selection
strategies (``dc`` different-class / ``sc`` same-class / ``sv`` same-video /
``random`` / ``vis1``), silence-rejecting crop retries, and center-frame
loading with temporally consistent transforms.

Determinism: the reference reseeds the *global* ``random`` per index
(``dataset/music.py:280``), which is worker-unsafe by design (SURVEY.md
appendix).  Here each ``__getitem__`` uses a local ``random.Random(seed ^
index)`` so results are reproducible per index AND thread-safe.

Unlike the reference, no STFT happens here — raw waveforms ship to the
device and the spectrogram pipeline runs on-TPU (see avsep_tpu.engine).
"""

from __future__ import annotations

import csv
import os
import random
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from avsep_tpu.config import Config
from avsep_tpu.data.audio_io import load_audio_crop
from avsep_tpu.data.video_transforms import train_transform, val_transform

MUSIC11_CLASSES = [
    "accordion", "acoustic_guitar", "cello", "clarinet", "erhu", "flute",
    "saxophone", "trumpet", "tuba", "violin", "xylophone"]


# The reference ships a compiled-only MUSICAODataset (dataset/__pycache__/
# music_ao.cpython-37.pyc, imported by SoP++/main.py:30) whose method surface
# matches MUSICMixDataset (SURVEY.md §2.1); the audio-only loaders here use
# the same class.
def MusicAODataset(*args, **kwargs):
    return MusicMixDataset(*args, **kwargs)


def read_manifest(csv_path: str) -> List[List[str]]:
    """Rows with >= 2 columns (reference dataset/base.py:61-70)."""
    rows = []
    with open(csv_path, "r") as f:
        for row in csv.reader(f, delimiter=","):
            if len(row) < 2:
                continue
            rows.append(row)
    return rows


class MusicMixDataset:
    """Deterministic-by-index mixture sampler (reference MUSICMixDataset)."""

    def __init__(self, csv_path, cfg: Config, split: str = "val",
                 seed: Optional[int] = None, random_sample: bool = False,
                 vis_data: Optional[str] = None, classes=None):
        self.cfg = cfg
        self.split = split
        self.random_sample = random_sample
        self.vis_data = vis_data
        self.seed = seed if seed is not None else cfg.seed
        self.classes = list(classes or MUSIC11_CLASSES)
        self.class_int_map = {k: v for v, k in enumerate(self.classes)}

        if isinstance(csv_path, str):
            self.list_samples = read_manifest(csv_path)
        else:
            self.list_samples = list(csv_path)
        self.dict_samples: Dict[str, list] = {}
        for s in self.list_samples:
            self.dict_samples.setdefault(s[-1], []).append(s)

        # repeat + shuffle (reference dataset/base.py:75-81)
        if split == "train":
            self.list_samples = self.list_samples * cfg.train_repeat
            random.Random(self.seed).shuffle(self.list_samples)
        else:
            self.list_samples = self.list_samples * cfg.val_repeat
        assert len(self.list_samples) > 0

    def __len__(self):
        return len(self.list_samples)

    # ---------------------------------------------------------- sampling

    def get_samples(self, index: int, option: str, rng: random.Random):
        """Partner selection (reference dataset/music.py:57-93)."""
        cfg = self.cfg
        infos = [self.list_samples[index]]
        sound_cls = self.list_samples[index][-1]
        if option == "dc":
            # restrict to classes actually present in the manifest (the
            # reference assumes the full MUSIC-11 class list is populated)
            left = [c for c in self.classes
                    if c != sound_cls and c in self.dict_samples]
            for _ in range(cfg.num_mix - 1):
                cls = rng.choice(left)
                infos.append(rng.choice(self.dict_samples[cls]))
        elif option == "sc":
            for _ in range(cfg.num_mix - 1):
                infos.append(rng.choice(self.dict_samples[sound_cls]))
        elif option == "sv":
            for _ in range(cfg.num_mix - 1):
                infos.append(self.list_samples[index])
        elif option == "random":
            for _ in range(cfg.num_mix - 1):
                infos.append(self.list_samples[
                    rng.randint(0, len(self.list_samples) - 1)])
        elif option == "vis1":
            infos = [rng.choice(self.dict_samples["cello"])]
            for _ in range(cfg.num_mix - 1):
                infos.append(rng.choice(self.dict_samples["flute"]))
        return infos

    def get_audios(self, infos, rng: random.Random):
        """Silence-rejecting crops; each source scaled by 1/N then summed
        (reference dataset/music.py:96-130)."""
        cfg = self.cfg
        aud_sec = cfg.audSec
        audios, center_times = [], []
        for info in infos:
            apath, _, num_f, fps, a_len = info[0], info[1], info[2], \
                info[3], info[4]
            act_len = min(float(num_f) / float(fps), float(a_len))
            for j in range(10):
                end = act_len - cfg.margin - aud_sec / 2
                start = cfg.margin + aud_sec / 2
                if start > end:
                    end = act_len - aud_sec / 2
                    start = aud_sec / 2
                t = rng.uniform(0 + start, end)
                aud = load_audio_crop(
                    apath, t, aud_len=cfg.audLen, aud_rate=cfg.audRate,
                    margin=cfg.margin, rng=rng, train=self.split == "train")
                if self.split == "train":
                    is_silent = bool(np.all(aud == 0))
                else:
                    frac = (np.abs(aud) < 0.001).sum() / cfg.audLen
                    is_silent = frac > cfg.max_silent
                if not is_silent or j == 9:
                    if is_silent:
                        print(f"Load {apath} failed.")
                    center_times.append(t)
                    audios.append(aud / cfg.num_mix)
                    break
        mixture = np.sum(np.asarray(audios), axis=0)
        return audios, mixture, center_times

    def frame_paths(self, info, center_t: float, rng: random.Random
                    ) -> List[str]:
        """Center-frame index arithmetic (reference dataset/music.py:132-156).

        Indices are clamped to [0, num_frames-1] — the reference doesn't
        clamp and crashes with FileNotFoundError on rows shorter than
        2*margin + audSec (its get_audios fallback can place center_t
        within stride of the clip edge); a clamped edge frame keeps a
        long training run alive instead (same policy as the clips path).
        """
        cfg = self.cfg
        _, fpath, num_f, fps = info[0], info[1], info[2], float(info[3])
        last = max(int(float(num_f)) - 1, 0)
        center_idx = round(center_t * fps)
        idxs = []
        if cfg.one_frame:
            idxs.append(center_idx
                        + rng.randint(-cfg.stride_frames, cfg.stride_frames))
        else:
            idxs = [center_idx + (i - cfg.num_frames // 2) * cfg.stride_frames
                    for i in range(cfg.num_frames)]
        return [os.path.join(fpath,
                             "{:06d}.jpg".format(min(max(i, 0), last)))
                for i in idxs]

    # ------------------------------------------------- native frame decode

    def _native_frames_enabled(self) -> bool:
        """--frame_decode auto|native|fast|pil (TPU-native addition): the
        C++ libjpeg + PIL-exact-resample fast path
        (native/avsep_frames.cpp) replaces the reference's per-frame PIL
        decode in Python workers (reference dataset/music.py:132-156, the
        measured host bottleneck of the real-data loop).  Numerics are
        bit-identical to the PIL path (tests/test_native_frames.py), so
        'auto' uses it whenever the library loads; 'fast' additionally
        decodes at a reduced DCT scale (approximate pixels, biggest
        decode saving on large frames)."""
        fd = getattr(self.cfg, "frame_decode", "auto")
        if fd == "pil":
            return False
        from avsep_tpu.data import native
        ok = native.frames_available()
        if not ok and fd in ("native", "fast"):
            raise RuntimeError(
                f"--frame_decode {fd} requested but libavsep_frames.so "
                "is unavailable (libjpeg or a C++ compiler is missing)")
        if ok and fd == "auto":
            # auto promises PIL bit-identity; verify it once against the
            # actual host libjpeg before trusting the fast path
            ok = native.frames_selfcheck_ok()
        return ok

    @property
    def _fast_decode(self) -> bool:
        return getattr(self.cfg, "frame_decode", "auto") == "fast"

    @staticmethod
    def _pil_apply(paths, resize, crop, final, flip) -> np.ndarray:
        """Apply already-drawn transform params with PIL — the fallback
        when the native batch call fails mid-sample (e.g. one corrupt
        jpg), keeping the rng stream identical to the native path."""
        from avsep_tpu.data.video_transforms import to_uint8_array
        imgs = [Image.open(p).convert("RGB") for p in paths]
        if resize:
            imgs = [im.resize(resize, Image.BICUBIC) for im in imgs]
        if crop:
            left, top, cw, ch = crop
            imgs = [im.crop((left, top, left + cw, top + ch))
                    for im in imgs]
        if final:
            imgs = [im.resize(final, Image.BICUBIC) for im in imgs]
        if flip:
            imgs = [im.transpose(Image.FLIP_LEFT_RIGHT) for im in imgs]
        return to_uint8_array(imgs)

    def get_frames(self, infos, center_times, rng: random.Random):
        cfg = self.cfg
        use_native = self._native_frames_enabled()
        out = []
        for info, t in zip(infos, center_times):
            paths = self.frame_paths(info, t, rng)
            arr = None
            if use_native:
                arr = self._native_center_frames(paths, rng)
            if arr is None:
                imgs = [Image.open(p).convert("RGB") for p in paths]
                # uint8 wire format: ImageNet normalization runs on device
                # (engine.normalize_frames) — 4x fewer host->device bytes
                if self.split == "train":
                    arr = train_transform(imgs, cfg.imgSize, rng,
                                          normalize=False)
                else:
                    arr = val_transform(imgs, cfg.imgSize, normalize=False)
            out.append(arr)
        return np.stack(out)

    def _native_center_frames(self, paths, rng: random.Random):
        """Native equivalent of train_transform/val_transform: identical
        geometry (resize_shorter_dims / center_crop_box) and identical
        rng draw order as video_transforms.{random_crop,random_hflip}."""
        from avsep_tpu.data import native
        from avsep_tpu.data.video_transforms import (center_crop_box,
                                                     resize_shorter_dims)
        cfg = self.cfg
        dims = native.jpeg_probe_dims(paths[0])
        if dims is None:  # unreadable/non-jpeg: PIL path, no draws burned
            return None
        w, h = dims
        S = cfg.imgSize
        if self.split == "train":
            rw, rh = resize_shorter_dims(w, h, int(S * 1.1))
            if (rw, rh) == (S, S):
                # random_crop's no-op early return consumes no draws
                crop = None
            else:
                left = rng.randint(0, max(rw - S, 0))
                top = rng.randint(0, max(rh - S, 0))
                crop = (left, top, S, S)
            flip = rng.random() < 0.5
        else:
            rw, rh = resize_shorter_dims(w, h, S)
            left, top = center_crop_box(rw, rh, S)
            crop = (left, top, S, S)
            flip = False
        arr = native.frame_pipeline_batch(paths, S, S, resize=(rw, rh),
                                          crop=crop, hflip=flip,
                                          fast=self._fast_decode)
        if arr is None:  # decode failed after draws: PIL with SAME params
            arr = self._pil_apply(paths, (rw, rh), crop, None, flip)
        return arr  # [N, T, H, W, 3] uint8

    def get_frames_clips(self, infos, center_times, rng: random.Random):
        """Clip pipeline (reference ``get_frames_mmcv``, dataset/
        music.py:202-229; behavior re-derived from ``make_mmcv_dict``
        :158-168 since the authors' mmaction ops are private): sample
        ``clip_len`` frames uniformly over ``audSec`` seconds around the
        center time, plus the ``num_frames`` strided center frames; train
        aug = Resize(-1,256) -> RandomResizedCrop -> 224, flip; val =
        Resize(-1,256) -> CenterCrop(224)."""
        from avsep_tpu.data.video_transforms import (
            center_crop, random_hflip, random_resized_crop, resize_shorter,
            to_uint8_array)
        cfg = self.cfg
        use_native = self._native_frames_enabled()
        center_list, clip_list = [], []
        for info, center_t in zip(infos, center_times):
            _, fpath, num_f, fps = info[0], info[1], float(info[2]), \
                float(info[3])
            # clip frame indices: clip_len uniform over audSec
            t0 = center_t - cfg.audSec / 2
            idxs = [int(round((t0 + cfg.audSec * k / cfg.clip_len) * fps))
                    for k in range(cfg.clip_len)]
            idxs = [min(max(i, 0), int(num_f) - 1) for i in idxs]
            # center frames with stride — clamped to the clip like the
            # clip indices above and frame_paths (review finding: an
            # unclamped edge-of-clip cidx crashed the loader with
            # FileNotFoundError on exactly the short rows the
            # silence-retry fallback produces)
            center_idx = round(center_t * fps)
            if cfg.one_frame:
                cidx = [center_idx]
            else:
                cidx = [center_idx + (i - cfg.num_frames // 2)
                        * cfg.stride_frames for i in range(cfg.num_frames)]
            cidx = [min(max(i, 0), int(num_f) - 1) for i in cidx]
            all_paths = [os.path.join(fpath, "{:06d}.jpg".format(i))
                         for i in idxs + cidx]
            arr = None
            if use_native:
                arr = self._native_clip_frames(all_paths, rng)
            if arr is not None:
                clip_list.append(arr[: cfg.clip_len])
                center_list.append(arr[cfg.clip_len:])
                continue
            all_imgs = [Image.open(p).convert("RGB") for p in all_paths]
            all_imgs = resize_shorter(all_imgs, 256)
            if self.split == "train":
                all_imgs = random_resized_crop(all_imgs, cfg.imgSize, rng)
                all_imgs = random_hflip(all_imgs, rng)
            else:
                all_imgs = center_crop(all_imgs, min(cfg.imgSize, 224))
            # uint8 wire like the frames path: ImageNet normalization runs
            # on device (engine.normalize_frames handles both streams)
            arr = to_uint8_array(all_imgs)
            clip_list.append(arr[: cfg.clip_len])
            center_list.append(arr[cfg.clip_len:])
        return np.stack(center_list), np.stack(clip_list)

    def _native_clip_frames(self, all_paths, rng: random.Random):
        """Native equivalent of the clip transform chain: Resize(-1, 256)
        -> [train: RandomResizedCrop -> imgSize, flip | val:
        CenterCrop(min(imgSize, 224))], same draws as the PIL path."""
        from avsep_tpu.data import native
        from avsep_tpu.data.video_transforms import (center_crop_box,
                                                     resize_shorter_dims,
                                                     rrc_params)
        cfg = self.cfg
        dims = native.jpeg_probe_dims(all_paths[0])
        if dims is None:
            return None
        w, h = dims
        rw, rh = resize_shorter_dims(w, h, 256)
        final = None
        if self.split == "train":
            S = cfg.imgSize
            p = rrc_params(rw, rh, rng)
            if p is None:  # 10-attempt fallback: center crop min side
                m = min(rw, rh)
                left, top = center_crop_box(rw, rh, m)
                crop = (left, top, m, m)
            else:
                crop = p
            final = (S, S)
            flip = rng.random() < 0.5
        else:
            S = min(cfg.imgSize, 224)
            left, top = center_crop_box(rw, rh, S)
            crop = (left, top, S, S)
            flip = False
        arr = native.frame_pipeline_batch(all_paths, S, S, resize=(rw, rh),
                                          crop=crop, final=final,
                                          hflip=flip,
                                          fast=self._fast_decode)
        if arr is None:  # decode failed after draws: PIL with SAME params
            arr = self._pil_apply(all_paths, (rw, rh), crop, final, flip)
        return arr

    def get_ids_labels(self, infos, index, center_times):
        """Sample name string + class ids (reference dataset/music.py:231-243)."""
        cls_ls, cls_ids, id_ls = [], [], []
        cts = [str(round(t)) for t in center_times]
        for info in infos:
            ci = self.class_int_map[info[-1]]
            cls_ls.append(str(ci))
            cls_ids.append(ci)
            id_ls.append(os.path.basename(info[0]).split(".")[0][:4])
        name = (str(index) + "_cls" + "_".join(cls_ls) + "_ids"
                + "_".join(id_ls) + "_ct" + "_".join(cts))
        return name, np.asarray(cls_ids, np.int32)

    def save_sample(self, inds, save_dir: str) -> None:
        """Debug dumper: write mixture + per-source wavs (+ frame video when
        ffmpeg is present) for dataset rows (reference dataset/music.py:
        258-273, minus its hard-coded path)."""
        import os as _os
        from avsep_tpu.data.audio_io import write_wav
        from avsep_tpu.data.video_transforms import denormalize
        from avsep_tpu.utils.media import save_video
        _os.makedirs(save_dir, exist_ok=True)
        for ind in inds:
            data = self[ind]
            sid = data["id"]
            write_wav(_os.path.join(save_dir, f"{sid}_mix.wav"),
                      data["audio_mix"], self.cfg.audRate)
            for i, audio in enumerate(data["audios"]):
                write_wav(_os.path.join(save_dir, f"{sid}_aud_{i}.wav"),
                          audio, self.cfg.audRate)
                rgb = np.stack([denormalize(f) for f in data["frames"][i]])
                save_video(_os.path.join(save_dir, f"{sid}_vid_{i}.mp4"),
                           rgb, fps=max(len(rgb) / self.cfg.audSec, 1))

    def dummy_mix_data(self):
        """All-zero fallback sample (reference dataset/base.py:191-205).

        Intentional deviation (ADVICE r2): frames are uint8 zeros — a
        black image on the live wire, which ``engine.normalize_frames``
        maps to ~[-2.12, -2.04, -1.80] — whereas the reference emits
        zeros in already-normalized float space.  Matching the reference
        exactly would require a float frame tensor, which cannot share a
        collated batch with the live uint8 wire.  Like the reference's
        fallback, this method has no live caller (the silence-retry loop
        warns and keeps the last crop instead); a black frame is the
        correct "no visual information" input for this pipeline because
        normalization happens on device, after collation.
        """
        cfg = self.cfg
        N = cfg.num_mix
        T = 1 if cfg.one_frame else cfg.num_frames
        return {
            "audios": np.zeros((N, cfg.audLen), np.float32),
            "audio_mix": np.zeros(cfg.audLen, np.float32),
            "frames": np.zeros((N, T, cfg.imgSize, cfg.imgSize, 3),
                               np.uint8),  # match the live uint8 wire
                                           # format so collate never mixes
                                           # dtypes in one batch
            "id": "dummy",
            "class": np.zeros(N, np.int32),
            "infos": [],
        }

    # ---------------------------------------------------------- getitem

    def __getitem__(self, index: int) -> Dict:
        cfg = self.cfg
        rng = random.Random((self.seed << 32) ^ index)

        if self.random_sample:
            infos = self.get_samples(index, "random", rng)
        elif self.vis_data:
            infos = self.get_samples(index, self.vis_data, rng)
        else:
            # nested fresh draws, faithfully (reference music.py:288-293)
            if rng.random() < cfg.rate_dc:
                infos = self.get_samples(index, "dc", rng)
            elif rng.random() < cfg.rate_dc + cfg.rate_sc:
                infos = self.get_samples(index, "sc", rng)
            elif rng.random() < cfg.rate_dc + cfg.rate_sc + cfg.rate_sv:
                infos = self.get_samples(index, "sv", rng)
            else:
                infos = self.get_samples(index, "dc", rng)

        audios, mixture, center_times = self.get_audios(infos, rng)
        clips = None
        if cfg.load_clips:
            frames, clips = self.get_frames_clips(infos, center_times, rng)
        else:
            frames = self.get_frames(infos, center_times, rng)
        name, class_ids = self.get_ids_labels(infos, index, center_times)

        if clips is not None:
            return {
                "audios": np.asarray(audios, np.float32),
                "audio_mix": mixture.astype(np.float32),
                # frames stay uint8 on the wire — ImageNet normalization
                # runs on device (engine.normalize_frames dtype dispatch)
                "frames": frames,
                "clips": clips,  # [N, clip_len, H, W, 3] uint8 wire
                "id": name,
                "class": class_ids,
                "infos": infos,
            }
        return {
            "audios": np.asarray(audios, np.float32),     # [N, L]
            "audio_mix": mixture.astype(np.float32),      # [L]
            "frames": frames,    # [N, T, H, W, 3] uint8 wire format
            "id": name,
            "class": class_ids,
            "infos": infos,
        }
