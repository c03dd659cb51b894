"""avsep_tpu.data — host-side input pipeline.

Manifest-driven deterministic mixing (reference ``dataset/music.py``),
audio crop/augment (reference ``dataset/base.py``), temporally-consistent
video transforms (reference ``dataset/video_transforms.py``), and a
prefetching batch loader that ships raw waveforms + frames to the device —
STFT and everything after it runs on-TPU inside the jit program
(:mod:`avsep_tpu.engine`).
"""

from avsep_tpu.data.dataset import MusicMixDataset  # noqa: F401
from avsep_tpu.data.loader import BatchLoader, ConcatDataset  # noqa: F401
