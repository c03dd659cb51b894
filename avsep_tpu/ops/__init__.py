"""avsep_tpu.ops — TPU numerics core.

Batched, jit-compiled equivalents of the reference's host-side numerics:

* :mod:`avsep_tpu.ops.stft` — librosa-semantics STFT / iSTFT
  (reference ``dataset/base.py:142-147``, ``utils.py:101-104``).
* :mod:`avsep_tpu.ops.warp` — log-frequency warp grid + bilinear
  ``grid_sample`` (reference ``utils.py:12-26``, ``main.py:61-66``).
* :mod:`avsep_tpu.ops.prepare` — mixture prep: warp, loss weights, ground
  truth masks, log-magnitude (reference ``main.py:51-95``).
* :mod:`avsep_tpu.ops.metrics` — vectorized SI-SDR / BSS-eval SDR/SIR/SAR
  (reference ``main.py:260-261`` via asteroid).
"""

from avsep_tpu.ops.stft import stft, istft, stft_magphase  # noqa: F401
from avsep_tpu.ops.warp import (  # noqa: F401
    warpgrid,
    grid_sample,
    warp_spectrogram,
    unwarp_mask,
)
