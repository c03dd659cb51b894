"""avsep_tpu — TPU-native audio-visual sound-source separation framework.

A from-scratch JAX / Flax / pjit / Pallas rebuild of the capabilities of the
reference PyTorch codebase
`abcqmars/audio-visual-sepatation-in-visual-agnostic-situtation`:

* spectrogram U-Net mask prediction with co-localized audio-visual fusion
  (CoLoc / CoLoc_Sel / MixVis; reference `models/audio_net.py`,
  `models/fusion_net.py`),
* ResNet18 / dilated-ResNet18 frame encoders (reference `models/vision_net.py`),
* joint audio-only + audio-visual training with permutation-invariant losses
  (reference `main.py`, `models/criterion.py`),
* the SoP++ attention/synthesizer experiment tree (reference `SoP++/`),
* SDR/SIR/SAR/SI-SDR evaluation on MUSIC val mixes (reference `main.py:197-286`).

Everything on the compute path is jit-compiled JAX running on TPU: batched
on-device STFT/iSTFT, log-frequency warps, convolutions on the MXU, and
data-parallel training over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"
