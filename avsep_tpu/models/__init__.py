"""avsep_tpu.models — Flax model zoo.

* :mod:`avsep_tpu.models.unet` — spectrogram U-Net mask decoder with the
  audio-visual fusion bottleneck (reference ``models/audio_net.py``).
* :mod:`avsep_tpu.models.fusion` — CoLoc / CoLoc_Sel / MixVis co-localization
  modules (reference ``models/fusion_net.py``).
* :mod:`avsep_tpu.models.resnet` — ResNet18 / dilated-ResNet18 frame encoders
  (reference ``models/vision_net.py``).
* :mod:`avsep_tpu.models.synthesizer` — InnerProd / Bias mask heads
  (reference ``models/synthesizer_net.py``).
* :mod:`avsep_tpu.models.criterion` — L1/L2/BCE losses + vectorized PIT
  (reference ``models/criterion.py``).
* :mod:`avsep_tpu.models.builder` — model factory + ``activate`` dispatcher
  (reference ``models/__init__.py``).
* :mod:`avsep_tpu.models.sop` — SoP++ basis U-Net and attention modules
  (reference ``SoP++/audio_net.py``, ``SoP++/attention_net.py``).
"""

from avsep_tpu.models.builder import ModelBuilder, activate  # noqa: F401

