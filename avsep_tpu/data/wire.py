"""Opt-in int16 audio wire: halve the host->device audio bytes.

The reference ships float32 tensors through pinned-memory PCIe copies
(torch DataLoader, reference main.py:633-657) where the wire is never
the bottleneck.  On a tunneled TPU host the host->device wire IS the
in-situ bottleneck (BENCH_NOTES.md "data_time"), so ``--audio_wire
int16`` re-encodes the per-source waveforms at the device boundary as

    audios_i16 [B, N, L] int16  +  audio_gain [B, N] float32

with ``gain = max|x| / 32767`` per (batch, source) and dequantizes on
device (`audios_of`).  This is lossy (~90 dB SNR against the per-source
peak, far below any separation-relevant signal level) and therefore
opt-in; the default ``f32`` wire is bit-exact.  The mixture is rebuilt
on device from the dequantized sources (engine.audio_mix_of), so under
int16 the gt masks / metrics see the quantized sources consistently.
"""

from typing import Dict

import numpy as np

import jax.numpy as jnp

_WIRE_KINDS = ("f32", "int16")


def encode_audio_wire(dev: Dict, cfg) -> Dict:
    """Host-side: replace f32 ``audios`` with int16 + per-source gains.

    No-op unless ``cfg.audio_wire == "int16"`` and the batch carries
    ``audios``.  Runs in the loader/prefetch thread (numpy only).
    """
    wire = getattr(cfg, "audio_wire", "f32")
    if wire not in _WIRE_KINDS:
        raise ValueError(f"audio_wire must be one of {_WIRE_KINDS}, "
                         f"got {wire!r}")
    if wire != "int16" or "audios" not in dev:
        return dev
    a = np.asarray(dev["audios"], np.float32)          # [B, N, L]
    # silent sources get gain 1e-8/32767 (not 0) so dequant stays exact 0
    gain = np.maximum(np.abs(a).max(axis=-1), 1e-8) / 32767.0
    q = np.rint(a / gain[..., None]).astype(np.int16)
    out = dict(dev)
    del out["audios"]
    out["audios_i16"] = q
    out["audio_gain"] = gain.astype(np.float32)
    return out


def audios_of(batch: Dict) -> jnp.ndarray:
    """Device-side: per-source waveforms regardless of wire format."""
    if "audios" in batch:
        return batch["audios"]
    return (batch["audios_i16"].astype(jnp.float32)
            * batch["audio_gain"][..., None])
