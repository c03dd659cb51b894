"""Batched on-device STFT / iSTFT with librosa semantics.

The reference computes per-sample STFTs on the CPU inside DataLoader workers
(``librosa.stft(audio, n_fft=1022, hop_length=256)``, reference
``dataset/base.py:142-147``) and reconstructs waveforms with
``librosa.istft(spec, hop_length=256)`` (reference ``utils.py:101-104``).
Here both run batched on TPU as jit-compiled XLA ops.

librosa semantics reproduced exactly (at float32):

* window: periodic Hann of length ``n_fft`` (scipy ``get_window('hann', n,
  fftbins=True)``),
* ``center=True``: the signal is reflect-padded by ``n_fft // 2`` on both
  sides before framing,
* frame count: ``1 + len(y) // hop`` (65535 samples -> 256 frames),
* iSTFT: windowed overlap-add normalized by the summed squared window,
  then trimmed by ``n_fft // 2`` at both ends
  (output length ``hop * (n_frames - 1)`` = 65280 samples).

Design notes (TPU): framing is a gather with a static index matrix; XLA
lowers it to dynamic slices and fuses the window multiply into the rfft
prologue.  The scatter-add in ``istft`` uses a static index matrix as well.
Everything is static-shape, so one compilation serves the whole run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def hann_periodic(n: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to scipy ``get_window('hann', n)``."""
    k = np.arange(n)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)).astype(dtype)


def _frame_indices(length: int, n_fft: int, hop: int) -> np.ndarray:
    """Static [n_frames, n_fft] gather indices into the padded signal."""
    n_frames = 1 + length // hop
    starts = np.arange(n_frames) * hop
    return starts[:, None] + np.arange(n_fft)[None, :]


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect padding (no edge repeat), matching np.pad(mode='reflect')."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft(audio: jnp.ndarray, n_fft: int = 1022, hop: int = 256) -> jnp.ndarray:
    """Batched STFT of ``audio [..., L]`` -> complex ``[..., F, T]``.

    F = n_fft // 2 + 1, T = 1 + L // hop.  Matches
    ``librosa.stft(y, n_fft=1022, hop_length=256)`` (center=True, periodic
    Hann, reflect pad) to float32 tolerance.
    """
    L = audio.shape[-1]
    pad = n_fft // 2
    window = jnp.asarray(hann_periodic(n_fft))
    idx = jnp.asarray(_frame_indices(L, n_fft, hop))
    padded = _reflect_pad(audio.astype(jnp.float32), pad)
    frames = padded[..., idx] * window  # [..., T, n_fft]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., T, F]
    return jnp.swapaxes(spec, -1, -2)  # [..., F, T]


@functools.partial(jax.jit, static_argnames=("n_fft", "hop"))
def stft_magphase(audio: jnp.ndarray, n_fft: int = 1022, hop: int = 256):
    """Magnitude and phase like the reference ``_stft``
    (reference ``dataset/base.py:142-147``)."""
    spec = stft(audio, n_fft=n_fft, hop=hop)
    return jnp.abs(spec), jnp.angle(spec)


@functools.partial(jax.jit, static_argnames=("hop",))
def istft(spec: jnp.ndarray, hop: int = 256) -> jnp.ndarray:
    """Batched inverse STFT of complex ``spec [..., F, T]`` -> ``[..., L]``.

    Matches ``librosa.istft(spec, hop_length=256)`` (window='hann',
    win_length=n_fft, center=True): windowed overlap-add with summed-squared-
    window normalization, trimmed by ``n_fft // 2`` at both ends.
    Output length ``hop * (T - 1)``.
    """
    F, T = spec.shape[-2], spec.shape[-1]
    n_fft = 2 * (F - 1)
    pad = n_fft // 2
    window = hann_periodic(n_fft)

    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * jnp.asarray(window)  # [..., T, n_fft]

    full_len = n_fft + hop * (T - 1)
    idx = jnp.asarray(_frame_indices(hop * (T - 1), n_fft, hop))  # [T, n_fft]

    batch_shape = spec.shape[:-2]
    flat = frames.reshape((-1, T, n_fft))
    out = jnp.zeros((flat.shape[0], full_len), jnp.float32)
    out = out.at[:, idx].add(flat)

    # summed squared window (static; computed with numpy at trace time)
    wss = np.zeros(full_len, np.float32)
    np_idx = _frame_indices(hop * (T - 1), n_fft, hop)
    np.add.at(wss, np_idx.reshape(-1),
              np.tile(window ** 2, T).astype(np.float32))
    # librosa thresholds by np.finfo(float32).tiny before dividing
    tiny = np.finfo(np.float32).tiny
    denom = np.where(wss > tiny, wss, 1.0).astype(np.float32)
    out = out / jnp.asarray(denom)

    out = out[:, pad: full_len - pad]
    return out.reshape(batch_shape + (hop * (T - 1),))


@functools.partial(jax.jit, static_argnames=("hop",))
def istft_reconstruction(mag: jnp.ndarray, phase: jnp.ndarray,
                         hop: int = 256) -> jnp.ndarray:
    """Waveform from magnitude+phase, clipped to [-1, 1].

    Equivalent of reference ``utils.py:101-104`` (``istft_reconstruction``),
    batched on device.
    """
    spec = mag.astype(jnp.complex64) * jnp.exp(1j * phase.astype(jnp.complex64))
    wav = istft(spec, hop=hop)
    return jnp.clip(wav, -1.0, 1.0)
