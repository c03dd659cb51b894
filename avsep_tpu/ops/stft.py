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

Design notes (TPU): framing and overlap-add are *gather/scatter-free*.
Because each frame spans at most ``K = ceil(n_fft / hop)`` hop-blocks, the
signal reshapes into ``[T', hop]`` blocks and a frame is the concatenation
of K consecutive blocks (K shifted static slices); overlap-add is the
transpose — K shifted adds of the frame chunks.  XLA lowers both to cheap
strided copies/adds instead of the big gather/scatter a naive indexing
formulation produces.  Everything is static-shape, so one compilation
serves the whole run.
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


# --------------------------------------------------------------- explicit DFT
#
# XLA lowers the non-power-of-2 rfft/irfft (n_fft=1022) into a chain of
# convolution HLOs pinned at operand_precision=HIGHEST (6-pass bf16 on the
# MXU).  A profiler trace of the separation pipeline puts that chain at
# ~25% of device time (STFT 8.0% + iSTFT 17.5%, BENCH_NOTES.md round-3
# trace).  The ``dft="matmul"`` path below computes the same real DFT as
# ONE dense einsum against precomputed cos/sin matrices at a chosen MXU
# precision — HIGH (3-pass bf16, ~f32-accurate) or DEFAULT (1-pass bf16)
# — trading bit-exactness with librosa for fewer MXU passes.  ``"fft"``
# remains the default everywhere; the fast path is opt-in via
# ``Config.dft`` exactly like ``use_pallas``.

_DFT_PRECISION = {"matmul": jax.lax.Precision.HIGH,
                  "matmul_fast": jax.lax.Precision.DEFAULT}


@functools.lru_cache(maxsize=None)
def _rdft_mats(n_fft: int):
    """cos/sin forward real-DFT matrices ``[n_fft, F]`` (float32)."""
    F = n_fft // 2 + 1
    ang = (-2.0 * np.pi / n_fft) * np.arange(n_fft)[:, None] \
        * np.arange(F)[None, :]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _irdft_mats(n_fft: int):
    """Inverse real-DFT matrices ``[F, n_fft]`` such that
    ``x = Re(spec) @ A + Im(spec) @ B`` reproduces ``irfft(spec, n_fft)``
    (bin 0 and, for even n_fft, the Nyquist bin carry weight 1/n and their
    imaginary parts are discarded, matching numpy's irfft contract)."""
    F = n_fft // 2 + 1
    ang = (2.0 * np.pi / n_fft) * np.arange(F)[:, None] \
        * np.arange(n_fft)[None, :]
    c = np.full((F, 1), 2.0 / n_fft)
    c[0, 0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        c[-1, 0] = 1.0 / n_fft
    A = (c * np.cos(ang)).astype(np.float32)
    B = (-c * np.sin(ang)).astype(np.float32)
    B[0] = 0.0          # irfft ignores Im at DC ...
    if n_fft % 2 == 0:
        B[-1] = 0.0     # ... and at Nyquist
    return A, B


def _dft_precision(dft: str):
    if dft not in _DFT_PRECISION:
        raise ValueError(
            f"dft must be one of 'fft', 'matmul', 'matmul_fast'; got "
            f"{dft!r}")
    return _DFT_PRECISION[dft]


def _rdft(frames: jnp.ndarray, n_fft: int, dft: str) -> jnp.ndarray:
    """``frames [..., T, n_fft]`` -> complex ``[..., T, F]`` via one
    cos/sin einsum at the precision selected by ``dft``."""
    C, S = _rdft_mats(n_fft)
    prec = _dft_precision(dft)
    re = jnp.einsum("...tn,nf->...tf", frames, jnp.asarray(C),
                    precision=prec)
    im = jnp.einsum("...tn,nf->...tf", frames, jnp.asarray(S),
                    precision=prec)
    return jax.lax.complex(re, im)


def _irdft(spec_tf: jnp.ndarray, n_fft: int, dft: str) -> jnp.ndarray:
    """complex ``spec [..., T, F]`` -> real frames ``[..., T, n_fft]``."""
    A, B = _irdft_mats(n_fft)
    prec = _dft_precision(dft)
    return (jnp.einsum("...tf,fn->...tn", jnp.real(spec_tf),
                       jnp.asarray(A), precision=prec)
            + jnp.einsum("...tf,fn->...tn", jnp.imag(spec_tf),
                         jnp.asarray(B), precision=prec))


def _reflect_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect padding (no edge repeat), matching np.pad(mode='reflect')."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def frame_signal(padded: jnp.ndarray, n_frames: int, n_fft: int,
                 hop: int) -> jnp.ndarray:
    """Gather-free framing: ``padded [..., L']`` -> ``[..., T, n_fft]``.

    Reshape into hop-blocks and concatenate K consecutive blocks per frame
    (K static shifted slices — no gather).  Requires hop | frame starts,
    which holds by construction.
    """
    K = -(-n_fft // hop)  # blocks per frame
    need = (n_frames + K) * hop
    extra = need - padded.shape[-1]
    if extra > 0:
        padded = jnp.pad(padded,
                         [(0, 0)] * (padded.ndim - 1) + [(0, extra)])
    blocks = padded[..., :need].reshape(padded.shape[:-1] + (-1, hop))
    parts = [blocks[..., m:m + n_frames, :] for m in range(K)]
    frames = jnp.concatenate(parts, axis=-1)  # [..., T, K*hop]
    return frames[..., :n_fft]


def overlap_add(frames: jnp.ndarray, hop: int, out_len: int) -> jnp.ndarray:
    """Scatter-free overlap-add: ``frames [..., T, n_fft]`` -> ``[..., L]``.

    Each frame splits into K hop-chunks; chunk m of frame t accumulates
    into output block t+m — K shifted adds instead of a scatter.
    """
    n_fft = frames.shape[-1]
    T = frames.shape[-2]
    K = -(-n_fft // hop)
    pad_tail = K * hop - n_fft
    if pad_tail:
        frames = jnp.pad(frames, [(0, 0)] * (frames.ndim - 1)
                         + [(0, pad_tail)])
    chunks = frames.reshape(frames.shape[:-1] + (K, hop))  # [..., T, K, hop]
    nb = T + K - 1
    out = jnp.zeros(frames.shape[:-2] + (nb, hop), frames.dtype)
    for m in range(K):
        out = out.at[..., m:m + T, :].add(chunks[..., :, m, :])
    flat = out.reshape(frames.shape[:-2] + (nb * hop,))
    return flat[..., :out_len]


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "use_pallas", "dft"))
def stft(audio: jnp.ndarray, n_fft: int = 1022, hop: int = 256,
         use_pallas: bool = False, dft: str = "fft") -> jnp.ndarray:
    """Batched STFT of ``audio [..., L]`` -> complex ``[..., F, T]``.

    F = n_fft // 2 + 1, T = 1 + L // hop.  Matches
    ``librosa.stft(y, n_fft=1022, hop_length=256)`` (center=True, periodic
    Hann, reflect pad) to float32 tolerance.  ``use_pallas`` switches the
    framing+window stage to the fused Pallas kernel
    (ops/pallas_kernels.frame_window); numerics are identical.  ``dft``
    selects the transform backend: ``"fft"`` (XLA rfft, bit-exact
    default), ``"matmul"`` (explicit DFT einsum, 3-pass bf16 MXU,
    ~f32-accurate) or ``"matmul_fast"`` (1-pass bf16) — see the module
    note on the HIGHEST-precision fft lowering this sidesteps.
    """
    L = audio.shape[-1]
    pad = n_fft // 2
    n_frames = 1 + L // hop
    padded = _reflect_pad(audio.astype(jnp.float32), pad)
    # frame starts are multiples of hop only if we absorb the pad offset:
    # start_t = t*hop into `padded`, so reshape directly applies.
    if use_pallas:
        from avsep_tpu.ops.pallas_kernels import frame_window
        batch_shape = padded.shape[:-1]
        flat = padded.reshape((-1, padded.shape[-1]))
        frames = frame_window(flat, n_frames, n_fft, hop,
                              interpret=jax.default_backend() != "tpu")
        frames = frames.reshape(batch_shape + frames.shape[1:])
    else:
        window = jnp.asarray(hann_periodic(n_fft))
        frames = frame_signal(padded, n_frames, n_fft, hop) * window
    if dft == "fft":
        spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)  # [..., T, F]
    else:
        spec = _rdft(frames, n_fft, dft)
    return jnp.swapaxes(spec, -1, -2)  # [..., F, T]


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "use_pallas", "dft"))
def stft_magphase(audio: jnp.ndarray, n_fft: int = 1022, hop: int = 256,
                  use_pallas: bool = False, dft: str = "fft"):
    """Magnitude and phase like the reference ``_stft``
    (reference ``dataset/base.py:142-147``)."""
    spec = stft(audio, n_fft=n_fft, hop=hop, use_pallas=use_pallas, dft=dft)
    return jnp.abs(spec), jnp.angle(spec)


@functools.partial(jax.jit, static_argnames=("hop", "use_pallas", "dft"))
def istft(spec: jnp.ndarray, hop: int = 256,
          use_pallas: bool = False, dft: str = "fft") -> jnp.ndarray:
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

    spec_tf = jnp.swapaxes(spec, -1, -2)
    if dft == "fft":
        frames = jnp.fft.irfft(spec_tf, n=n_fft, axis=-1)
    else:
        frames = _irdft(spec_tf, n_fft, dft)
    frames = frames * jnp.asarray(window)  # [..., T, n_fft]

    full_len = n_fft + hop * (T - 1)

    # summed squared window (static; computed with numpy at trace time)
    wss = np.zeros(full_len, np.float32)
    w2 = (window ** 2).astype(np.float64)
    for t in range(T):
        wss[t * hop: t * hop + n_fft] += w2
    # librosa thresholds by np.finfo(float32).tiny before dividing
    tiny = np.finfo(np.float32).tiny
    denom = np.where(wss > tiny, wss, 1.0).astype(np.float32)

    if use_pallas:
        from avsep_tpu.ops.pallas_kernels import overlap_add_normalize
        batch_shape = spec.shape[:-2]
        flat = frames.reshape((-1, T, n_fft)).astype(jnp.float32)
        out = overlap_add_normalize(flat, hop, full_len, denom, clip=False,
                                    interpret=jax.default_backend()
                                    != "tpu")
        out = out.reshape(batch_shape + (full_len,))
    else:
        out = overlap_add(frames.astype(jnp.float32), hop, full_len)
        out = out / jnp.asarray(denom)

    return out[..., pad: full_len - pad]


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
