"""Pallas TPU kernels for the STFT hot paths.

Two fused kernels replacing multi-op XLA sequences on the separation hot
path (reference equivalents: librosa iSTFT overlap-add, ``utils.py:101-104``;
STFT framing+window, ``dataset/base.py:142-147``):

* :func:`overlap_add_normalize` — iSTFT tail: windowed frames -> overlap-add
  -> divide by the summed-squared window -> clip to [-1, 1], in ONE kernel.
  Each grid step owns `BLOCKS_PER_TILE` hop-blocks of output and reads the
  (at most K=ceil(n_fft/hop)) frame chunks that touch them from VMEM.
* :func:`frame_window` — STFT head: hop-blocks -> K-block frames x Hann
  window in one kernel (the multiply fuses into the copy).

Both have XLA fallbacks (the reshape formulation in ops/stft.py); numerics
are identical.  ``interpret=True`` paths are used by the CPU test-suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from avsep_tpu.ops.stft import hann_periodic


def _k_blocks(n_fft: int, hop: int) -> int:
    return -(-n_fft // hop)


# ------------------------------------------------------------- overlap-add


def _ola_kernel(frames_ref, denom_ref, out_ref, *, K: int, hop: int,
                tile: int, clip: bool):
    """Grid step i owns output blocks [i*tile, (i+1)*tile).

    Frames come pre-padded with K-1 zero frames on each side, so every
    read ``frames[b + (K-1) - m]`` is in bounds and zero rows contribute
    nothing — no masking needed.
    """
    i = pl.program_id(0)
    b0 = i * tile
    acc = jnp.zeros((frames_ref.shape[0], tile, hop), jnp.float32)
    for m in range(K):
        chunk = frames_ref[:, pl.ds(b0 + (K - 1) - m, tile),
                           pl.ds(m * hop, hop)]  # [B, tile, hop]
        acc = acc + chunk
    out = acc / denom_ref[pl.ds(b0, tile), :][None]
    out_ref[:, :, :] = jnp.clip(out, -1.0, 1.0) if clip else out


def overlap_add_normalize(frames: jnp.ndarray, hop: int, out_len: int,
                          denom: np.ndarray, *, clip: bool = True,
                          interpret: bool = False) -> jnp.ndarray:
    """frames [B, T, n_fft] (windowed ifft frames) -> [B, out_len],
    normalized by ``denom`` (summed-squared window), optionally clipped
    to [-1, 1].
    """
    B, T, n_fft = frames.shape
    K = _k_blocks(n_fft, hop)
    pad_tail = K * hop - n_fft
    frames = jnp.pad(frames, ((0, 0), (K - 1, K - 1), (0, pad_tail)))
    nb = T + K - 1
    tile = 8 if nb % 8 == 0 else 1  # grid tile in hop-blocks

    denom_blocks = np.ones((nb * hop,), np.float32)
    denom_blocks[:out_len] = denom[:out_len]
    denom_blocks = denom_blocks.reshape(nb, hop)

    grid = nb // tile
    out = pl.pallas_call(
        functools.partial(_ola_kernel, K=K, hop=hop, tile=tile, clip=clip),
        out_shape=jax.ShapeDtypeStruct((B, nb, hop), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((B, tile, hop), lambda i: (0, i, 0)),
        interpret=interpret,
    )(frames.astype(jnp.float32), jnp.asarray(denom_blocks))
    flat = out.reshape(B, nb * hop)
    return flat[:, :out_len]


# ---------------------------------------------------------------- framing


def _frame_kernel(blocks_ref, win_ref, out_ref, *, K: int, hop: int,
                  tile: int):
    """Grid step i emits frames [i*tile, (i+1)*tile): frame t =
    concat(blocks[t .. t+K-1]) * window."""
    i = pl.program_id(0)
    t0 = i * tile
    parts = []
    for m in range(K):
        parts.append(blocks_ref[:, pl.ds(t0 + m, tile), :])  # [B, tile, hop]
    frame = jnp.concatenate(parts, axis=-1)                   # [B,tile,K*hop]
    out_ref[:, :, :] = frame * win_ref[:]


def frame_window(padded: jnp.ndarray, n_frames: int, n_fft: int, hop: int,
                 *, interpret: bool = False) -> jnp.ndarray:
    """padded [B, L'] -> windowed frames [B, T, n_fft] in one kernel."""
    B = padded.shape[0]
    K = _k_blocks(n_fft, hop)
    need = (n_frames + K) * hop
    extra = need - padded.shape[-1]
    if extra > 0:
        padded = jnp.pad(padded, ((0, 0), (0, extra)))
    blocks = padded[:, :need].reshape(B, -1, hop)

    win = np.zeros((K * hop,), np.float32)
    win[:n_fft] = hann_periodic(n_fft)

    tile = 8 if n_frames % 8 == 0 else 1
    grid = n_frames // tile
    out = pl.pallas_call(
        functools.partial(_frame_kernel, K=K, hop=hop, tile=tile),
        out_shape=jax.ShapeDtypeStruct((B, n_frames, K * hop), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((B, tile, K * hop), lambda i: (0, i, 0)),
        interpret=interpret,
    )(blocks.astype(jnp.float32), jnp.asarray(win))
    return out[:, :, :n_fft]
