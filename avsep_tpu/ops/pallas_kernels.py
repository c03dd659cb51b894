"""Pallas TPU kernels for the STFT hot paths.

Two fused kernels replacing multi-op XLA sequences on the separation hot
path (reference equivalents: librosa iSTFT overlap-add, ``utils.py:101-104``;
STFT framing+window, ``dataset/base.py:142-147``):

* :func:`overlap_add_normalize` — iSTFT tail: windowed frames -> overlap-add
  -> divide by the summed-squared window -> (optional) clip, in ONE kernel.
* :func:`frame_window` — STFT head: hop-blocks -> K-block frames x Hann
  window in one kernel (the multiply fuses into the copy).

Frames overlap across hop-block tiles, so the inputs stay in HBM/ANY and
each grid step DMAs exactly the (tile + K - 1) rows it needs into VMEM
scratch (the documented manual-copy pattern for windows BlockSpec tiling
cannot express), computes, and writes an aligned VMEM output tile.

Both have XLA fallbacks (the reshape formulation in ops/stft.py); numerics
are identical.  ``interpret=True`` paths serve the CPU test-suite; the
native path is exercised on TPU.
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


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _ola_kernel(frames_ref, denom_ref, out_ref, scratch, sem, *, K: int,
                hop: int, tile: int, clip: bool):
    """Grid step i owns output blocks [i*tile, (i+1)*tile).

    Frames come pre-padded with K-1 zero frames in front (plus alignment
    tail); the step DMAs a sublane-aligned row window from HBM into VMEM
    scratch, then output block b = sum_m scratch[b - i*tile + (K-1) - m,
    m*hop:(m+1)*hop].
    """
    i = pl.program_id(0)
    b0 = i * tile
    rows = scratch.shape[1]  # _round8(tile + K - 1)
    dma = pltpu.make_async_copy(
        frames_ref.at[:, pl.ds(b0, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((scratch.shape[0], tile, hop), jnp.float32)
    for m in range(K):
        # local row for output block b (offset j in tile): j + (K-1) - m
        acc = acc + scratch[:, pl.ds((K - 1) - m, tile),
                            pl.ds(m * hop, hop)]
    out = acc / denom_ref[:, :][None]
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
    nb = _round8(T + K - 1)  # output blocks, grid-aligned
    tile = 8                 # grid tile in hop-blocks (8-sublane aligned)
    rows = _round8(tile + K - 1)
    # front pad: K-1 zero frames; tail pad: enough that the last aligned
    # row window [nb - tile, nb - tile + rows) stays in bounds
    tail = (nb - tile + rows) - (T + K - 1)
    frames = jnp.pad(frames, ((0, 0), (K - 1, max(tail, 0)), (0, pad_tail)))

    denom_blocks = np.ones((nb * hop,), np.float32)
    denom_blocks[:out_len] = denom[:out_len]
    denom_blocks = denom_blocks.reshape(nb, hop)

    grid = nb // tile
    out = pl.pallas_call(
        functools.partial(_ola_kernel, K=K, hop=hop, tile=tile, clip=clip),
        out_shape=jax.ShapeDtypeStruct((B, nb, hop), jnp.float32),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # frames stay in HBM
            pl.BlockSpec((tile, hop), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, tile, hop), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, rows, K * hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(frames.astype(jnp.float32), jnp.asarray(denom_blocks))
    flat = out.reshape(B, nb * hop)
    return flat[:, :out_len]


# ---------------------------------------------------------------- framing


def _frame_kernel(blocks_ref, win_ref, out_ref, scratch, sem, *, K: int,
                  hop: int, tile: int):
    """Grid step i emits frames [i*tile, (i+1)*tile): DMA rows
    [i*tile, i*tile + tile + K - 1) to VMEM, frame t = concat(K consecutive
    rows) * window."""
    i = pl.program_id(0)
    t0 = i * tile
    rows = scratch.shape[1]  # _round8(tile + K - 1)
    dma = pltpu.make_async_copy(
        blocks_ref.at[:, pl.ds(t0, rows), :], scratch, sem)
    dma.start()
    dma.wait()
    # write each hop-chunk into its lane slice directly (Mosaic cannot
    # concatenate slices with mismatched sublane offsets)
    for m in range(K):
        out_ref[:, :, pl.ds(m * hop, hop)] = (
            scratch[:, pl.ds(m, tile), :]
            * win_ref[:, pl.ds(m * hop, hop)][None])


def frame_window(padded: jnp.ndarray, n_frames: int, n_fft: int, hop: int,
                 *, interpret: bool = False) -> jnp.ndarray:
    """padded [B, L'] -> windowed frames [B, T, n_fft] in one kernel."""
    B = padded.shape[0]
    K = _k_blocks(n_fft, hop)
    tile = 8
    n_pad = _round8(n_frames)  # grid-aligned frame count
    rows = _round8(tile + K - 1)
    # last grid step reads block rows [n_pad - tile, + rows)
    need = (n_pad - tile + rows) * hop
    extra = need - padded.shape[-1]
    if extra > 0:
        padded = jnp.pad(padded, ((0, 0), (0, extra)))
    blocks = padded[:, :need].reshape(B, -1, hop)

    win = np.zeros((1, K * hop), np.float32)
    win[0, :n_fft] = hann_periodic(n_fft)

    grid = n_pad // tile
    out = pl.pallas_call(
        functools.partial(_frame_kernel, K=K, hop=hop, tile=tile),
        out_shape=jax.ShapeDtypeStruct((B, n_pad, K * hop), jnp.float32),
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, K * hop), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, tile, K * hop), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((B, rows, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(blocks.astype(jnp.float32), jnp.asarray(win))
    return out[:, :n_frames, :n_fft]
