"""Log-frequency warp + bilinear grid sampling on TPU.

The reference warps 512-bin linear-frequency spectrograms onto a 256-bin
log-frequency axis with ``F.grid_sample(mag, warpgrid(...), align_corners=
False)`` (reference ``utils.py:12-26``, ``main.py:61-66``) and un-warps
predicted masks the same way (reference ``main.py:217-220``).

The warp grid is *separable*: its x-coordinate depends only on the output
column and its y-coordinate only on the output row (reference
``utils.py:14-23``).  Bilinear interpolation of a separable grid factorises
into two 1-D linear resamples, i.e. two small dense matmuls::

    out[b, c] = Wy @ img[b, c] @ Wx.T

which is exactly what the MXU wants — no gathers on the hot path.  The
interpolation matrices bake in PyTorch's ``align_corners=False`` coordinate
convention and zero padding, so results are bit-identical to
``F.grid_sample`` at float32.  A general gather-based ``grid_sample`` is
also provided for arbitrary (non-separable) grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def warpgrid_coords(HO: int, WO: int, warp: bool = True):
    """The 1-D normalized grid coordinates of reference ``utils.py:12-26``.

    Returns (grid_x [WO], grid_y [HO]) in [-1, 1] normalized space.
    """
    x = np.linspace(-1, 1, WO)
    y = np.linspace(-1, 1, HO)
    if warp:
        gy = (np.power(21, (y + 1) / 2) - 11) / 10
    else:
        gy = np.log(y * 10 + 11) / np.log(21) * 2 - 1
    return x.astype(np.float32), gy.astype(np.float32)


def warpgrid(bs: int, HO: int, WO: int, warp: bool = True) -> np.ndarray:
    """Full [bs, HO, WO, 2] grid — drop-in for reference ``utils.warpgrid``."""
    gx, gy = warpgrid_coords(HO, WO, warp)
    grid = np.zeros((bs, HO, WO, 2), np.float32)
    grid[..., 0] = gx[None, None, :]
    grid[..., 1] = gy[None, :, None]
    return grid


def _interp_matrix(coords: np.ndarray, in_size: int) -> np.ndarray:
    """Dense [out, in] bilinear interpolation matrix for normalized coords.

    Implements PyTorch ``grid_sample(align_corners=False, padding_mode=
    'zeros')`` 1-D semantics: pixel position ``p = ((c + 1) * S - 1) / 2``;
    out-of-range taps contribute zero.
    """
    out = np.zeros((len(coords), in_size), np.float64)
    p = ((coords.astype(np.float64) + 1.0) * in_size - 1.0) / 2.0
    lo = np.floor(p).astype(np.int64)
    w_hi = p - lo
    for i, (l, w) in enumerate(zip(lo, w_hi)):
        if 0 <= l < in_size:
            out[i, l] += 1.0 - w
        if 0 <= l + 1 < in_size:
            out[i, l + 1] += w
    return out.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _warp_matrices(H_in: int, W_in: int, HO: int, WO: int, warp: bool):
    gx, gy = warpgrid_coords(HO, WO, warp)
    Wy = _interp_matrix(gy, H_in)  # [HO, H_in]
    Wx = _interp_matrix(gx, W_in)  # [WO, W_in]
    return Wy, Wx


@functools.partial(jax.jit, static_argnames=("HO", "WO", "warp"))
def warp_spectrogram(x: jnp.ndarray, HO: int = 256, WO: int | None = None,
                     warp: bool = True) -> jnp.ndarray:
    """Warp ``x [..., H, W]`` to ``[..., HO, WO]`` on the log-frequency grid.

    Equals ``F.grid_sample(x, warpgrid(B, HO, WO, warp), align_corners=
    False)`` (reference ``main.py:61-66``) but runs as two MXU matmuls.
    """
    H_in, W_in = x.shape[-2], x.shape[-1]
    if WO is None:
        WO = W_in
    Wy, Wx = _warp_matrices(H_in, W_in, HO, WO, warp)
    Wy = jnp.asarray(Wy)
    Wx = jnp.asarray(Wx)
    y = jnp.einsum("oh,...hw->...ow", Wy, x.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.einsum("...ow,pw->...op", y, Wx,
                      preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("HO",))
def unwarp_mask(mask: jnp.ndarray, HO: int = 512) -> jnp.ndarray:
    """Un-warp a log-frequency mask back to ``HO`` linear-frequency bins.

    Equals reference ``main.py:217-220`` (``warpgrid(warp=False)`` +
    ``grid_sample``): output time width equals the input's.
    """
    return warp_spectrogram(mask, HO=HO, WO=mask.shape[-1], warp=False)


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """General bilinear ``F.grid_sample(x, grid, align_corners=False,
    padding_mode='zeros')`` for NCHW ``x [B, C, H, W]`` and
    ``grid [B, HO, WO, 2]`` with (x, y) normalized coords in the last dim.

    Gather-based; use :func:`warp_spectrogram` for the separable warp grids
    on the hot path.
    """
    B, C, H, W = x.shape
    gx, gy = grid[..., 0], grid[..., 1]
    px = ((gx + 1.0) * W - 1.0) / 2.0
    py = ((gy + 1.0) * H - 1.0) / 2.0

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def tap(yi, xi, w):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        v = x[jnp.arange(B)[:, None, None, None],
              jnp.arange(C)[None, :, None, None],
              yc[:, None], xc[:, None]]
        return v * (w * inb)[:, None]

    out = (tap(y0, x0, (1 - wy) * (1 - wx))
           + tap(y0, x0 + 1, (1 - wy) * wx)
           + tap(y0 + 1, x0, wy * (1 - wx))
           + tap(y0 + 1, x0 + 1, wy * wx))
    return out
