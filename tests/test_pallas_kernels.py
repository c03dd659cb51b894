"""Pallas STFT kernels vs the XLA reshape formulation (interpret mode on
CPU; the TPU path compiles the same kernels natively)."""

import numpy as np

import jax.numpy as jnp

from avsep_tpu.ops.pallas_kernels import frame_window, overlap_add_normalize
from avsep_tpu.ops.stft import (
    _reflect_pad, frame_signal, hann_periodic, overlap_add)

N_FFT, HOP = 1022, 256


def test_frame_window_matches_xla():
    rs = np.random.RandomState(0)
    L = 64 * HOP - 1
    x = rs.randn(2, L).astype(np.float32)
    padded = _reflect_pad(jnp.asarray(x), N_FFT // 2)
    T = 1 + L // HOP
    ref = frame_signal(padded, T, N_FFT, HOP) * jnp.asarray(
        hann_periodic(N_FFT))
    got = frame_window(padded, T, N_FFT, HOP, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_overlap_add_normalize_matches_xla():
    rs = np.random.RandomState(1)
    T = 64
    frames = rs.randn(2, T, N_FFT).astype(np.float32) * 0.05
    full_len = N_FFT + HOP * (T - 1)
    # reference: overlap_add + divide + clip
    wss = np.zeros(full_len, np.float32)
    w2 = hann_periodic(N_FFT).astype(np.float64) ** 2
    for t in range(T):
        wss[t * HOP: t * HOP + N_FFT] += w2
    denom = np.where(wss > np.finfo(np.float32).tiny, wss, 1.0).astype(
        np.float32)
    ref = overlap_add(jnp.asarray(frames), HOP, full_len) / jnp.asarray(
        denom)
    ref = jnp.clip(ref, -1, 1)
    got = overlap_add_normalize(jnp.asarray(frames), HOP, full_len, denom,
                                interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_stft_istft_pallas_flag_matches_xla():
    import jax.numpy as jnp
    from avsep_tpu.ops.stft import stft, istft
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(2, 64 * HOP - 1).astype(np.float32) * 0.2)
    s_x = stft(x, N_FFT, HOP, use_pallas=False)
    s_p = stft(x, N_FFT, HOP, use_pallas=True)
    np.testing.assert_allclose(np.abs(np.asarray(s_x) - np.asarray(s_p)),
                               0, atol=1e-5)
    w_x = istft(s_x, HOP, use_pallas=False)
    w_p = istft(s_x, HOP, use_pallas=True)
    np.testing.assert_allclose(np.asarray(w_x), np.asarray(w_p), atol=1e-5)
