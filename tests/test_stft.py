"""Golden parity: avsep_tpu.ops.stft vs librosa semantics.

librosa itself is not installed; torch.stft with center=True,
pad_mode='reflect' and a periodic Hann window implements the identical
algorithm (same framing, padding, window), so it serves as the oracle
for the forward transform.  iSTFT is checked against torch.istft and by
round-trip reconstruction (reference dataset/base.py:142-147,
utils.py:101-104).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from avsep_tpu.ops.stft import (
    stft, istft, stft_magphase, istft_reconstruction, hann_periodic)

N_FFT, HOP, AUDLEN = 1022, 256, 65535


def _torch_stft(x):
    w = torch.hann_window(N_FFT, periodic=True, dtype=torch.float64)
    return torch.stft(torch.from_numpy(x.astype(np.float64)), n_fft=N_FFT,
                      hop_length=HOP, window=w, center=True,
                      pad_mode="reflect", return_complex=True)


def test_window_matches_scipy():
    from scipy.signal import get_window
    np.testing.assert_allclose(
        hann_periodic(N_FFT), get_window("hann", N_FFT, fftbins=True),
        rtol=0, atol=1e-7)


def test_stft_shape():
    x = np.random.RandomState(0).randn(3, AUDLEN).astype(np.float32)
    s = np.asarray(stft(jnp.asarray(x), N_FFT, HOP))
    assert s.shape == (3, 512, 256)


def test_stft_matches_torch_reflect_center():
    x = np.random.RandomState(1).randn(2, AUDLEN).astype(np.float32) * 0.3
    ours = np.asarray(stft(jnp.asarray(x), N_FFT, HOP))
    ref = _torch_stft(x).numpy()
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours.real, ref.real, atol=2e-4 * scale)
    np.testing.assert_allclose(ours.imag, ref.imag, atol=2e-4 * scale)


def test_magphase_consistency():
    x = np.random.RandomState(2).randn(AUDLEN).astype(np.float32)
    mag, phase = stft_magphase(jnp.asarray(x), N_FFT, HOP)
    spec = stft(jnp.asarray(x), N_FFT, HOP)
    np.testing.assert_allclose(np.asarray(mag), np.abs(np.asarray(spec)),
                               rtol=1e-6, atol=1e-6)


def test_istft_matches_torch():
    x = np.random.RandomState(3).randn(AUDLEN).astype(np.float32) * 0.5
    spec = _torch_stft(x)
    w = torch.hann_window(N_FFT, periodic=True, dtype=torch.float64)
    ref = torch.istft(spec, n_fft=N_FFT, hop_length=HOP, window=w,
                      center=True).numpy()
    ours = np.asarray(istft(jnp.asarray(spec.numpy().astype(np.complex64)),
                            HOP))
    assert ours.shape[-1] == HOP * (spec.shape[-1] - 1)
    L = min(len(ref), ours.shape[-1])
    np.testing.assert_allclose(ours[:L], ref[:L], atol=5e-4)


def test_roundtrip_reconstruction():
    # stft -> istft reproduces the (interior of the) signal
    x = (np.random.RandomState(4).randn(AUDLEN) * 0.2).astype(np.float32)
    spec = stft(jnp.asarray(x), N_FFT, HOP)
    y = np.asarray(istft(spec, HOP))
    L = y.shape[-1]
    np.testing.assert_allclose(y[HOP:L - HOP], x[HOP:L - HOP], atol=1e-4)


def test_istft_reconstruction_clips():
    x = (np.random.RandomState(5).randn(AUDLEN) * 2.0).astype(np.float32)
    mag, phase = stft_magphase(jnp.asarray(x), N_FFT, HOP)
    wav = np.asarray(istft_reconstruction(mag, phase, HOP))
    assert wav.max() <= 1.0 and wav.min() >= -1.0


def test_batched_equals_single():
    xs = np.random.RandomState(6).randn(4, AUDLEN).astype(np.float32)
    batched = np.asarray(stft(jnp.asarray(xs), N_FFT, HOP))
    for i in range(4):
        single = np.asarray(stft(jnp.asarray(xs[i]), N_FFT, HOP))
        np.testing.assert_allclose(batched[i], single, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("dft", ["matmul", "matmul_fast"])
def test_matmul_dft_matches_fft(dft):
    """The explicit-DFT path (``dft="matmul*"``, ops/stft.py) must agree
    with the XLA fft path.  On CPU every MXU precision level computes in
    full float32, so this pins the MATH (matrices, Nyquist/DC handling,
    layout); on-chip precision deltas are characterized in
    BENCH_NOTES.md."""
    rs = np.random.RandomState(7)
    x = (rs.randn(3, AUDLEN) * 0.1).astype(np.float32)
    ref = np.asarray(stft(jnp.asarray(x), N_FFT, HOP))
    got = np.asarray(stft(jnp.asarray(x), N_FFT, HOP, dft=dft))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 2e-6

    spec = jnp.asarray(ref)
    wav_ref = np.asarray(istft(spec, HOP))
    wav_got = np.asarray(istft(spec, HOP, dft=dft))
    assert np.abs(wav_got - wav_ref).max() < 2e-6


def test_unknown_dft_backend_rejected():
    with pytest.raises(ValueError, match="dft must be one of"):
        stft(jnp.zeros((2, AUDLEN)), N_FFT, HOP, dft="bogus")


@pytest.mark.parametrize("n_fft", [256, 510, 511])
def test_matmul_dft_general_nfft(n_fft):
    """The explicit-DFT matrices must be correct for any n_fft (even,
    even-non-pow2, odd) — DC/Nyquist weighting differs by parity."""
    rs = np.random.RandomState(n_fft)
    hop = n_fft // 4
    x = (rs.randn(2, 40 * hop - 1) * 0.1).astype(np.float32)
    ref = np.asarray(stft(jnp.asarray(x), n_fft, hop))
    got = np.asarray(stft(jnp.asarray(x), n_fft, hop, dft="matmul"))
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6

    wav_ref = np.asarray(istft(jnp.asarray(ref), hop))
    wav_got = np.asarray(istft(jnp.asarray(ref), hop, dft="matmul"))
    assert np.abs(wav_got - wav_ref).max() < 2e-6
