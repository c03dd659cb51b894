"""C++ host kernels vs Python fallbacks (native/avsep_host.cpp)."""

import numpy as np
import pytest

from avsep_tpu.data import native
from avsep_tpu.data.audio_io import write_wav

SR = 11025


@pytest.fixture(scope="module")
def built():
    if not native.native_available():
        pytest.skip("native library unavailable (no compiler)")
    return True


def test_wav_read_crop(built, tmp_path):
    x = (np.sin(np.arange(SR * 2) / 50.0) * 0.3).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, SR)
    out, sr = native.wav_read_crop(p, 100, 500)
    assert sr == SR and out.shape == (500,)
    np.testing.assert_allclose(out, x[100:600], atol=1e-4)


def test_wav_read_matches_python_path(built, tmp_path):
    from avsep_tpu.data.audio_io import read_wav
    rs = np.random.RandomState(0)
    x = (rs.randn(SR) * 0.2).astype(np.float32)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, SR)
    # native path (through read_wav) vs stdlib wave parsing
    a, sr_a = read_wav(p, 0.25, 0.5)
    import wave
    with wave.open(p, "rb") as w:
        sr = w.getframerate()
        w.setpos(int(0.25 * sr))
        raw = w.readframes(int(0.5 * sr))
    b = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_silence_fraction(built):
    x = np.zeros(1000, np.float32)
    x[:100] = 0.5
    assert abs(native.silence_fraction(x, 0.001) - 0.9) < 1e-9


def test_gain_clamp(built):
    x = np.asarray([0.5, -0.9, 0.9], np.float32)
    native.gain_clamp(x, 1.5)
    np.testing.assert_allclose(x, [0.75, -1.0, 1.0], atol=1e-6)


def test_mix_sources(built):
    rs = np.random.RandomState(1)
    src = rs.randn(2, 4096).astype(np.float32)
    out = native.mix_sources(src)
    np.testing.assert_allclose(out, src.mean(0), atol=1e-6)


def test_resample_quality(built):
    # a pure tone resampled 44100 -> 11025 keeps its frequency
    sr_in, sr_out = 44100, 11025
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = native.resample_sinc(x, sr_in, sr_out)
    assert y.shape[0] == sr_out
    # compare against scipy polyphase on the interior
    from scipy.signal import resample_poly
    ref = resample_poly(x.astype(np.float64), 1, 4).astype(np.float32)
    L = min(len(y), len(ref))
    err = np.abs(y[100:L - 100] - ref[100:L - 100])
    assert err.mean() < 0.02
