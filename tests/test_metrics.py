"""Golden parity for BSS-eval metrics.

mir_eval/asteroid are not installed; the oracle here is an independent
numpy/scipy implementation of the published bss_eval_sources algorithm
(Vincent et al. 2006, as implemented by mir_eval.separation) using
scipy.linalg.toeplitz/solve and scipy.signal.fftconvolve.
"""

import itertools

import numpy as np
import pytest
from scipy.linalg import toeplitz
from scipy.signal import fftconvolve

import jax.numpy as jnp

from avsep_tpu.ops.metrics import bss_eval_sources, si_sdr, eval_metrics

FLEN = 512


# ------------------------- numpy oracle (mir_eval algorithm) ----------------

def np_project(refs, est, flen):
    nsrc, nsampl = refs.shape
    n_fft = int(2 ** np.ceil(np.log2(nsampl + flen - 1)))
    sf = np.fft.fft(np.hstack((refs, np.zeros((nsrc, flen - 1)))), n=n_fft,
                    axis=1)
    sef = np.fft.fft(np.hstack((est, np.zeros(flen - 1))), n=n_fft)
    G = np.zeros((nsrc * flen, nsrc * flen))
    for i in range(nsrc):
        for j in range(i, nsrc):
            ssf = np.real(np.fft.ifft(sf[i] * np.conj(sf[j])))
            ss = toeplitz(np.hstack((ssf[0], ssf[-1:-flen:-1])),
                          r=ssf[:flen])
            G[i * flen:(i + 1) * flen, j * flen:(j + 1) * flen] = ss
            G[j * flen:(j + 1) * flen, i * flen:(i + 1) * flen] = ss.T
    D = np.zeros(nsrc * flen)
    for i in range(nsrc):
        ssef = np.real(np.fft.ifft(sf[i] * np.conj(sef)))
        D[i * flen:(i + 1) * flen] = np.hstack((ssef[0], ssef[-1:-flen:-1]))
    C = np.linalg.solve(G, D).reshape(flen, nsrc, order="F")
    sproj = np.zeros(nsampl + flen - 1)
    for i in range(nsrc):
        sproj += fftconvolve(C[:, i], refs[i])[: nsampl + flen - 1]
    return sproj


def np_decomp(refs, est, j, flen):
    nsampl = refs.shape[1]
    s_true = np.hstack((refs[j], np.zeros(flen - 1)))
    e_spat = np_project(refs[j:j + 1], est, flen) - s_true
    e_interf = np_project(refs, est, flen) - s_true - e_spat
    e_artif = -s_true - e_spat - e_interf + np.hstack(
        (est, np.zeros(flen - 1)))
    sdr = 10 * np.log10(np.sum((s_true + e_spat) ** 2)
                        / np.sum((e_interf + e_artif) ** 2))
    sir = 10 * np.log10(np.sum((s_true + e_spat) ** 2)
                        / np.sum(e_interf ** 2))
    sar = 10 * np.log10(np.sum((s_true + e_spat + e_interf) ** 2)
                        / np.sum(e_artif ** 2))
    return sdr, sir, sar


def np_bss_eval(refs, ests, flen=FLEN):
    S = refs.shape[0]
    sdr = np.zeros((S, S)); sir = np.zeros((S, S)); sar = np.zeros((S, S))
    for i in range(S):
        for j in range(S):
            sdr[i, j], sir[i, j], sar[i, j] = np_decomp(refs, ests[j], i,
                                                        flen)
    best, best_perm = -np.inf, None
    for p in itertools.permutations(range(S)):
        m = np.mean([sir[i, p[i]] for i in range(S)])
        if m > best:
            best, best_perm = m, p
    p = best_perm
    return (np.array([sdr[i, p[i]] for i in range(S)]),
            np.array([sir[i, p[i]] for i in range(S)]),
            np.array([sar[i, p[i]] for i in range(S)]),
            np.array(p))


# ----------------------------------------------------------------- tests


def _mix_signals(seed, L=4096, swap=False):
    rs = np.random.RandomState(seed)
    t = np.arange(L) / 11025
    s1 = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.01 * rs.randn(L)
    s2 = 0.4 * np.sign(np.sin(2 * np.pi * 220 * t)) + 0.01 * rs.randn(L)
    refs = np.stack([s1, s2]).astype(np.float64)
    # imperfect estimates: mostly-correct masks with bleed
    e1 = 0.9 * s1 + 0.2 * s2 + 0.02 * rs.randn(L)
    e2 = 0.15 * s1 + 0.85 * s2 + 0.02 * rs.randn(L)
    ests = np.stack([e2, e1] if swap else [e1, e2]).astype(np.float64)
    return refs, ests


@pytest.mark.parametrize("swap", [False, True])
def test_bss_eval_matches_numpy_oracle(swap):
    refs, ests = _mix_signals(0, swap=swap)
    ref_sdr, ref_sir, ref_sar, ref_perm = np_bss_eval(refs, ests)
    sdr, sir, sar, perm = bss_eval_sources(
        jnp.asarray(refs[None], jnp.float32), jnp.asarray(ests[None],
                                                          jnp.float32))
    np.testing.assert_array_equal(np.asarray(perm)[0], ref_perm)
    np.testing.assert_allclose(np.asarray(sdr)[0], ref_sdr, atol=0.15)
    np.testing.assert_allclose(np.asarray(sir)[0], ref_sir, atol=0.15)
    np.testing.assert_allclose(np.asarray(sar)[0], ref_sar, atol=0.15)


def test_bss_eval_batched_consistency():
    refs1, ests1 = _mix_signals(1)
    refs2, ests2 = _mix_signals(2, swap=True)
    refs = jnp.asarray(np.stack([refs1, refs2]), jnp.float32)
    ests = jnp.asarray(np.stack([ests1, ests2]), jnp.float32)
    sdr_b, *_ = bss_eval_sources(refs, ests)
    sdr_1, *_ = bss_eval_sources(refs[:1], ests[:1])
    np.testing.assert_allclose(np.asarray(sdr_b)[0], np.asarray(sdr_1)[0],
                               atol=1e-3)


def test_si_sdr_properties():
    rs = np.random.RandomState(3)
    ref = rs.randn(2, 2, 2048).astype(np.float32)
    noisy = ref + 0.1 * rs.randn(*ref.shape).astype(np.float32)
    # scale invariance: scaling the estimate must not change si_sdr
    v1 = si_sdr(jnp.asarray(noisy), jnp.asarray(ref))
    v2 = si_sdr(jnp.asarray(noisy * 3.7), jnp.asarray(ref))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-2)
    # perfect estimate scores (numerically) much higher
    v0 = si_sdr(jnp.asarray(ref), jnp.asarray(ref))
    assert np.all(np.asarray(v0) > np.asarray(v1))
    # worse estimates -> lower si_sdr
    noisier = ref + 0.5 * rs.randn(*ref.shape).astype(np.float32)
    v3 = si_sdr(jnp.asarray(noisier), jnp.asarray(ref))
    assert np.all(np.asarray(v3) < np.asarray(v1))


def test_eval_metrics_dict():
    refs, ests = _mix_signals(4)
    m = eval_metrics(jnp.asarray(refs[None], jnp.float32),
                     jnp.asarray(ests[None], jnp.float32))
    for k in ("sdr", "sir", "sar", "si_sdr"):
        assert m[k].shape == (1,)
        assert np.isfinite(float(m[k][0]))
    assert float(m["sir"][0]) > float(m["sdr"][0])


def test_bss_eval_degenerate_references_finite():
    """Rank-deficient reference Grams must yield finite metrics, not NaN.

    Duplicated / gain-scaled sources make the stacked shift Gram exactly
    singular, and narrowband references (a pure sine's flen shifted
    copies span a rank-2 subspace) are singular even source-by-source —
    unregularized Cholesky (and mir_eval's np.linalg.solve) NaN out.
    The relative diagonal loading in ops.metrics._psolve must hold for
    all of them, and stay accurate on the well-conditioned case."""
    from avsep_tpu.ops.metrics import bss_eval_sources
    rs = np.random.RandomState(3)
    L = 8191
    t = np.arange(L) / 11025.0
    a = rs.randn(L).astype(np.float32)
    cases = {
        "dup": np.stack([a, a]),
        "scaled": np.stack([a, 0.25 * a]),
        "sines": np.stack([0.4 * np.sin(2 * np.pi * 220 * t),
                           0.4 * np.sin(2 * np.pi * 330 * t)]
                          ).astype(np.float32),
        "same-sine": np.stack(
            [0.4 * np.sin(2 * np.pi * 220 * t)] * 2).astype(np.float32),
    }
    for name, refs in cases.items():
        ests = refs + 0.05 * rs.randn(*refs.shape).astype(np.float32)
        sdr, sir, sar, perm = bss_eval_sources(jnp.asarray(refs[None]),
                                               jnp.asarray(ests[None]))
        for metric_name, v in (("sdr", sdr), ("sir", sir), ("sar", sar)):
            assert np.isfinite(np.asarray(v)).all(), (name, metric_name, v)
    # ~26 dB mixing SNR must survive the loading on conditioned refs
    refs = np.stack([a, rs.randn(L).astype(np.float32)])
    ests = refs + 0.05 * rs.randn(*refs.shape).astype(np.float32)
    sdr, _, _, _ = bss_eval_sources(jnp.asarray(refs[None]),
                                    jnp.asarray(ests[None]))
    assert np.asarray(sdr).min() > 20.0
