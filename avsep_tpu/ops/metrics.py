"""Vectorized separation metrics: SI-SDR and BSS-eval SDR / SIR / SAR.

The reference scores each eval sample on the host with
``asteroid.metrics.get_metrics(mix, gts, preds, sample_rate=11025,
metrics_list=['sdr','sir','sar','si_sdr'])`` (reference ``main.py:260-261``)
— a per-sample Python loop over mir_eval's ``bss_eval_sources`` that
dominates eval cost (SURVEY.md §3.2).  Here the classic BSS-eval
decomposition is implemented in JAX and vmapped over the batch, so a whole
val sweep scores in a few device calls:

* 512-tap least-squares projection filters per (estimate, reference) pair,
  built from FFT cross-correlations (Toeplitz-block Gram matrix, one
  ``linalg.solve`` per sample);
* s_target / e_spat / e_interf / e_artif decomposition and the standard
  dB ratios;
* permutation search maximizing mean SIR over the S! source orderings
  (mir_eval's convention);
* SI-SDR (scale-invariant SDR) with fixed source ordering, asteroid's
  convention.

All shapes static: [B, S, L] references and estimates.
"""

from __future__ import annotations

import functools
import itertools

import jax
import jax.numpy as jnp
import numpy as np

FLEN = 512  # mir_eval bss_eval_sources filter length


def _db(num, den, eps=1e-30):
    return 10.0 * jnp.log10((num + eps) / (den + eps))


def si_sdr(est: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Scale-invariant SDR, fixed pairing, mean over sources.

    est/ref: [..., S, L].  Zero-mean both, project est onto ref.
    """
    est = est - jnp.mean(est, axis=-1, keepdims=True)
    ref = ref - jnp.mean(ref, axis=-1, keepdims=True)
    alpha = (jnp.sum(est * ref, -1, keepdims=True)
             / (jnp.sum(ref * ref, -1, keepdims=True) + 1e-12))
    target = alpha * ref
    noise = est - target
    val = _db(jnp.sum(target ** 2, -1), jnp.sum(noise ** 2, -1))
    return jnp.mean(val, axis=-1)


# --------------------------------------------------------------- bss_eval


def _toeplitz_from_corr(ssf: jnp.ndarray, flen: int) -> jnp.ndarray:
    """T[a, b] = ssf[(b - a) mod n_fft] — the correlation Toeplitz block."""
    n_fft = ssf.shape[-1]
    a = jnp.arange(flen)
    idx = (a[None, :] - a[:, None]) % n_fft
    return ssf[..., idx]


def _corr(fa: jnp.ndarray, fb: jnp.ndarray) -> jnp.ndarray:
    """real(ifft(fa * conj(fb))) — circular cross-correlation."""
    return jnp.real(jnp.fft.ifft(fa * jnp.conj(fb), axis=-1))


def _fftconvolve(c: jnp.ndarray, x_f: jnp.ndarray, n_fft: int,
                 out_len: int) -> jnp.ndarray:
    cf = jnp.fft.fft(c, n=n_fft, axis=-1)
    return jnp.real(jnp.fft.ifft(cf * x_f, axis=-1))[..., :out_len]


def _decompose(refs: jnp.ndarray, est: jnp.ndarray, j: jnp.ndarray,
               flen: int = FLEN):
    """BSS-eval decomposition of one estimate against reference j.

    refs: [S, L], est: [L], j: one-hot [S] selecting the true source.
    Returns (s_true+e_spat energy pieces) per mir_eval's
    _bss_decomp_mtifilt: s_filt = proj(est | ref_j shifts),
    p_all = proj(est | all ref shifts).
    """
    S, L = refs.shape
    out_len = L + flen - 1
    n_fft = int(2 ** np.ceil(np.log2(out_len)))

    refs_f = jnp.fft.fft(refs, n=n_fft, axis=-1)        # [S, n_fft]
    est_f = jnp.fft.fft(est, n=n_fft, axis=-1)          # [n_fft]

    # --- projection onto ALL sources' shifted versions (1024x1024 solve)
    corr_ij = _corr(refs_f[:, None], refs_f[None, :])   # [S, S, n_fft]
    G_blocks = _toeplitz_from_corr(corr_ij, flen)       # [S, S, flen, flen]
    G = jnp.concatenate(
        [jnp.concatenate([G_blocks[i, k] for k in range(S)], axis=1)
         for i in range(S)], axis=0)                    # [S*flen, S*flen]

    d_corr = _corr(refs_f, est_f[None])                 # [S, n_fft]
    a = jnp.arange(flen)
    D = d_corr[:, (-a) % n_fft].reshape(S * flen)       # hstack(ssef[0], rev)

    C = jnp.linalg.solve(G, D).reshape(S, flen)         # filters per source
    p_all = jnp.sum(_fftconvolve(C, refs_f, n_fft, out_len), axis=0)

    # --- projection onto the TRUE source only (flen x flen solve)
    ref_j_f = jnp.einsum("s,sf->f", j, refs_f)
    Gjj = _toeplitz_from_corr(_corr(ref_j_f, ref_j_f), flen)
    Dj = _corr(ref_j_f, est_f)[(-a) % n_fft]
    Cj = jnp.linalg.solve(Gjj, Dj)
    p_true = _fftconvolve(Cj, ref_j_f, n_fft, out_len)

    ref_j = jnp.einsum("s,sl->l", j, refs)
    s_true = jnp.concatenate([ref_j, jnp.zeros(flen - 1)])
    est_pad = jnp.concatenate([est, jnp.zeros(flen - 1)])

    e_spat = p_true - s_true
    e_interf = p_all - p_true
    e_artif = est_pad - p_all

    sdr = _db(jnp.sum((s_true + e_spat) ** 2),
              jnp.sum((e_interf + e_artif) ** 2))
    sir = _db(jnp.sum((s_true + e_spat) ** 2), jnp.sum(e_interf ** 2))
    sar = _db(jnp.sum((s_true + e_spat + e_interf) ** 2),
              jnp.sum(e_artif ** 2))
    return sdr, sir, sar


@functools.partial(jax.jit, static_argnames=("compute_permutation",))
def bss_eval_sources(refs: jnp.ndarray, ests: jnp.ndarray,
                     compute_permutation: bool = True):
    """Batched bss_eval: refs/ests [B, S, L] -> (sdr, sir, sar, perm),
    each [B, S], following mir_eval.separation.bss_eval_sources semantics
    (including choosing the permutation that maximizes mean SIR).
    """
    B, S, L = refs.shape
    eye = jnp.eye(S)

    def pairwise(refs_b, ests_b):
        def one(i, j):
            return _decompose(refs_b, ests_b[j], eye[i])
        return jax.vmap(lambda i: jax.vmap(lambda j: one(i, j))(
            jnp.arange(S)))(jnp.arange(S))  # ([S,S], [S,S], [S,S])

    sdr_m, sir_m, sar_m = jax.vmap(pairwise)(refs, ests)  # each [B, S, S]
    # entry [b, i, j] = metric(est_j vs ref_i)

    if not compute_permutation:
        idx = jnp.arange(S)
        d = sdr_m[:, idx, idx]
        i_ = sir_m[:, idx, idx]
        a_ = sar_m[:, idx, idx]
        perm = jnp.broadcast_to(idx, (B, S))
        return d, i_, a_, perm

    perms = jnp.asarray(list(itertools.permutations(range(S))))  # [P, S]
    idx = jnp.arange(S)

    idx_ps = jnp.broadcast_to(idx, perms.shape)  # [P, S]

    def gather(m):  # m [B, S, S] -> [B, P, S]: m[b, i, perms[p, i]]
        return m[:, idx_ps, perms]

    sir_p = gather(sir_m)                       # [B, P, S]
    best = jnp.argmax(jnp.mean(sir_p, -1), -1)  # [B]

    def pick(m):
        g = gather(m)
        return jnp.take_along_axis(g, best[:, None, None], 1)[:, 0]

    return pick(sdr_m), pick(sir_m), pick(sar_m), perms[best]


def eval_metrics(refs, ests):
    """get_metrics-style dict: mean-over-sources sdr/sir/sar (permuted) +
    si_sdr (fixed order), per sample (reference main.py:260-266)."""
    sdr, sir, sar, _ = bss_eval_sources(refs, ests)
    return {
        "sdr": jnp.mean(sdr, -1),
        "sir": jnp.mean(sir, -1),
        "sar": jnp.mean(sar, -1),
        "si_sdr": si_sdr(ests, refs),
    }
