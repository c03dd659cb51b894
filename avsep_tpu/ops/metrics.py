"""Vectorized separation metrics: SI-SDR and BSS-eval SDR / SIR / SAR.

The reference scores each eval sample on the host with
``asteroid.metrics.get_metrics(mix, gts, preds, sample_rate=11025,
metrics_list=['sdr','sir','sar','si_sdr'])`` (reference ``main.py:260-261``)
— a per-sample Python loop over mir_eval's ``bss_eval_sources`` that
dominates eval cost (SURVEY.md §3.2).  Here the classic BSS-eval
decomposition is implemented in JAX and vmapped over the batch, so a whole
val sweep scores in a few device calls:

* 512-tap least-squares projection filters per (estimate, reference) pair,
  built from rfft cross-correlations (Toeplitz-block Gram matrix, one
  Cholesky factorization per sample — the Gram is symmetric PD);
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


def _corr(fa: jnp.ndarray, fb: jnp.ndarray, n_fft: int) -> jnp.ndarray:
    """irfft(fa * conj(fb)) — circular cross-correlation of real signals
    given their rfft spectra (half-spectrum: half the FFT work of the
    complex formulation, exact by Hermitian symmetry)."""
    return jnp.fft.irfft(fa * jnp.conj(fb), n=n_fft, axis=-1)


def _fftconvolve(c: jnp.ndarray, x_f: jnp.ndarray, n_fft: int,
                 out_len: int) -> jnp.ndarray:
    cf = jnp.fft.rfft(c, n=n_fft, axis=-1)
    return jnp.fft.irfft(cf * x_f, n=n_fft, axis=-1)[..., :out_len]


def _psolve(G: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Solve G x = rhs for symmetric positive-semidefinite G via Cholesky.

    The projection Grams here are correlation matrices of real signals
    (PSD by construction; PD for any non-degenerate reference), so
    Cholesky is valid and roughly half the work of the general LU that
    ``jnp.linalg.solve`` lowers to — measured ~1.5x on the whole
    BSS-eval program on a v5e chip (BENCH_NOTES.md).  Supports leading
    batch dims like the lax.linalg primitives it wraps.

    Degenerate references make G exactly singular — duplicated or
    gain-scaled copies of one source, or narrowband signals whose
    ``flen`` shifted versions span a low-rank subspace (a pure sine's
    shift Gram is rank 2) — and factorizing a singular G yields NaN
    metrics (mir_eval inherits the same hazard from np.linalg.solve).
    Relative diagonal loading (Tikhonov, eps * trace) keeps the
    factorization PD in f32: the trace upper-bounds the top eigenvalue,
    so the loaded condition number is at most 1/eps = 1e7, inside f32
    Cholesky's stable range (mean-diag scaling is NOT enough — a rank-2
    sine Gram concentrates the whole trace in two eigenvalues and still
    fails).  eps sweep on rank-deficient Grams (duplicate sources,
    pure sines): 1e-8 still NaNs, 3e-8 is the edge, 1e-7 holds a 10x
    margin while moving well-conditioned oracle metrics <0.05 dB
    (tests assert 0.15 dB).
    """
    n = G.shape[-1]
    scale = jnp.trace(G, axis1=-2, axis2=-1)
    G = G + (1e-7 * scale + 1e-12)[..., None, None] * jnp.eye(n, dtype=G.dtype)
    L = jax.lax.linalg.cholesky(G)
    y = jax.lax.linalg.triangular_solve(L, rhs, left_side=True, lower=True)
    return jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                           transpose_a=True)


def _decompose_all(refs: jnp.ndarray, ests: jnp.ndarray, flen: int = FLEN):
    """All S x S BSS-eval decompositions of one sample, sharing the Gram.

    refs/ests: [S, L].  Returns (sdr, sir, sar), each [S, S] with entry
    [i, j] = metric(est_j vs ref_i), per mir_eval's _bss_decomp_mtifilt:
    p_true = proj(est_j | ref_i shifts), p_all = proj(est_j | all shifts).

    The [S*flen, S*flen] Gram matrix and its factorization depend only on
    the references, so it is built ONCE and solved with all S estimates
    stacked as right-hand sides.  (The earlier per-(i, j) vmap formulation
    compiled to the same program — vmap leaves operands that do not depend
    on the mapped axis unbatched, so XLA already shared the factorization;
    verified by comparing compiled HLO custom-call shapes.  This explicit
    form just stops relying on that subtlety.)
    """
    S, L = refs.shape
    out_len = L + flen - 1
    n_fft = int(2 ** np.ceil(np.log2(out_len)))
    a = jnp.arange(flen)

    refs_f = jnp.fft.rfft(refs, n=n_fft, axis=-1)       # [S, n_fft//2+1]
    ests_f = jnp.fft.rfft(ests, n=n_fft, axis=-1)       # [S, n_fft//2+1]

    # --- shared Gram of ALL sources' shifted versions, built once
    corr_ij = _corr(refs_f[:, None], refs_f[None, :], n_fft)  # [S, S, n_fft]
    G_blocks = _toeplitz_from_corr(corr_ij, flen)       # [S, S, flen, flen]
    G = G_blocks.transpose(0, 2, 1, 3).reshape(S * flen, S * flen)

    # cross-correlations ref_i x est_j, one gather for every pair
    d_corr = _corr(refs_f[:, None], ests_f[None, :], n_fft)   # [S, S, n_fft]
    D = d_corr[:, :, (-a) % n_fft]                      # [S, S, flen]

    # --- ONE factorization, S stacked RHS (one per estimate)
    D_all = D.transpose(0, 2, 1).reshape(S * flen, S)
    C = _psolve(G, D_all).reshape(S, flen, S)           # [s, flen, j]
    C = C.transpose(2, 0, 1)                            # [j, s, flen]
    # p_all[j] = sum_s conv(C[j, s], refs[s])
    p_all = jnp.sum(_fftconvolve(C, refs_f[None], n_fft, out_len),
                    axis=1)                             # [j, out_len]

    # --- true-source projections: diagonal Gram blocks, S RHS each
    Gjj = G_blocks[jnp.arange(S), jnp.arange(S)]        # [i, flen, flen]
    Cj = _psolve(Gjj, D.transpose(0, 2, 1))             # [i, flen, j]
    # p_true[i, j] = conv(Cj[i, :, j], refs[i])
    p_true = _fftconvolve(Cj.transpose(0, 2, 1), refs_f[:, None],
                          n_fft, out_len)               # [i, j, out_len]

    s_true = jnp.pad(refs, ((0, 0), (0, flen - 1)))     # [i, out_len]
    est_pad = jnp.pad(ests, ((0, 0), (0, flen - 1)))    # [j, out_len]

    e_interf = p_all[None] - p_true                     # [i, j, out_len]
    e_artif = (est_pad - p_all)[None]                   # [1, j, out_len]
    # s_true + e_spat == p_true by construction
    sdr = _db(jnp.sum(p_true ** 2, -1),
              jnp.sum((e_interf + e_artif) ** 2, -1))
    sir = _db(jnp.sum(p_true ** 2, -1), jnp.sum(e_interf ** 2, -1))
    sar = _db(jnp.sum((p_true + e_interf) ** 2, -1),
              jnp.sum(jnp.broadcast_to(e_artif,
                                       e_interf.shape) ** 2, -1))
    return sdr, sir, sar


@functools.partial(jax.jit, static_argnames=("compute_permutation",))
def bss_eval_sources(refs: jnp.ndarray, ests: jnp.ndarray,
                     compute_permutation: bool = True):
    """Batched bss_eval: refs/ests [B, S, L] -> (sdr, sir, sar, perm),
    each [B, S], following mir_eval.separation.bss_eval_sources semantics
    (including choosing the permutation that maximizes mean SIR).
    """
    B, S, L = refs.shape

    sdr_m, sir_m, sar_m = jax.vmap(_decompose_all)(refs, ests)  # [B, S, S]
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
