"""Losses: weighted L1 / L2 / BCE and vectorized permutation-invariant
training (PIT).

Reference semantics (``models/criterion.py``):

* ``BaseLoss`` reduces a list of per-source predictions by averaging the
  per-source scalar losses (``criterion.py:10-25``).
* ``BCELoss`` is ``F.binary_cross_entropy(pred, target, weight=w)`` — mean of
  ``w * bce`` with logs clamped at -100 (``criterion.py:44-49``).
* ``PitWrapper`` scans all source permutations per sample and returns the
  minimal loss plus the optimal permutation (``criterion.py:74-231``).  The
  reference loops Python-level over the batch and over ``itertools.
  permutations``; here the whole thing is one batched tensor expression —
  for C sources the [C, C] pairwise loss matrix is built with one broadcast,
  permutation scores with one static gather, so XLA fuses it end-to-end and
  there is no host round-trip (SURVEY.md §7 "hard parts" #2).

Conventions: tensors are channels-last with sources on the trailing axis,
``[B, ..., S]``, exactly like the reference's PIT contract
(``criterion.py:80-82``).
"""

from __future__ import annotations

import functools
import itertools
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG_CLAMP = -100.0  # torch F.binary_cross_entropy clamps log() at -100
# Gradient-safety epsilon.  torch clamps only the log VALUE; its backward is
# (p-t)/max(p(1-p), 1e-12), finite but up to 1e12.  The jnp.maximum-clamp
# formulation is worse: at p==0 exactly the VJP evaluates 0 * (1/0) = NaN,
# which killed a toy training run the moment the sigmoid saturated in f32
# (easy data -> logits beyond +-17 -> p exactly 0/1).  Clipping p into
# [eps, 1-eps] keeps values bit-identical to torch for all p in that range
# (the parity regime) and bounds the gradient at 1/eps instead of NaN/1e12.
_BCE_EPS = 1e-7


def bce_elementwise(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Unreduced binary cross entropy matching torch's log clamp, with a
    gradient-safe input clip (see ``_BCE_EPS``)."""
    pred = jnp.clip(pred, _BCE_EPS, 1.0 - _BCE_EPS)
    logp = jnp.maximum(jnp.log(pred), _LOG_CLAMP)
    log1mp = jnp.maximum(jnp.log(1.0 - pred), _LOG_CLAMP)
    return -(target * logp + (1.0 - target) * log1mp)


def l1_elementwise(pred, target):
    return jnp.abs(pred - target)


def l2_elementwise(pred, target):
    return jnp.square(pred - target)


_ELEMENTWISE = {"bce": bce_elementwise, "l1": l1_elementwise,
                "l2": l2_elementwise}


def weighted_loss(pred: jnp.ndarray, target: jnp.ndarray,
                  weight: jnp.ndarray | None = None,
                  kind: str = "bce") -> jnp.ndarray:
    """Scalar weighted loss over one source (reference BaseLoss._forward).

    For ``bce`` this is mean(w * bce) (torch BCE weight semantics); for
    l1/l2 it is mean(w * |d|) / mean(w * d^2) (reference criterion.py:33,41).
    """
    e = _ELEMENTWISE[kind](pred, target)
    if weight is not None:
        e = e * weight
    return jnp.mean(e)


def multi_source_loss(preds: jnp.ndarray, targets: jnp.ndarray,
                      weight: jnp.ndarray | None = None,
                      kind: str = "bce",
                      per_sample: bool = False) -> jnp.ndarray:
    """Average of per-source scalar losses (reference BaseLoss.forward over
    a list).  ``preds/targets [N, B, ...]``; ``weight`` broadcast to each.

    With ``per_sample=True`` returns the [B] per-sample losses whose mean is
    the scalar loss exactly (all samples have equal element counts) — used
    by eval to exclude padded rows from the meters.
    """
    e = _ELEMENTWISE[kind](preds, targets)
    if weight is not None:
        e = e * weight  # weight [B, ...] broadcasts over the source axis
    ps = jnp.mean(e, axis=(0,) + tuple(range(2, e.ndim)))  # [B]
    # every sample has the same element count, so the scalar is exactly
    # the mean of the per-sample losses — one elementwise pass serves both
    return ps if per_sample else jnp.mean(ps)


@functools.partial(jax.jit, static_argnames=("kind", "n_sources"))
def pit_loss(preds: jnp.ndarray, targets: jnp.ndarray,
             weights: jnp.ndarray | None = None, *, kind: str = "bce",
             n_sources: int | None = None
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched permutation-invariant loss.

    Args:
      preds, targets: ``[B, ..., S]`` with sources trailing.
      weights: same shape (indexed by the *target* source, matching
        reference ``criterion.py:167-169``), or None.
      kind: 'bce' | 'l1' | 'l2'.

    Returns:
      (loss [B], perm [B, S]) where ``perm[b]`` maps target-slot -> pred-slot
      minimizing the loss (ties resolved to the first permutation in
      ``itertools.permutations`` order, like the reference's strict ``>``).
    """
    S = n_sources or preds.shape[-1]
    perms = jnp.asarray(list(itertools.permutations(range(S))))  # [P, S]

    # pairwise matrix: elem[..., i, j] = loss(pred_j vs target_i)
    e = _ELEMENTWISE[kind](preds[..., None, :], targets[..., :, None])
    if weights is not None:
        e = e * weights[..., :, None]
    # mean over every axis except (batch, i, j) -> [B, S, S]
    reduce_axes = tuple(range(1, e.ndim - 2))
    mat = jnp.mean(e, axis=reduce_axes)

    # perm scores: mean_i mat[:, i, perms[p, i]] -> [B, P]
    perm_losses = jnp.mean(
        mat[:, jnp.arange(S)[None, :], perms], axis=-1)  # [B, P]

    best = jnp.argmin(perm_losses, axis=-1)  # [B]
    loss = jnp.take_along_axis(perm_losses, best[:, None], axis=-1)[:, 0]
    perm = perms[best]  # [B, S]
    return loss, perm


def reorder_sources(tensor: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Apply per-sample optimal permutation on the trailing sources axis.

    Equivalent of reference ``PitWrapper.reorder_tensor``
    (``criterion.py:180-200``) without the Python batch loop: one
    ``take_along_axis``.
    """
    B, S = perm.shape
    idx = perm.reshape((B,) + (1,) * (tensor.ndim - 2) + (S,))
    idx = jnp.broadcast_to(idx, tensor.shape)
    return jnp.take_along_axis(tensor, idx, axis=-1)
