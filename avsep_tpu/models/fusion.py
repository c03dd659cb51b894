"""Audio-visual co-localization fusion (the research core).

TPU-native re-implementation of the three fusion modules at the U-Net
bottleneck (reference ``models/fusion_net.py``):

* **CoLoc** (``fusion_net.py:20-110``, ``fusion_type='hidsep'``): split the
  max-pooled bottleneck audio vector into C per-source chunks (the
  reference hard-codes C=2; here any C with an evenly dividing bottleneck
  works), score all C! chunk<->visual-map assignments with cosine or
  scaled-dot-sigmoid attention,
  pick the best permutation (match loss = -best + sum(rest)), attend the
  visual maps, and broadcast per-source guidance vectors back over the
  spectrogram bottleneck.
* **CoLoc_Sel** (``fusion_net.py:112-226``): same, but the guidance vector is
  the visual feature at the argmax attention pixel.
* **MixVis** (``fusion_net.py:229-311``): one mixed visual map; per-chunk
  similarity, argmax-pixel selection, match loss with map-area regularizer
  and cross-source cosine penalty.

All modules are *parameter-free* pure functions: permutation search is a
static gather over P=C! permutations (no data-dependent control flow), the
audio-only slot shuffle (``fusion_net.py:96``) takes an explicit JAX PRNG
key instead of implicit CUDA RNG, and everything is channels-last.

Tensor conventions: bottleneck audio ``x [B, h, w, D]``; visual feature maps
``v [C, B, H, W, D/C]`` (stacked sources); attention maps ``[B, C, H, W]``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avsep_tpu.models.layers import cosine_similarity


class FusionOut(NamedTuple):
    features: jnp.ndarray              # [B, h, w, 2D] fused bottleneck
    match_loss: Optional[jnp.ndarray]  # scalar or None (AO path)
    att_maps: Optional[jnp.ndarray]    # [B, C, H, W] or None
    match_ps: Optional[jnp.ndarray] = None  # per-sample match loss [B]
    # (mean(match_ps) == match_loss; lets eval exclude padded rows)


def _attend(x_pc: jnp.ndarray, v: jnp.ndarray, att_type: str,
            att_temp: float = 1.0) -> jnp.ndarray:
    """Attention kernel (reference fusion_net.py:27-33).

    x_pc: [B, ..., Dc] audio chunk vectors (any middle dims, e.g. [B,P,C,Dc])
    v:    [B, ..., H, W, Dc] visual maps broadcastable against x_pc's middle
    att_temp: temperature dividing the attention scores (TPU-native
      diagnostic knob beyond the reference, which fixes temp=1).  For
      'sig' it sharpens/softens the sigmoid saturation (temp<1 pushes the
      map toward a hard 0/1 localization); for 'cos' it rescales the
      bounded similarity, which rescales the match loss and the
      attention-pooled guidance magnitude (argmax locations unchanged).
    Returns per-pixel scores [..., H, W].
    """
    xb = x_pc[..., None, None, :]   # broadcast over H, W
    if att_type == "cos":
        sim = cosine_similarity(xb, v, axis=-1)
        return sim if att_temp == 1.0 else sim / att_temp
    elif att_type == "sig":
        d = x_pc.shape[-1]
        logits = jnp.sum(xb * v / jnp.sqrt(float(d)), axis=-1)
        if att_temp != 1.0:
            logits = logits / att_temp
        return jax.nn.sigmoid(logits)
    raise ValueError(f"unknown att_type {att_type}")


def _pool_chunks(x: jnp.ndarray, C: int) -> jnp.ndarray:
    """Spatial max-pool the bottleneck and split channels into C chunks.

    Matches ``AdaptiveMaxPool3d((None,1,1))`` + ``tensor_split(dim=1)``
    (reference fusion_net.py:24,38).  Returns [B, C, D/C].
    """
    B, _, _, D = x.shape
    if D % C:
        # fail with intent, not a reshape TypeError: the reference has the
        # same constraint implicitly (fusion_net.py:38-46 stacks
        # tensor_split chunks, which must be equal-sized) and is
        # additionally hard-coded to C=2; here any C works when the
        # bottleneck divides evenly
        raise ValueError(
            f"U-Net bottleneck dim {D} must be divisible by num_mix={C} "
            f"for chunked AV fusion (pick ngf so bottleneck % num_mix == 0)")
    g = jnp.max(x, axis=(1, 2))  # [B, D]
    return g.reshape(B, C, D // C)


def _broadcast_guidance(feat: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """[B, C, Dc] -> [B, h, w, C*Dc] per-source guidance planes."""
    B, C, Dc = feat.shape
    flat = feat.reshape(B, C * Dc)
    return jnp.broadcast_to(flat[:, None, None, :], (B, h, w, C * Dc))


def _perms(C: int) -> jnp.ndarray:
    """All C! orderings as one static index table [P, C] — itertools order
    puts identity first (ties in downstream argmax/argmin resolve to it)."""
    import itertools
    return jnp.asarray(list(itertools.permutations(range(C))))


def _perm_stack(blocks: jnp.ndarray) -> jnp.ndarray:
    """[B, C, Dc] -> [B, P, C, Dc], every source ordering via one static
    gather.  For C=2 this is exactly the reference's pair
    (fusion_net.py:44-46: identity + swap); the reference hard-codes that
    special case, here any C works (P = C!)."""
    return blocks[:, _perms(blocks.shape[1])]


def _score_and_sort(maps: jnp.ndarray):
    """maps [B, P, C, H, W] -> (match_loss, match_ps [B], best_perm_idx [B],
    att [B,C,H,W]).

    score(p) = sum_c max_{hw} maps[p, c]; best = argmax; match loss =
    mean(-best_score + sum(rest)) (reference fusion_net.py:54-65).
    """
    scores = jnp.sum(jnp.max(maps, axis=(3, 4)), axis=2)   # [B, P]
    best = jnp.argmax(scores, axis=1)                       # [B]
    best_score = jnp.take_along_axis(scores, best[:, None], 1)[:, 0]
    rest = jnp.sum(scores, axis=1) - best_score
    match_ps = -best_score + rest                            # [B]
    match_loss = jnp.mean(match_ps)
    att = jnp.take_along_axis(
        maps, best[:, None, None, None, None], axis=1)[:, 0]  # [B,C,H,W]
    return match_loss, match_ps, best, att


def _random_slot_swap(blocks: jnp.ndarray, rng: jax.Array) -> jnp.ndarray:
    """Randomly permute the per-source audio chunks per sample (reference
    AO_forward, fusion_net.py:96-98).

    C=2 keeps the reference's exact fair-coin-uniform draw — the torch
    parity tests pin this stream (test_unet_parity / test_train_loss_
    parity feed the same uniforms to torch.rand).  C>2 (beyond the
    reference, which is pair-only) draws uniformly over all C! orders.
    """
    B, C, Dc = blocks.shape
    if C == 2:
        swap = jax.random.uniform(rng, (B,)) <= 0.5
        perm = jnp.where(swap[:, None], jnp.asarray([1, 0])[None, :],
                         jnp.asarray([0, 1])[None, :])       # [B, C]
    else:
        perms = _perms(C)                                    # [P, C]
        pick = jax.random.randint(rng, (B,), 0, perms.shape[0])
        perm = perms[pick]
    return jnp.take_along_axis(blocks, perm[:, :, None], axis=1)


def _ao_forward(x: jnp.ndarray, rng: jax.Array, C: int = 2) -> FusionOut:
    """Audio-only path: shuffle the per-source chunks and broadcast them as
    the guidance (reference fusion_net.py:93-104).  ``C`` must match the
    AV branch's source count (callers thread ``n_sources`` through) so AO
    and AV iterations chunk the bottleneck identically."""
    B, h, w, D = x.shape
    blocks = _random_slot_swap(_pool_chunks(x, C), rng)
    guidance = _broadcast_guidance(blocks, h, w)
    return FusionOut(jnp.concatenate([guidance, x], axis=-1), None, None)


def _duet_vcat(v: jnp.ndarray, axis_h: bool) -> jnp.ndarray:
    """Duet option: concatenate the two frame maps along one spatial dim and
    duplicate (reference fusion_net.py:83-90).  The reference draws the dim
    with a host-side coin (``torch.rand(1)``); under jit the concat axis
    changes the output SHAPE, so it must be static — callers draw the coin
    on the host and pass ``option='duet_h' | 'duet_w'``."""
    vc = jnp.concatenate([v[0], v[1]], axis=1 if axis_h else 2)
    return jnp.stack([vc, vc], axis=0)  # [C=2, B, H', W', Dc]


def coloc(x: jnp.ndarray, v: Optional[jnp.ndarray], *, att_type: str = "cos",
          rng: Optional[jax.Array] = None, option: Optional[str] = None,
          select: bool = False, n_sources: int = 2,
          att_temp: float = 1.0) -> FusionOut:
    """CoLoc / CoLoc_Sel fusion (reference fusion_net.py:20-226).

    Args:
      x: bottleneck audio features [B, h, w, D].
      v: stacked visual maps [C, B, H, W, D/C] or None (audio-only batch).
      att_type: 'cos' | 'sig'.
      rng: PRNG key; required for AO path.
      option: None | 'duet' (alias 'duet_h') | 'duet_w' — concat axis for
        the duet visual mixture (the reference's random host coin,
        fusion_net.py:88, becomes this static choice).
      select: False -> CoLoc (attention-pooled guidance); True -> CoLoc_Sel
        (argmax-pixel guidance, reference fusion_net.py:163-169).
      n_sources: chunk count for the AO branch (the AV branch infers it
        from v; both must agree so AO/AV iterations chunk identically).
    """
    if v is None:
        return _ao_forward(x, rng, n_sources)
    if option in ("duet", "duet_h", "duet_w"):
        v = _duet_vcat(v, axis_h=option != "duet_w")

    B, h, w, D = x.shape
    C = v.shape[0]
    blocks = _pool_chunks(x, C)                     # [B, C, Dc]
    x_t = _perm_stack(blocks)                       # [B, P, C, Dc]
    v_cat = jnp.moveaxis(v, 0, 1)                   # [B, C, H, W, Dc]
    maps = _attend(x_t, v_cat[:, None], att_type, att_temp)  # [B,P,C,H,W]
    match_loss, match_ps, _, att = _score_and_sort(maps)

    if select:
        # argmax-pixel selection (reference fusion_net.py:163-169)
        Bv, Cv, H, W, Dc = v_cat.shape
        flat_att = att.reshape(B, C, H * W)
        max_ind = jnp.argmax(flat_att, axis=-1)            # [B, C]
        v_flat = v_cat.reshape(B, C, H * W, Dc)
        feat = jnp.take_along_axis(
            v_flat, max_ind[:, :, None, None], axis=2)[:, :, 0]  # [B, C, Dc]
    else:
        # attention pooling (reference fusion_net.py:68-70)
        feat = jnp.max(v_cat * att[..., None], axis=(2, 3))      # [B, C, Dc]

    guidance = _broadcast_guidance(feat, h, w)
    return FusionOut(jnp.concatenate([guidance, x], axis=-1), match_loss, att,
                     match_ps)


def mixvis(x: jnp.ndarray, v: Optional[jnp.ndarray], *,
           att_type: str = "cos", rng: Optional[jax.Array] = None,
           option: Optional[str] = None,
           n_sources: int = 2, att_temp: float = 1.0) -> FusionOut:
    """MixVis fusion: a single mixture visual map (reference
    fusion_net.py:229-311).  Two-source only (engine guards num_mix);
    ``n_sources`` is accepted for a uniform fusion signature."""
    if v is None:
        return _ao_forward(x, rng, n_sources)
    vm = v[0]                                       # [B, H, W, Dc]
    B, h, w, D = x.shape
    C = 2
    Dc = D // C
    blocks = _pool_chunks(x, C)                     # [B, C, Dc]
    maps = _attend(blocks, vm[:, None], att_type, att_temp)  # [B, C, H, W]

    H, W = vm.shape[1], vm.shape[2]
    map_size = H * W  # reference fusion_net.py:258-259: per-source flat size
    flat = maps.reshape(B, C, H * W)
    max_ind = jnp.argmax(flat, axis=-1)
    v_flat = jnp.broadcast_to(vm.reshape(B, 1, H * W, Dc), (B, C, H * W, Dc))
    selected = jnp.take_along_axis(
        v_flat, max_ind[:, :, None, None], axis=2)[:, :, 0]  # [B, C, Dc]

    # match loss: -sum_c max(map_c) + area regularizer + cross-source cosine
    # penalty (reference fusion_net.py:267-275)
    scores = -jnp.max(maps, axis=(2, 3))            # [B, C]
    match_ps = (jnp.sum(scores, axis=-1)
                + jnp.sum(flat, axis=(1, 2)) / map_size
                + cosine_similarity(selected[:, 0], selected[:, 1],
                                    axis=1))        # [B]
    match_loss = jnp.mean(match_ps)

    guidance = _broadcast_guidance(selected, h, w)
    return FusionOut(jnp.concatenate([guidance, x], axis=-1), match_loss,
                     maps, match_ps)


def get_fusion(fusion_type: str):
    """Dispatch like reference ``get_fusion_net`` (fusion_net.py:7-18)."""
    if fusion_type in ("hidsep", "con_motion", "share", "CoLoc_ClipAtt"):
        return lambda x, v, **kw: coloc(x, v, select=False, **kw)
    if fusion_type == "CoLoc_Sel":
        return lambda x, v, **kw: coloc(x, v, select=True, **kw)
    if fusion_type == "MixVis":
        return mixvis
    raise ValueError(f"unknown fusion_type {fusion_type}")
