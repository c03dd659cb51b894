"""Golden parity: losses + PIT vs the reference PyTorch criterion
(reference models/criterion.py, loaded read-only via reference_loader)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from avsep_tpu.models.criterion import (
    weighted_loss, multi_source_loss, pit_loss, reorder_sources)
from tests.reference_loader import load_reference_models


@pytest.fixture(scope="module")
def ref():
    audio_net, fusion_net, criterion, vision_net, synth = \
        load_reference_models()
    return criterion


def test_bce_matches_torch():
    rs = np.random.RandomState(0)
    p = rs.rand(4, 16, 16).astype(np.float32).clip(1e-4, 1 - 1e-4)
    t = (rs.rand(4, 16, 16) > 0.5).astype(np.float32)
    w = rs.rand(4, 16, 16).astype(np.float32)
    ref = TF.binary_cross_entropy(torch.from_numpy(p), torch.from_numpy(t),
                                  weight=torch.from_numpy(w)).item()
    ours = float(weighted_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w),
                               "bce"))
    assert abs(ours - ref) < 1e-6


def test_bce_gradient_finite_at_saturation():
    """d(bce)/d(pred) must stay finite at pred == 0/1 exactly.  The
    log-value clamp alone leaves a 0 * inf = NaN in the maximum VJP the
    moment a sigmoid saturates in f32 — which a converged easy dataset
    reaches (observed: toy flagship run NaN'd at iter ~1700)."""
    import jax

    t = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    p = jnp.asarray([0.0, 1.0, 1.0, 0.0])  # worst cases incl. exact-wrong
    g = jax.grad(lambda p: weighted_loss(p, t, None, "bce"))(p)
    assert np.all(np.isfinite(np.asarray(g)))
    # and the loss value still matches torch in the parity regime
    rs = np.random.RandomState(3)
    pr = rs.rand(64).astype(np.float32).clip(1e-6, 1 - 1e-6)
    tr = (rs.rand(64) > 0.5).astype(np.float32)
    ref = TF.binary_cross_entropy(torch.from_numpy(pr),
                                  torch.from_numpy(tr)).item()
    ours = float(weighted_loss(jnp.asarray(pr), jnp.asarray(tr), None,
                               "bce"))
    assert abs(ours - ref) < 1e-6


def test_multi_source_matches_reference_baseloss(ref):
    rs = np.random.RandomState(1)
    preds = [torch.rand(2, 1, 8, 8) for _ in range(2)]
    tgts = [(torch.rand(2, 1, 8, 8) > 0.5).float() for _ in range(2)]
    w = torch.rand(2, 1, 8, 8)
    ref_loss = ref.BCELoss()(preds, tgts, w).item()
    ours = float(multi_source_loss(
        jnp.asarray(np.stack([p.numpy() for p in preds])),
        jnp.asarray(np.stack([t.numpy() for t in tgts])),
        jnp.asarray(w.numpy()), "bce"))
    assert abs(ours - ref_loss) < 1e-6


@pytest.mark.parametrize("S", [2, 3])
def test_pit_matches_reference(ref, S):
    rs = np.random.RandomState(2 + S)
    B = 5
    p = rs.rand(B, 12, 10, S).astype(np.float32).clip(1e-4, 1 - 1e-4)
    t = (rs.rand(B, 12, 10, S) > 0.5).astype(np.float32)
    w = rs.rand(B, 12, 10, S).astype(np.float32)

    pit = ref.PitWrapper(TF.binary_cross_entropy)
    ref_loss, ref_perms = pit(torch.from_numpy(p), torch.from_numpy(t),
                              torch.from_numpy(w))
    loss, perm = pit_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w),
                          kind="bce")
    np.testing.assert_allclose(np.asarray(loss), ref_loss.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(perm),
                                  np.asarray([list(q) for q in ref_perms]))


def test_reorder_matches_reference(ref):
    rs = np.random.RandomState(9)
    x = rs.rand(4, 6, 5, 3).astype(np.float32)
    perms = [(2, 0, 1), (0, 1, 2), (1, 2, 0), (2, 1, 0)]
    pit = ref.PitWrapper(TF.binary_cross_entropy)
    ref_re = pit.reorder_tensor(torch.from_numpy(x), perms).numpy()
    ours = np.asarray(reorder_sources(jnp.asarray(x), jnp.asarray(perms)))
    np.testing.assert_allclose(ours, ref_re, rtol=0, atol=0)


def test_pit_perfect_permutation_zero_loss():
    # the reference docstring example (criterion.py:96-104), in l2
    rs = np.random.RandomState(10)
    t = rs.rand(2, 32, 4).astype(np.float32)
    p = t[..., (3, 0, 2, 1)]
    loss, perm = pit_loss(jnp.asarray(p), jnp.asarray(t), None, kind="l2")
    np.testing.assert_allclose(np.asarray(loss), 0.0, atol=1e-7)
    re = reorder_sources(jnp.asarray(p), perm)
    np.testing.assert_allclose(np.asarray(re), t, atol=0)
