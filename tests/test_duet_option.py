"""CoLoc 'duet' option parity: the two frame maps concatenated along a
random spatial dim and reused for both slots (reference fusion_net.py:83-90,
AV_forward(option='duet')), with the concat coin pinned across frameworks."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_loader import load_reference_models
from tests.test_unet_parity import _build_pair, _rand_inputs, _to_jax


@pytest.fixture(scope="module")
def ref_mods():
    return load_reference_models()


@pytest.mark.parametrize("axis_opt,torch_coin", [("duet_h", 0.9),
                                                 ("duet_w", 0.1)])
def test_duet_option_parity(ref_mods, monkeypatch, axis_opt, torch_coin):
    """Fusion-level comparison on bottleneck tensors: reference coin > 0.5
    -> concat dim 2 (H); our static options mirror both outcomes."""
    # pin the reference's host coin (fusion_net.py:88)
    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if shape == (1,):
            return torch.tensor([torch_coin])
        return real_rand(*shape, **kw)
    monkeypatch.setattr(torch, "rand", fake_rand)

    from avsep_tpu.models.fusion import coloc
    ref_fusion_mod = ref_mods[1].CoLoc(att_type="sig")
    B, D, h, w = 2, 512, 2, 2
    rs = np.random.RandomState(4)
    xb = rs.randn(B, D, h, w).astype(np.float32)
    vmaps = [rs.rand(B, 256, 14, 14).astype(np.float32) for _ in range(2)]

    with torch.no_grad():
        t_out, (t_match, t_maps) = ref_fusion_mod(
            torch.from_numpy(xb), [torch.from_numpy(m) for m in vmaps],
            option="duet")

    out = coloc(jnp.asarray(xb.transpose(0, 2, 3, 1)),
                jnp.asarray(np.stack([m.transpose(0, 2, 3, 1)
                                      for m in vmaps])),
                att_type="sig", option=axis_opt)
    got = np.asarray(out.features).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, t_out.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.match_loss), float(t_match),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.att_maps), t_maps.numpy(),
                               rtol=1e-4, atol=1e-5)
