"""Golden parity: AudioUnet + CoLoc fusion vs the reference torch Unet
(reference models/audio_net.py + models/fusion_net.py), with weights
imported from a randomly-initialized reference state_dict."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from avsep_tpu.models.builder import ModelBuilder
from avsep_tpu.models.torch_import import unet_from_torch
from tests.reference_loader import load_reference_models

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier


@pytest.fixture(scope="module")
def ref_mods():
    return load_reference_models()


def _build_pair(ref_mods, att_type="sig", fusion_type="hidsep", fc_dim=2,
                num_downs=7, seed=0):
    audio_net = ref_mods[0]
    torch.manual_seed(seed)
    tnet = audio_net.Unet(fc_dim=fc_dim, num_downs=num_downs,
                          fusion_type=fusion_type, att_type=att_type)
    tnet.eval()
    jnet = ModelBuilder.build_sound(
        arch=f"unet{num_downs}", fc_dim=fc_dim, fusion_type=fusion_type,
        att_type=att_type)
    params, stats = unet_from_torch(tnet.state_dict(), num_downs=num_downs)
    return tnet, jnet, {"params": params, "batch_stats": stats}


def _rand_inputs(B=2, size=256, vis_ch=256, vh=14, C=2, seed=1):
    rs = np.random.RandomState(seed)
    x = rs.randn(B, 1, size, size).astype(np.float32)
    v = [rs.rand(B, vis_ch, vh, vh).astype(np.float32) for _ in range(C)]
    return x, v


def _to_jax(x, v):
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))          # NCHW -> NHWC
    vj = None
    if v is not None:
        vj = jnp.asarray(np.stack([m.transpose(0, 2, 3, 1) for m in v]))
    return xj, vj


@pytest.mark.parametrize("att_type", ["sig", "cos"])
def test_unet7_av_forward_parity(ref_mods, att_type):
    tnet, jnet, variables = _build_pair(ref_mods, att_type=att_type)
    x, v = _rand_inputs()
    with torch.no_grad():
        tout, (tmatch, tmaps) = tnet(torch.from_numpy(x),
                                     [torch.from_numpy(m) for m in v])
    xj, vj = _to_jax(x, v)
    jout, meta = jnet.apply(variables, xj, vj, train=False)
    ours = np.asarray(jout).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, tout.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(meta.match_loss), float(tmatch),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(meta.att_maps), tmaps.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_unet7_ao_forward_parity(ref_mods, monkeypatch):
    """AO path with the slot-shuffle coin pinned to identical draws."""
    tnet, jnet, variables = _build_pair(ref_mods)
    x, _ = _rand_inputs()

    key = jax.random.PRNGKey(42)
    # the fusion module draws uniform(B,) inside; replicate it here and feed
    # the identical values to torch.rand so both frameworks pick the same
    # slot permutation (reference fusion_net.py:96 vs fusion._random_slot_swap)
    coin = np.asarray(jax.random.uniform(key, (x.shape[0],)))

    real_rand = torch.rand

    def fake_rand(*shape, **kw):
        if shape == (x.shape[0],):
            return torch.from_numpy(coin)
        return real_rand(*shape, **kw)
    monkeypatch.setattr(torch, "rand", fake_rand)

    with torch.no_grad():
        tout, (tmatch, tmaps) = tnet(torch.from_numpy(x), None)
    assert tmatch is None and tmaps is None

    xj, _ = _to_jax(x, None)
    jout, meta = jnet.apply(variables, xj, None, train=False,
                            fusion_rng=key)
    assert meta.match_loss is None
    ours = np.asarray(jout).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, tout.numpy(), rtol=1e-3, atol=2e-3)


def test_unet5_shapes(ref_mods):
    tnet, jnet, variables = _build_pair(ref_mods, num_downs=5, fc_dim=2)
    x, v = _rand_inputs(B=1, size=64, vh=7)
    with torch.no_grad():
        tout, _ = tnet(torch.from_numpy(x), [torch.from_numpy(m) for m in v])
    xj, vj = _to_jax(x, v)
    jout, _ = jnet.apply(variables, xj, vj, train=False)
    assert jout.shape == (1, 64, 64, 2)
    np.testing.assert_allclose(np.asarray(jout).transpose(0, 3, 1, 2),
                               tout.numpy(), rtol=1e-3, atol=2e-3)


def test_coloc_sel_parity(ref_mods):
    tnet, jnet, variables = _build_pair(ref_mods, fusion_type="CoLoc_Sel",
                                        att_type="sig")
    x, v = _rand_inputs(seed=7)
    with torch.no_grad():
        tout, (tmatch, tmaps) = tnet(torch.from_numpy(x),
                                     [torch.from_numpy(m) for m in v])
    xj, vj = _to_jax(x, v)
    jout, meta = jnet.apply(variables, xj, vj, train=False)
    np.testing.assert_allclose(np.asarray(jout).transpose(0, 3, 1, 2),
                               tout.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(meta.match_loss), float(tmatch),
                               rtol=1e-4, atol=1e-5)


def test_mixvis_parity(ref_mods):
    tnet, jnet, variables = _build_pair(ref_mods, fusion_type="MixVis",
                                        att_type="sig")
    x, v = _rand_inputs(seed=8)
    vm = [np.concatenate(v, axis=-1)]  # single mixture map B,C,H,2W
    with torch.no_grad():
        tout, (tmatch, tmaps) = tnet(torch.from_numpy(x),
                                     [torch.from_numpy(vm[0])])
    xj, vj = _to_jax(x, vm)
    jout, meta = jnet.apply(variables, xj, vj, train=False)
    np.testing.assert_allclose(np.asarray(jout).transpose(0, 3, 1, 2),
                               tout.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(float(meta.match_loss), float(tmatch),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(meta.att_maps), tmaps.numpy(),
                               rtol=1e-4, atol=1e-5)
