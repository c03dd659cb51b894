"""Golden parity: SoP++ BasisUnet and attention modules vs the reference
SoP++ tree (reference SoP++/audio_net.py, SoP++/attention_net.py)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from avsep_tpu.models.sop import BasisUnet, att_model, match_att
from avsep_tpu.models.torch_import import unet_from_torch
from tests.reference_loader import load_reference_sop

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier


@pytest.fixture(scope="module")
def sop():
    return load_reference_sop()


def test_basis_unet_parity(sop):
    sop_audio, _ = sop
    torch.manual_seed(0)
    tnet = sop_audio.Unet(fc_dim=32, num_downs=7, extra_size=16).eval()
    params, stats = unet_from_torch(tnet.state_dict(), num_downs=7)
    jnet = BasisUnet(fc_dim=32, num_downs=7, extra_size=16, n_sources=2)

    x = np.random.RandomState(0).randn(2, 1, 256, 256).astype(np.float32)
    with torch.no_grad():
        tout, (tmeta,) = tnet(torch.from_numpy(x))
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    jout, jmeta = jnet.apply({"params": params, "batch_stats": stats}, xj,
                             train=False)
    np.testing.assert_allclose(np.asarray(jout).transpose(0, 3, 1, 2),
                               tout.numpy(), rtol=1e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(jmeta).transpose(0, 3, 1, 2),
                               tmeta.numpy(), rtol=1e-3, atol=2e-3)


def _rand_att_inputs(seed=0, B=3, C=2, D=16, h=2, w=2, H=7, W=7):
    rs = np.random.RandomState(seed)
    aud = [rs.randn(B, D, h, w).astype(np.float32) for _ in range(C)]
    mix = rs.rand(B, D, H, W).astype(np.float32)
    sep = [rs.rand(B, D, H, W).astype(np.float32) for _ in range(C)]
    return aud, mix, sep


def _to_jax_feats(lst):
    return jnp.asarray(np.stack([a.transpose(0, 2, 3, 1) for a in lst]))


@pytest.mark.parametrize("att_type", ["cos", "sig"])
@pytest.mark.parametrize("which", ["Base", "MatchAtt"])
def test_attention_parity(sop, att_type, which):
    _, sop_att = sop
    tmod = (sop_att.AttModel if which == "Base"
            else sop_att.MatchAtt)(att_type=att_type)
    jfn = att_model if which == "Base" else match_att
    aud, mix, sep = _rand_att_inputs()
    taud = [torch.from_numpy(a) for a in aud]
    tmix = torch.from_numpy(mix)
    tsep = [torch.from_numpy(s) for s in sep]

    # --- train forward (full PIT path)
    with torch.no_grad():
        t_ctx, t_meta = tmod(taud, tmix, tsep)
    out = jfn(_to_jax_feats(aud),
              jnp.asarray(mix.transpose(0, 2, 3, 1)),
              _to_jax_feats(sep), att_type=att_type)
    np.testing.assert_allclose(np.asarray(out.ctx_feats), t_ctx.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.match_loss), float(t_meta[0]),
                               rtol=1e-4, atol=1e-5)
    if which == "Base":
        np.testing.assert_allclose(float(out.reg_loss), float(t_meta[1]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.att_maps),
                                   t_meta[2].numpy(), rtol=1e-4, atol=1e-5)

    # --- inference forward (no separated feats)
    with torch.no_grad():
        t_ctx2, (t_reg2, t_maps2) = tmod(taud, tmix, None)
    out2 = jfn(_to_jax_feats(aud),
               jnp.asarray(mix.transpose(0, 2, 3, 1)), None,
               att_type=att_type)
    np.testing.assert_allclose(np.asarray(out2.ctx_feats), t_ctx2.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out2.reg_loss), float(t_reg2),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out2.att_maps), t_maps2.numpy(),
                               rtol=1e-4, atol=1e-5)

    # --- audio-only forward
    with torch.no_grad():
        t_ctx3, t_none = tmod(taud, None, None)
    out3 = jfn(_to_jax_feats(aud), None, None, att_type=att_type)
    assert t_none is None and out3.match_loss is None
    np.testing.assert_allclose(np.asarray(out3.ctx_feats), t_ctx3.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sop_forward_stages(sop):
    """End-to-end sop_forward stages 1-3 + AO on tiny shapes."""
    from avsep_tpu.config import Config
    from avsep_tpu.engine import Nets
    from avsep_tpu.models.resnet import FrameEncoder
    from avsep_tpu.models.synthesizer import InnerProd
    from avsep_tpu.sop_engine import SopNets, sop_forward, stage_for_iter

    assert stage_for_iter(5, (10, 20, 30)) == 1
    assert stage_for_iter(15, (10, 20, 30)) == 2
    assert stage_for_iter(25, (10, 20, 30)) == 3

    audlen = 64 * 256 - 1
    cfg = Config(arch_sound="unet5", num_channels=16, vis_channels=16,
                 extra_size=16, fusion_type="Base", att_type="cos",
                 loss="bce", binary_mask=1, weighted_loss=1, num_mix=2,
                 audLen=audlen, imgSize=64, one_frame=True,
                 not_pool_vis=False, img_activation="relu",
                 sound_activation="no", output_activation="sigmoid",
                 match_weight=0.1)
    nets = SopNets(
        BasisUnet(fc_dim=16, num_downs=5, ngf=8, extra_size=16),
        FrameEncoder(fc_dim=16, pool_type="maxpool", dilate_scale=16),
        InnerProd(fc_dim=16), None)

    rng = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(rng, 3)
    sound_vars = nets.sound.init(k1, jnp.zeros((1, 256, 64, 1)),
                                 train=False)
    frame_vars = nets.frame.init(k2, jnp.zeros((1, 1, 64, 64, 3)),
                                 pool=False, train=False)
    synth_vars = nets.synthesizer.init(
        k3, jnp.zeros((1, 16)), jnp.zeros((1, 8, 8, 16)))
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"],
              "synthesizer": synth_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}

    rs = np.random.RandomState(0)
    batch = {
        "audios": jnp.asarray(rs.randn(2, 2, audlen).astype(np.float32)
                              * 0.1),
        "audio_mix": jnp.asarray(rs.randn(2, audlen).astype(np.float32)
                                 * 0.1),
        "frames": jnp.asarray(rs.rand(2, 2, 1, 64, 64, 3)
                              .astype(np.float32)),
    }
    for stage in (1, 2, 3):
        err, (_, outputs) = sop_forward(nets, params, stats, batch, cfg,
                                        jax.random.PRNGKey(1), True, False,
                                        stage)
        assert np.isfinite(float(err)), f"stage {stage}"
        assert outputs["pred_masks"].shape == (2, 2, 256, 64)
    err, (_, outputs) = sop_forward(nets, params, stats, batch, cfg,
                                    jax.random.PRNGKey(1), False, False)
    assert np.isfinite(float(err))
