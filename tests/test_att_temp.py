"""Attention-temperature knob (models/fusion.py::_attend att_temp).

TPU-native diagnostic addition for the pointing-game sweep (VERDICT r4
#5): the reference's attention (fusion_net.py:27-33) has no temperature;
``att_temp=1.0`` must therefore be bit-identical to the pre-knob
behavior, and temp != 1 must transform the scores exactly as documented
(logit/temp for 'sig', score/temp for 'cos') without moving argmax
locations.
"""

import numpy as np

import jax
import jax.numpy as jnp

from avsep_tpu.models.fusion import _attend, coloc


def _inputs(seed=0, B=2, C=2, Dc=16, H=5, W=7):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.randn(B, C, Dc).astype(np.float32))
    v = jnp.asarray(rs.randn(B, C, H, W, Dc).astype(np.float32))
    return x, v


def test_temp_one_is_identity():
    x, v = _inputs()
    for att_type in ("cos", "sig"):
        base = _attend(x, v, att_type)
        temp1 = _attend(x, v, att_type, att_temp=1.0)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(temp1))


def test_sig_temp_scales_logits():
    x, v = _inputs(1)
    d = x.shape[-1]
    logits = jnp.sum(x[..., None, None, :] * v / jnp.sqrt(float(d)), axis=-1)
    for temp in (0.5, 2.0):
        got = _attend(x, v, "sig", att_temp=temp)
        want = jax.nn.sigmoid(logits / temp)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)
    # temp < 1 sharpens: scores move away from 0.5
    base = np.asarray(_attend(x, v, "sig"))
    sharp = np.asarray(_attend(x, v, "sig", att_temp=0.5))
    assert np.all(np.abs(sharp - 0.5) >= np.abs(base - 0.5) - 1e-6)


def test_cos_temp_rescales_without_moving_argmax():
    x, v = _inputs(2)
    base = np.asarray(_attend(x, v, "cos"))
    scaled = np.asarray(_attend(x, v, "cos", att_temp=0.25))
    np.testing.assert_allclose(scaled, base / 0.25, rtol=1e-6, atol=1e-7)
    B, C, H, W = base.shape
    assert np.array_equal(base.reshape(B, C, -1).argmax(-1),
                          scaled.reshape(B, C, -1).argmax(-1))


def test_coloc_threads_temp_and_keeps_attention_argmax():
    rs = np.random.RandomState(3)
    B, D, h, w = 2, 64, 2, 2
    xb = jnp.asarray(rs.randn(B, h, w, D).astype(np.float32))
    v = jnp.asarray(rs.randn(2, B, 6, 6, D // 2).astype(np.float32))
    base = coloc(xb, v, att_type="sig")
    warm = coloc(xb, v, att_type="sig", att_temp=2.0)
    att_b = np.asarray(base.att_maps).reshape(B, 2, -1)
    att_w = np.asarray(warm.att_maps).reshape(B, 2, -1)
    assert not np.allclose(att_b, att_w)          # the knob is live
    # monotone transform of the per-pixel logits -> same argmax pixel
    assert np.array_equal(att_b.argmax(-1), att_w.argmax(-1))


def test_config_flag_parses():
    from avsep_tpu.config import parse_args
    cfg = parse_args(["--mode", "train", "--att_temp", "0.5"])
    assert cfg.att_temp == 0.5
