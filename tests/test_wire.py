"""int16 audio wire (data/wire.py): lossless-enough, loop-integrated.

The reference ships f32 tensors over PCIe where the wire never matters
(main.py:633-657 DataLoader semantics); on tunneled TPU hosts the wire
is the in-situ bottleneck (BENCH_NOTES.md), so ``--audio_wire int16``
halves the audio bytes.  These tests pin (a) the round-trip SNR, (b)
exact-zero preservation for silent sources, (c) that a full AV train
step under the int16 wire matches the f32-wire step's loss closely and
trains, and (d) flag validation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.data.wire import audios_of, encode_audio_wire
from avsep_tpu.engine import forward
from tests.test_train_step import clone, setup, tiny_batch  # noqa: F401


class _WireCfg:
    def __init__(self, kind):
        self.audio_wire = kind


def test_round_trip_snr_above_80db():
    rs = np.random.RandomState(0)
    a = (rs.randn(4, 2, 65535).astype(np.float32) * 0.1)
    dev = encode_audio_wire({"audios": a}, _WireCfg("int16"))
    assert "audios" not in dev
    assert dev["audios_i16"].dtype == np.int16
    assert dev["audio_gain"].shape == (4, 2)
    back = np.asarray(audios_of({k: jnp.asarray(v) for k, v in dev.items()}))
    err = back - a
    snr = 10 * np.log10(np.sum(a ** 2) / np.sum(err ** 2))
    assert snr > 80.0, f"int16 wire SNR {snr:.1f} dB"


def test_silent_source_stays_exact_zero():
    a = np.zeros((2, 2, 1024), np.float32)
    a[0, 0] = np.sin(np.linspace(0, 40, 1024)).astype(np.float32)
    dev = encode_audio_wire({"audios": a}, _WireCfg("int16"))
    back = np.asarray(audios_of({k: jnp.asarray(v) for k, v in dev.items()}))
    assert np.all(back[0, 1] == 0.0)
    assert np.all(back[1] == 0.0)


def test_f32_wire_is_passthrough():
    a = np.ones((1, 2, 8), np.float32)
    dev = encode_audio_wire({"audios": a}, _WireCfg("f32"))
    assert dev["audios"] is a


def test_bad_wire_kind_raises():
    with pytest.raises(ValueError):
        encode_audio_wire({"audios": np.zeros((1, 2, 8), np.float32)},
                          _WireCfg("int8"))


def test_av_forward_matches_f32_wire(setup):  # noqa: F811
    """Loss under the int16 wire tracks the f32-wire loss closely."""
    cfg, nets, state = setup
    batch = tiny_batch(cfg)
    host = {k: np.asarray(v) for k, v in batch.items()}
    host.pop("audio_mix")  # rebuilt on device, like the live loaders
    q = encode_audio_wire(host, cfg.replace(audio_wire="int16"))
    dev_q = {k: jnp.asarray(v) for k, v in q.items()}

    rng = jax.random.PRNGKey(1)
    err_f32, (_, out_f32) = forward(nets, state.params, state.batch_stats,
                                    batch, cfg, rng, use_vis=True,
                                    train=False)
    err_i16, (_, out_i16) = forward(nets, state.params, state.batch_stats,
                                    dev_q, cfg, rng, use_vis=True,
                                    train=False)
    assert np.isfinite(float(err_i16))
    assert abs(float(err_f32) - float(err_i16)) < 1e-3
    # gt masks from quantized sources agree almost everywhere (the only
    # flips sit on exact mask-threshold ties)
    agree = np.mean(np.asarray(out_f32["gt_masks"])
                    == np.asarray(out_i16["gt_masks"]))
    assert agree > 0.999


def test_train_step_runs_under_int16_wire(setup):  # noqa: F811
    from avsep_tpu.parallel.mesh import make_mesh, shard_batch, shard_tree
    from avsep_tpu.train import make_train_step

    cfg, nets, state0 = setup
    cfg = cfg.replace(audio_wire="int16")
    mesh = make_mesh(8)
    state = shard_tree(clone(state0), mesh)
    host = {k: np.asarray(v) for k, v in tiny_batch(cfg).items()}
    host.pop("audio_mix")
    dev = shard_batch(encode_audio_wire(host, cfg), mesh)
    step = make_train_step(cfg, nets, use_vis=True)
    state, m = step(state, dev, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["err"]))
    assert int(state.step) == 1
