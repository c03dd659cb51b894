"""Serving layer (avsep_tpu/serve.py): dynamic batching correctness,
padded-batch determinism, AV/AO request grouping, TCP wire round trip.

Runs the tiny model on the CPU platform; the service's single compiled
program per branch means results must be bit-identical to a direct
``engine.separate`` call on the same padded batch with the same rng.
"""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from avsep_tpu.engine import separate
from avsep_tpu.serve import (
    SeparationService, separate_remote, serve_forever, server_stats)
from tests.test_train_step import tiny_cfg, tiny_nets

AUDLEN = 64 * 256 - 1


@pytest.fixture(scope="module")
def model():
    cfg = tiny_cfg()
    nets = tiny_nets(cfg)
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    sound_vars = nets.sound.init(k1, jnp.zeros((2, 256, 64, 1)),
                                 jnp.zeros((2, 2, 4, 4, 32)), train=False)
    frame_vars = nets.frame.init(k2, jnp.zeros((2, 1, 64, 64, 3)),
                                 pool=False, train=False)
    params = {"sound": sound_vars["params"],
              "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}
    return cfg, nets, params, stats


def mixes(n, seed=0):
    rs = np.random.RandomState(seed)
    return [(0.3 * np.sin(2 * np.pi * (200 + 50 * i)
                          * np.arange(AUDLEN) / 11025)
             + 0.05 * rs.randn(AUDLEN)).astype(np.float32)
            for i in range(n)]


def test_service_matches_direct_padded_call(model):
    """Service output == direct separate() on the same padded batch with
    the same rng (one program, one shape — bit-identical)."""
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=4,
                            max_wait_ms=50.0, rng_seed=7)
    try:
        reqs = mixes(3)
        futs = [svc.submit(m) for m in reqs]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        svc.close()

    padded = np.zeros((4, AUDLEN), np.float32)
    for i, m in enumerate(reqs):
        padded[i] = np.clip(m, -1, 1)
    _, sub = jax.random.split(jax.random.PRNGKey(7))
    direct = np.asarray(jax.device_get(separate(
        nets, params, stats, jnp.asarray(padded), None, cfg,
        rng=sub)["wavs"]))
    for i, out in enumerate(outs):
        assert out.shape == direct[i].shape
        np.testing.assert_array_equal(out, direct[i])


def test_dynamic_batching_coalesces(model):
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=4,
                            max_wait_ms=500.0)
    try:
        futs = [svc.submit(m) for m in mixes(4, seed=1)]
        for f in futs:
            assert np.isfinite(f.result(timeout=300)).all()
        snap = svc.stats.snapshot()
    finally:
        svc.close()
    assert snap["requests"] == 4
    assert snap["dispatches"] == 1, "4 requests should coalesce"
    assert snap["mean_batch"] == 4.0


def test_av_and_ao_groups(model):
    """Frames and no-frames requests in one wave are dispatched as two
    groups through their own compiled programs."""
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=4,
                            max_wait_ms=500.0)
    try:
        rs = np.random.RandomState(3)
        frames = rs.rand(2, 1, 64, 64, 3).astype(np.float32)
        f_av = svc.submit(mixes(1, seed=2)[0], frames=frames)
        f_ao = svc.submit(mixes(1, seed=4)[0])
        out_av = f_av.result(timeout=600)
        out_ao = f_ao.result(timeout=600)
    finally:
        svc.close()
    assert out_av.shape == out_ao.shape
    assert np.isfinite(out_av).all() and np.isfinite(out_ao).all()
    assert not np.array_equal(out_av, out_ao)


def test_error_propagates_to_future(model):
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=2,
                            max_wait_ms=1.0)
    try:
        # a dispatch-time failure (device error, OOM, ...) must be
        # delivered on the future, not hang it; malformed frames are
        # already rejected at submit (test_bad_frames_shape_rejected)
        def boom(*a, **k):
            raise RuntimeError("injected dispatch failure")
        svc._run_ao = boom
        fut = svc.submit(mixes(1)[0])
        with pytest.raises(RuntimeError, match="injected"):
            fut.result(timeout=300)
    finally:
        svc.close()


def test_submit_after_close_raises(model):
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(mixes(1)[0])


def test_tcp_round_trip(model):
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=2,
                            max_wait_ms=2.0)
    server = serve_forever(svc, port=0)
    host, port = server.server_address
    try:
        results = {}

        def call(i):
            results[i] = separate_remote(host, port, mixes(1, seed=i)[0])

        threads = [threading.Thread(target=call, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert set(results) == {0, 1, 2}
        for out in results.values():
            assert out.shape[0] == cfg.num_mix
            assert np.isfinite(out).all()
        snap = server_stats(host, port)
        assert snap["ok"] and snap["requests"] >= 3
    finally:
        server.shutdown()
        svc.close()


def test_int16_wire_close_to_f32(model):
    """wire=int16 halves host<->device transfer bytes; outputs must match
    the f32 service to quantization accuracy.  Input quantization can
    flip a borderline binary-mask bin, so the assertion is SNR-based
    (>30 dB against the f32 output) rather than elementwise."""
    cfg, nets, params, stats = model
    req = mixes(2, seed=9)
    outs = {}
    for wire in ("f32", "int16"):
        svc = SeparationService(cfg, nets, params, stats, max_batch=2,
                                max_wait_ms=200.0, rng_seed=11, wire=wire)
        try:
            futs = [svc.submit(m) for m in req]
            outs[wire] = [f.result(timeout=300) for f in futs]
        finally:
            svc.close()
    for a, b in zip(outs["f32"], outs["int16"]):
        assert b.dtype == np.float32 and np.abs(b).max() <= 1.0
        diff = np.linalg.norm(a - b)
        snr = 20 * np.log10(np.linalg.norm(a) / max(diff, 1e-12))
        assert snr > 30.0, f"int16 wire SNR {snr:.1f} dB"


def test_close_fails_pending_futures(model):
    """Queued-but-undispatched requests must resolve with an error on
    close(), never hang (review finding: the worker exited on _stop
    without draining the queue)."""
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=2,
                            max_wait_ms=5000.0)
    # the worker collects the 1st wave and parks on the wait deadline;
    # close() fires before dispatch
    futs = [svc.submit(m) for m in mixes(3, seed=12)]
    svc.close()
    resolved = 0
    for f in futs:
        try:
            f.result(timeout=60)
            resolved += 1
        except RuntimeError:
            resolved += 1
    assert resolved == 3, "every future must resolve (result or error)"


def test_bad_frames_shape_rejected_at_submit(model):
    """Shape validation at submit keeps one compiled AV program and
    stops a malformed request from poisoning a batched wave."""
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats)
    try:
        with pytest.raises(ValueError):
            svc.submit(mixes(1)[0],
                       frames=np.zeros((2, 1, 32, 32, 3), np.float32))
        assert svc.frames_shape == (2, 1, 64, 64, 3)
    finally:
        svc.close()


def test_tcp_connection_survives_request_error(model):
    """A request-level failure is reported in-band and the (framing-
    synchronized) connection keeps serving (review finding: the handler
    used to close the socket after any error)."""
    import socket as _socket

    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=2,
                            max_wait_ms=2.0)
    server = serve_forever(svc, port=0)
    host, port = server.server_address
    sock = _socket.create_connection((host, port))
    try:
        with pytest.raises(RuntimeError, match="server error"):
            separate_remote(host, port, mixes(1)[0],
                            frames=np.zeros((3, 3), np.float32),
                            sock=sock)
        out = separate_remote(host, port, mixes(1)[0], sock=sock)
        assert out.shape[0] == cfg.num_mix
    finally:
        sock.close()
        server.shutdown()
        svc.close()


def test_av_frames_are_imagenet_normalized(model):
    """The serving contract is frames in [0,1]; the model was trained on
    ImageNet-normalized inputs, so the service must apply the same
    normalization on device (review finding: float frames pass through
    engine.normalize_frames unchanged, so served AV requests used to feed
    the vision net raw pixels).  Service output must equal a direct
    separate() call on explicitly normalized frames, and a uint8 submit
    must match its float/255 equivalent."""
    from avsep_tpu.engine import _IMAGENET_MEAN, _IMAGENET_STD

    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=1,
                            max_wait_ms=1.0, rng_seed=3)
    try:
        mix = mixes(1, seed=5)[0]
        rs = np.random.RandomState(11)
        frames_u8 = rs.randint(0, 256, size=svc.frames_shape,
                               dtype=np.uint8)
        frames = frames_u8.astype(np.float32) / 255.0
        got = svc.submit(mix, frames=frames).result(timeout=300)

        m = np.zeros(cfg.audLen, np.float32)
        m[:len(mix)] = np.clip(mix[:cfg.audLen], -1, 1)
        f_norm = (frames - _IMAGENET_MEAN) / _IMAGENET_STD
        want = np.asarray(separate(
            nets, params, stats, jnp.asarray(m[None]),
            jnp.asarray(f_norm[None]), cfg,
            rng=jax.random.fold_in(jax.random.PRNGKey(3), 1))["wavs"][0])
        # same compiled math modulo batching plumbing
        assert np.allclose(got, want, atol=1e-5), (
            np.abs(got - want).max())

        got_u8 = svc.submit(mix, frames=frames_u8).result(timeout=300)
        assert np.allclose(got_u8, got, atol=1e-5)
    finally:
        svc.close()


def test_u8_frames_wire_matches_f32(model):
    """uint8 frames over TCP (1/4 the AV request bytes) must produce the
    same wavs as the f32 wire carrying the identical /255 values."""
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=1,
                            max_wait_ms=1.0)
    server = serve_forever(svc, port=0)
    host, port = server.server_address
    try:
        mix = mixes(1, seed=9)[0]
        rs = np.random.RandomState(3)
        f_u8 = rs.randint(0, 256, size=svc.frames_shape, dtype=np.uint8)
        out_u8 = separate_remote(host, port, mix, frames=f_u8)
        out_f32 = separate_remote(host, port, mix,
                                  frames=f_u8.astype(np.float32) / 255.0)
        assert out_u8.shape[0] == cfg.num_mix
        assert np.allclose(out_u8, out_f32, atol=1e-6)
    finally:
        server.shutdown()
        svc.close()


def test_frames_wire_u8_service_matches_f32(model):
    """frames_wire="u8" (uint8 host->device, /255 fused into the device
    program) must match the f32-wire service on 8-bit-exact inputs."""
    cfg, nets, params, stats = model
    mix = mixes(1, seed=21)[0]
    rs = np.random.RandomState(13)

    def serve_once(frames_wire, frames):
        svc = SeparationService(cfg, nets, params, stats, max_batch=1,
                                max_wait_ms=1.0, rng_seed=5,
                                frames_wire=frames_wire)
        try:
            return svc.submit(mix, frames=frames).result(timeout=300)
        finally:
            svc.close()

    probe = SeparationService(cfg, nets, params, stats)
    shape = probe.frames_shape
    probe.close()
    f_u8 = rs.randint(0, 256, size=shape, dtype=np.uint8)
    out_u8 = serve_once("u8", f_u8)
    out_f32 = serve_once("f32", f_u8.astype(np.float32) / 255.0)
    assert np.allclose(out_u8, out_f32, atol=1e-5)


def test_integer_nonuint8_frames_rejected(model):
    """int16/int32 frames are ambiguous-scale; submit must reject them
    rather than silently binarizing via the [0,1] clip (review finding)."""
    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, frames_wire="u8")
    try:
        bad = np.random.RandomState(0).randint(
            0, 256, size=svc.frames_shape).astype(np.int32)
        with pytest.raises(ValueError, match="uint8 .* or float"):
            svc.submit(mixes(1)[0], frames=bad)
    finally:
        svc.close()


def test_tcp_truncated_payload_rejected(model):
    """A header whose `n` promises more samples than the payload ships
    must get an in-band ok=False reply, not ok=True separations of a
    zero-filled mixture (review finding: frombuffer silently shortened
    the mix and submit() zero-padded it).  The connection stays usable."""
    import socket as _socket

    from avsep_tpu.serve import _recv_msg, _send_msg

    cfg, nets, params, stats = model
    svc = SeparationService(cfg, nets, params, stats, max_batch=1,
                            max_wait_ms=2.0)
    server = serve_forever(svc, port=0)
    host, port = server.server_address
    sock = _socket.create_connection((host, port))
    try:
        mix = mixes(1)[0]
        short = mix[:100].astype(np.float32).tobytes()  # lies: n says full
        _send_msg(sock, {"op": "separate", "n": int(mix.shape[0]),
                         "payload_bytes": len(short)}, short)
        header, _ = _recv_msg(sock)
        assert header["ok"] is False
        assert "expected" in header["error"]
        # framing is intact: a well-formed request still succeeds
        out = separate_remote(host, port, mix, sock=sock)
        assert out.shape[0] == cfg.num_mix
    finally:
        sock.close()
        server.shutdown()
        svc.close()
