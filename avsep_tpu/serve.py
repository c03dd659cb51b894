"""Production separation serving: dynamic batching + TCP front-end.

No reference equivalent (the reference's only serving surface is the
offline demo ``inference.py``); this is the deployment-shaped layer a
production user expects: a resident model with requests batched onto the
accelerator.

TPU-native design decisions:

* **One compiled program.**  Requests are padded to a fixed
  ``max_batch`` so every dispatch reuses a single jitted executable —
  dynamic batch shapes would recompile per size class (XLA traces once
  per shape).  Padding rows are sliced off before reply.
* **Dynamic batching.**  A collector thread takes the first pending
  request, then drains the queue until ``max_batch`` requests are in
  hand or ``max_wait_ms`` has elapsed — the standard
  latency/throughput knob (max_wait 0 = latency-optimal, large =
  throughput-optimal).  AO requests and AV requests (with frames) form
  separate groups, one compiled program each.
* **Host/device split.**  The wire and padding stay on host numpy; the
  whole DSP+model pipeline (STFT -> warp -> U-Net [-> CoLoc fusion] ->
  masks -> iSTFT) is the fused on-device ``engine.separate`` program —
  identical math to the eval/demo paths (reference inference.py:39-86,
  :433-491).

In-process use::

    svc = SeparationService(cfg, nets, params, batch_stats)
    fut = svc.submit(mix_f32)            # [L] -> Future
    wavs = fut.result()                  # [N, L']

Network use (length-prefixed JSON+raw-f32 protocol, stdlib only)::

    python -m avsep_tpu.serve --port 7860 --ckpt ./ckpt --id RUN &
    wavs = separate_remote("127.0.0.1", 7860, mix_f32)
"""

from __future__ import annotations

import json
import os
import queue
import socket
import socketserver
import struct
import threading
import time
from concurrent.futures import Future
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from avsep_tpu.config import Config
from avsep_tpu.engine import Nets, separate


class ServiceStats:
    """Requests/dispatches/latency accounting (observability)."""

    def __init__(self):
        self.lock = threading.Lock()
        self.requests = 0
        self.dispatches = 0
        self.batched_rows = 0
        self.latencies_ms = []

    def record(self, n_rows: int, lat_ms: float):
        with self.lock:
            self.dispatches += 1
            self.batched_rows += n_rows
            self.latencies_ms.append(lat_ms)
            if len(self.latencies_ms) > 4096:
                del self.latencies_ms[:2048]

    def snapshot(self) -> Dict:
        with self.lock:
            lat = sorted(self.latencies_ms)
            pct = (lambda p: lat[min(len(lat) - 1,
                                     int(p * len(lat)))] if lat else 0.0)
            return {"requests": self.requests,
                    "dispatches": self.dispatches,
                    "mean_batch": (self.batched_rows
                                   / max(self.dispatches, 1)),
                    "p50_ms": pct(0.50), "p95_ms": pct(0.95)}


class SeparationService:
    """Resident separation model with dynamic request batching."""

    def __init__(self, cfg: Config, nets: Nets, params, batch_stats,
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 rng_seed: int = 0, wire: str = "f32",
                 frames_wire: str = "f32"):
        if wire not in ("f32", "int16"):
            raise ValueError(f"wire must be f32 or int16, got {wire!r}")
        if frames_wire not in ("f32", "u8"):
            raise ValueError(
                f"frames_wire must be f32 or u8, got {frames_wire!r}")
        self.cfg = cfg
        self.max_batch = int(max_batch)
        self.max_wait_s = float(max_wait_ms) / 1e3
        self.wire = wire
        self.frames_wire = frames_wire
        self.stats = ServiceStats()
        self._q: "queue.Queue" = queue.Queue()
        self._stop = threading.Event()
        self._rng = jax.random.PRNGKey(rng_seed)

        def jit_branch(with_frames: bool):
            # wire="int16": audio crosses the host<->device boundary as
            # int16 (mixes are clipped to [-1,1], so a fixed 32767 scale
            # is exact to ~90 dB SNR) and de/re-quantization fuses into
            # the device program — halves the transfer bytes on hosts
            # where the wire dominates dispatch (the tunnel measurement
            # in BENCH_NOTES.md "Serving layer").  Same idea as the
            # training loader's --audio_wire (data/wire.py); opt-in, the
            # default f32 wire is bit-exact.
            def run(a, f, rng):
                if self.wire == "int16":
                    a = a.astype(jnp.float32) / 32767.0
                if f is not None:
                    # the serving contract is RGB in [0,1]; the model was
                    # trained on ImageNet-normalized inputs (the dataset
                    # wire is uint8, normalized on device by
                    # engine.normalize_frames' uint8 branch — float
                    # inputs pass through it unchanged, so the service
                    # must normalize [0,1] floats itself or AV requests
                    # silently feed the vision net raw pixels.
                    # frames_wire="u8": the batch crosses the
                    # host<->device boundary as uint8 (1/4 the bytes,
                    # same idea as wire="int16"); normalize_frames'
                    # uint8 branch does /255 + normalize downstream.
                    # NOTE (compat): pre-round-3 services lacked this
                    # normalization — clients that pre-normalized frames
                    # to compensate must switch to the [0,1] contract.
                    from avsep_tpu.engine import imagenet_normalize
                    if self.frames_wire != "u8":
                        f = imagenet_normalize(f)
                wavs = separate(nets, params, batch_stats, a, f, cfg,
                                rng=rng)["wavs"]
                if self.wire == "int16":
                    wavs = jnp.rint(wavs * 32767.0).astype(jnp.int16)
                return wavs
            return jax.jit(lambda a, rng: run(a, None, rng)) \
                if not with_frames else jax.jit(run)

        self._run_ao = jit_branch(False)
        self._run_av = jit_branch(True)
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    # ------------------------------------------------------------- client
    @property
    def frames_shape(self):
        """The ONE accepted frames shape per request.  Enforcing it at
        submit keeps the AV branch a single compiled program (jax.jit
        retraces per shape) and stops one client's malformed request
        from poisoning a batched wave."""
        T = 1 if self.cfg.one_frame else self.cfg.num_frames
        return (self.cfg.num_mix, T, self.cfg.imgSize, self.cfg.imgSize,
                3)

    def submit(self, audio_mix: np.ndarray,
               frames: Optional[np.ndarray] = None) -> Future:
        """audio_mix [L] float32 (truncated/zero-padded to cfg.audLen);
        frames ``self.frames_shape`` RGB in [0,1] float32 (uint8 [0,255]
        also accepted) for visually-guided separation, or None for
        audio-only.  ImageNet normalization is applied on device inside
        the compiled program (matching the training pipeline).  Returns
        a Future resolving to [num_mix, L'] separated wavs."""
        if self._stop.is_set():
            raise RuntimeError("service is closed")
        if frames is not None:
            frames = np.asarray(frames)
            if frames.shape != self.frames_shape:
                raise ValueError(
                    f"frames must have shape {self.frames_shape}, got "
                    f"{frames.shape}")
            if frames.dtype != np.uint8 and not np.issubdtype(
                    frames.dtype, np.floating):
                # int16/int32 "images" are ambiguous (0-255? 0-65535?) —
                # silently clipping them to [0,1] would binarize real
                # pictures; make the caller pick uint8 or float [0,1]
                raise ValueError(
                    f"frames must be uint8 [0,255] or float [0,1], got "
                    f"dtype {frames.dtype}")
            if self.frames_wire == "u8":
                # ship uint8 to the device (submit-time quantization of
                # float inputs is documented; 8-bit matches jpg sources)
                if frames.dtype != np.uint8:
                    frames = np.rint(
                        np.clip(frames, 0.0, 1.0) * 255.0).astype(np.uint8)
            else:
                if frames.dtype == np.uint8:
                    frames = frames.astype(np.float32) / 255.0
                frames = np.asarray(frames, np.float32)
        mix = np.zeros(self.cfg.audLen, np.float32)
        n = min(len(audio_mix), self.cfg.audLen)
        mix[:n] = np.clip(audio_mix[:n], -1.0, 1.0)
        fut: Future = Future()
        with self.stats.lock:
            self.stats.requests += 1
        self._q.put((mix, frames, fut, time.perf_counter()))
        # submit/close race: if close() won, the worker is gone — fail
        # this future instead of leaving it forever pending
        if self._stop.is_set():
            self._fail_pending()
        return fut

    def _fail_pending(self):
        """Resolve every still-queued future with an error (close path —
        a pending `fut.result()` must never hang)."""
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                return
            if item is not None and not item[2].done():
                item[2].set_exception(RuntimeError("service closed"))

    def close(self):
        self._stop.set()
        self._q.put(None)
        self._t.join(timeout=5.0)
        self._fail_pending()

    # ------------------------------------------------------------- worker
    def _collect(self):
        """First request blocks; then drain until max_batch or the wait
        deadline.  Returns a list of (mix, frames, future, t0)."""
        first = self._q.get()
        if first is None:
            return None
        reqs = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(reqs) < self.max_batch:
            left = deadline - time.perf_counter()
            if left <= 0:
                break
            try:
                nxt = self._q.get(timeout=left)
            except queue.Empty:
                break
            if nxt is None:
                self._q.put(None)  # re-post the shutdown sentinel
                break
            reqs.append(nxt)
        return reqs

    def _dispatch_group(self, group, with_frames: bool):
        if not group:
            return
        B = self.max_batch
        mixes = np.zeros((B, self.cfg.audLen), np.float32)
        for i, (mix, _, _, _) in enumerate(group):
            mixes[i] = mix
        if self.wire == "int16":
            mixes = np.rint(mixes * 32767.0).astype(np.int16)
        self._rng, sub = jax.random.split(self._rng)
        t0 = time.perf_counter()
        if with_frames:
            frames = np.stack(
                [f for _, f, _, _ in group]
                + [group[0][1]] * (B - len(group)))
            wavs = self._run_av(jnp.asarray(mixes), jnp.asarray(frames),
                                sub)
        else:
            wavs = self._run_ao(jnp.asarray(mixes), sub)
        wavs = np.asarray(jax.device_get(wavs))
        if self.wire == "int16":
            wavs = wavs.astype(np.float32) / 32767.0
        lat = (time.perf_counter() - t0) * 1e3
        self.stats.record(len(group), lat)
        for i, (_, _, fut, _) in enumerate(group):
            fut.set_result(wavs[i])

    def _worker(self):
        while not self._stop.is_set():
            reqs = self._collect()
            if reqs is None:
                break
            try:
                self._dispatch_group(
                    [r for r in reqs if r[1] is None], with_frames=False)
                self._dispatch_group(
                    [r for r in reqs if r[1] is not None],
                    with_frames=True)
            except Exception as e:  # propagate to every waiting client
                for _, _, fut, _ in reqs:
                    if not fut.done():
                        fut.set_exception(e)
        # requests still queued behind the stop/sentinel must not leave
        # their futures pending forever
        self._fail_pending()


# ------------------------------------------------------------------ wire
# length-prefixed frames: uint32 header_len | json header | raw payload.
# Request header: {"op": "separate"|"stats", "n": L, "frames_shape": [...],
# "frames_dtype": "f32"|"u8"} with payload = mix f32 bytes [+ frames
# bytes].  A uint8 frames wire quarters the AV request payload — on
# wire-bound hosts (the tunnel serving measurements in BENCH_NOTES) the
# frames dominate request bytes; [0,1] floats from e.g. jpg decode are
# exactly representable as u8 anyway.  Response header: {"ok": true,
# "shape": [...]} with payload = wavs f32 bytes.

def _send_msg(sock, header: dict, payload: bytes = b""):
    hj = json.dumps(header).encode()
    sock.sendall(struct.pack("<I", len(hj)) + hj + payload)


def _recv_exact(sock, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("peer closed mid-message")
        buf += chunk
    return buf


def _recv_msg(sock):
    (hlen,) = struct.unpack("<I", _recv_exact(sock, 4))
    header = json.loads(_recv_exact(sock, hlen))
    payload = _recv_exact(sock, int(header.get("payload_bytes", 0)))
    return header, payload


class _Handler(socketserver.BaseRequestHandler):
    def handle(self):
        svc: SeparationService = self.server.service  # type: ignore
        while True:
            try:  # wire errors end the connection
                header, payload = _recv_msg(self.request)
            except (ConnectionError, OSError):
                return
            try:  # request-level errors are reported in-band and the
                # (still framing-synchronized) connection keeps serving
                if header["op"] == "stats":
                    _send_msg(self.request,
                              {"ok": True, **svc.stats.snapshot()})
                    continue
                n = int(header["n"])
                fs = (tuple(header["frames_shape"])
                      if header.get("frames_shape") else None)
                fdt = (np.uint8 if header.get("frames_dtype") == "u8"
                       else np.float32)
                need = 4 * n + (int(np.prod(fs)) * np.dtype(fdt).itemsize
                                if fs else 0)
                if len(payload) != need:
                    # a truncated payload must fail loudly: frombuffer
                    # would silently shorten the mix and submit() would
                    # zero-fill it, returning ok=True separations of a
                    # mostly-silent mixture on a client framing bug
                    raise ValueError(
                        f"payload is {len(payload)} bytes, expected {need} "
                        f"(n={n}" + (f", frames_shape={list(fs)}" if fs
                                     else "") + ")")
                mix = np.frombuffer(payload[:4 * n], np.float32)
                frames = None
                if fs:
                    frames = np.frombuffer(payload[4 * n:], fdt).reshape(fs)
                wavs = svc.submit(mix, frames).result()
                _send_msg(self.request,
                          {"ok": True, "shape": list(wavs.shape),
                           "payload_bytes": wavs.nbytes},
                          np.ascontiguousarray(wavs).tobytes())
            except (ConnectionError, OSError):
                return
            except Exception as e:
                try:
                    _send_msg(self.request,
                              {"ok": False, "error": repr(e)})
                except OSError:
                    return


class SeparationServer(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, addr, service: SeparationService):
        super().__init__(addr, _Handler)
        self.service = service


def serve_forever(service: SeparationService, host: str = "127.0.0.1",
                  port: int = 7860) -> SeparationServer:
    server = SeparationServer((host, port), service)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return server


def separate_remote(host: str, port: int, mix: np.ndarray,
                    frames: Optional[np.ndarray] = None,
                    sock: Optional[socket.socket] = None) -> np.ndarray:
    """Client helper: one round trip, returns [num_mix, L'] wavs."""
    own = sock is None
    if own:
        sock = socket.create_connection((host, port))
    try:
        mix = np.ascontiguousarray(mix, np.float32)
        header = {"op": "separate", "n": int(mix.size),
                  "payload_bytes": mix.nbytes}
        payload = mix.tobytes()
        if frames is not None:
            # uint8 input rides the wire as-is (1/4 the bytes; the server
            # maps u8 -> /255 -> ImageNet-normalize on device)
            if np.asarray(frames).dtype != np.uint8:
                frames = np.ascontiguousarray(frames, np.float32)
            frames = np.ascontiguousarray(frames)
            header["frames_shape"] = list(frames.shape)
            header["frames_dtype"] = ("u8" if frames.dtype == np.uint8
                                      else "f32")
            header["payload_bytes"] += frames.nbytes
            payload += frames.tobytes()
        _send_msg(sock, header, payload)
        rh, rp = _recv_msg(sock)
        if not rh.get("ok"):
            raise RuntimeError(f"server error: {rh.get('error')}")
        return np.frombuffer(rp, np.float32).reshape(rh["shape"])
    finally:
        if own:
            sock.close()


def server_stats(host: str, port: int) -> Dict:
    with socket.create_connection((host, port)) as sock:
        _send_msg(sock, {"op": "stats"})
        header, _ = _recv_msg(sock)
        return header


# -------------------------------------------------------------------- CLI

def main():
    import argparse

    from avsep_tpu.engine import build_nets
    from avsep_tpu.train import init_state
    from avsep_tpu.utils.compile_cache import enable_compile_cache
    enable_compile_cache()

    ap = argparse.ArgumentParser(
        description="avsep_tpu separation server")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--wire", default="f32", choices=["f32", "int16"],
                    help="host<->device audio encoding (int16 halves "
                         "transfer bytes, ~90 dB SNR)")
    ap.add_argument("--frames_wire", default="f32",
                    choices=["f32", "u8"],
                    help="host<->device frames encoding (u8 quarters "
                         "transfer bytes; float submits are quantized "
                         "to 8-bit, the precision of jpg sources)")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--id", default="")
    args, rest = ap.parse_known_args()

    from avsep_tpu.config import parse_args as parse_cfg
    cfg = parse_cfg(rest) if rest else Config(
        arch_sound="unet7", num_channels=2, vis_channels=256,
        fusion_type="hidsep", att_type="sig", not_pool_vis=False,
        img_activation="relu", output_activation="sigmoid",
        binary_mask=1, log_freq=1, one_frame=True)

    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    if args.ckpt:
        from avsep_tpu.checkpoint import restore_checkpoint
        state = restore_checkpoint(os.path.join(args.ckpt, args.id),
                                   state, "best")

    svc = SeparationService(cfg, nets, state.params, state.batch_stats,
                            max_batch=args.max_batch,
                            max_wait_ms=args.max_wait_ms, wire=args.wire,
                            frames_wire=args.frames_wire)
    server = SeparationServer((args.host, args.port), svc)
    print(f"serving on {args.host}:{args.port} "
          f"(max_batch={args.max_batch}, "
          f"max_wait_ms={args.max_wait_ms})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        svc.close()


if __name__ == "__main__":
    main()
