"""A/B: separation-pipeline throughput and fidelity, f32 vs bf16 compute.

The train step gains +21% from ``--dtype bfloat16`` (BENCH_NOTES); the
forward-only serving pipeline (reference inference.py:39-86,433-491) is
more conv-dominated (no backward elementwise/copy traffic), so the MXU
dtype lever should bite harder here.  This tool measures it with
bench.py's exact methodology (one on-device lax.scan sweep per timing,
fresh PRNG seeds per run, best-of-RUNS) and reports the bf16 wav SNR
against the f32 pipeline on identical inputs.

Usage: python tools/sep_dtype_ab.py [B] [ITERS]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 64
RUNS = 3


def build(dtype: str):
    import jax
    from avsep_tpu.config import Config
    from avsep_tpu.engine import build_nets, separate
    from avsep_tpu.train import init_state

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, weighted_loss=1, log_freq=1, one_frame=True,
                 use_pallas=jax.default_backend() == "tpu",
                 dft="matmul", dtype=dtype)
    nets = build_nets(cfg)
    return cfg, nets, separate, init_state


def main():
    import jax
    import jax.numpy as jnp
    import jax.lax as lax

    try:
        import os
        cache_dir = os.path.join(os.path.dirname(__file__), "..",
                                 ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    results = {}
    wavs_by_dtype = {}
    state = None
    for dtype in ("float32", "bfloat16"):
        cfg, nets, separate, init_state = build(dtype)
        if state is None:
            # params are f32 in both configs (Flax param_dtype default);
            # share one init so the fidelity diff is purely compute dtype
            try:
                cpu = jax.local_devices(backend="cpu")[0]
            except Exception:
                cpu = None
            if cpu is not None:
                with jax.default_device(cpu):
                    state = init_state(cfg, nets, jax.random.PRNGKey(0))
            else:
                state = init_state(cfg, nets, jax.random.PRNGKey(0))

        def fn(audio_mix, frames):
            out = separate(nets, state.params, state.batch_stats,
                           audio_mix, frames, cfg)
            return out["wavs"]

        @jax.jit
        def sweep(seed):
            key0 = jax.random.PRNGKey(seed[0])
            kf, kc = jax.random.split(key0)
            f_base = jax.random.uniform(kf, (B, 2, 1, 224, 224, 3))

            def body(carry, key):
                a = 0.1 * jax.random.normal(key, (B, cfg.audLen))
                eps = jax.random.uniform(key, ()) * 1e-3
                wavs = fn(a, f_base + eps)
                return carry + jnp.sum(wavs[:, :, ::4096]), None
            keys = jax.random.split(kc, ITERS)
            total, _ = lax.scan(body, jnp.zeros(()), keys)
            return total

        t0 = time.time()
        float(sweep(jnp.asarray([1])))
        print(f"# {dtype}: compile+first sweep {time.time() - t0:.1f}s",
              file=sys.stderr)
        best = None
        for s in range(2, 2 + RUNS):
            t0 = time.time()
            total = float(sweep(jnp.asarray([s])))
            dt = time.time() - t0
            assert np.isfinite(total)
            best = dt if best is None else min(best, dt)
        results[dtype] = B * ITERS / best

        # fidelity probe: one fixed batch through the un-scanned pipeline
        ka, kf2 = jax.random.split(jax.random.PRNGKey(99))
        a = 0.1 * jax.random.normal(ka, (B, cfg.audLen))
        f = jax.random.uniform(kf2, (B, 2, 1, 224, 224, 3))
        wavs_by_dtype[dtype] = np.asarray(jax.jit(fn)(a, f))

    ref = wavs_by_dtype["float32"]
    test = wavs_by_dtype["bfloat16"]
    err = ref - test
    snr = 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-30))
    # binary masks -> identical wavs unless a threshold crossing flips;
    # report the flip rate too (fraction of output samples that differ)
    flip = float((np.abs(err) > 1e-6).mean())

    f32, bf16 = results["float32"], results["bfloat16"]
    print(f"f32:  {f32:.1f} clips/s")
    print(f"bf16: {bf16:.1f} clips/s  ({(bf16 / f32 - 1) * 100:+.1f}%)")
    print(f"bf16 wav SNR vs f32: {snr:.1f} dB; "
          f"sample flip rate {flip * 100:.3f}%")


if __name__ == "__main__":
    main()
