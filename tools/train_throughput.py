"""Measure training-step throughput on the current accelerator.

One device execution scans N full AV train steps (forward double-pass,
backward, SGD update) over PRNG-generated synthetic batches — same timing
methodology as bench.py (see BENCH_NOTES.md).  Prints steps/s and
clips/s (global batch per step).

Usage: python tools/train_throughput.py [batch_per_step] [n_steps] [dtype] [dft]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(batch: int = 8, n_steps: int = 8, dtype: str = "float32",
         dft: str = "fft"):
    import jax
    import jax.numpy as jnp
    import optax
    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from avsep_tpu.config import Config
    from avsep_tpu.engine import build_nets, forward
    from avsep_tpu.train import init_state, make_optimizer

    cfg = Config(arch_sound="unet7", num_channels=2, vis_channels=256,
                 fusion_type="hidsep", att_type="sig", not_pool_vis=False,
                 img_activation="relu", output_activation="sigmoid",
                 binary_mask=1, weighted_loss=1, log_freq=1, loss="bce",
                 one_frame=True, match_weight=0.1, dtype=dtype, dft=dft)
    nets = build_nets(cfg)
    state = init_state(cfg, nets, jax.random.PRNGKey(0))
    opt = make_optimizer(cfg, state.params)

    def loss_fn(params, stats, batch_data, rng):
        err, (new_stats, _) = forward(nets, params, stats, batch_data, cfg,
                                      rng, use_vis=True, train=True)
        return err, new_stats

    @jax.jit
    def sweep(params, stats, opt_state, seed):
        def body(carry, key):
            params, stats, opt_state = carry
            ka, kf, kr = jax.random.split(key, 3)
            bd = {
                "audios": 0.1 * jax.random.normal(ka, (batch, 2,
                                                       cfg.audLen)),
                "audio_mix": 0.1 * jax.random.normal(ka, (batch,
                                                          cfg.audLen)),
                "frames": jax.random.uniform(kf, (batch, 2, 1, 224, 224,
                                                  3)),
            }
            (err, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, stats, bd, kr)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), err
        keys = jax.random.split(jax.random.PRNGKey(seed[0]), n_steps)
        (params, stats, opt_state), errs = jax.lax.scan(
            body, (params, stats, opt_state), keys)
        return jnp.sum(errs)

    t0 = time.time()
    float(sweep(state.params, state.batch_stats, state.opt_state,
                jnp.asarray([1])))
    print(f"# compile+first {time.time() - t0:.1f}s on {jax.devices()[0]}")

    t0 = time.time()
    total = float(sweep(state.params, state.batch_stats, state.opt_state,
                        jnp.asarray([2])))
    dt = time.time() - t0
    assert np.isfinite(total)
    print(f"train: {n_steps / dt:.2f} steps/s, "
          f"{batch * n_steps / dt:.1f} clips/s "
          f"(AV step, batch {batch}, {n_steps} steps in {dt:.2f}s)")


if __name__ == "__main__":
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dt = sys.argv[3] if len(sys.argv) > 3 else "float32"
    df = sys.argv[4] if len(sys.argv) > 4 else "fft"
    main(b, n, dt, df)
