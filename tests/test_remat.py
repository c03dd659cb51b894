"""Remat option: gradients with rematerialized forwards match the plain
path (cfg.remat trades FLOPs for HBM)."""

import pytest

import numpy as np

import jax
import jax.numpy as jnp

from avsep_tpu.engine import build_nets, forward
from tests.test_train_step import tiny_batch, tiny_cfg

pytestmark = pytest.mark.slow  # torch-parity / long-compile tier


def test_remat_grads_match():
    cfg = tiny_cfg(arch_sound="unet5", vis_channels=256)
    # full-size unet5 bottleneck = 512 -> vis 256; small images keep it fast
    cfg = cfg.replace(imgSize=64)
    nets_plain = build_nets(cfg)
    nets_remat = build_nets(cfg.replace(remat=True))

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    x = jnp.zeros((1, 256, 64, 1))
    v = jnp.zeros((2, 1, 4, 4, 256))
    sound_vars = nets_plain.sound.init(k1, x, v, train=False)
    frames = jnp.zeros((1, 1, 64, 64, 3))
    frame_vars = nets_plain.frame.init(k2, frames, pool=False, train=False)
    params = {"sound": sound_vars["params"], "frame": frame_vars["params"]}
    stats = {"sound": sound_vars["batch_stats"],
             "frame": frame_vars["batch_stats"]}

    batch = tiny_batch(cfg, B=2)

    def loss(nets):
        def f(p):
            err, _ = forward(nets, p, stats, batch, cfg,
                             jax.random.PRNGKey(1), True, train=True)
            return err
        return f

    e1, g1 = jax.value_and_grad(loss(nets_plain))(params)
    e2, g2 = jax.value_and_grad(loss(nets_remat))(params)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(g1)
    l2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)
