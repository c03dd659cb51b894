"""Compile-time HBM accounting (tools/memory_report.py) plumbing tests.

XLA reports a compiled program's argument/output/temp/alias byte sizes at
compile time; the tool turns that into batch-capacity planning for the
train step.  These tests exercise the analysis path at toy scale on the
CPU platform (absolute numbers are backend-specific; the invariants are
not).
"""

import jax
import jax.numpy as jnp
import pytest

from avsep_tpu.config import Config

from tools.memory_report import _mem, analyze_train_step

AUDLEN = 32 * 256 - 1  # -> 32 STFT frames


def tiny_cfg(**kw):
    # vis_channels must equal the builder U-Net's bottleneck chunk
    # (ngf=64 -> 512 / C=2 = 256), unlike test_train_step's hand-built
    # ngf=8 tiny nets
    base = dict(arch_sound="unet5", num_channels=2, vis_channels=256,
                fusion_type="hidsep", att_type="sig", loss="bce",
                not_pool_vis=False, binary_mask=1, weighted_loss=1,
                log_freq=1, num_mix=2, audLen=AUDLEN, imgSize=64,
                one_frame=True, output_activation="sigmoid",
                img_activation="relu", lr_sound=1e-3, lr_frame=1e-4,
                lr_steps=(5,), match_weight=0.1)
    base.update(kw)
    return Config(**base)


@pytest.mark.slow  # two full train-step compiles (~70 s on the 1-core host)
def test_mem_fields_and_scaling():
    m2 = analyze_train_step(tiny_cfg(), batch=2)
    for k in ("argument_size_in_bytes", "output_size_in_bytes",
              "temp_size_in_bytes", "alias_size_in_bytes", "peak_bytes"):
        assert k in m2, k
    assert m2["argument_size_in_bytes"] > 0
    # batch inputs (audios + frames) grow with batch; params do not
    m4 = analyze_train_step(tiny_cfg(), batch=4)
    assert m4["argument_size_in_bytes"] > m2["argument_size_in_bytes"]
    # donation aliases the state into the output on every backend
    assert m2["alias_size_in_bytes"] > 0
    assert m2["peak_bytes"] == (m2["argument_size_in_bytes"]
                                + m2["temp_size_in_bytes"]
                                - m2["alias_size_in_bytes"])


def test_mem_of_trivial_program():
    c = jax.jit(lambda x: (x @ x).sum()).lower(
        jax.ShapeDtypeStruct((256, 256), jnp.float32)).compile()
    m = _mem(c)
    assert m["argument_size_in_bytes"] == 256 * 256 * 4
    assert m["output_size_in_bytes"] == 4
