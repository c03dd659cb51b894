"""Checkpointing: Orbax save/restore of params + optimizer state + step.

The reference saves per-net ``state_dict`` files ``{sound,frame}_
{latest,best}.pth`` plus a pickled history (reference ``main.py:506-533``)
and — a known gap — loses optimizer momentum and LR-schedule position on
resume (SURVEY.md §5).  Here the whole TrainState (params, batch_stats,
SGD momentum, step) round-trips through Orbax; the latest/best-by-val_ao-
SI-SDR policy is identical (``main.py:524-526``).
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax

import orbax.checkpoint as ocp

from avsep_tpu.train import TrainState


def _ckptr():
    return ocp.PyTreeCheckpointer()


def save_checkpoint(ckpt_dir: str, state: TrainState, history: dict,
                    tag: str = "latest") -> None:
    # multi-host: EVERY process must call the orbax save — it contains
    # cross-process synchronization internally, so a primary-only call
    # deadlocks the job (p0 parks in orbax's barrier while the others run
    # ahead into the next collective; measured in tests/test_multihost.py
    # bring-up).  device_get of the replicated TrainState is local and
    # cheap on each process; orbax coordinates so the tree is written
    # once.  Only the history json (a plain file write with no barrier)
    # is primary-gated.
    path = os.path.join(os.path.abspath(ckpt_dir), f"state_{tag}")
    host_state = jax.device_get(state)
    _ckptr().save(path, host_state._asdict(), force=True)
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, "history_latest.json"), "w") as f:
            json.dump(history, f)


def restore_checkpoint(ckpt_dir: str, template: TrainState,
                       tag: str = "latest", mesh=None) -> TrainState:
    """Restore a TrainState saved by :func:`save_checkpoint`.

    Checkpoints are host-resident (``save_checkpoint`` device_gets before
    writing), so they restore onto ANY mesh topology: a state saved from an
    8-device mesh restores onto 1 device and vice versa — the standard
    production wrinkle of the DataParallel->mesh migration (SURVEY.md §5).
    Pass ``mesh`` to re-place the restored tree replicated across it (the
    same placement ``train.init_state`` gives a fresh state); without it
    the arrays stay host-side and jit places them on first use.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"state_{tag}")
    restored = _ckptr().restore(path, item=jax.device_get(template)._asdict())
    state = TrainState(**restored)
    if mesh is not None:
        from avsep_tpu.parallel.mesh import shard_tree
        state = shard_tree(state, mesh)
    return state


def load_history(ckpt_dir: str) -> Optional[dict]:
    p = os.path.join(ckpt_dir, "history_latest.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def checkpoint(ckpt_dir: str, state: TrainState, history: dict,
               best_err_holder: dict) -> None:
    """Save latest; promote to best when -val_ao si_sdr improves
    (reference checkpoint(), main.py:506-533).

    Unlike the reference (which resets its best tracker every run,
    main.py:797, so the first post-resume eval always clobbers *best*),
    ``best_err`` is persisted in the history json and restored by
    ``main()`` on resume."""
    print("Saving checkpoints at {} iterations.".format(int(state.step)))
    cur_err = -history["val_ao"]["si_sdr"][-1]
    improved = cur_err < best_err_holder.get("best_err", float("inf"))
    if improved:
        best_err_holder["best_err"] = cur_err
    history["best_err"] = best_err_holder.get("best_err", float("inf"))
    save_checkpoint(ckpt_dir, state, history, "latest")
    if improved:
        save_checkpoint(ckpt_dir, state, history, "best")
