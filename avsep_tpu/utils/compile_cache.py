"""Persistent on-disk XLA compile cache for the CLI entry points.

First compile of the flagship train/eval/probe programs through the
tunneled chip costs 10-15 minutes; the reference pays the analogous CUDA
warm-up on every process too (no persistent cache in torch eager).  JAX
ships one — it just has to be switched on before the first lowering.
Every CLI (`main`, `sop_main`, `inference`, `separate_cli`, `serve`)
calls :func:`enable_compile_cache` at startup, so repeated invocations
with unchanged shapes (sweeps, probes, resumes) skip straight to
execution.

The cache is keyed by XLA on the full program fingerprint (HLO, flags,
backend), so stale hits are impossible by construction; a corrupt or
read-only directory degrades to compile-as-usual.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/avsep_tpu/xla")


def enable_compile_cache(path: str = "") -> None:
    """Point JAX's persistent compilation cache at ``path``.

    ``path`` ""  -> $AVSEP_COMPILE_CACHE or ~/.cache/avsep_tpu/xla;
    "off" (or a falsy env override) disables entirely.
    """
    path = path or os.environ.get("AVSEP_COMPILE_CACHE", _DEFAULT)
    if not path or path == "off":
        return
    try:
        import jax
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(path))
        # only programs worth a disk round-trip (the tunnel compiles we
        # care about are O(minutes)); tiny host jits stay memory-only
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a failure mode
