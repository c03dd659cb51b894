"""Identity-pinned bounded cache for jitted step closures.

``jax.jit`` caches compiled executables by function object, so building a
fresh closure per call retraces AND recompiles the program (20-40 s for the
full forward+BSS eval step on TPU).  Keying a cache by ``id()`` alone is
fragile — ids can be reused after garbage collection — so entries pin the
key objects and re-check identity on lookup, which both keeps the ids
stable and makes a collision return a miss instead of the wrong
executable.  Eviction is LRU (hits re-insert, the least-recently-used
entry goes first), so a config sweep never wipes the hot entries of the
point currently running.
Shared by the main eval harness (``evaluate.make_eval_step``) and the
SoP++ one (``sop_main.make_sop_eval_step``).
"""

from __future__ import annotations

from typing import Callable, Hashable, Sequence, Tuple


class JitStepCache:
    def __init__(self, cap: int = 8):
        self._cap = cap
        self._d: dict = {}

    def get_or_build(self, key_objs: Sequence[object], extra: Hashable,
                     build: Callable[[], object]) -> object:
        key: Tuple = tuple(id(o) for o in key_objs) + (extra,)
        hit = self._d.get(key)
        if hit is not None and all(a is b for a, b in zip(hit[0], key_objs)):
            # LRU refresh: re-insert so a long-running config's hot entry
            # is never the "oldest" one evicted by a sweep of cold ones
            self._d[key] = self._d.pop(key)
            return hit[1]
        step = build()
        while len(self._d) >= self._cap:  # evict least-recently-used
            del self._d[next(iter(self._d))]
        self._d[key] = (tuple(key_objs), step)
        return step
