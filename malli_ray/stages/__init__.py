"""Ray Data stages.

``cached_stage`` turns a callable CLASS into a task function with a
worker-process instance cache: the same compile-once-per-worker invariant as
an actor pool, without per-execution pool spin-up (worker processes persist
across tasks and executions).  Use real actor pools (`map_batches(Cls,
concurrency=...)`) only for genuinely heavy state — model weights, large
broadcast tables — where you also want placement/lifetime control.
"""

from __future__ import annotations

import hashlib
from typing import Any, Callable

_STAGE_CACHE: dict[str, Any] = {}

#: Worker-heap bound: stage keys embed ObjectRefs, so every pipeline RUN
#: mints fresh keys — an unbounded cache makes a long-lived worker
#: accumulate every broadcast table (vocab dicts, drop sets, codebooks) it
#: ever held, ballooning the heap and pinning the object store (measured:
#: a 44-query bench session degraded 2-3x by its tail).  An LRU of the most
#: recent entries keeps the compile-once invariant for live pipelines (one
#: pipeline holds nowhere near 32 stateful stages) while letting dead runs'
#: state be collected.
_STAGE_CACHE_MAX = 32


def cached_stage(cls: type, **kwargs) -> Callable:
    """A map_batches-ready function wrapping ``cls(**kwargs)`` built once per
    worker process (keyed by class + constructor args; LRU-bounded)."""
    import ray.cloudpickle as cp

    key = (f"{cls.__module__}.{cls.__qualname__}:"
           + hashlib.sha256(cp.dumps(sorted(kwargs.items()))).hexdigest())

    def stage_fn(batch):
        inst = _STAGE_CACHE.pop(key, None)
        if inst is None:
            inst = cls(**kwargs)
        _STAGE_CACHE[key] = inst          # (re-)insert at LRU tail
        while len(_STAGE_CACHE) > _STAGE_CACHE_MAX:
            _STAGE_CACHE.pop(next(iter(_STAGE_CACHE)))
        return inst(batch)

    return stage_fn


def concurrency_kwargs(concurrency) -> dict:
    """Normalize a concurrency cap for task-based map_batches: ints pass
    through; (min,max) actor-pool tuples use their max."""
    if concurrency is None:
        return {}
    if isinstance(concurrency, (tuple, list)):
        concurrency = max(concurrency)
    return {"concurrency": int(concurrency)}
