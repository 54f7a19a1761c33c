"""Process-level cache of jitted programs, keyed by everything that shapes
the traced computation except parameter VALUES.

Why this exists: the pipeline stages (pipeline/stages.py) and the iterative
full loop (pipeline/full_loop.py) construct models and jitted step/generate
closures from fresh config objects on every invocation. ``jax.jit``'s cache
is per-callable-object, so a fresh closure retraces and recompiles even when
the config, shapes and dtypes are identical — measured as iteration 2 of the
full loop evaluating 4.4× slower than iteration 1 (answers_per_sec 5.91 →
1.34, artifacts/full_loop_r3_final.json) purely on recompilation. The
reference never hits this because torch eager has no compile step; the
TPU-native answer is to make program construction a pure function of config
and memoize it.

Builders opt in via :func:`cached_program`; configs are frozen dataclasses
(core/config.py) so keys are plain hashable tuples. The cache deliberately
holds strong references — compiled executables are the most expensive
artifacts in the process and the key space is tiny (a handful of configs per
run). ``clear()`` exists for tests and for long-lived processes that sweep
many architectures.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

_CACHE: Dict[Tuple, Any] = {}
_HITS = 0
_MISSES = 0


def cached_program(key: Tuple, builder: Callable[[], Any]) -> Any:
    """Return the cached artifact for ``key``, building it on first use.

    ``key`` must capture every static influence on the traced program
    (architecture config, dtype, decode/backend knobs); parameter values and
    batch contents must not be part of it. Shapes need not be: the cached
    artifact is usually a jitted callable whose own cache handles per-shape
    specialization.
    """
    global _HITS, _MISSES
    if key in _CACHE:
        _HITS += 1
        return _CACHE[key]
    _MISSES += 1
    art = builder()
    _CACHE[key] = art
    return art


def dtype_key(dtype) -> str:
    """Canonical hashable form of a jnp dtype / numpy dtype / type."""
    import numpy as np

    return np.dtype(dtype).name


def stats() -> Dict[str, int]:
    return {"hits": _HITS, "misses": _MISSES, "size": len(_CACHE)}


def clear() -> None:
    global _HITS, _MISSES
    _CACHE.clear()
    _HITS = 0
    _MISSES = 0
