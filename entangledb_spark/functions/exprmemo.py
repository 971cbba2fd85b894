"""Process-wide memo for pure Column-expression templates.

Round-11 profiling showed query CONSTRUCTION (driver-side plan assembly,
before any Spark job) costing 0.3-2.3 s per query at bench scale, >90% of
it py4j socket round-trips: every `F.*` / Column-method call is 1-2
round-trips (~0.6 ms), and the HOF-heavy builders (winnowing, MinHash
permutations, LSH hyperplanes, span windows) issue 200-1900 round-trips
PER BUILD re-constructing byte-identical expression trees each time.
That cost is pure driver overhead at ANY scale — at 100 TB the same
round-trips happen before the first task launches.

PySpark Column objects are immutable expression TEMPLATES: reusing one
instance across queries, twice within one plan, and on both sides of a
self-join all produce identical results (verified empirically before this
module landed; the analyzer re-resolves lambda variables and attributes
per plan). Module-level shared expressions are the documented PySpark
idiom — this memo just builds them lazily instead of at import.

Rules for decorated builders:
  - must be PURE functions of their arguments (same args => semantically
    identical expression tree);
  - arguments must be hashable primitives (str column NAMES, ints,
    floats, bools, tuples) — never live Column objects. Column overloads
    `==` to return a Column, so a dict collision on a Column key would
    raise; the wrapper therefore bypasses the cache for any non-primitive
    argument and builds directly.
"""

from __future__ import annotations

import functools

_PRIMS = (str, int, float, bool, bytes, frozenset, tuple, type(None))

# Every decorated builder registers here so a relaunched py4j gateway can
# drop Column objects bound to the dead JVM (session.get_spark calls
# clear_all when it observes a new gateway). Under the normal
# one-JVM-per-process lifecycle this never fires.
_ALL_CACHES: list = []


def clear_all() -> None:
    """Clear every @expr_template memo (stale-gateway guard)."""
    for c in _ALL_CACHES:
        c()


def _hashable(args: tuple, kwargs: dict) -> bool:
    return all(isinstance(a, _PRIMS) for a in args) and all(
        isinstance(v, _PRIMS) for v in kwargs.values()
    )


def expr_template(fn):
    """Memoize a pure Column-template builder on primitive arguments.

    Non-primitive arguments (e.g. a live Column) skip the cache and build
    directly, so decorated functions may keep flexible signatures.
    """
    cached = functools.lru_cache(maxsize=None)(fn)

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if _hashable(args, kwargs):
            return cached(*args, **kwargs)
        return fn(*args, **kwargs)

    wrapper.cache_clear = cached.cache_clear  # for tests
    _ALL_CACHES.append(cached.cache_clear)
    return wrapper
