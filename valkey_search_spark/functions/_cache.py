"""Executor-side object cache keyed by content fingerprint.

Pandas-UDF closures rebuild driver objects (tokenizers, models) from a
broadcast on each executor. This cache gives every such module the same
posture: ONE rebuilt instance per content fingerprint per worker
process (so repeated applies of the same artifact share internal LRU
caches), bounded so a session cycling through many artifacts cannot
grow worker memory without limit. PySpark 4's Broadcast has no public
id, hence fingerprint keys (see project notes)."""

from __future__ import annotations

from collections.abc import Callable

_CAP = 8
_CACHE: dict[tuple[str, int], object] = {}


def worker_cached(kind: str, fingerprint: int, build: Callable[[], object]):
    """Return the cached instance for (kind, fingerprint), building it
    with ``build()`` on first use; FIFO-evicts beyond the cap."""
    k = (kind, fingerprint)
    obj = _CACHE.get(k)
    if obj is None:
        while len(_CACHE) >= _CAP:
            _CACHE.pop(next(iter(_CACHE)))
        obj = build()
        _CACHE[k] = obj
    return obj
