"""Session-keyed cache hygiene for memoized (persisted) DataFrames.

Several plan modules memoize staged frames per (applicationId, ...).
Keys of STOPPED sessions can never be hit again, but without eviction
they pin the persisted DataFrame plus the whole dead-session object
graph for the process lifetime — a slow leak in any long-lived process
that cycles SparkSessions. Call ``evict_stale_apps`` on every cache
MISS (inserts are rare; hits pay nothing)."""

from __future__ import annotations

# Every memoizing plan module registers its cache dict here so a
# sweep harness (bench.py, the driver-sim) can bound executor storage
# between entry families without knowing module internals.
_ALL_CACHES: list[dict] = []


def register_cache(cache: dict) -> dict:
    _ALL_CACHES.append(cache)
    return cache


def evict_stale_apps(cache: dict, app_id: str) -> None:
    """Drop entries whose leading key element is another application's
    id. Safe even with two live sessions in one process — an evicted
    live entry is merely rebuilt on its next use."""
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]


def evict_staged() -> int:
    """Unpersist and forget every memoized staged frame across all
    registered caches — the memory-pressure guard for 100+-entry
    sweeps (a staged index is rebuilt on next use, so this only costs
    recomputation, never correctness). Returns the number of entries
    evicted. localCheckpoint-backed frames release their blocks via
    the ContextCleaner once the reference is dropped; persist-backed
    frames are unpersisted eagerly here."""
    n = 0
    for cache in _ALL_CACHES:
        for df in cache.values():
            n += 1
            try:
                df.unpersist()
            except Exception:
                pass  # stopped session / non-persisted frame
        cache.clear()
    return n
