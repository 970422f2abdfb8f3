"""Session-keyed cache hygiene for memoized (persisted) DataFrames.

Several plan modules memoize staged frames ("fronts") per
(applicationId, dataset). This module centralizes the three hygiene
rules every memoizer must follow:

1. **Eviction** — keys of STOPPED sessions can never be hit again,
   but without eviction they pin the persisted DataFrame plus the
   whole dead-session object graph for the process lifetime. Every
   cache MISS sweeps ALL registered caches (inserts are rare; hits
   pay nothing), so a long-lived process that cycles sessions but
   hits warm caches on one family still frees the others.
2. **Staleness** — ``staged_key`` folds a cheap dataset fingerprint
   (max parquet (mtime_ns, size) under sf_dir) into every key, so a
   rewrite of any table under sf_dir within one Spark application
   changes the key and the front is rebuilt instead of silently
   serving a checkpoint of the old data. The fingerprint is an
   os.scandir sweep over the handful of files in a dataset dir —
   microseconds against a build that scans the tables themselves.
3. **Concurrency** — ``memoize`` guards the miss path with a
   module-level lock and a double-checked insert, so two concurrent
   callers in one process build the front once instead of leaking a
   checkpoint's blocks until application exit.
"""

from __future__ import annotations

import os
import threading
from typing import Callable, TypeVar

# Every memoizing plan module registers its cache dict here so a
# sweep harness (bench.py, the driver-sim) can bound executor storage
# between entry families without knowing module internals.
_ALL_CACHES: list[dict] = []

# Caches registered WITH a name can additionally be evicted one at a
# time (``evict_named``). The r12 verdict's result-front accounting
# rule needs this granularity: a registry entry whose declared result
# is itself a memoized front must have THAT front (and only that
# front) dropped before each timed benchmark run, so the recorded
# time is build+serve rather than a cache read — while the amortized
# index fronts other entries legitimately share stay warm.
_NAMED_CACHES: dict[str, dict] = {}

# One process-wide lock for all miss paths: front builds are rare and
# heavyweight (a localCheckpoint executes the build job under the
# lock), so a single lock costs nothing and removes any lock-ordering
# question between caches that build through each other.
_MEMO_LOCK = threading.RLock()

T = TypeVar("T")


def register_cache(cache: dict, name: str | None = None) -> dict:
    _ALL_CACHES.append(cache)
    if name is not None:
        _NAMED_CACHES[name] = cache
    return cache


def evict_named(name: str, *match) -> int:
    """Unpersist and drop entries of ONE named cache — the targeted
    sibling of ``evict_staged``. When ``match`` elements are given,
    only entries whose key tuple contains every element are dropped
    (e.g. the ``("scd2", "all")`` subset of a cache shared by two
    entries under distinct subset keys). Unknown names evict nothing
    (0) rather than raising, so a sweep harness can carry a static
    owner map across code versions. Returns the eviction count."""
    cache = _NAMED_CACHES.get(name)
    if cache is None:
        return 0
    n = 0
    with _MEMO_LOCK:
        for k in [k for k in cache if all(m in k for m in match)]:
            df = cache.pop(k)
            n += 1
            try:
                df.unpersist()
            except Exception:
                pass  # stopped session / non-persisted frame
    return n


def dataset_fingerprint(sf_dir: str) -> tuple[int, int]:
    """Cheap change detector for the parquet tables under ``sf_dir``:
    (max mtime_ns, total bytes) over data files one level deep (a
    dataset dir holds either bare ``table.parquet`` files or
    ``table.parquet/part-*.parquet`` directories). Any rewrite bumps
    the mtime component; append-only growth bumps the size component.
    NOT a content hash — a byte-identical rewrite re-keys too, which
    merely costs one rebuild, never correctness."""
    newest = 0
    total = 0
    try:
        with os.scandir(sf_dir) as it:
            entries = list(it)
    except OSError:
        return (0, 0)
    for e in entries:
        try:
            if e.is_file():
                st = e.stat()
                newest = max(newest, st.st_mtime_ns)
                total += st.st_size
            elif e.is_dir():
                with os.scandir(e.path) as inner:
                    for f in inner:
                        if f.is_file():
                            st = f.stat()
                            newest = max(newest, st.st_mtime_ns)
                            total += st.st_size
        except OSError:
            continue
    return (newest, total)


def staged_key(spark, sf_dir: str, *extra) -> tuple:
    """Canonical cache key for a staged front: (applicationId,
    sf_dir, dataset_fingerprint, *extra).

    Keyed by applicationId, not id(spark): Python can reuse a freed
    object's id for a new session, which would resurrect checkpoints
    of a stopped SparkContext. The fingerprint component means a
    same-application rewrite of the dataset re-keys every consumer
    (hygiene rule 2 above)."""
    return (spark.sparkContext.applicationId, sf_dir, dataset_fingerprint(sf_dir), *extra)


def memoize(cache: dict, key: tuple, build: Callable[[], T]) -> T:
    """Double-checked, locked memoization for staged fronts.

    The fast path (hit) is a plain dict get. The miss path takes
    ``_MEMO_LOCK``, re-checks, sweeps stale-application entries out
    of EVERY registered cache, then runs ``build()`` — which is
    expected to return an already-persisted/localCheckpointed frame —
    and inserts it. ``key[0]`` must be the applicationId (use
    ``staged_key``)."""
    df = cache.get(key)
    if df is not None:
        return df
    with _MEMO_LOCK:
        df = cache.get(key)
        if df is None:
            evict_stale_apps(cache, key[0])
            df = cache[key] = build()
        return df


def evict_stale_apps(cache: dict, app_id: str) -> None:
    """Drop entries whose leading key element is another application's
    id — from the touched cache AND every other registered cache, so
    dead-application entries can't hide in a cache that never misses.
    Safe even with two live sessions in one process — an evicted live
    entry is merely rebuilt on its next use."""
    for c in _ALL_CACHES:
        for k in [k for k in c if k[0] != app_id]:
            del c[k]
    # an unregistered cache passed directly still gets swept
    if cache is not None and all(cache is not c for c in _ALL_CACHES):
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
    with _MEMO_LOCK:
        for cache in _ALL_CACHES:
            for df in cache.values():
                n += 1
                try:
                    df.unpersist()
                except Exception:
                    pass  # stopped session / non-persisted frame
            cache.clear()
    return n
