"""Unit tests for the staged-front cache hygiene rules
(pe_firm_investment_database_pipeline_spark/functions/session_cache.py):
locked double-checked memoization, dataset-fingerprint re-keying, and
the all-cache stale-application sweep. Pure-Python — no SparkSession
needed (frames are stand-in objects; `memoize` is type-agnostic)."""

from __future__ import annotations

import os
import threading

from pe_firm_investment_database_pipeline_spark.functions import session_cache as sc


class _FakeFrame:
    def __init__(self) -> None:
        self.unpersisted = False

    def unpersist(self):
        self.unpersisted = True
        return self


def test_memoize_builds_once_and_hits():
    cache = sc.register_cache({})
    try:
        calls = []

        def build():
            calls.append(1)
            return _FakeFrame()

        key = ("app-1", "dir", (0, 0), "x")
        first = sc.memoize(cache, key, build)
        second = sc.memoize(cache, key, build)
        assert first is second
        assert len(calls) == 1
    finally:
        sc._ALL_CACHES.remove(cache)


def test_memoize_concurrent_miss_builds_once():
    """Two threads racing the same cold key must share one build
    (the pre-fix check-then-insert pattern built twice, leaking one
    checkpoint's blocks until application exit)."""
    cache = sc.register_cache({})
    try:
        calls = []
        gate = threading.Barrier(2)
        results = []

        def build():
            calls.append(1)
            return _FakeFrame()

        def run():
            gate.wait()
            results.append(sc.memoize(cache, ("app-1", "d", (0, 0)), build))

        ts = [threading.Thread(target=run) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(calls) == 1
        assert results[0] is results[1]
    finally:
        sc._ALL_CACHES.remove(cache)


def test_miss_sweeps_stale_apps_out_of_all_caches():
    """A miss on ONE cache evicts dead-application entries from EVERY
    registered cache — dead entries must not hide in a cache that
    never misses."""
    a = sc.register_cache({})
    b = sc.register_cache({})
    try:
        b[("old-app", "d")] = _FakeFrame()
        b[("app-2", "d")] = _FakeFrame()
        sc.memoize(a, ("app-2", "d", "k"), _FakeFrame)
        assert ("old-app", "d") not in b
        assert ("app-2", "d") in b
    finally:
        sc._ALL_CACHES.remove(a)
        sc._ALL_CACHES.remove(b)


def test_dataset_fingerprint_changes_on_rewrite(tmp_path):
    """Rewriting any table under sf_dir changes the fingerprint, so
    staged_key re-keys and consumers rebuild instead of serving a
    checkpoint of the old data."""
    p = tmp_path / "t.parquet"
    p.write_bytes(b"v1")
    fp1 = sc.dataset_fingerprint(str(tmp_path))
    os.utime(p, ns=(1, 1))
    fp_old = sc.dataset_fingerprint(str(tmp_path))
    assert fp_old != fp1 or fp_old[1] == fp1[1]
    p.write_bytes(b"v2-longer")
    fp2 = sc.dataset_fingerprint(str(tmp_path))
    assert fp2 != fp_old
    # nested part-file layout is covered too
    d = tmp_path / "u.parquet"
    d.mkdir()
    (d / "part-0.parquet").write_bytes(b"xx")
    assert sc.dataset_fingerprint(str(tmp_path)) != fp2


def test_dataset_fingerprint_missing_dir_is_stable():
    assert sc.dataset_fingerprint("/nonexistent/path/xyz") == (0, 0)


def test_evict_staged_unpersists_and_clears():
    cache = sc.register_cache({})
    try:
        f = _FakeFrame()
        cache[("app-1", "d")] = f
        n = sc.evict_staged()
        assert n >= 1
        assert f.unpersisted
        assert not cache
    finally:
        sc._ALL_CACHES.remove(cache)
