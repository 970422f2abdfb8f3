"""Session-keyed cache hygiene for memoized (persisted) DataFrames.

Several plan modules memoize staged frames per (applicationId, ...).
Keys of STOPPED sessions can never be hit again, but without eviction
they pin the persisted DataFrame plus the whole dead-session object
graph for the process lifetime — a slow leak in any long-lived process
that cycles SparkSessions. Call ``evict_stale_apps`` on every cache
MISS (inserts are rare; hits pay nothing)."""

from __future__ import annotations


def evict_stale_apps(cache: dict, app_id: str) -> None:
    """Drop entries whose leading key element is another application's
    id. Safe even with two live sessions in one process — an evicted
    live entry is merely rebuilt on its next use."""
    for k in [k for k in cache if k[0] != app_id]:
        del cache[k]
