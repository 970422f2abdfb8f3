"""Named query plans. ``all_queries()`` is the merged §2 inventory."""

from __future__ import annotations

from ..registry import QuerySpec, merge


def all_queries() -> dict[str, QuerySpec]:
    from ..streaming import stateful as streaming_stateful
    from ..streaming import windows as streaming_windows
    from . import (
        advanced_aggs,
        components,
        enrichment,
        io_ops,
        matching,
        multimodal,
        reference_scalars,
        relational,
        seed_pipeline,
        sessions,
        similarity,
        textops,
    )

    return merge(
        advanced_aggs.QUERIES,
        components.QUERIES,
        streaming_stateful.QUERIES,
        relational.QUERIES,
        enrichment.QUERIES,
        textops.QUERIES,
        similarity.QUERIES,
        seed_pipeline.QUERIES,
        matching.QUERIES,
        streaming_windows.QUERIES,
        multimodal.QUERIES,
        io_ops.QUERIES,
        reference_scalars.QUERIES,
        sessions.QUERIES,
    )
