"""Driver-checked operator surface (SURVEY.md §2B + training-data pipeline ops).

Each module contributes QUERIES (name → fn(spark, sf_dir) → DataFrame) and
ORACLES (name → ANSI SQL for DuckDB over the same parquet views). Names are
aligned column-for-column: every computed column is aliased identically on
both sides because the driver's compare hashes values after sorting columns
by name.

Numeric discipline (load-bearing for the value-hash gate): multi-row SUM/AVG
over doubles is computed as SUM(CAST(x AS DECIMAL(30,10))) then cast to
double — exact, order-independent, so Spark and DuckDB produce bit-identical
doubles regardless of partitioning. Timestamps in final projections are cast
to string on both sides.
"""

from __future__ import annotations

from ocrautomator_spark.queries import (
    conversation_q,
    corpus_ops,
    curation,
    events_analytics,
    extraction,
    graph,
    pipeline_ops,
    relational,
    relational2,
    scalars,
    scale_demo,
    udfs,
    windows,
)

_MODULES = [
    relational,
    relational2,
    graph,
    scalars,
    windows,
    udfs,
    pipeline_ops,
    extraction,
    conversation_q,
    curation,
    events_analytics,
    corpus_ops,
    scale_demo,
]
QUERIES = {k: v for m in _MODULES for k, v in m.QUERIES.items()}
ORACLES = {k: v for m in _MODULES for k, v in m.ORACLES.items()}
