"""Shared helpers for the query surface."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def par_scan(df: DataFrame) -> DataFrame:
    """Scan-parallelism guard for compute-heavy consumers.

    A parquet file with a single row group is an unsplittable input: the
    whole scan — and every per-row expression Catalyst fuses into the scan
    stage (digest hashing, decimal casts, array HOFs, partial aggregation,
    pandas UDFs) — runs as ONE task no matter how many cores the cluster
    has (the optimization guide's §2.5 "one huge unsplittable file" case:
    repartition immediately after the read). When the scan yields fewer
    partitions than the cluster's parallelism, round-robin repartition so
    downstream per-row compute uses every core; the shuffle moves only the
    raw table bytes, orders of magnitude less than the work it unlocks.

    Size-adaptive by construction, not a local-mode constant: on a real
    multi-file/multi-row-group table the scan already splits past
    ``defaultParallelism`` and this is a no-op decision. Apply only where
    the scan stage carries heavy per-row compute (measured: the per-offset
    digest scans and the 8-way decimal aggregation win; light probe/HOF
    scans lose more to the extra exchange than they gain — see the r7
    per-entry A/Bs in OPTIMIZATION_r07.md).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def T_par(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``T`` with the ``par_scan`` guard applied."""
    return par_scan(T(spark, sf_dir, name))


def dsum(col: Column | str) -> Column:
    """Order-independent exact sum of a double expression: accumulate as
    DECIMAL(30,10), return as double. Matches the DSUM SQL macro below."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast("decimal(30,10)")).cast("double")


def davg(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast("decimal(30,10)")).cast("double") / F.count(c)).cast("double")


# DuckDB's native DECIMAL→DOUBLE cast is not correctly rounded (can be 1 ulp
# off Spark's BigDecimal conversion); routing through VARCHAR forces a
# correctly-rounded parse, so both engines yield the bit-identical double.
def dsum_sql(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(30,10))) AS VARCHAR) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return f"CAST({dsum_sql(expr)} / COUNT({expr}) AS DOUBLE)"
