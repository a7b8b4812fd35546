"""Shared helpers for the query surface."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
