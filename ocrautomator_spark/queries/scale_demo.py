"""Scale-pattern operators as driver-gated queries (SURVEY.md §4 promoted
from tests/test_scale_patterns.py): bucketed co-located joins and dynamic
partition pruning. Testdata is small, but the PLAN is the contract — the
plan-shape tests in tests/test_scale_patterns.py assert no Exchange before
the bucketed join and a dynamicpruning subquery in the partitioned scan.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocrautomator_spark.queries.common import dsum, dsum_sql

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _sfx(sf: str, src: str = "orders") -> str:
    """Cache key for derived /tmp layouts: sf path + source parquet
    mtime/size, so a regenerated source invalidates the cached layout
    instead of serving a stale copy against a fresh oracle."""
    import pathlib

    key = sf
    p = pathlib.Path(sf) / f"{src}.parquet"
    if p.is_dir():
        # directory-style parquet: a part file rewritten in place under the
        # same name leaves the DIRECTORY stat unchanged, so the key must
        # fold in every part file's own stat
        for part in sorted(p.glob("*.parquet")):
            st = part.stat()
            key += f"|{part.name}|{st.st_mtime_ns}|{st.st_size}"
    else:
        try:
            st = p.stat()
            key += f"|{src}|{st.st_mtime_ns}|{st.st_size}"
        except OSError:
            pass  # missing source: constant key; the read itself will fail loudly
    return hashlib.md5(key.encode()).hexdigest()[:8]


def _ensure_bucketed(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Write bucketed twins of orders/lineitem (8 buckets on the join key,
    sorted within buckets) once per sf dir; reuse on later calls. At 10^12
    rows this layout is written once and every subsequent join of the two
    tables is shuffle-free AND sort-free."""
    ot = f"orders_bkt_{_sfx(sf, 'orders')}"
    lt = f"lineitem_bkt_{_sfx(sf, 'lineitem')}"
    for tbl, src, key in ((ot, "orders", "o_orderkey"), (lt, "lineitem", "l_orderkey")):
        path = f"/tmp/ocras_bucketed_{tbl}"
        import pathlib

        if spark.catalog.tableExists(tbl) and (pathlib.Path(path) / "_SUCCESS").exists():
            continue
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        df = spark.read.parquet(f"{sf}/{src}.parquet")
        df.write.mode("overwrite").bucketBy(8, key).sortBy(key).option("path", path).saveAsTable(tbl)
    return ot, lt


@q(
    "join_bucketed_colocated",
    f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n,
           {dsum_sql('l.l_quantity')} AS sum_qty
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf: str) -> DataFrame:
    """Co-located fact-fact join over bucketed tables: both sides bucketed by
    the join key into the same bucket count, so the SortMergeJoin (forced via
    the merge hint — a broadcast would hide the point) runs with ZERO
    exchanges and zero sorts. The once-per-layout write is the 100 TB trade:
    pay one shuffle at ingest, never again."""
    ot, lt = _ensure_bucketed(spark, sf)
    li = spark.table(lt).hint("merge")
    o = spark.table(ot)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            dsum("l_quantity").alias("sum_qty"),
        )
    )


DPP_YEAR = 1996


@q(
    "join_dpp_partitioned",
    f"""
    SELECT 'pick' AS tag, COUNT(*) AS n,
           {dsum_sql('o_totalprice')} AS sum_price
    FROM orders WHERE year(o_orderdate) = {DPP_YEAR}
    """,
)
def join_dpp_partitioned(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out partitioned by
    year; joining it to a filtered dim makes Spark prune fact partitions AT
    RUNTIME from the dim filter's result (a 100 TB scan touches only the
    matching partitions). The partitioned write happens once per sf dir."""
    import pathlib

    path = f"/tmp/ocras_dpp_orders_{_sfx(sf)}"
    if not (pathlib.Path(path) / "_SUCCESS").exists():
        (
            spark.read.parquet(f"{sf}/orders.parquet")
            .withColumn("yr", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("yr")
            .parquet(path)
        )
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(DPP_YEAR - 1, "skip"), (DPP_YEAR, "pick"), (DPP_YEAR + 1, "skip2")],
        "yr int, tag string",
    ).filter(F.col("tag") == "pick")
    return (
        fact.join(dim, "yr")
        .groupBy("tag")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("sum_price"),
        )
    )
