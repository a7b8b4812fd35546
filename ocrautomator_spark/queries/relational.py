"""SURVEY.md §2B — core relational operator surface.

Every query is declarative DataFrame API (Catalyst handles pushdown, pruning,
join selection; AQE handles runtime coalescing/skew). Oracles are ANSI SQL for
DuckDB over identical parquet views, with identical output column names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ocrautomator_spark.queries.common import T, davg, davg_sql, dsum, dsum_sql, par_scan

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------- scans

@q(
    "scan_project",
    "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM lineitem",
)
def scan_project(spark: SparkSession, sf: str) -> DataFrame:
    # column pruning: ReadSchema must show exactly these 4 columns
    return T(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@q(
    "filter_pred",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND NOT (l_quantity >= 24)
    """,
)
def filter_pred(spark: SparkSession, sf: str) -> DataFrame:
    # compound predicate pushed to the parquet scan (PushedFilters in explain)
    li = T(spark, sf, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & ~(F.col("l_quantity") >= 24)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


# ---------------------------------------------------------------- joins

@q(
    "join_inner_hash",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_hash(spark: SparkSession, sf: str) -> DataFrame:
    # fact⋈dim equi-join; at 100 TB this is a shuffled hash/SMJ on the key —
    # here customer is small enough that AQE may pick broadcast, equally fine
    # no T_par here (r7, measured): the broadcast-join probe + count/sum agg
    # is ~one hash probe per row — cheaper than the repartition that would
    # parallelize it (A/B 0.42s -> 0.46s). Contrast agg_hash, whose 8
    # decimal aggregates per row DO pay for the spread.
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@q(
    "join_broadcast",
    f"""
    SELECT p_brand, COUNT(*) AS n_lines, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast(spark: SparkSession, sf: str) -> DataFrame:
    # explicit broadcast: part is a dim table; never shuffle the fact side
    # no T_par (r7, measured 0.85s -> 1.15s): shuffling the 600k-row probe
    # side costs more than the one-core broadcast probe + light agg it spreads
    li, p = T(spark, sf, "lineitem"), T(spark, sf, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_lines"), dsum("l_quantity").alias("sum_qty"))
    )


@q(
    "join_left",
    """
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "join_right",
    """
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def join_right(spark: SparkSession, sf: str) -> DataFrame:
    o, c = T(spark, sf, "orders"), T(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@q(
    "join_full",
    """
    WITH cn AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.nk, sn.nk) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL JOIN sn ON cn.nk = sn.nk
    """,
)
def join_full(spark: SparkSession, sf: str) -> DataFrame:
    c = T(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(F.count("*").alias("n_cust"))
    s = T(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(F.count("*").alias("n_supp"))
    return c.join(s, c.nk == s.nk, "full").select(
        F.coalesce(c.nk, s.nk).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@q(
    "join_semi",
    "SELECT c_custkey, c_name FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)",
)
def join_semi(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@q(
    "join_anti",
    "SELECT c_custkey, c_name FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)",
)
def join_anti(spark: SparkSession, sf: str) -> DataFrame:
    c, o = T(spark, sf, "customer"), T(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@q(
    "join_cross",
    "SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf: str) -> DataFrame:
    return T(spark, sf, "region").select("r_name").crossJoin(T(spark, sf, "nation").select("n_name"))


_BUCKETS = [("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1e18)]
_BUCKETS_SQL = ", ".join(f"('{l}', {lo}, {hi})" for l, lo, hi in _BUCKETS)


@q(
    "join_theta_range",
    f"""
    SELECT label, COUNT(*) AS n_events, {dsum_sql('value')} AS sum_value
    FROM events JOIN (VALUES {_BUCKETS_SQL}) AS b(label, lo, hi)
      ON value >= lo AND value < hi
    GROUP BY label
    """,
)
def join_theta_range(spark: SparkSession, sf: str) -> DataFrame:
    # non-equi join → BroadcastNestedLoopJoin with the tiny bucket dim broadcast
    e = T(spark, sf, "events")
    b = spark.createDataFrame(_BUCKETS, "label string, lo double, hi double")
    return (
        e.join(F.broadcast(b), (e.value >= b.lo) & (e.value < b.hi))
        .groupBy("label")
        .agg(F.count("*").alias("n_events"), dsum("value").alias("sum_value"))
    )


@q(
    "join_asof",
    """
    WITH od AS (
      SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, od.o_orderkey AS last_orderkey
    FROM events e ASOF JOIN od
      ON e.user_id = od.o_custkey AND e.ts >= od.o_orderdate
    """,
)
def join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join (no native Spark operator): for each event, the most recent
    prior order of the same key. Implemented scale-first as the union-and-
    carry-forward pattern — one shuffle on (key), one window, NO range
    explosion — instead of an inequality join that degenerates to
    BroadcastNestedLoop at 100 TB."""
    e = T(spark, sf, "events")
    # dedupe orders to one per (key, time): deterministic tie-break = max key
    od = (
        T(spark, sf, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    left = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.col("event_id"),
        F.lit(None).cast("long").alias("ok"),
        F.lit(1).alias("is_event"),
    )
    right = od.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("ok"),
        F.lit(0).alias("is_event"),
    )
    # order rows sort before events at identical t (ties resolve to "order
    # visible at its own timestamp"), matching ASOF's >= semantics
    w = (
        Window.partitionBy("k")
        .orderBy(F.col("t").asc(), F.col("is_event").asc(), F.col("ok").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # pin the window exchange's partition count (r7): the carry-forward
    # window is compute-heavy per byte, and AQE's bytes-only coalescing
    # would fold this tiny-but-hot stage onto one core. repartition on the
    # SAME key the window partitions by adds no exchange — it IS the
    # window's exchange, with an explicit count AQE leaves alone.
    merged = (
        left.unionByName(right)
        .repartition(spark.sparkContext.defaultParallelism, "k")
        .withColumn("last_ok", F.last("ok", ignorenulls=True).over(w))
    )
    return (
        merged.filter((F.col("is_event") == 1) & F.col("last_ok").isNotNull())
        .select("event_id", F.col("last_ok").alias("last_orderkey"))
    )


# ---------------------------------------------------------------- aggregation

@q(
    "agg_hash",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum_sql('l_quantity')} AS sum_qty,
           {dsum_sql('l_extendedprice')} AS sum_base_price,
           {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {davg_sql('l_quantity')} AS avg_qty,
           {davg_sql('l_extendedprice')} AS avg_price,
           {davg_sql('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_hash(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q1-style pricing summary — partial (map-side) aggregation then
    final merge, the canonical hash-agg plan."""
    # par_scan (r7): the 8 decimal(30,10) partial aggregates fuse into the
    # scan stage; a single-row-group lineitem would run them all on one core
    li = par_scan(T(spark, sf, "lineitem")).filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc).alias("sum_disc_price"),
        dsum(disc * (1 + F.col("l_tax"))).alias("sum_charge"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_extendedprice").alias("avg_price"),
        davg("l_discount").alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@q(
    "agg_distinct",
    "SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events FROM events GROUP BY event_type",
)
def agg_distinct(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
    )


@q(
    "agg_approx",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users_exact,
           1 AS within_tol
    FROM events GROUP BY event_type
    """,
)
def agg_approx(spark: SparkSession, sf: str) -> DataFrame:
    """HLL++ approximate distinct — the scale path when exact distinct's
    shuffle is the bottleneck; rsd=0.02 keeps it within ±2%.

    Driver-gate contract (VERDICT r5 item 6): the HLL estimate itself has no
    DuckDB twin (different sketch), so the gated output is (a) the exact
    distinct count and (b) ``within_tol`` = 1 iff the HLL estimate is within
    10% (= 5·rsd, the bound the in-repo 5σ accuracy test already pins) of the
    exact count. The approximate path still RUNS — the flag is derived from
    the estimate — and any HLL regression past 5σ flips the flag and fails
    the hash gate. The oracle's ``1`` is therefore a real assertion, not a
    constant-by-construction."""
    est = F.approx_count_distinct("user_id", rsd=0.02)
    exact = F.countDistinct("user_id")
    return (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(est.alias("approx_users"), exact.alias("n_users_exact"))
        .select(
            "event_type",
            "n_users_exact",
            F.when(
                F.abs(F.col("approx_users") - F.col("n_users_exact"))
                <= 0.10 * F.col("n_users_exact"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("within_tol"),
        )
    )


@q(
    "agg_rollup",
    f"""
    SELECT n_name, c_mktsegment, COUNT(*) AS n_cust, {dsum_sql('c_acctbal')} AS sum_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def agg_rollup(spark: SparkSession, sf: str) -> DataFrame:
    c, n = T(spark, sf, "customer"), T(spark, sf, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("sum_acctbal"))
    )


@q(
    "agg_cube",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n, {dsum_sql('l_quantity')} AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf: str) -> DataFrame:
    return (
        T(spark, sf, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
    )


# ---------------------------------------------------------------- windows / sort

@q(
    "win_rank",
    """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
           NTILE(4) OVER w AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def win_rank(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    # pinned-count keyed repartition = the window's own exchange, exempt
    # from AQE's bytes-only coalescing (r7; measured 0.43s -> 0.31s)
    return T(spark, sf, "orders").repartition(
        spark.sparkContext.defaultParallelism, "o_custkey"
    ).select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@q(
    "win_analytic",
    """
    SELECT event_id, user_id,
           epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS delta_us,
           CAST(CAST(SUM(CAST(value AS DECIMAL(30,10))) OVER
                (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS running_value,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LEAD(event_id) OVER w AS next_event_id
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_analytic(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = T(spark, sf, "events")
    return e.select(
        "event_id",
        "user_id",
        # parquet timestamps arrive as TIMESTAMP_NTZ; cast for epoch math
        # (deltas cancel any session-tz interpretation)
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.lag("ts").over(w).cast("timestamp"))
        ).alias("delta_us"),
        F.sum(F.col("value").cast("decimal(30,10)")).over(wsum).cast("double").alias("running_value"),
        F.first("event_type").over(w).alias("first_type"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


@q(
    "sort_limit",
    """
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf: str) -> DataFrame:
    # TakeOrderedAndProject: per-partition top-k + driver merge, never a global sort
    return (
        T(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@q(
    "topk_per_group",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    # pinned-count keyed repartition = the window's own exchange (r7)
    return (
        T(spark, sf, "orders")
        .repartition(spark.sparkContext.defaultParallelism, "o_custkey")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


# ---------------------------------------------------------------- set ops

@q(
    "set_union",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    UNION
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_union(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.unionByName(r).distinct()


@q(
    "set_intersect",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    INTERSECT
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_intersect(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.intersect(r)


@q(
    "set_except",
    """
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
    EXCEPT
    SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R'
    """,
)
def set_except(spark: SparkSession, sf: str) -> DataFrame:
    li = T(spark, sf, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_orderkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return a.subtract(r)  # EXCEPT (set semantics), not exceptAll
