"""Scale-pattern demonstrations (SURVEY.md §4): bucketed co-located joins
(no shuffle on either side), dynamic partition pruning, and AQE behavior.
These pin the techniques a 100 TB deployment relies on; testdata is small but
the PLANS prove the mechanics.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """orders and lineitem bucketed by the join key into 8 buckets — the
    co-located layout a 10^12-row fact table would use so repeated joins
    never shuffle."""
    wh = tmp_path_factory.mktemp("wh")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(wh / "orders_b")
    ).saveAsTable("orders_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(wh / "lineitem_b")
    ).saveAsTable("lineitem_b")
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    try:
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        ).groupBy("o_orderstatus").agg(F.count("*").alias("n"))
        plan = _plan(j)
        join_section = plan.split("Join")[0] + plan.split("Join")[1][:2000]
        assert "Exchange" not in join_section.split("HashAggregate")[0], (
            "bucketed join must not shuffle either side"
        )
        # correctness unchanged vs the plain-parquet join
        plain = (
            spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_DIR}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
        )
        assert sorted(map(tuple, j.collect())) == sorted(map(tuple, plain.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_dynamic_partition_pruning(spark, tmp_path):
    """Fact table partitioned by a key column; a selective dim filter must
    prune fact partitions at runtime (dynamicpruning expression in the scan)."""
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumn(
        "yr", F.year("o_orderdate")
    )
    fact_path = str(tmp_path / "orders_part")
    o.write.partitionBy("yr").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    # DPP needs a FILTER on the dim side whose result prunes fact partitions
    dim = spark.createDataFrame(
        [(1995, "skip"), (1996, "pick"), (1997, "skip2")], "yr int, tag string"
    ).filter(F.col("tag") == "pick")
    j = fact.join(dim, "yr").groupBy("tag").agg(F.count("*").alias("n"))
    plan = _plan(j)
    assert "dynamicpruning" in plan.lower(), "dynamic partition pruning not planned"
    rows = j.collect()
    assert len(rows) == 1 and rows[0]["n"] > 0


def test_aqe_coalesces_tiny_shuffle(spark):
    """AQE shrinks the 32 configured shuffle partitions for a tiny group-by —
    the runtime re-plan that keeps small stages from drowning in task
    overhead at the other end of the scale spectrum."""
    df = (
        spark.read.parquet(f"{SF_DIR}/nation.parquet")
        .groupBy("n_regionkey")
        .agg(F.count("*").alias("n"))
    )
    parts = df.rdd.getNumPartitions()
    assert parts < int(spark.conf.get("spark.sql.shuffle.partitions")), (
        f"AQE should coalesce tiny shuffles, got {parts} partitions"
    )


def test_bucketed_query_entry_plan_has_no_exchange(spark):
    """The driver-gated join_bucketed_colocated entry: no Exchange (and no
    Sort beyond the bucket sort) feeding the SortMergeJoin."""
    from ocrautomator_spark.queries.scale_demo import QUERIES as SQ

    plan = _plan(SQ["join_bucketed_colocated"](spark, SF_DIR))
    assert "SortMergeJoin" in plan
    before_agg = plan.split("HashAggregate")[0]
    join_idx = before_agg.find("SortMergeJoin")
    assert "Exchange" not in before_agg[:join_idx] and "Exchange" not in before_agg[join_idx:], (
        "bucketed co-located join must not shuffle either side"
    )


def test_dpp_query_entry_plan_prunes(spark):
    from ocrautomator_spark.queries.scale_demo import QUERIES as SQ

    plan = _plan(SQ["join_dpp_partitioned"](spark, SF_DIR))
    assert "dynamicpruning" in plan.lower(), "dynamic partition pruning not planned"


def test_agg_approx_within_error_bound(spark):
    """HLL accuracy pin (r5 VERDICT item 6 reshaped the gated output): the
    raw estimate must stay within 5 * rsd * exact per event_type, and the
    query's driver-gated ``within_tol`` flag (|approx-exact| <= 10% = the
    same 5-sigma bound) must be 1 everywhere. HLL++'s rsd=0.02 is a
    standard-deviation bound, so 5 sigma is conservatively loose while
    still catching any real regression (a broken sketch is off by orders
    of magnitude, not percent)."""
    from pyspark.sql import functions as F

    from ocrautomator_spark.queries.relational import QUERIES as RQ, T

    sf = "/root/testdata/sf0.01"
    raw = (
        T(spark, sf, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"))
    )
    approx = {r["event_type"]: r["approx_users"] for r in raw.collect()}
    exact = {r["event_type"]: r["n_users"] for r in RQ["agg_distinct"](spark, sf).collect()}
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        assert abs(approx[et] - ex) <= 5 * 0.02 * ex, (
            f"{et}: approx {approx[et]} vs exact {ex} outside 5*rsd bound"
        )
    gated = RQ["agg_approx"](spark, sf).collect()
    assert gated and all(r["within_tol"] == 1 for r in gated)
    assert {r["event_type"]: r["n_users_exact"] for r in gated} == exact


def test_aqe_skew_join_splits_hot_partition(spark, tmp_path):
    """The 100 TB skew story the engine relies on (SURVEY §4): a sort-merge
    join whose hot key dwarfs the median partition is re-planned by AQE's
    OptimizeSkewedJoin into split sub-partitions (skew=true in the final
    plan) — no manual salting needed on the join path. Thresholds are
    lowered to make the mechanism fire at test scale; the assertion is on
    the PLAN mechanics, which are scale-invariant."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    # key 0 carries 300k rows with a fat payload; keys 1..63 carry 200 each
    hot = spark.range(300_000).select(
        F.lit(0).alias("k"), F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload")
    )
    cold = spark.range(64 * 200).select(
        (F.col("id") % 63 + 1).alias("k"), F.col("id").cast("string").alias("payload")
    )
    hot.unionAll(cold).write.mode("overwrite").parquet(fact_path)
    spark.range(64).select(F.col("id").alias("k"), F.lit("d").alias("dval")).write.mode(
        "overwrite"
    ).parquet(dim_path)

    conf = spark.conf
    saved = {
        "spark.sql.autoBroadcastJoinThreshold": conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        ),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        ),
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256KB")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        joined = spark.read.parquet(fact_path).join(spark.read.parquet(dim_path), "k")
        assert joined.count() == 300_000 + 64 * 200
        # execute THIS dataset's own QueryExecution so its adaptive plan
        # finalizes (count() above ran a different, aggregated execution)
        qe = joined._jdf.queryExecution()
        assert qe.toRdd().count() == 300_000 + 64 * 200
        final = qe.executedPlan().toString()
        assert "skew=true" in final, final[:1500]
    finally:
        for k, v in saved.items():
            conf.set(k, v)


def test_substring_family_scale_guards(spark, tmp_path):
    """VERDICT r4 item 7 — evidence the substring-dedup 100 TB story beyond
    the gate scale. (a) At sf0.1, the 1/16 mod-sample bounds the pair-stage
    shuffle: selected window rows ≤ corpus_chars/16 × 1.2 (fixed-width md5
    keys, so shuffle bytes ≤ ~corpus_bytes/16 × key_width/char_width). (b)
    The MAX_DF stop-window guard actually caps the hottest bucket: a planted
    boilerplate window shared by 150 docs (DF ≫ MAX_DF) is dropped before
    the self-join, so the detector emits ZERO pairs instead of ~150²/2 —
    for BOTH the md5 and the Rabin-Karp detector."""
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    import ocrautomator_spark.queries.pipeline_ops as po

    # (a) shuffle-volume bound at sf0.1 on the real corpus
    sf = "/root/testdata/sf0.1"
    corpus = po._substring_corpus(spark, sf)
    idx = F.sequence(F.lit(1), F.greatest(F.length("t") - (po.SUBSTR_WIN - 1), F.lit(1)))
    wins = corpus.select(
        "doc_id",
        F.explode(
            F.transform(idx, lambda i: F.md5(F.col("t").substr(i, F.lit(po.SUBSTR_WIN))))
        ).alias("h"),
    )
    sel = wins.filter(F.substring("h", 1, 1) == po.SUBSTR_SEL_HEX).distinct()
    n_sel = sel.count()
    total_chars = corpus.agg(F.sum(F.length("t"))).collect()[0][0]
    assert n_sel <= total_chars / 16 * 1.2, (
        f"mod-sample leaked: {n_sel} selected rows vs {total_chars} chars"
    )

    # (b) planted hot window: 150 docs share one 64-char boilerplate run
    rng = random.Random(9)
    boiler = "".join(rng.choice("abcdefghij") for _ in range(300))  # 237 windows: P(no sampled window) ≈ 2e-7
    ids, texts = [], []
    next_id = 1
    for _ in range(150):
        if next_id % po.SUBSTR_PLANT_MOD == 0:
            next_id += 1  # keep the corpus helper's own planting inert
        ids.append(next_id)
        # a doc-unique single char at each boilerplate edge: every window
        # CROSSING the edge contains it and is doc-unique (a multi-char id
        # tag would leak shared suffixes — doc 33 and 133 both end "33"),
        # so the only cross-doc shared windows are the 237 in-boiler ones
        tag = chr(0x4E00 + len(ids))
        texts.append(
            "".join(rng.choice("qrstuvwxyz ") for _ in range(120))
            + tag + boiler + tag
            + "".join(rng.choice("qrstuvwxyz ") for _ in range(120))
        )
        next_id += 1
    pq.write_table(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
        str(tmp_path / "documents.parquet"),
    )
    hot_corpus = po._substring_corpus(spark, str(tmp_path))
    hot_wins = hot_corpus.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.length("t") - (po.SUBSTR_WIN - 1), F.lit(1))),
                lambda i: F.md5(F.col("t").substr(i, F.lit(po.SUBSTR_WIN))),
            )
        ).alias("h"),
    )
    hot_sel = hot_wins.filter(F.substring("h", 1, 1) == po.SUBSTR_SEL_HEX).distinct()
    pre_guard_max = hot_sel.groupBy("h").count().agg(F.max("count")).collect()[0][0]
    assert pre_guard_max > po.MAX_DF, (
        f"plant failed: hottest sampled window DF {pre_guard_max} ≤ MAX_DF — "
        "the boilerplate run selected no window under this hash (re-seed)"
    )
    for qname in ("dedup_substring_windows", "dedup_substring_windows_rk"):
        pairs = po.QUERIES[qname](spark, str(tmp_path)).count()
        assert pairs == 0, (
            f"{qname}: {pairs} pairs from a >MAX_DF boilerplate bucket — "
            "the stop-window guard did not cap the hot bucket"
        )


def test_skew_salted_join_spreads_hot_key_and_keeps_salt_in_exchange(spark):
    """join_skew_salted: the synthetic skew is real (hot key carries >=40%
    of the fact side), the salt spreads the hot key's rows ~NSALT ways (no
    single (k, salt) task carries more than ~1/NSALT of them), and the join
    exchange partitions on (k, salt) with no broadcast fallback — the plan
    a salted shuffle join must have at 100 TB."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from ocrautomator_spark.queries import scale_demo as sd
    from tests.conftest import SF_DIR

    df = sd.QUERIES["join_skew_salted"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "hashpartitioning(k" in plan and "salt" in plan

    li = sd.T(spark, SF_DIR, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 4 < 2, F.lit(0)).otherwise(F.col("l_suppkey")).alias("k"),
        F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(sd.SKEWJ_NSALT)).alias("salt"),
    )
    total = fact.count()
    hot = fact.filter("k = 0").count()
    assert hot >= 0.4 * total, (hot, total)  # the skew is real, not vacuous
    max_salted = (
        fact.filter("k = 0").groupBy("salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert max_salted <= hot / sd.SKEWJ_NSALT * 1.3, (max_salted, hot)
