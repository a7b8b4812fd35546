"""Conversation-level analytics over transcripts / extracted tables.

The extract job is per-turn; these operators are the whole-conversation
layer on top. Scale discipline: everything here is WINDOW functions or
aggregation over (conv_id) — never ``applyInPandas`` over a conversation
group, because a 5,000-turn conversation materialized as one pandas group is
exactly the skew the salted repartition exists to avoid (SURVEY.md §4).
One shuffle on conv_id per query; windows reuse it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

def _w_conv():
    # constructed lazily: Column/Window creation needs an active session in Spark 4
    return Window.partitionBy("conv_id").orderBy("turn_idx")


def turn_gaps(df: DataFrame) -> DataFrame:
    """Per-turn gap to the previous turn (seconds) and role transition."""
    W = _w_conv()
    prev_ts = F.lag("ts").over(W)
    return df.select(
        "conv_id",
        "turn_idx",
        "role",
        (
            (F.unix_micros(F.col("ts").cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp")))
            / 1e6
        ).alias("gap_sec"),
        F.concat_ws("->", F.lag("role").over(W), F.col("role")).alias("transition"),
    )


def response_latency(df: DataFrame) -> DataFrame:
    """user→assistant response time per exchange (the turn-pair metric an
    agent-quality pipeline monitors)."""
    g = turn_gaps(df)
    return g.filter(F.col("transition") == "user->assistant").select(
        "conv_id", "turn_idx", F.col("gap_sec").alias("response_sec")
    )


def conversation_stats(df: DataFrame) -> DataFrame:
    """One row per conversation: length, duration, role mix, payload size."""
    return df.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        (
            (F.unix_micros(F.max("ts").cast("timestamp")) - F.unix_micros(F.min("ts").cast("timestamp")))
            / 1e6
        ).alias("duration_sec"),
        F.sum(F.when(F.col("role") == "user", 1).otherwise(0)).alias("n_user"),
        F.sum(F.when(F.col("role") == "assistant", 1).otherwise(0)).alias("n_assistant"),
        F.sum(F.when(F.col("role") == "tool", 1).otherwise(0)).alias("n_tool"),
        F.sum(F.length("text")).alias("total_chars"),
    )


def span_kind_profile(extracted: DataFrame) -> DataFrame:
    """Distribution of extracted span kinds per conversation — the content
    'shape' signal (code-heavy vs prose-heavy conversations)."""
    return (
        extracted.select("conv_id", F.explode("spans").alias("s"))
        .groupBy("conv_id")
        .pivot("s.kind", ["content", "heading", "code", "list"])
        .count()
        .na.fill(0)
    )


def merge_consecutive_same_role(df: DataFrame) -> DataFrame:
    """Merge runs of consecutive same-role turns into one logical message
    (double-texting repair) — gaps-and-islands with windows, no grouping of
    whole conversations into memory. Keeps the first turn_idx of each run."""
    W = _w_conv()
    new_run = F.when(
        F.lag("role").over(W).isNull() | (F.lag("role").over(W) != F.col("role")), 1
    ).otherwise(0)
    run_id = F.sum(new_run).over(W.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        df.withColumn("_run", run_id)
        .groupBy("conv_id", "_run")
        .agg(
            F.min("turn_idx").alias("turn_idx"),
            # collect_list gives NO ordering guarantee after a shuffle:
            # collect (turn_idx, text) pairs and sort explicitly
            F.min_by("role", "turn_idx").alias("role"),
            F.concat_ws(
                "\n\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s.getField("text"),
                ),
            ).alias("text"),
            F.min("ts").alias("ts"),
            F.count("*").alias("n_merged"),
        )
        .drop("_run")
    )
