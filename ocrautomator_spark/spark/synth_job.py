"""Distributed synthetic-transcripts generation.

Each Spark task generates whole conversations independently (the counter-based
PRNG has no cross-row state — FIXTURES.md §A), so generation scales linearly
and the produced table is byte-identical regardless of parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocrautomator_spark.spark.schemas import TRANSCRIPTS
from ocrautomator_spark.synth.transcripts import SEED, gen_conversation


def synth_transcripts_df(
    spark: SparkSession,
    n_convs: int,
    seed: int = SEED,
    n_partitions: int | None = None,
) -> DataFrame:
    n = n_partitions or spark.sparkContext.defaultParallelism * 2

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for i in pdf["id"]:
                rows = gen_conversation(int(i), seed)
                out = pd.DataFrame(rows, columns=[f.name for f in TRANSCRIPTS.fields])
                out["turn_idx"] = out["turn_idx"].astype("int32")
                yield out

    return spark.range(n_convs).repartition(n).mapInPandas(gen, TRANSCRIPTS)
