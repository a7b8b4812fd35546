"""DuckDB oracle parity — the local twin of the driver's correctness gate
(__spark_entry__.py:3-7): for every oracled query, run the Spark DataFrame
version AND the ANSI-SQL oracle, then compare row count, column names, and
canonicalized values order-insensitively. Exact equality, floats included —
the engine's numeric discipline (decimal-exact sums, IEEE-only scalar ops)
is designed to make Spark and DuckDB bit-identical.

SPARK_GRAFT_PARITY_SF selects the scale (default sf0.001; driver uses sf0.01).
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    # DuckDB defaults to local time for TIMESTAMP rendering edge cases; the
    # testdata timestamps are naive so no TZ conversion applies either way.
    return con


def _canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)  # exact double repr: bit-identity or bust
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rows_to_canonical(col_names, rows):
    order = sorted(range(len(col_names)), key=lambda i: col_names[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_oracle_parity(spark, ddb, name):
    from ocrautomator_spark.queries.pipeline_ops import MINHASH_ORACLE_ENV, MINHASH_ORACLE_ONLY

    # the minhash entries default to the xxhash64 production hash (r6 gate
    # inversion); their registered md5-twin oracle is only valid in oracle
    # mode, so this gate — and only this gate — opts in
    oracle_mode = name in MINHASH_ORACLE_ONLY
    prior = os.environ.get(MINHASH_ORACLE_ENV)
    if oracle_mode:
        os.environ[MINHASH_ORACLE_ENV] = "1"
    try:
        sdf = QUERIES[name](spark, SF_DIR)
        spark_cols = sdf.columns
        spark_rows = [tuple(r) for r in sdf.collect()]
    finally:
        if oracle_mode:
            if prior is None:
                os.environ.pop(MINHASH_ORACLE_ENV, None)
            else:
                os.environ[MINHASH_ORACLE_ENV] = prior

    res = ddb.execute(ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    a = _rows_to_canonical(spark_cols, spark_rows)
    b = _rows_to_canonical(duck_cols, duck_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        pytest.fail(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    rows = sdf.collect()
    assert rows is not None
    assert len(sdf.columns) > 0


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)
