"""VERDICT r6 item 7: the four UDF-family keys rotated out of the r6 driver
sample (udf_scalar_pandas, udaf_grouped, udtf_map, udtf_grouped_map) stay
exercised every suite run, so a future rotation back into the driver set
cannot surprise. Row-count + schema sanity at the gate SF; full value parity
stays covered by tests/test_oracle_parity.py."""

from __future__ import annotations

from ocrautomator_spark.queries import QUERIES
from tests.conftest import SF_DIR

UDF_KEYS = ["udf_scalar_pandas", "udaf_grouped", "udtf_map", "udtf_grouped_map"]


def test_udf_family_smoke(spark):
    for name in UDF_KEYS:
        df = QUERIES[name](spark, SF_DIR)
        rows = df.collect()
        assert len(rows) > 0, f"{name}: empty result"
        assert len(df.columns) > 0, name
