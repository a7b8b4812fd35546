"""TableIO — the storage seam (SURVEY.md §0 'Iceberg gap', §7 M3).

The north_rule targets Iceberg tables; this sandbox has no Iceberg runtime
jars and no network. All checkpoint/resume logic is therefore written against
a small interface with two backends:

* ``IcebergIO`` — the real-cluster backend. Config-only here: documents the
  exact calls (``df.writeTo(table).append()``; restart from the last committed
  snapshot via the ``snapshots`` metadata table) and raises cleanly if the
  Iceberg catalog isn't on the classpath.
* ``ParquetManifestIO`` — sandbox emulation of snapshot/manifest semantics:
  each committed chunk is a parquet directory plus an atomic JSON manifest
  (write tmp + ``os.replace``), the moral equivalent of one Iceberg append
  snapshot. This is the columnar rebuild of ocrAutomator's resume file
  (SURVEY.md §2A A10): the manifest set IS the resume state.
"""

from __future__ import annotations

import json
import os
import pathlib
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession


class ParquetManifestIO:
    """Parquet data + atomic per-chunk JSON manifests under one root dir."""

    def __init__(self, root: str) -> None:
        self.root = pathlib.Path(root)
        self.data_dir = self.root / "data"
        self.manifest_dir = self.root / "_manifests"
        self.manifest_dir.mkdir(parents=True, exist_ok=True)

    # -- resume state (A10) --
    def committed_buckets(self) -> set[int]:
        out = set()
        for p in self.manifest_dir.glob("bucket-*.json"):
            try:
                out.add(int(json.loads(p.read_text())["bucket"]))
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn write never counts as committed
        return out

    def bucket_manifest(self, bucket: int) -> dict[str, Any] | None:
        p = self.manifest_dir / f"bucket-{bucket:05d}.json"
        return json.loads(p.read_text()) if p.exists() else None

    # -- commit protocol: data first, manifest last, manifest rename atomic --
    def write_bucket_data(self, df: DataFrame, bucket: int) -> str:
        """Write a chunk's data files. NOT yet committed: until commit_bucket
        lands the manifest, a restart treats this bucket as not done and the
        mode=overwrite write makes the retry idempotent."""
        path = self.data_dir / f"bucket={bucket:05d}"
        df.write.mode("overwrite").parquet(str(path))
        return str(path)

    def commit_bucket(self, bucket: int, run_id: str, stats: dict[str, Any] | None = None) -> dict[str, Any]:
        manifest = {
            "bucket": bucket,
            "run_id": run_id,
            "path": str(self.data_dir / f"bucket={bucket:05d}"),
            "committed_at": time.time(),
            **(stats or {}),
        }
        final = self.manifest_dir / f"bucket-{bucket:05d}.json"
        tmp = final.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=1))
        os.replace(tmp, final)  # atomic on POSIX: a manifest is all-or-nothing
        return manifest

    def write_bucket(self, df: DataFrame, bucket: int, run_id: str, stats: dict[str, Any] | None = None) -> None:
        self.write_bucket_data(df, bucket)
        self.commit_bucket(bucket, run_id, stats)

    def read(self, spark: SparkSession) -> DataFrame:
        committed = sorted(self.committed_buckets())
        paths = [str(self.data_dir / f"bucket={b:05d}") for b in committed]
        if not paths:
            raise FileNotFoundError(f"no committed buckets under {self.root}")
        return spark.read.parquet(*paths)

    def manifests(self) -> list[dict[str, Any]]:
        return sorted(
            (json.loads(p.read_text()) for p in self.manifest_dir.glob("bucket-*.json")),
            key=lambda m: m["bucket"],
        )


class IcebergIO:
    """Real-cluster backend. Every method maps 1:1 onto public Iceberg calls;
    in this sandbox (no Iceberg jars, SURVEY.md §0) construction fails fast."""

    def __init__(self, spark: SparkSession, table: str) -> None:
        self.table = table
        try:
            spark.sql(f"SELECT 1 FROM {table}.snapshots LIMIT 1")
        except Exception as e:  # noqa: BLE001
            raise RuntimeError(
                "Iceberg catalog unavailable in this environment. On a real "
                "cluster: spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog; "
                "then write_bucket == df.writeTo(table).append() (one snapshot per "
                "chunk, commit metadata carries bucket+run_id via snapshot summary "
                "properties), committed_buckets == SELECT summary['bucket'] FROM "
                f"{table}.snapshots, and read == spark.read.table(table)."
            ) from e

    def committed_buckets(self) -> set[int]:  # pragma: no cover - cluster only
        raise NotImplementedError

    def write_bucket(self, df: DataFrame, bucket: int, run_id: str, stats=None):  # pragma: no cover
        raise NotImplementedError

    def read(self, spark: SparkSession) -> DataFrame:  # pragma: no cover
        raise NotImplementedError
