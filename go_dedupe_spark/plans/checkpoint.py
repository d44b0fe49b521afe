"""Stage checkpoint store with lineage + metrics and idempotent resume.

Generalizes the reference's two ad-hoc resume mechanisms —
``refresh=false`` skip-if-already-embedded (vector/sqlite.go:273-303)
and the Overture iterator's ``start-after`` line offset
(overture/iterator.go:85-96) — into one uniform rule: every stage
writes a checkpoint table + a manifest; a rerun with the same
``input_snapshot`` reuses the checkpoint (skip), a changed snapshot
recomputes. Incremental variants anti-join against the checkpoint.

Backend: Parquet directories + JSON manifests. On a cluster this class
is the seam where Iceberg slots in (``writeTo(...).createOrReplace()``
with snapshot ids as input_snapshot) — the interface is identical; the
sandbox container has no Iceberg runtime jar, so Parquet stands in.

Lineage/metrics schema (FIXTURES.md §4): stage, partition_id, rows_in,
rows_out, wall_ms, input_snapshot.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, stage: str, input_snapshot: str) -> Path:
        # content-addressed by snapshot: two configs/inputs NEVER share
        # a directory, so (a) switching back and forth reuses each
        # config's own checkpoint instead of thrashing recomputes, and
        # (b) a recompute never overwrites parquet files that a
        # previously returned (lazy) DataFrame still references.
        h = hashlib.sha256(input_snapshot.encode()).hexdigest()[:12]
        return self.root / f"{stage}@{h}"

    def _manifest(self, stage: str, input_snapshot: str) -> Path:
        return self._dir(stage, input_snapshot).with_suffix(".manifest.json")

    def has(self, stage: str, input_snapshot: str) -> bool:
        """True iff a completed checkpoint for this exact input exists."""
        mf = self._manifest(stage, input_snapshot)
        if not mf.exists():
            return False
        try:
            meta = json.loads(mf.read_text())
        except json.JSONDecodeError:
            return False
        return (
            meta.get("input_snapshot") == input_snapshot
            and meta.get("complete") is True
        )

    def read(self, spark: SparkSession, stage: str,
             input_snapshot: str) -> DataFrame:
        return spark.read.parquet(str(self._dir(stage, input_snapshot)))

    def write(
        self,
        df: DataFrame,
        stage: str,
        input_snapshot: str,
        sort_by: list[str] | None = None,
    ) -> DataFrame:
        """Materialize a stage. Deterministic on-disk layout: when
        ``sort_by`` is given the data is repartitioned by the key then
        sorted within partitions, so reruns are byte-stable (resume
        idempotency invariant, FIXTURES.md §5.5)."""
        t0 = time.monotonic()
        out = df
        if sort_by:
            out = df.repartition(*sort_by).sortWithinPartitions(*sort_by)
        path = self._dir(stage, input_snapshot)
        out.write.mode("overwrite").parquet(str(path))
        spark = df.sparkSession
        persisted = spark.read.parquet(str(path))
        rows_out = persisted.count()
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._manifest(stage, input_snapshot).write_text(json.dumps({
            "stage": stage,
            "input_snapshot": input_snapshot,
            "rows_out": rows_out,
            "wall_ms": wall_ms,
            "complete": True,
        }, indent=2))
        self._append_metrics(spark, stage, input_snapshot, rows_out, wall_ms)
        return persisted

    def get_or_compute(
        self,
        spark: SparkSession,
        stage: str,
        input_snapshot: str,
        compute,
        sort_by: list[str] | None = None,
    ) -> DataFrame:
        """The resume rule: reuse iff (stage, input_snapshot) checkpoint
        is complete, else compute() and persist."""
        if self.has(stage, input_snapshot):
            return self.read(spark, stage, input_snapshot)
        return self.write(compute(), stage, input_snapshot, sort_by=sort_by)

    # ------------------------------------------------------------ metrics

    def _append_metrics(self, spark, stage, snapshot, rows_out, wall_ms):
        rec = {
            "stage": stage,
            "input_snapshot": snapshot,
            "rows_out": rows_out,
            "wall_ms": wall_ms,
        }
        path = self.root / "metrics.jsonl"
        with path.open("a") as f:
            f.write(json.dumps(rec) + "\n")

    def metrics(self) -> list[dict]:
        path = self.root / "metrics.jsonl"
        if not path.exists():
            return []
        return [json.loads(line) for line in path.read_text().splitlines() if line]

    def partition_lineage(self, df: DataFrame, stage: str) -> DataFrame:
        """Per-partition row counts for a stage (lineage table,
        FIXTURES.md §4) — computed distributed, no driver collect of data."""
        from pyspark.sql import functions as F

        return (
            df.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .count()
            .select(
                F.lit(stage).alias("stage"),
                "partition_id",
                F.col("count").alias("rows_out"),
            )
        )
