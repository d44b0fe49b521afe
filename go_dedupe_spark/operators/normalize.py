"""Stage 1 — normalize: input ``files`` table -> ``records`` table.

Ancestor: the index-locations ingest path — parse -> validate -> derive
geohash -> upsert (app/locations/index/index.go:71-94 +
location/sql.go:102-122). Here: derive id / content_sha256 / token
arrays as native Columns; invalid rows go to a quarantine DataFrame
instead of being swallowed in logs (index.go:75-77 logs-and-continues).

All derivations are built-in Column expressions -> whole-stage codegen,
predicate pushdown and column pruning remain available to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dedupe_spark.functions.hashing import (
    content_sha256,
    path_tokens,
    record_id_expr,
)


def normalize(files: DataFrame, src: str = "code") -> DataFrame:
    """files(repo, path, commit, lang, content) -> records.

    Output columns: id, src, repo, path, commit, lang, content,
    content_sha256, path_tokens. Invalid rows (null/empty natural key or
    content) are EXCLUDED — use :func:`quarantine` for the rejects
    (ancestor: InvalidRecordError, errors.go:8-34).
    """
    return (
        files.where(_valid_predicate())
        .select(
            record_id_expr().alias("id"),
            F.lit(src).alias("src"),
            "repo",
            "path",
            "commit",
            "lang",
            "content",
            content_sha256().alias("content_sha256"),
            path_tokens().alias("path_tokens"),
        )
    )


def quarantine(files: DataFrame) -> DataFrame:
    """The rows normalize() rejected, with a reason column — the
    DataFrame answer to the reference's logged-and-dropped invalid
    records (app/locations/index/index.go:75-77)."""
    reason = (
        F.when(F.col("repo").isNull() | (F.col("repo") == ""), "missing_repo")
        .when(F.col("path").isNull() | (F.col("path") == ""), "missing_path")
        .when(F.col("commit").isNull() | (F.col("commit") == ""), "missing_commit")
        .when(F.col("lang").isNull() | (F.col("lang") == ""), "missing_lang")
        .when(F.col("content").isNull(), "missing_content")
    )
    return files.where(~_valid_predicate()).withColumn("reject_reason", reason)


def _valid_predicate():
    return (
        F.col("repo").isNotNull() & (F.col("repo") != "")
        & F.col("path").isNotNull() & (F.col("path") != "")
        & F.col("commit").isNotNull() & (F.col("commit") != "")
        & F.col("lang").isNotNull() & (F.col("lang") != "")
        & F.col("content").isNotNull()
    )
