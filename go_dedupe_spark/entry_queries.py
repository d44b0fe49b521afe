"""Driver-contract queries: one entry per implemented operator
(SURVEY.md §2 + the training-data operators), each with a DuckDB oracle
SQL twin producing identical columns and values.

Cross-engine determinism rules used throughout:
- md5/sha256 are bit-identical in Spark and DuckDB -> all blocking keys
  and fingerprints check exactly.
- every float output is round()ed in BOTH engines (raw double sums can
  differ in the last ulp between engines / partition orders).
- integer aggregates are cast to BIGINT in SQL (DuckDB sums ints to
  HUGEINT; Spark uses long).
- window ranks order by (rounded value, id) so ties are deterministic.

The ER queries run the real pipeline operators over the ``documents``
table via a files-shaped adapter (doc_id -> id, source/doc_id -> path,
text -> content).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_dedupe_spark.functions.hashing import minhash_band_keys
from go_dedupe_spark.functions.similarity import (
    jaro_winkler_udf,
    token_shingles,
    word_tokens,
)

# ---------------------------------------------------------------- registry

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ------------------------------------------------- ER pipeline constants

ER_NH, ER_R = 8, 4          # unigram-token MinHash: 2 bands x 4 rows
CMH_NH, CMH_R = 9, 3        # 3-token-shingle MinHash: 3 bands x 3 rows
SHA_PREFIX = 12
ER_W_JW, ER_W_JAC = 0.3, 0.7
ER_THRESHOLD = 0.31

# --- shared DuckDB CTE text (records/shingles/signatures/blocks/pairs) ---

_SQL_TOKS = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9_]+'), "
    "t -> t <> '')"
)


def _sql_sig(n: int, src: str, prefix: str) -> str:
    return ", ".join(
        f"list_aggregate(list_transform({src}, t -> md5('{i}:' || t)), 'min') "
        f"{prefix}{i}"
        for i in range(n)
    )


def _sql_band(prefix: str, band: int, rows: int, sig_prefix: str) -> str:
    parts = " || ',' || ".join(
        f"{sig_prefix}{band * rows + r}" for r in range(rows)
    )
    return f"lang || ':{prefix}:{band}:' || md5({parts})"


def _records_cte() -> str:
    return f"""
t AS (
  SELECT doc_id, lang, source, text,
         sha256('doc:' || CAST(doc_id AS VARCHAR)) AS id,
         source || '/doc_' || CAST(doc_id AS VARCHAR) || '.txt' AS path,
         sha256(text) AS content_sha256,
         {_SQL_TOKS} AS toks
  FROM documents
),
sh AS (
  SELECT *, CASE WHEN len(toks) < 3 THEN [array_to_string(toks, ' ')]
       ELSE list_transform(range(1, len(toks) - 1),
                           i -> array_to_string(toks[i:i+2], ' ')) END AS shingles
  FROM t
)"""


def _blocks_cte() -> str:
    mh_bands = ER_NH // ER_R
    cmh_bands = CMH_NH // CMH_R
    selects = [
        f"SELECT id, 'sha:' || lang || ':' || substr(content_sha256, 1, {SHA_PREFIX}) "
        f"AS block_key, 'sha' AS block_kind FROM sig"
    ]
    for b in range(mh_bands):
        selects.append(
            f"SELECT id, {_sql_band('mh', b, ER_R, 's')} AS block_key, "
            f"'mh' AS block_kind FROM sig"
        )
    for b in range(cmh_bands):
        selects.append(
            f"SELECT id, {_sql_band('cmh', b, CMH_R, 'c')} AS block_key, "
            f"'cmh' AS block_kind FROM sig"
        )
    union = " UNION ALL ".join(selects)
    return f"""
sig AS (
  SELECT id, lang, content_sha256,
         {_sql_sig(ER_NH, 'toks', 's')},
         {_sql_sig(CMH_NH, 'shingles', 'c')}
  FROM sh
),
bl AS (SELECT DISTINCT id, block_key, block_kind FROM ({union}))"""


def _pairs_cte() -> str:
    return """
pr AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bl a JOIN bl b ON a.block_key = b.block_key AND a.id < b.id
)"""


def _scores_cte() -> str:
    return f"""
sc AS (
  SELECT pr.id_a, pr.id_b,
    round(jaro_winkler_similarity(x.path, y.path), 6) AS jw_path,
    round(len(list_intersect(list_distinct(x.shingles), list_distinct(y.shingles)))
      * 1.0 / len(list_distinct(list_concat(x.shingles, y.shingles))), 6)
      AS jaccard_content,
    round({ER_W_JW} * jaro_winkler_similarity(x.path, y.path)
      + {ER_W_JAC} * (len(list_intersect(list_distinct(x.shingles), list_distinct(y.shingles)))
      * 1.0 / len(list_distinct(list_concat(x.shingles, y.shingles)))), 6) AS score
  FROM pr JOIN sh x ON x.id = pr.id_a JOIN sh y ON y.id = pr.id_b
)"""


# ---------------------------------------------- ER pipeline Spark builders


def _doc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.sha2(F.concat(F.lit("doc:"), F.col("doc_id").cast("string")), 256).alias("id"),
        F.concat(F.col("source"), F.lit("/doc_"),
                 F.col("doc_id").cast("string"), F.lit(".txt")).alias("path"),
        "lang",
        F.col("text").alias("content"),
        F.sha2(F.col("text"), 256).alias("content_sha256"),
        word_tokens(F.col("text")).alias("toks"),
    ).withColumn("shingles", token_shingles(F.col("toks"), n=3))


def _doc_blocks(records: DataFrame) -> DataFrame:
    sha_key = F.concat(F.lit("sha:"), F.col("lang"), F.lit(":"),
                       F.substring("content_sha256", 1, SHA_PREFIX))
    mh = minhash_band_keys(F.col("toks"), num_hashes=ER_NH, band_rows=ER_R,
                           prefix="mh")
    cmh = minhash_band_keys(F.col("shingles"), num_hashes=CMH_NH,
                            band_rows=CMH_R, prefix="cmh")
    lang_scoped = lambda arr: F.transform(  # noqa: E731
        arr, lambda k: F.concat(F.col("lang"), F.lit(":"), k)
    )
    kinds = F.concat(
        F.array(F.struct(sha_key.alias("block_key"), F.lit("sha").alias("block_kind"))),
        F.transform(lang_scoped(mh),
                    lambda k: F.struct(k.alias("block_key"),
                                       F.lit("mh").alias("block_kind"))),
        F.transform(lang_scoped(cmh),
                    lambda k: F.struct(k.alias("block_key"),
                                       F.lit("cmh").alias("block_kind"))),
    )
    return (
        records.select("id", F.explode(kinds).alias("k"))
        .select("id", "k.block_key", "k.block_kind")
        .dropDuplicates(["id", "block_key", "block_kind"])
    )


def _doc_pairs(blocks: DataFrame) -> DataFrame:
    a = blocks.select(F.col("id").alias("id_a"), "block_key")
    b = blocks.select(F.col("id").alias("id_b"), "block_key")
    return (
        a.join(b, ["block_key"]).where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b").distinct()
    )


def _doc_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    records = _doc_records(spark, sf_dir)
    pairs = _doc_pairs(_doc_blocks(records))
    x = records.select(F.col("id").alias("id_a"), F.col("path").alias("path_a"),
                       F.col("shingles").alias("sh_a"))
    y = records.select(F.col("id").alias("id_b"), F.col("path").alias("path_b"),
                       F.col("shingles").alias("sh_b"))
    jw = jaro_winkler_udf(F.col("path_a"), F.col("path_b"))
    inter = F.size(F.array_intersect(F.array_distinct("sh_a"),
                                     F.array_distinct("sh_b")))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter * F.lit(1.0) / union
    return (
        pairs.join(x, "id_a").join(y, "id_b")
        .select(
            "id_a", "id_b",
            F.round(jw, 6).alias("jw_path"),
            F.round(jac, 6).alias("jaccard_content"),
            F.round(F.lit(ER_W_JW) * jw + F.lit(ER_W_JAC) * jac, 6).alias("score"),
        )
    )


# ----------------------------------------------------------- ER queries


@query("er_records", f"""
WITH {_records_cte()}
SELECT id, path, lang, content_sha256,
       CAST(len(toks) AS BIGINT) AS n_tokens
FROM sh
""")
def er_records(spark, sf_dir):
    """Stage-1 normalize over the documents adapter (ancestor:
    index-locations ingest, app/locations/index/index.go:71-94)."""
    return _doc_records(spark, sf_dir).select(
        "id", "path", "lang", "content_sha256",
        F.size("toks").cast("long").alias("n_tokens"),
    )


@query("er_blocks", f"""
WITH {_records_cte()}, {_blocks_cte()}
SELECT id, block_key, block_kind FROM bl
""")
def er_blocks(spark, sf_dir):
    """Stage-2 multi-family blocking keys (ancestor: geohash precision-5,
    location/location.go:67-77)."""
    return _doc_blocks(_doc_records(spark, sf_dir))


@query("er_block_histogram", f"""
WITH {_records_cte()}, {_blocks_cte()}
SELECT block_key, CAST(count(*) AS BIGINT) AS n_ids
FROM bl GROUP BY block_key
""")
def er_block_histogram(spark, sf_dir):
    """Ancestor: SELECT geohash, COUNT(id) ... GROUP BY geohash
    (location/sql.go:149-184, operator A1)."""
    blocks = _doc_blocks(_doc_records(spark, sf_dir))
    return blocks.groupBy("block_key").agg(F.count("*").alias("n_ids"))


@query("er_candidate_pairs", f"""
WITH {_records_cte()}, {_blocks_cte()}, {_pairs_cte()}
SELECT id_a, id_b FROM pr
""")
def er_candidate_pairs(spark, sf_dir):
    """Stage-3 block self-join with id_a < id_b (ancestors J1 block
    equi-join compare/database.go:183-299 + A2 symmetric dedup)."""
    return _doc_pairs(_doc_blocks(_doc_records(spark, sf_dir)))


@query("er_scores", f"""
WITH {_records_cte()}, {_blocks_cte()}, {_pairs_cte()}, {_scores_cte()}
SELECT id_a, id_b, jw_path, jaccard_content, score,
       score >= {ER_THRESHOLD} AS is_match
FROM sc
""")
def er_scores(spark, sf_dir):
    """Stage-4 pairwise scoring (ancestor: embed+L2 kNN probe,
    vector/sqlite.go:368-437; here JW-on-path + shingle Jaccard)."""
    return _doc_scores(spark, sf_dir).withColumn(
        "is_match", F.col("score") >= F.lit(ER_THRESHOLD)
    )


@query("er_matches_topk", f"""
WITH {_records_cte()}, {_blocks_cte()}, {_pairs_cte()}, {_scores_cte()}
SELECT id_a, id_b, score,
       CAST(row_number() OVER (PARTITION BY id_a ORDER BY score DESC, id_b)
            AS BIGINT) AS rank
FROM sc
WHERE score >= {ER_THRESHOLD}
QUALIFY rank <= 10
""")
def er_matches_topk(spark, sf_dir):
    """Top-k accepted matches per record (ancestors J2/J3/O1: ORDER BY
    distance LIMIT k + top-1 early break, vector/sqlite.go:391)."""
    scores = _doc_scores(spark, sf_dir).where(F.col("score") >= ER_THRESHOLD)
    w = Window.partitionBy("id_a").orderBy(F.desc("score"), "id_b")
    return (
        scores.select("id_a", "id_b", "score")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 10)
    )


@query("er_components", f"""
WITH RECURSIVE {_records_cte()}, {_blocks_cte()}, {_pairs_cte()}, {_scores_cte()},
m AS (SELECT id_a, id_b FROM sc WHERE score >= {ER_THRESHOLD}),
edges AS (SELECT id_a AS u, id_b AS v FROM m
          UNION SELECT id_b, id_a FROM m),
reach(id, r) AS (
  SELECT id, id FROM t
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
)
SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
""")
def er_components(spark, sf_dir):
    """Stage-5 transitive clustering (fills the reference's gap C5,
    SURVEY.md §2.9) — large-star/small-star CC; oracle is a recursive
    min-reachability CTE."""
    from go_dedupe_spark.operators.components import connected_components

    records = _doc_records(spark, sf_dir)
    scores = _doc_scores(spark, sf_dir)
    matches = scores.where(F.col("score") >= ER_THRESHOLD).select("id_a", "id_b")
    comp = connected_components(matches)
    singletons = (
        records.select("id")
        .join(comp.select("id"), "id", "left_anti")
        .withColumn("cluster_id", F.col("id"))
    )
    return comp.unionByName(singletons)


@query("er_resolution", f"""
WITH RECURSIVE {_records_cte()}, {_blocks_cte()}, {_pairs_cte()}, {_scores_cte()},
m AS (SELECT id_a, id_b FROM sc WHERE score >= {ER_THRESHOLD}),
edges AS (SELECT id_a AS u, id_b AS v FROM m
          UNION SELECT id_b, id_a FROM m),
reach(id, r) AS (
  SELECT id, id FROM t
  UNION
  SELECT reach.id, e.v FROM reach JOIN edges e ON reach.r = e.u
),
comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT id, cluster_id,
       max(id) OVER (PARTITION BY cluster_id) AS survivor_id,
       id = max(id) OVER (PARTITION BY cluster_id) AS is_survivor
FROM comp
""")
def er_resolution(spark, sf_dir):
    """Stage-6 survivor selection per cluster (ancestor: precedence
    rules process.go:143-333; tie rule (d): higher id wins
    process.go:295-312)."""
    comp = er_components(spark, sf_dir)
    w = Window.partitionBy("cluster_id")
    return comp.select(
        "id", "cluster_id",
        F.max("id").over(w).alias("survivor_id"),
    ).withColumn("is_survivor", F.col("id") == F.col("survivor_id"))
