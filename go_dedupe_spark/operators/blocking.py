"""Stage 2 — blocking: ``records`` -> exploded ``blocks`` table.

Ancestor: the geohash blocking key (precision 5 ~ 2.4 km cells,
location/location.go:14-15, 67-77; README.md:34-45 explains it as THE
core optimization — only same-block pairs are ever compared).

This engine blocks on THREE key families (north_star):
- ``sha``  — lang + sha256(content) 12-hex prefix: exact-duplicate fast
             path. Any two byte-identical contents land in one block.
- ``mh``   — MinHash-band keys over path tokens (b bands x r rows):
             near-duplicate recall on renamed/moved files. A record
             explodes into one row per band — the multi-key
             generalization README.md:44-45 foreshadows with
             variable-precision geohashes.
- ``cmh``  — MinHash-band keys over content word-shingles: catches
             near-dup content under heavy path divergence.

Output: blocks(block_key string, block_kind string, id string).
Everything is built-in Columns (md5/sha2/transform/array) — no UDFs,
full whole-stage codegen; the explode is Catalyst's generator node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_dedupe_spark.functions.hashing import minhash_band_keys
from go_dedupe_spark.functions.similarity import word_tokens

SHA_PREFIX_LEN = 12


def make_blocks(
    records: DataFrame,
    num_hashes: int = 12,
    band_rows: int = 3,
    content_num_hashes: int = 9,
    content_band_rows: int = 3,
    use_path_bands: bool = True,
    use_content_bands: bool = True,
) -> DataFrame:
    """records -> blocks(block_key, block_kind, id), exploded."""
    if use_content_bands:
        # materialize content tokens once (inline exprs re-evaluate per
        # signature permutation)
        records = records.withColumn(
            "_content_toks", word_tokens(F.col("content"))
        )
    sha_key = F.concat(
        F.lit("sha:"), F.col("lang"), F.lit(":"),
        F.substring(F.col("content_sha256"), 1, SHA_PREFIX_LEN),
    )
    keys = [F.struct(sha_key.alias("block_key"), F.lit("sha").alias("block_kind"))]

    arrays = [F.array(*keys)]
    if use_path_bands:
        path_keys = minhash_band_keys(
            F.col("path_tokens"), num_hashes=num_hashes, band_rows=band_rows,
            prefix="mh",
        )
        # scope path bands by lang so unrelated languages never pair
        arrays.append(
            F.transform(
                path_keys,
                lambda k: F.struct(
                    F.concat(F.col("lang"), F.lit(":"), k).alias("block_key"),
                    F.lit("mh").alias("block_kind"),
                ),
            )
        )
    if use_content_bands:
        content_keys = minhash_band_keys(
            F.col("_content_toks"),
            num_hashes=content_num_hashes, band_rows=content_band_rows,
            prefix="cmh",
        )
        arrays.append(
            F.transform(
                content_keys,
                lambda k: F.struct(
                    F.concat(F.col("lang"), F.lit(":"), k).alias("block_key"),
                    F.lit("cmh").alias("block_kind"),
                ),
            )
        )

    all_keys = arrays[0]
    for a in arrays[1:]:
        all_keys = F.concat(all_keys, a)

    # no dropDuplicates: every key family embeds a distinct prefix
    # (sha: / mh:{band}: / cmh:{band}:), so one record cannot emit the
    # same block_key twice — a dedup here would be a full no-op shuffle
    return (
        records.select(F.col("id"), F.explode(all_keys).alias("k"))
        .select(
            F.col("k.block_key").alias("block_key"),
            F.col("k.block_kind").alias("block_kind"),
            "id",
        )
    )


def block_histogram(blocks: DataFrame) -> DataFrame:
    """block_key -> member count, biggest first.

    Ancestor: ``SELECT geohash, COUNT(id) ... GROUP BY geohash ORDER BY
    count DESC`` (location/sql.go:149-184). The reference used it for
    biggest-blocks-first work stealing; here it feeds skew diagnostics
    and the mega-block cap in candidate_pairs.
    """
    return (
        blocks.groupBy("block_key")
        .agg(F.count("id").alias("n_ids"))
        .orderBy(F.desc("n_ids"), "block_key")
    )
