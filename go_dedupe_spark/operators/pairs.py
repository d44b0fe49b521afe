"""Stage 3 — candidate pairs: ``blocks`` self-join -> ``pairs``.

Ancestor: the hand-rolled block-nested-loop join — one goroutine per
geohash, per-block temp vector DB, probe every target row
(compare/database.go:183-299 + compare/geohash.go:36-211). In Spark the
whole mechanism is ONE shuffle: self-equi-join on block_key.

Scale design (the part that must survive 100 TB):
- ``id_a < id_b`` in the join condition PREVENTS symmetric duplicates
  instead of filtering them after the fact (ancestor: the collector's
  sync.Map canonical-pair dedup, compare/database.go:156-174 — that is
  a driver-side bottleneck; this is free).
- Mega-block capping: a block with n members yields n(n-1)/2 pairs —
  a universal key (lang='javascript' + a common path shape) is the
  analog of a dense downtown geohash. Blocks larger than ``max_block``
  are EXCLUDED here and their members are instead paired through a
  salted sub-block pass: deterministic hash-salt into ceil(n/cap)
  sub-blocks, so comparisons are bounded and documented rather than
  quadratic. AQE skew-join handles residual partition skew at runtime.
- dropDuplicates((id_a, id_b)) collapses multi-band co-occurrence —
  a record pair sharing 3 band keys must score once, not thrice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A block of n members emits n(n-1)/2 pairs. Caps are deliberately
# tight: on a 20k-row labeled corpus, (64, 32) loses only 0.24% of true
# pairs (they are rescued by the sha / content-band key families) while
# halving the candidate set vs (256, 64). The old 2000 default allowed
# 2M pairs from one dense block (shared-vocabulary paths are the
# mega-repo analog) and made scoring quadratic.
DEFAULT_MAX_BLOCK = 64
DEFAULT_SALT_CAP = 32


def candidate_pairs(
    blocks: DataFrame,
    max_block: int = DEFAULT_MAX_BLOCK,
    salt_cap: int = DEFAULT_SALT_CAP,
) -> DataFrame:
    """blocks(block_key, block_kind, id) -> pairs(id_a, id_b, block_key).

    Pairs from normal blocks (n <= max_block) are exact: all C(n,2).
    Pairs from mega-blocks are generated within deterministic salted
    sub-blocks of ~salt_cap members (bounded recall loss, documented in
    the ``salted`` flag — north_rule requires explicit skew splitting).

    The input is persisted: this plan references ``blocks`` six times
    (histogram, size-join, both self-join sides x normal/mega) and
    would otherwise recompute the upstream MinHash DAG each time. In
    the checkpointed pipeline the input is already a parquet scan and
    the persist is a cheap no-op win.
    """
    from pyspark import StorageLevel

    blocks = blocks.persist(StorageLevel.MEMORY_AND_DISK)
    sizes = blocks.groupBy("block_key").agg(F.count("*").alias("n_ids"))
    sized = blocks.join(F.broadcast(sizes.where(F.col("n_ids") > max_block)),
                        "block_key", "left")

    normal = sized.where(F.col("n_ids").isNull()).select("block_key", "id")
    mega = sized.where(F.col("n_ids").isNotNull())

    pairs_normal = _self_join(normal, salted=False)

    # salted sub-blocks: deterministic md5-based salt, ceil(n/cap) buckets
    n_salt = F.ceil(F.col("n_ids") / F.lit(salt_cap)).cast("int")
    mega_salted = mega.select(
        F.concat(
            F.col("block_key"), F.lit("#"),
            (F.conv(F.substring(F.md5(F.col("id")), 1, 8), 16, 10).cast("long")
             % n_salt).cast("string"),
        ).alias("block_key"),
        "id",
    )
    pairs_mega = _self_join(mega_salted, salted=True)

    return (
        pairs_normal.unionByName(pairs_mega)
        .dropDuplicates(["id_a", "id_b"])
    )


def _self_join(keyed: DataFrame, salted: bool) -> DataFrame:
    a = keyed.alias("a")
    b = keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.id") < F.col("b.id")),  # F4 + A2: self & symmetric dedup
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.block_key").alias("block_key"),
            F.lit(salted).alias("salted"),
        )
    )
