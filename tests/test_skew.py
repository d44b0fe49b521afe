"""Skew stress: the salt split must bound per-key group size and the
largest shuffle partition on a pathologically skewed corpus (VERDICT r5
missing #4 — the analog of the reference's dense-geohash hazard,
README.md:34-45: one downtown geohash holding most of a city's venues).

The committed wall-time evidence at sf0.1 scale lives in BENCH.md
(tools/skew_stress.py); these tests pin the INVARIANTS the wall time
depends on, at test scale, in the default suite.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from go_dedupe_spark.operators.pairs import candidate_pairs, salted_rekey

N_SKEW = 4_500          # one block holding 90% of the corpus
N_REST = 500
MAX_BLOCK = 64
SALT_CAP = 32


def _skewed_blocks(spark):
    """block assignment where key 'mega' holds 90% of all rows and the
    rest spread over small unique-ish keys."""
    mega = spark.range(N_SKEW).select(
        F.concat(F.lit("d"), F.col("id")).alias("id"),
        F.lit("mega").alias("block_key"))
    rest = spark.range(N_SKEW, N_SKEW + N_REST).select(
        F.concat(F.lit("d"), F.col("id")).alias("id"),
        F.concat(F.lit("k"), (F.col("id") % 100)).alias("block_key"))
    return mega.unionByName(rest)


def test_salted_rekey_bounds_group_size(spark):
    """After the salt split no block key holds more than ~salt_cap
    members (binomial spread allowed: <= 2x cap, vs 4500 unsalted)."""
    rekeyed = salted_rekey(_skewed_blocks(spark),
                           max_block=MAX_BLOCK, salt_cap=SALT_CAP)
    sizes = rekeyed.groupBy("block_key").count()
    top = sizes.agg(F.max("count")).first()[0]
    assert top <= 2 * SALT_CAP, f"largest salted group {top} > {2 * SALT_CAP}"
    # the mega block really was split, not dropped: every member kept
    assert rekeyed.where(F.col("salted")).count() == N_SKEW
    n_sub = sizes.where(F.col("block_key").startswith("mega#")).count()
    assert n_sub >= N_SKEW // SALT_CAP  # ceil(n/cap) sub-blocks exist


def test_salted_shuffle_partitions_bounded(spark):
    """The join-side shuffle on the REWRITTEN key has no straggler
    partition: hashing ceil(n/cap) sub-keys spreads the former mega
    block across the cluster, so the largest partition carries no more
    than 3x the mean — one key would otherwise funnel 90% of all rows
    (and its quadratic pair fanout) through ONE task."""
    rekeyed = salted_rekey(_skewed_blocks(spark),
                           max_block=MAX_BLOCK, salt_cap=SALT_CAP)
    hist = (rekeyed.repartition(32, "block_key")
            .groupBy(F.spark_partition_id().alias("pid")).count()
            .collect())
    counts = [r["count"] for r in hist]
    mean = sum(counts) / len(counts)
    assert max(counts) <= 3 * mean, (
        f"straggler partition: max {max(counts)} vs mean {mean:.0f}")


def test_skewed_pair_fanout_linear_not_quadratic(spark):
    """Pair count from the mega block is ~n*cap/2 (linear in n), never
    the unsalted n(n-1)/2: at n=4500, cap=32 that is <= ~90k pairs vs
    10.1M unsalted — the bound that keeps scoring affordable when 90%
    of a 100 TB corpus shares one boilerplate key."""
    pairs = candidate_pairs(_skewed_blocks(spark),
                            max_block=MAX_BLOCK, salt_cap=SALT_CAP)
    n_mega = pairs.where(F.col("salted")).count()
    # each salted sub-block of ~cap members yields C(cap,2); allow the
    # binomial spread: ceil(n/cap) * C(2cap, 2) is a hard ceiling
    import math
    n_sub = math.ceil(N_SKEW / SALT_CAP)
    hard_ceiling = n_sub * (2 * SALT_CAP) * (2 * SALT_CAP - 1) // 2
    assert 0 < n_mega <= hard_ceiling
    assert n_mega < N_SKEW * SALT_CAP          # linear-in-n bound
    assert n_mega < N_SKEW * (N_SKEW - 1) // 200  # nowhere near quadratic
