"""Stage 5 — transitive clustering: match pairs -> connected components.

The reference STOPS at pairwise supersession edges; transitive chains
only emerge by re-running the whole pipeline (SURVEY.md §2.9 C5 — the
explicit gap north_star closes). This implements the alternating
large-star / small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) in pure DataFrame ops:

    large-star: for each node u, connect every strictly-larger neighbor
                v > u to u's minimum neighbor m (including u itself)
    small-star: for each node u, connect all neighbors <= u (and u)
                to the minimum among them

Each round is two groupBy/explode passes; convergence when the edge set
reaches a fixpoint (every node points directly at its component min).
Lineage is cut every iteration with localCheckpoint — at cluster scale
swap for a checkpoint table write (see plans.checkpoint) so a failed
iteration resumes instead of recomputing the loop.

Output: components(id, cluster_id) where cluster_id = min id in the
component (deterministic, rerun-stable — resume idempotency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    checkpoint_fn=None,
) -> DataFrame:
    """edges(src, dst) -> components(id, cluster_id).

    Includes singleton handling only for nodes present in edges; callers
    union isolated records back (see plans.pipeline.run_pipeline).
    ``checkpoint_fn(df, iteration)`` may persist + return a DataFrame —
    defaults to localCheckpoint (lineage cut).
    """
    spark = edges.sparkSession
    if checkpoint_fn is None:
        def checkpoint_fn(df: DataFrame, _i: int) -> DataFrame:
            return df.localCheckpoint(eager=True)

    # canonical undirected edge set, self-loops dropped
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .dropDuplicates(["u", "v"])
    )

    for i in range(max_iter):
        e2 = _small_star(_large_star(e))
        e2 = checkpoint_fn(e2.dropDuplicates(["u", "v"]), i)
        # fixpoint: edge multiset unchanged (cheap symmetric-difference count)
        delta = e2.exceptAll(e).limit(1).count() + e.exceptAll(e2).limit(1).count()
        e = e2
        if delta == 0:
            break

    # after convergence every v points at its component min u
    comp = e.select(F.col("v").alias("id"), F.col("u").alias("cluster_id"))
    roots = (
        e.select(F.col("u").alias("id"))
        .distinct()
        .join(comp.select(F.col("id")), "id", "left_anti")
        .withColumn("cluster_id", F.col("id"))
    )
    return comp.unionByName(roots).dropDuplicates(["id"])


def _neighborhoods(e: DataFrame) -> DataFrame:
    """Symmetrize edges -> (node u, neighbor v) adjacency rows."""
    return e.select("u", "v").union(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


def _large_star(e: DataFrame) -> DataFrame:
    """Connect strictly-larger neighbors to the neighborhood minimum."""
    adj = _neighborhoods(e)
    grouped = adj.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("u"))))
    return (
        grouped.select("u", m.alias("m"), F.explode("nbrs").alias("v"))
        .where(F.col("v") > F.col("u"))
        .select(F.col("m").alias("u"), F.col("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Connect all smaller-or-equal neighbors (and u) to their minimum."""
    # orient edges so u >= v, group by the larger endpoint
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    grouped = oriented.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.array_min(F.col("nbrs"))
    return (
        grouped.select("u", m.alias("m"),
                       F.explode(F.array_union("nbrs", F.array("u"))).alias("v"))
        .where(F.col("v") != F.col("m"))
        .select(F.col("m").alias("u"), F.col("v"))
    )
