"""Stage 6 — resolution: components + records -> survivors & edges.

Ancestor: wof-process-duplicates' survivor-precedence rules
(process.go:143-333): (a) deprecated side loses, (b) mapzen geometry
wins, (c) newer lastmod wins, (d) tie -> higher id wins; plus the
supersession edge writes (process.go:341-377) and concordance
assignment (assign.go:53-170).

Adapted to the source-code domain: per cluster the survivor is the
record with the ordered key (max commit, then max id) — deterministic,
rerun-stable. Implemented as one ``max_by`` aggregation per cluster
(no window shuffle over the full record set), then a broadcast-friendly
join back for the supersession arrays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_clusters(
    components: DataFrame,
    records: DataFrame,
    order_cols: tuple[str, ...] = ("commit", "id"),
    supersedes_arrays: bool = True,
) -> DataFrame:
    """-> resolution(id, cluster_id, survivor_id, is_survivor,
    superseded_by array<string>, supersedes array<string>).

    Survivor precedence (C2): max_by over the ordered struct of
    ``order_cols``. Default (commit, id) = newest commit wins, tie ->
    max id. The reference's full venue precedence (process.go:143-333)
    is ``order_cols=("is_mapzen", "lastmod", "id")`` — (b) mapzen
    geometry wins, (c) newer lastmod wins, (d) tie -> higher id; rule
    (a) deprecated-side-loses composes as a pre-filter or a leading
    ``not_deprecated`` column — use
    ``functions.edtf.edtf_is_deprecated_strict`` here (process.go
    tests ``d != ""``; the iterator's any-present-value predicate
    would wrongly demote records carrying ``edtf:deprecated=''``).

    ``supersedes_arrays``: the survivor row's ``supersedes`` list
    (reference parity: the wof:supersedes array, process.go:341-377) is
    an inherently cluster-sized ARRAY — a boilerplate mega-cluster of m
    members materializes an m-element array in one aggregation task and
    one output row, the same hub hazard fixed array-free in
    connected_components. Every supersession edge is ALREADY encoded
    pairwise on the loser rows (loser.superseded_by = [survivor]), so
    the array is derived convenience data: pass ``False`` at corpus
    scale to keep survivors' ``supersedes`` empty and the whole plan
    array-free (the max_by survivor aggregate is O(1) per group
    either way)."""
    member = components.join(
        records.select("id", *[c for c in order_cols if c != "id"]),
        "id", "inner",
    )
    aggs = [
        F.max_by("id", F.struct(*[F.col(c) for c in order_cols]))
         .alias("survivor_id"),
    ]
    if supersedes_arrays:
        aggs.append(F.collect_set("id").alias("member_ids"))
    survivors = member.groupBy("cluster_id").agg(*aggs)
    is_surv = F.col("id") == F.col("survivor_id")
    empty = F.array().cast("array<string>")
    supersedes = (
        F.when(
            is_surv,
            F.array_sort(F.array_remove(F.col("member_ids"),
                                        F.col("survivor_id"))),
        ).otherwise(empty)
        if supersedes_arrays else empty
    )
    out = (
        member.join(survivors, "cluster_id")
        .select(
            "id",
            "cluster_id",
            "survivor_id",
            is_surv.alias("is_survivor"),
            # loser -> [survivor]; survivor -> [] (process.go:341-377 C3)
            F.when(is_surv, empty)
             .otherwise(F.array(F.col("survivor_id"))).alias("superseded_by"),
            supersedes.alias("supersedes"),
        )
    )
    return out


def match_table(scores: DataFrame) -> DataFrame:
    """The reference's emitted match row — {block, source_id, target_id,
    similarity} (compare/geohash.go:175-183, README.md:152-163) — as a
    DataFrame instead of a channel-fed CSV writer."""
    return scores.where("is_match").select(
        F.col("block_key").alias("block"),
        F.col("id_a").alias("source_id"),
        F.col("id_b").alias("target_id"),
        F.col("score").alias("similarity"),
    )
