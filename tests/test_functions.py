"""EDTF ordering (X9), metadata union (P8) and reference-parity
survivor precedence (C2 rules a-d, process.go:143-333)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_dedupe_spark.functions.edtf import edtf_is_deprecated, edtf_sort_key
from go_dedupe_spark.functions.metadata import metadata_canonical, metadata_union
from go_dedupe_spark.operators.resolve import resolve_clusters


def test_edtf_sort_key_ordering(spark):
    vals = ["2021", "2021-04", "2021-04-09", "2021~", "2020-12-31",
            "uuuu", "", "open", "..", None, "1999-01?"]
    df = spark.createDataFrame([(v,) for v in vals], ["d"])
    got = {r["d"]: r["k"] for r in
           df.select("d", edtf_sort_key("d").alias("k")).collect()}
    assert got["2021"] == "2021-00-00"
    assert got["2021-04"] == "2021-04-00"
    assert got["2021-04-09"] == "2021-04-09"
    assert got["2021~"] == "2021-00-00"          # approximation stripped
    assert got["1999-01?"] == "1999-01-00"       # uncertainty stripped
    # containment order: year < year-month < exact date
    assert got["2021"] < got["2021-04"] < got["2021-04-09"]
    assert got["2020-12-31"] < got["2021"]
    for unknown in ("uuuu", "", "open", "..", None):
        assert got[unknown] is None


def test_edtf_is_deprecated_predicate(spark):
    """ANY present value deprecates — including unknown sentinels —
    matching the reference's any-value regex filter (ADVICE r3: 'uuuu'
    means deprecated-at-unknown-date, not not-deprecated)."""
    df = spark.createDataFrame(
        [("a", "2021-04-01"), ("b", None), ("c", "uuuu"), ("d", "2021~")],
        ["id", "dep"])
    got = {r["id"]: r["x"] for r in
           df.select("id", edtf_is_deprecated("dep").alias("x")).collect()}
    assert got == {"a": True, "b": False, "c": True, "d": True}


def test_edtf_is_deprecated_strict_survivorship(spark):
    """ADVICE r4: the SURVIVORSHIP check mirrors process.go's d != ""
    — empty string is NOT deprecated there, unlike the iterator's
    any-present-value regex — RAW comparison, no trim: whitespace-only
    ' ' satisfies d != "" and IS deprecated. The two predicates must
    disagree exactly on the empty string."""
    from go_dedupe_spark.functions.edtf import edtf_is_deprecated_strict

    df = spark.createDataFrame(
        [("a", "2021-04-01"), ("b", None), ("c", ""), ("d", " "),
         ("e", "uuuu")],
        ["id", "dep"])
    strict = {r["id"]: r["x"] for r in
              df.select("id",
                        edtf_is_deprecated_strict("dep").alias("x"))
              .collect()}
    assert strict == {"a": True, "b": False, "c": False, "d": True,
                      "e": True}
    loose = {r["id"]: r["x"] for r in
             df.select("id", edtf_is_deprecated("dep").alias("x"))
             .collect()}
    assert {k for k in strict if strict[k] != loose[k]} == {"c"}


def test_metadata_union_reserved_key_wins(spark):
    df = spark.createDataFrame([(1, "u1")], ["id", "user"])
    custom = F.create_map(F.lit("user"), F.col("user"),
                          F.lit("geohash"), F.lit("STALE"))
    merged = metadata_union(custom, geohash=F.lit("f25dv"))
    row = df.select(merged.alias("m"),
                    metadata_canonical(merged).alias("c")).first()
    assert row["m"] == {"user": "u1", "geohash": "f25dv"}   # computed wins
    assert row["c"] == "geohash=f25dv;user=u1"              # sorted k=v


def test_metadata_union_null_custom(spark):
    df = spark.createDataFrame([(1,)], ["id"])
    merged = metadata_union(F.lit(None).cast("map<string,string>"),
                            geohash=F.lit("abc"))
    assert df.select(merged.alias("m")).first()["m"] == {"geohash": "abc"}


def test_reference_survivor_precedence(spark):
    """Golden precedence cases from process.go:143-333: (b) mapzen
    geometry wins regardless of recency; (c) newer lastmod wins;
    (d) equal lastmod -> higher id wins."""
    comps = spark.createDataFrame(
        [("a1", "c1"), ("a2", "c1"),      # c1: a2 is mapzen, a1 newer
         ("b1", "c2"), ("b2", "c2"),      # c2: b2 newer lastmod
         ("d1", "c3"), ("d2", "c3")],     # c3: tie -> higher id (d2)
        ["id", "cluster_id"])
    recs = spark.createDataFrame(
        [("a1", 0, 2000), ("a2", 1, 1000),
         ("b1", 0, 1500), ("b2", 0, 1600),
         ("d1", 0, 1700), ("d2", 0, 1700)],
        ["id", "is_mapzen", "lastmod"])
    out = resolve_clusters(comps, recs,
                           order_cols=("is_mapzen", "lastmod", "id"))
    surv = {r["cluster_id"]: r["survivor_id"]
            for r in out.where("is_survivor").collect()}
    assert surv == {"c1": "a2", "c2": "b2", "c3": "d2"}
    losers = {r["id"]: r for r in out.where("NOT is_survivor").collect()}
    assert losers["a1"]["superseded_by"] == ["a2"]   # C3 edge shape
    winner = next(r for r in out.collect()
                  if r["id"] == "a2" and r["is_survivor"])
    assert winner["supersedes"] == ["a1"]
