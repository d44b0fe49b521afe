"""Source readers: GeoJSON dir / line-delimited / FeatureCollection /
CSV-with-coord-guards / match-CSV (SURVEY.md §2.1 S1-S4, S7)."""

from __future__ import annotations

import json

from go_dedupe_spark.sources.readers import (
    read_csv_records,
    read_feature_collections,
    read_geojson_dir,
    read_line_delimited_json,
    read_match_csv,
)


def _feature(fid, name, deprecated=None):
    props = {"wof:id": fid, "name": name}
    if deprecated:
        props["edtf:deprecated"] = deprecated
    return {
        "type": "Feature",
        "properties": props,
        "geometry": {"type": "Point", "coordinates": [-73.6, 45.5]},
    }


def test_read_geojson_dir_excludes_deprecated(spark, tmp_path):
    d = tmp_path / "wof"
    d.mkdir()
    (d / "1.geojson").write_text(json.dumps(_feature(1, "Open Da Night")))
    (d / "2.geojson").write_text(json.dumps(_feature(2, "Old Place", "2020-01-01")))
    df = read_geojson_dir(spark, str(d))
    names = [r["name"] for r in df.select("properties.name").collect()]
    assert names == ["Open Da Night"]
    both = read_geojson_dir(spark, str(d), exclude_deprecated=False)
    assert both.count() == 2


def test_read_line_delimited_json(spark, tmp_path):
    p = tmp_path / "places.jsonl"
    p.write_text("\n".join(json.dumps({"id": i, "name": f"p{i}"}) for i in range(5)))
    df = read_line_delimited_json(spark, str(p))
    assert df.count() == 5
    assert set(df.columns) == {"id", "name"}


def test_read_feature_collections(spark, tmp_path):
    fc = {"type": "FeatureCollection",
          "features": [_feature(1, "a"), _feature(2, "b"), _feature(3, "c")]}
    p = tmp_path / "atp.geojson"
    p.write_text(json.dumps(fc))
    df = read_feature_collections(spark, str(p))
    assert df.count() == 3
    assert "properties" in df.columns


def test_read_csv_records_coord_guards(spark, tmp_path):
    p = tmp_path / "ilms.csv"
    p.write_text(
        "MID,COMMONNAME,LATITUDE,LONGITUDE\n"
        "1,Museum A,45.5,-73.6\n"
        "2,Museum B,,\n"
        "3,Museum C,999,10\n"
        "4,Museum D,45.0,-200\n"
    )
    df = read_csv_records(spark, str(p))
    valid = df.where("coord_valid").select("MID").collect()
    assert [r["MID"] for r in valid] == ["1"]
    assert df.count() == 4  # quarantined rows kept, not dropped


def test_read_match_csv_dedups_symmetric_pairs(spark, tmp_path):
    p = tmp_path / "matches.csv"
    p.write_text(
        "geohash,source_id,target_id,similarity\n"
        "abc,wof:1,ovtr:2,0.9\n"
        "abc,ovtr:2,wof:1,0.9\n"   # symmetric duplicate
        "abc,wof:3,ovtr:4,0.8\n"
    )
    df = read_match_csv(spark, str(p))
    assert df.count() == 2


# ---------------------------------------------------- P1-P4 golden parsing


def test_parse_wof_venue_golden(spark):
    """Golden WOF venue (mirrors the reference's fixture style,
    vector/tests.go:11-119): exact field extraction per
    whosonfirst/parser.go:33-71."""
    from go_dedupe_spark.sources.readers import parse_wof_venue, read_geojson_dir

    raw = read_geojson_dir(spark, "/root/repo/fixtures/wof",
                           exclude_deprecated=True)
    rows = {r["id"]: r for r in parse_wof_venue(raw).collect()}
    assert set(rows) == {"wof:id=101", "wof:id=102", "wof:id=103"}
    r = rows["wof:id=101"]
    assert r["name"] == "Open Da Night"
    assert r["address"] == "124 rue St. Viateur o. Montreal"
    assert (r["lon"], r["lat"]) == (-73.603, 45.524)
    assert r["valid"] and r["reason"] == ""


def test_parse_overture_place_golden_and_quarantine(spark):
    from go_dedupe_spark.sources.readers import (
        parse_overture_place,
        read_line_delimited_json,
    )

    raw = read_line_delimited_json(
        spark, "/root/repo/fixtures/overture_places.jsonl")
    rows = {r["id"]: r for r in parse_overture_place(raw).collect()}
    # addresses[] joined over freeform/locality/region/country, non-empty
    # components only (overture/parser.go:45-114)
    assert rows["ovtr:id=ov1"]["address"] == \
        "124 rue St-Viateur O Montreal QC CA"
    assert rows["ovtr:id=ov2"]["address"] == "88 Main Street Brooklyn US"
    bad = rows["ovtr:id=ov3"]
    assert not bad["valid"] and bad["reason"] == "missing_address"


def test_parse_ilms_golden_coord_and_name_guards(spark):
    from go_dedupe_spark.sources.readers import parse_ilms_venue

    raw = spark.read.csv("/root/repo/fixtures/ilms.csv", header=True)
    rows = {r["id"]: r for r in parse_ilms_venue(raw).collect()}
    assert rows["ilms:id=M1"]["valid"]
    assert rows["ilms:id=M1"]["address"] == \
        "10 Object Way Springfield IL 62701"
    assert rows["ilms:id=M3"]["reason"] == "invalid_coordinates"
    assert rows["ilms:id=M4"]["reason"] == "missing_name"
