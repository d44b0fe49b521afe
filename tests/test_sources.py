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
