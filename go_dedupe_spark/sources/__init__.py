"""Source readers mirroring the reference's iterator/parser plugins."""

from go_dedupe_spark.sources.readers import (  # noqa: F401
    read_csv_records,
    read_feature_collections,
    read_geojson_dir,
    read_line_delimited_json,
    read_match_csv,
)
