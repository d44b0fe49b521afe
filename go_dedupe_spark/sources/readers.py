"""Source readers — DataFrame equivalents of the reference's
iterator + parser plugin pairs (SURVEY.md §2.1/2.3).

| reference                               | here                        |
|-----------------------------------------|-----------------------------|
| WhosOnFirstIterator (dir of GeoJSON,     | read_geojson_dir            |
|   exclude deprecated) whosonfirst/iterator.go:50-70 |                 |
| OvertureIterator (line-delimited JSON,   | read_line_delimited_json    |
|   bzip2, 20 workers) overture/iterator.go:108-165 |                   |
| AllThePlacesIterator (FeatureCollection  | read_feature_collections    |
|   fan-out) alltheplaces/iterator.go:62-132 |                         |
| ILMSIterator (CSV -> records, coord      | read_csv_records            |
|   guards) ilms/iterator.go:110-184       |                            |
| CSV match-pair reader process.go:60-77   | read_match_csv              |

Spark gives for free what the iterators hand-rolled: multi-file
parallelism (20-goroutine fan-out -> input splits), codec handling
(bzip2/gzip auto via file extension), and resume (checkpoint anti-join
instead of start-after offsets). The parsers' per-record gjson
extraction becomes schema-on-read JSON + column selects; invalid
records surface as a quarantine filter, not swallowed logs
(errors.go:8-34, index.go:75-77).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson_dir(
    spark: SparkSession,
    path: str,
    exclude_deprecated: bool = True,
) -> DataFrame:
    """Directory of one-feature-per-file GeoJSON (WhosOnFirst layout).

    Default filter mirrors the reference's
    ``repo://?exclude=properties.edtf:deprecated=.*``
    (whosonfirst/iterator.go:38-41)."""
    df = spark.read.option("multiLine", True).json(path)
    if exclude_deprecated and "properties" in df.columns:
        dep = "properties.`edtf:deprecated`"
        if "edtf:deprecated" in df.select("properties.*").columns:
            df = df.where(F.col(dep).isNull())
    return df


def read_line_delimited_json(spark: SparkSession, path: str) -> DataFrame:
    """Line-delimited (Geo)JSON, compression auto-detected from the
    extension (.bz2/.gz) — the OvertureIterator equivalent; resume is a
    left-anti join against the records checkpoint, not line offsets."""
    return spark.read.json(path)


def read_feature_collections(spark: SparkSession, path: str) -> DataFrame:
    """Whole-file GeoJSON FeatureCollections, one row per feature
    (AllThePlaces layout): multiLine read + explode(features)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(F.explode("features").alias("feature")).select("feature.*")


def read_csv_records(
    spark: SparkSession,
    path: str,
    lat_col: str = "LATITUDE",
    lon_col: str = "LONGITUDE",
) -> DataFrame:
    """CSV rows -> point records with coordinate-validity quarantine
    (ILMS layout; coord guards ilms/iterator.go:133-159). Returns rows
    with a ``coord_valid`` flag instead of silently skipping."""
    df = spark.read.csv(path, header=True)
    lat = F.col(lat_col).cast("double")
    lon = F.col(lon_col).cast("double")
    valid = (
        lat.isNotNull() & lon.isNotNull()
        & (lat >= -90) & (lat <= 90) & (lon >= -180) & (lon <= 180)
    )
    return df.withColumn("latitude", lat).withColumn("longitude", lon) \
        .withColumn("coord_valid", valid)


def read_match_csv(spark: SparkSession, path: str) -> DataFrame:
    """Re-read emitted match CSVs (the reference's downstream tools,
    process.go:60-77; row shape README.md:152-163) with canonical pair
    ordering applied on read (A2)."""
    df = spark.read.csv(path, header=True)
    return df.withColumn(
        "pair_key",
        F.concat_ws("-", F.least("source_id", "target_id"),
                    F.greatest("source_id", "target_id")),
    ).dropDuplicates(["pair_key"])
