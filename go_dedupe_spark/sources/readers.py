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


# ------------------------------------------------------------- parsers
# P1-P4: per-source field extraction to the COMMON record schema
# (id, name, address, lon, lat, valid, reason). Invalid records carry a
# typed reason instead of being swallowed (errors.go:8-34 -> quarantine
# columns; the reference logs-and-drops at index.go:75-77).

def _finish_record(df: DataFrame, prefix: str, raw_id, name, comps,
                   lon, lat, check_coords: bool = False) -> DataFrame:
    """Assemble the common record columns from per-source expressions.
    ``comps`` is an array<string> of non-empty address components
    (joined with ' ' like strings.Join(addr_components, " "),
    overture/parser.go:91)."""
    has_addr = F.size(comps) > 0
    coord_ok = (
        lat.isNotNull() & lon.isNotNull()
        & (lat >= -90) & (lat <= 90) & (lon >= -180) & (lon <= 180)
    ) if check_coords else F.lit(True)
    valid = raw_id.isNotNull() & name.isNotNull() & has_addr & coord_ok
    reason = (
        F.when(raw_id.isNull(), "missing_id")
        .when(name.isNull(), "missing_name")
        .when(~has_addr, "missing_address")
        .when(~coord_ok, "invalid_coordinates")
        .otherwise("")
    )
    return df.select(
        F.concat(F.lit(f"{prefix}:id="), raw_id.cast("string")).alias("id"),
        name.alias("name"),
        F.when(has_addr, F.array_join(comps, " ")).alias("address"),
        F.round(lon, 6).alias("lon"),
        F.round(lat, 6).alias("lat"),
        valid.alias("valid"),
        reason.alias("reason"),
    )


def parse_wof_venue(df: DataFrame) -> DataFrame:
    """P1 — WhosOnFirst venue extraction (whosonfirst/parser.go:33-71):
    properties.wof:id, properties.name, properties.addr:full, Point
    centroid; id namespaced 'wof:id={id}' (ids.go:7-25)."""
    props = F.col("properties")
    addr = props.getField("addr:full")
    return _finish_record(
        df, "wof",
        raw_id=props.getField("wof:id"),
        name=props.getField("name"),
        comps=F.filter(F.array(addr), lambda x: x.isNotNull() & (x != "")),
        lon=F.element_at("geometry.coordinates", 1),
        lat=F.element_at("geometry.coordinates", 2),
    )


def parse_overture_place(df: DataFrame) -> DataFrame:
    """P2 — Overture place extraction (overture/parser.go:45-114):
    properties.id, properties.names.primary, and the addresses[] array
    flattened over {freeform, locality, region, country} in key order,
    non-empty components joined with ' '."""
    props = F.col("properties")
    comps = F.flatten(F.transform(
        props.getField("addresses"),
        lambda a: F.filter(
            F.array(a.getField("freeform"), a.getField("locality"),
                    a.getField("region"), a.getField("country")),
            lambda x: x.isNotNull() & (x != ""),
        ),
    ))
    return _finish_record(
        df, "ovtr",
        raw_id=props.getField("id"),
        name=props.getField("names").getField("primary"),
        comps=comps,
        lon=F.element_at("geometry.coordinates", 1),
        lat=F.element_at("geometry.coordinates", 2),
    )


def parse_atp_venue(df: DataFrame) -> DataFrame:
    """P3 — AllThePlaces venue extraction (alltheplaces/parser.go:46-110):
    top-level id, properties.name, addr:street_address/city/state/country
    joined with ' '. Input: one row per feature (read_feature_collections)."""
    props = F.col("properties")
    comps = F.filter(
        F.array(*[props.getField(k) for k in
                  ("addr:street_address", "addr:city",
                   "addr:state", "addr:country")]),
        lambda x: x.isNotNull() & (x != ""),
    )
    return _finish_record(
        df, "atp",
        raw_id=F.col("id"),
        name=props.getField("name"),
        comps=comps,
        lon=F.element_at("geometry.coordinates", 1),
        lat=F.element_at("geometry.coordinates", 2),
    )


def parse_ilms_venue(df: DataFrame) -> DataFrame:
    """P4 — ILMS extraction (ilms/parser.go:45-109 + the iterator's
    coordinate guards, ilms/iterator.go:133-159): MID, COMMONNAME,
    ADSTREET/ADCITY/ADSTATE/ADZIP joined with ' ', straight from the
    CSV columns (the reference synthesizes intermediate GeoJSON; a
    column select needs no such detour)."""
    comps = F.filter(
        F.array("ADSTREET", "ADCITY", "ADSTATE", "ADZIP"),
        lambda x: x.isNotNull() & (x != ""),
    )
    return _finish_record(
        df, "ilms",
        raw_id=F.col("MID"),
        name=F.col("COMMONNAME"),
        comps=comps,
        lon=F.col("LONGITUDE").cast("double"),
        lat=F.col("LATITUDE").cast("double"),
        check_coords=True,
    )


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
