"""SparkSession builders.

Local sessions are sized for the sandbox (local[N] single JVM) but every
config here is the one you would set on a real multi-executor cluster:
AQE on (skew-join mitigation for mega-blocks — the analog of the
reference's biggest-blocks-first work stealing, location/sql.go:153),
Arrow enabled (all row-level compute is vectorized pandas UDFs),
shuffle partitions sized to cores.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from pathlib import Path

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go-dedupe-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or 32. ``shuffle_partitions``
    defaults to 2x cores — small enough for local mode, and the knob a
    cluster deployment retunes first.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(8, 2 * cores)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def package_zip() -> str:
    """Zip this package for ``spark-submit --py-files`` / addPyFile.

    The cluster deployment story (north_rule: ``spark-submit
    --py-files``): workers must import go_dedupe_spark to deserialize
    the pandas UDFs.
    """
    pkg_dir = Path(__file__).resolve().parent
    out = Path(tempfile.gettempdir()) / "go_dedupe_spark_pyfiles"
    out.mkdir(exist_ok=True)
    zip_base = out / "go_dedupe_spark"
    stage = out / "stage"
    if stage.exists():
        shutil.rmtree(stage)
    shutil.copytree(pkg_dir, stage / "go_dedupe_spark",
                    ignore=shutil.ignore_patterns("__pycache__"))
    return shutil.make_archive(str(zip_base), "zip", root_dir=stage)


def _ship_package(spark: SparkSession) -> None:
    """Make go_dedupe_spark importable on executors (idempotent)."""
    if getattr(spark, "_go_dedupe_shipped", False):
        return
    spark.sparkContext.addPyFile(package_zip())
    spark._go_dedupe_shipped = True
