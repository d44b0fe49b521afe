"""Per-stage scaling profile: run the pipeline once per parallelism
level with a timer around every stage materialization, to locate the
non-scaling (Amdahl) time. Usage:
  python tools/profile_scaling.py [rows] [level ...]
"""

from __future__ import annotations

import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CORPUS = Path("/tmp/go_dedupe_scaling_corpus")


def worker(cores: int) -> None:
    from go_dedupe_spark.operators.blocking import make_blocks
    from go_dedupe_spark.operators.components import connected_components
    from go_dedupe_spark.operators.normalize import normalize
    from go_dedupe_spark.operators.pairs import candidate_pairs
    from go_dedupe_spark.operators.resolve import resolve_clusters
    from go_dedupe_spark.operators.scoring import build_features, score_pairs
    from go_dedupe_spark.plans.pipeline import PipelineConfig
    from go_dedupe_spark.session import get_spark
    from pyspark.sql import functions as F

    cfg = PipelineConfig()
    spark = get_spark(f"prof-{cores}", cores=cores, shuffle_partitions=2 * cores)
    spark.sparkContext.setLogLevel("ERROR")
    files = spark.read.parquet(str(CORPUS / "files.parquet")).repartition(2 * cores)
    files.count()

    def run_once(timings):
        def stage(name, compute):
            t0 = time.monotonic()
            out = compute().localCheckpoint(eager=True)
            timings[name] = round(time.monotonic() - t0, 2)
            return out

        records = stage("records", lambda: normalize(files))
        blocks = stage("blocks", lambda: make_blocks(
            records, num_hashes=cfg.num_hashes, band_rows=cfg.band_rows,
            content_num_hashes=cfg.content_num_hashes,
            content_band_rows=cfg.content_band_rows))
        pairs = stage("pairs", lambda: candidate_pairs(
            blocks, max_block=cfg.max_block, salt_cap=cfg.salt_cap))
        features = stage("features", lambda: build_features(records))
        scores = stage("scores", lambda: score_pairs(
            pairs, threshold=cfg.threshold, features=features))
        matches = scores.where("is_match").select("id_a", "id_b")

        def comp():
            c = connected_components(matches, max_iter=cfg.cc_max_iter)
            singles = (records.select("id")
                       .join(c.select("id"), "id", "left_anti")
                       .withColumn("cluster_id", F.col("id")))
            return c.unionByName(singles)

        components = stage("components", comp)
        resolution = stage("resolution",
                           lambda: resolve_clusters(components, records))
        t0 = time.monotonic()
        resolution.write.format("noop").mode("overwrite").save()
        timings["sink"] = round(time.monotonic() - t0, 2)

    warm: dict = {}
    files_all = files
    files = files_all.sample(0.25, seed=1)
    run_once(warm)
    files = files_all
    for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
        rdd.unpersist(True)
    timed: dict = {}
    t0 = time.monotonic()
    run_once(timed)
    timed["TOTAL"] = round(time.monotonic() - t0, 2)
    print(json.dumps({"cores": cores, "timings": timed, "warmup": warm}))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
        return
    levels = [int(x) for x in sys.argv[1:]] or [2, 8]
    for k in levels:
        out = subprocess.run(
            ["taskset", "-c", f"0-{k - 1}",
             sys.executable, __file__, "--worker", str(k)],
            capture_output=True, text=True, timeout=2400, check=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        print(line)


if __name__ == "__main__":
    main()
