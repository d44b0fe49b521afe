"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the noop sink (full materialization,
no driver collect). See bench_scaling.py for the N-vs-4N parallelism run
(BENCH.md)."""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "er_scores",
    "er_components",
    "dedup_minhash_lsh",
    "dedup_simhash_hamming",
    "dedup_ngram_jaccard",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ivf_kmeans_centroids",
    "dedup_embedding_cosine",
    "ann_topk_bruteforce",
    "agg_pricing_summary",
    "join_revenue_top10",
    "window_topk_orders",
    "events_hourly_rollup",
    "text_quality",
    "text_fingerprint",
]


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from go_dedupe_spark.session import get_spark

    spark = get_spark("bench", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # Warmup outside the timed region: a tiny-SF run of the first
    # headline query pays whole-stage-codegen JIT + python-worker fork
    # (pandas import per worker) on the REAL plan shapes — without it
    # the first timed query absorbs ~5-10s of one-time cost.
    warm_dir = str(Path(sf_dir).parent / "sf0.001")
    if not Path(warm_dir).exists():
        warm_dir = sf_dir
    force(queries["er_scores"](spark, warm_dir))
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.monotonic()
        force(fn(spark, sf_dir))
        dt = time.monotonic() - t0
        timings[name] = round(dt, 3)
        total += dt

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cores": cores,
    }))


if __name__ == "__main__":
    main()
