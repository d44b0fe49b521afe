"""Extra benchmarks for the optimization rounds (guide §1.4): noop-sink
isolation of ER-pipeline sub-stages and per-query repeat timing.

bench.py is FROZEN for driver measurement; every auxiliary number cited
in OPTIMIZATION_r07.md comes from here instead.

Usage:
    python bench_extra.py stages            # ER sub-stage isolation
    python bench_extra.py query NAME [N]    # time one query N times
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, label, df_or_fn, timings, repeats=1):
    """df_or_fn: a DataFrame or a zero-arg builder. Builders are invoked
    INSIDE the timed region (matches bench.py, and queries with eager
    localCheckpoints would otherwise run outside the clock)."""
    spark.sparkContext.setJobDescription(label)
    walls = []
    for _ in range(repeats):
        t0 = time.monotonic()
        df = df_or_fn() if callable(df_or_fn) else df_or_fn
        force(df)
        walls.append(round(time.monotonic() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    timings[label] = walls if repeats > 1 else walls[0]


def stages(spark) -> None:
    """Isolate the ER pipeline sub-stages with the noop sink."""
    from go_dedupe_spark import entry_queries as q

    t = {}
    timed(spark, "documents_scan", q._t(spark, SF_DIR, "documents"), t)
    records = q._doc_records(spark, SF_DIR)
    timed(spark, "records(tok+shingle+sha)", records, t, repeats=2)
    blocks = q._doc_blocks(records)
    timed(spark, "blocks(minhash bands)", blocks, t, repeats=2)
    pairs = q._doc_pairs(blocks)
    timed(spark, "pairs(salted self-join)", pairs, t, repeats=2)
    scores = q._doc_scores(spark, SF_DIR)
    timed(spark, "scores(full)", scores, t, repeats=2)
    print(json.dumps(t, indent=1))


def one_query(spark, name: str, repeats: int) -> None:
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    t = {}
    timed(spark, name, lambda: queries[name](spark, SF_DIR), t, repeats=repeats)
    print(json.dumps(t))


def warm_floor(spark) -> None:
    """Warm per-query floor: run every headline query twice, report both
    walls. bench.py's single-shot walls minus these floors = the
    once-per-plan cold cost (codegen JIT, python worker forks, AQE)."""
    import __spark_entry__ as entry_mod

    from bench import HEADLINE

    queries = entry_mod.queries()
    t = {}
    for name in HEADLINE:
        timed(spark, name, lambda n=name: queries[n](spark, SF_DIR), t,
              repeats=2)
    print(json.dumps(t))


def benchctx(spark, name: str, repeats: int) -> None:
    """Approximate the frozen bench's context for ONE query: warm the
    session generically (the bench's own sf0.001 warmup + two unrelated
    sf0.1 queries), then time the target — first run is plan-cold in a
    warm session, like the real bench; later runs show the warm floor."""
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    warm_dir = str(Path(SF_DIR).parent / "sf0.001")
    force(queries["er_scores"](spark, warm_dir))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for w in ("dedup_embedding_cosine", "ann_topk_bruteforce"):
        if w != name:
            force(queries[w](spark, SF_DIR))
    t = {}
    timed(spark, name, lambda: queries[name](spark, SF_DIR), t,
          repeats=repeats)
    print(json.dumps(t))


def main() -> None:
    from go_dedupe_spark.session import get_spark

    spark = get_spark("bench-extra")
    spark.sparkContext.setLogLevel("ERROR")
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    if mode == "stages":
        stages(spark)
    elif mode == "warm":
        warm_floor(spark)
    elif mode == "benchctx":
        benchctx(spark, sys.argv[2],
                 int(sys.argv[3]) if len(sys.argv) > 3 else 2)
    elif mode == "query":
        one_query(spark, sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
