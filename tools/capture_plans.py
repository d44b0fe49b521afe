"""Capture .explain("formatted") for every headline query into
plans/r07/<query>_{before,after}.txt (guide §1: record plan shape before
and after each change). Usage:

    python tools/capture_plans.py before [query ...]
    python tools/capture_plans.py after  [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

HEADLINE = [
    "er_scores", "er_components", "er_components_dist",
    "dedup_minhash_lsh", "dedup_simhash_hamming", "dedup_ngram_jaccard",
    "ann_topk_lsh", "ann_topk_ivf", "ivf_kmeans_centroids",
    "dedup_embedding_cosine", "ann_topk_bruteforce", "agg_pricing_summary",
    "join_revenue_top10", "window_topk_orders", "events_hourly_rollup",
    "text_quality", "text_fingerprint",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(__file__).resolve().parents[1] / "plans" / "r07"
    out_dir.mkdir(parents=True, exist_ok=True)

    from go_dedupe_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted")
        (out_dir / f"{name}_{tag}.txt").write_text(txt)
        print(f"wrote {name}_{tag}.txt ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
