"""Plan-quality inspector: prints `explain(formatted)` evidence for the
scale-critical properties of headline queries —

- parquet PushedFilters / ReadSchema (pushdown + pruning)
- BroadcastHashJoin on dimension joins
- absence of CartesianProduct anywhere
- WholeStageCodegen coverage

Usage: python tools/inspect_plans.py [query ...]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

CHECKS = {
    "filter_pushdown_projection": {
        "require": ["PushedFilters: [IsNotNull(l_shipdate)",
                    "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double"],
        "forbid": ["CartesianProduct"],
    },
    "join_broadcast_enrich": {
        "require": ["BroadcastHashJoin"],
        "forbid": ["SortMergeJoin", "CartesianProduct"],
    },
    "agg_pricing_summary": {
        "require": ["HashAggregate", "PushedFilters"],
        "forbid": ["CartesianProduct"],
    },
    "er_candidate_pairs": {
        "require": [],
        "forbid": ["CartesianProduct"],
    },
    # the record/gram sides of the scoring joins must carry NO manual
    # broadcast hint (cannot broadcast at corpus scale — VERDICT r1 #4);
    # AQE may still convert to broadcast at runtime from MEASURED sizes,
    # which is the correct conditional policy.
    "er_scores": {
        "require": [],
        "forbid": ["CartesianProduct"],
        "forbid_logical": ["ResolvedHint"],
    },
    "dedup_ngram_jaccard": {
        "require": [],
        "forbid": ["CartesianProduct"],
        "forbid_logical": ["ResolvedHint"],
    },
    # IVF assignment: the rank<=1 filter must compile to WindowGroupLimit
    # (one row per item kept per map task BEFORE the exchange), and the
    # broadcast crossJoin must not degrade to a CartesianProduct
    "ann_topk_ivf": {
        "require": ["WindowGroupLimit"],
        "forbid": ["CartesianProduct"],
    },
    "window_topk_orders": {
        # WindowGroupLimit (Partial before the shuffle) is the Spark-4
        # top-k pushdown: each map task keeps only k rows per key before
        # the exchange — the plan you want for rank<=k at any scale
        "require": ["WindowGroupLimit", "Window"],
        "forbid": ["CartesianProduct"],
    },
}


def main() -> int:
    from go_dedupe_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark("inspect-plans", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries = entry_mod.queries()
    names = sys.argv[1:] or list(CHECKS)
    sf = "/root/testdata/sf0.01"
    failures = 0
    for name in names:
        df = queries[name](spark, sf)
        # execute first: with AQE the pre-execution explain shows only
        # the initial AdaptiveSparkPlan skeleton (no codegen spans, no
        # runtime join selections) — the FINAL executed plan is the
        # evidence. `*(n)` markers are the whole-stage-codegen spans.
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]  # judge the final plan
        spec = CHECKS.get(name, {"require": [], "forbid": ["CartesianProduct"]})
        ok = True
        for frag in spec.get("require", []):
            if frag not in plan:
                print(f"MISSING in {name}: {frag!r}")
                ok = False
        for frag in spec.get("forbid", []):
            if frag in plan:
                print(f"FORBIDDEN in {name}: {frag!r}")
                ok = False
        if spec.get("forbid_logical"):
            logical = df._jdf.queryExecution().optimizedPlan().toString()
            for frag in spec["forbid_logical"]:
                if frag in logical:
                    print(f"FORBIDDEN in {name} logical plan: {frag!r}")
                    ok = False
        n_codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
        if n_codegen == 0 and "FileScan" in plan:
            print(f"WARN {name}: no whole-stage-codegen spans in final plan")
        print(f"{'ok ' if ok else 'FAIL'} {name}: codegen_spans={n_codegen}")
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
