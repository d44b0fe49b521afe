"""Plan-quality inspector: prints `explain(formatted)` evidence for the
scale-critical properties of headline queries —

- parquet PushedFilters / ReadSchema (pushdown + pruning)
- BroadcastHashJoin on dimension joins
- absence of CartesianProduct anywhere
- WholeStageCodegen coverage

Usage: python tools/inspect_plans.py [query ...]
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
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
    "window_topk_orders": {
        "require": ["RunningWindowFunction", "WholeStageCodegen"],
        "forbid": ["CartesianProduct"],
        "require_any": ["Window"],
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
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
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
        n_codegen = len(re.findall(r"WholeStageCodegen", plan))
        print(f"{'ok ' if ok else 'FAIL'} {name}: codegen_spans={n_codegen}")
        failures += 0 if ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
