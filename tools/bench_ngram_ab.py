"""Within-run A/B: hashed-gram vs string-gram n-gram Jaccard.

VERDICT r4 next #2 asked for proof that the r4 gram-hashing rewrite
(grams md5-prefix-hashed to int64 before the pair join, 8-byte wire
weight) is not slower like-for-like — the committed r4 wall number
(10.48 s vs r3's 6.61 s) was captured in a documented hypervisor-steal
window, so a cross-run diff can't settle it. This harness settles it
WITHIN one process: the same LSH candidate pairs (materialized once,
localCheckpoint) verified by ngram_jaccard_pairs with hash_grams=True
and hash_grams=False, interleaved A/B/A/B... so any host drift hits
both arms equally. Outputs identical (asserted) — the differential
test in tests/ already proves this; here it guards the timing claim.

Usage: python tools/bench_ngram_ab.py [sf_dir] [rounds]
Prints one JSON line; run on an otherwise idle machine.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from go_dedupe_spark.entry_queries import (
        ER_MAX_BLOCK,
        ER_SALT_CAP,
        LSH_NH,
        LSH_R,
        NGRAM_JAC_N,
        NGRAM_JAC_T,
    )
    from go_dedupe_spark.operators.dedupe import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )
    from go_dedupe_spark.session import get_spark

    spark = get_spark("bench-ngram-ab", cores=32)
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .localCheckpoint(eager=True)
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=LSH_NH, band_rows=LSH_R,
        scope_col="lang", max_block=ER_MAX_BLOCK, salt_cap=ER_SALT_CAP,
    ).localCheckpoint(eager=True)

    def run(hash_grams: bool) -> tuple[float, int]:
        t0 = time.perf_counter()
        out = ngram_jaccard_pairs(docs, pairs, "doc_id", "text",
                                  n=NGRAM_JAC_N, threshold=NGRAM_JAC_T,
                                  hash_grams=hash_grams)
        n = out.count()
        return time.perf_counter() - t0, n

    run(True)   # warmup: JIT + python worker fork, not timed
    hashed, strings, counts = [], [], set()
    for _ in range(rounds):
        t, n = run(True)
        hashed.append(round(t, 2))
        counts.add(n)
        t, n = run(False)
        strings.append(round(t, 2))
        counts.add(n)
    assert len(counts) == 1, f"arms disagree: {counts}"

    med_h, med_s = statistics.median(hashed), statistics.median(strings)
    print(json.dumps({
        "metric": "ngram_jaccard_hashed_vs_string_ab",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "hashed_sec": hashed,
        "string_sec": strings,
        "median_hashed_sec": med_h,
        "median_string_sec": med_s,
        "hashed_over_string": round(med_h / med_s, 3),
        "rows": counts.pop(),
    }))


if __name__ == "__main__":
    main()
