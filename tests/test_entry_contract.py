"""Driver-contract smoke tests: entry() runs at sf0.001, every
queries() entry returns a DataFrame there, and oracle coverage is
complete (keys subset of queries)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.mark.skipif(not Path(SF).exists(), reason="driver testdata absent")
def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) >= {"id_a", "id_b", "score", "is_match"}


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # every oracled query has non-empty SQL
    assert all(sql.strip() for sql in o.values())
    # coverage: the registry is the SURVEY §2 checklist surface
    assert len(q) >= 25
    assert len(o) >= 23


@pytest.mark.skipif(not Path(SF).exists(), reason="driver testdata absent")
@pytest.mark.parametrize("name", [
    "er_scores", "dedup_minhash_lsh", "ann_topk_bruteforce",
    "text_quality", "multimodal_features",
])
def test_query_smoke(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0
