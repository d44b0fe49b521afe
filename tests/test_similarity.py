"""Differential tests for the similarity scorers.

The Jaro-Winkler trio — scalar ``_jaro_winkler``, numpy-batched
``_jaro_winkler_batch`` and DuckDB's ``jaro_winkler_similarity`` — must
be bit-identical: the batch is what the pipeline runs, the scalar is
the readable spec, and DuckDB is the correctness oracle the driver
compares against. All three operate on UTF-8 bytes (the
rapidfuzz-style semantics DuckDB implements).
"""

from __future__ import annotations

import random
import string

import duckdb
import numpy as np
import pandas as pd
import pytest

from go_dedupe_spark.functions.similarity import (
    _jaro_winkler,
    _jaro_winkler_batch,
)

ALPHABETS = [
    string.ascii_lowercase,
    string.ascii_letters + string.digits + "/_-. ",
    "ab",                                  # high-collision
    "aé漢ü字ßø",                            # multi-byte UTF-8
]


def _random_pairs(n: int, seed: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    pairs = []
    for i in range(n):
        ab = ALPHABETS[i % len(ALPHABETS)]
        la, lb = rng.randint(0, 24), rng.randint(0, 24)
        a = "".join(rng.choice(ab) for _ in range(la))
        b = "".join(rng.choice(ab) for _ in range(lb))
        if rng.random() < 0.3:              # correlated pair: small edit
            b = a[: max(0, la - 2)] + "".join(rng.choice(ab) for _ in range(2))
        pairs.append((a, b))
    # edge cases
    pairs += [("", ""), ("", "x"), ("x", ""), ("abc", "abc"),
              ("a漢d", "字acü漢"), ("prefix_match_x", "prefix_match_y")]
    return pairs


@pytest.fixture(scope="module")
def pairs() -> list[tuple[str, str]]:
    return _random_pairs(1200, seed=99)


def test_batch_matches_scalar(pairs):
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = _jaro_winkler_batch(a, b)
    want = np.array([_jaro_winkler(x, y) for x, y in pairs])
    # exact: both float64, same expression order — bit-identity is the
    # documented contract (np.isclose's default rtol would mask drift)
    bad = [(pairs[i], got[i], want[i])
           for i in np.nonzero(got != want)[0][:5]]
    assert not bad, f"batch != scalar: {bad}"


def test_batch_matches_duckdb(pairs):
    con = duckdb.connect()
    con.register("p", pd.DataFrame(pairs, columns=["a", "b"]))
    want = np.array([r[0] for r in con.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM p").fetchall()])
    got = _jaro_winkler_batch(
        pd.Series([p[0] for p in pairs]), pd.Series([p[1] for p in pairs]))
    # DuckDB returns EXACT doubles from the same algorithm; allow only
    # last-ulp noise
    bad = [(pairs[i], got[i], want[i])
           for i in np.nonzero(np.abs(got - want) > 1e-12)[0][:5]]
    assert not bad, f"batch != duckdb: {bad}"


def test_known_values():
    # classic textbook values (byte semantics; all-ASCII so codepoint
    # references agree)
    assert _jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert _jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-4)
    assert _jaro_winkler("", "") == 0.0
    assert _jaro_winkler("same", "same") == 1.0


def test_non_ascii_byte_semantics():
    """The documented ADVICE repro: 'a漢d' vs '字acü漢' must give the
    DuckDB (UTF-8 byte) answer in BOTH implementations."""
    a, b = "a漢d", "字acü漢"
    want = duckdb.connect().execute(
        "SELECT jaro_winkler_similarity(?, ?)", [a, b]).fetchone()[0]
    assert _jaro_winkler(a, b) == pytest.approx(want, abs=1e-12)
    got = _jaro_winkler_batch(pd.Series([a]), pd.Series([b]))[0]
    assert got == pytest.approx(want, abs=1e-12)


def test_hash_vector_wide_ngram():
    """ADVICE r2: _hash_vector must support any window width n, with
    n <= 5 vectors bit-identical to the fixed-constant era."""
    import numpy as np

    from go_dedupe_spark.functions.similarity import _GRAM_COEF, _gram_coef, _hash_vector

    assert (_gram_coef(5) == _GRAM_COEF).all()
    text = "hello world this is a longer line of text for hashing"
    v8 = _hash_vector(text, n=8)
    assert v8.sum() > 0
    assert (v8 == _hash_vector(text, n=8)).all()          # deterministic
    assert not (v8 == _hash_vector(text, n=9)).all()      # n matters
    c = _gram_coef(12)
    assert len(np.unique(c)) == 12 and (c % 2 == 1).all() # distinct, odd
