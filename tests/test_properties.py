"""Property-based tests (hypothesis) for the pure kernels the pipeline
leans on hardest — the ones where a single wrong byte silently corrupts
scores or destroys a table:

- Jaro-Winkler: the numpy batch (the production scorer), the scalar
  spec, and DuckDB (the driver's oracle) must stay bit-identical on
  ARBITRARY unicode, not just the seeded random corpus in
  test_similarity.py; plus the metric's own invariants (symmetry,
  range, identity).
- hashed n-gram vectors: mass conservation (one count per byte
  window), determinism, and coefficient-prefix stability for n <= 5
  (score compatibility across releases).
- swap_dir/recover_dir: a crash injected before ANY filesystem
  operation of the real swap_dir, over a SEQUENCE of versioned swaps,
  never loses the live table — after recover_dir the table exists and
  holds either the previous or the new version, never a stale or
  partial one. This is the durability contract the streaming index
  compaction and every writeback rely on (VERDICT r5 wrong #1).
"""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from go_dedupe_spark.functions.similarity import (
    _gram_coef,
    _hash_vector,
    _jaro_winkler,
    _jaro_winkler_batch,
)
from go_dedupe_spark.plans.writeback import recover_dir, swap_dir

# default hypothesis text() already excludes surrogates, so every
# generated string is utf-8 encodable (the byte semantics all three
# Jaro-Winkler implementations share)
_text = st.text(max_size=48)
_settings = settings(
    max_examples=200,
    deadline=None,  # duckdb/numpy warmup spikes the first examples
    suppress_health_check=[HealthCheck.too_slow],
)


# one shared in-process oracle connection (hypothesis calls the test
# function many times; a connect() per example would dominate runtime)
_DDB = duckdb.connect()


# ------------------------------------------------------- Jaro-Winkler


@_settings
@given(pairs=st.lists(st.tuples(_text, _text), min_size=1, max_size=12))
def test_jw_batch_scalar_duckdb_identical(pairs):
    """Bit-identity of the production batch vs the scalar spec vs the
    SQL oracle on arbitrary unicode pairs, batched with MIXED lengths
    (the batch path's padding/masking is exactly what per-row tests
    can't exercise)."""
    ddb = _DDB
    a = pd.Series([p[0] for p in pairs])
    b = pd.Series([p[1] for p in pairs])
    got = _jaro_winkler_batch(a, b)
    want_scalar = np.array([_jaro_winkler(x, y) for x, y in pairs])
    # EXACT equality — both are float64 over the same expression order;
    # allclose's default rtol would mask real kernel drift
    assert (got == want_scalar).all(), (
        list(zip(pairs, got, want_scalar)))
    ddb.register("_p", pd.DataFrame(pairs, columns=["a", "b"]))
    want_sql = np.array([r[0] for r in ddb.execute(
        "SELECT jaro_winkler_similarity(a, b) FROM _p").fetchall()])
    assert np.all(np.abs(got - want_sql) <= 1e-12), (
        list(zip(pairs, got, want_sql)))


@_settings
@given(a=_text, b=_text)
def test_jw_metric_invariants(a, b):
    s_ab = _jaro_winkler(a, b)
    s_ba = _jaro_winkler(b, a)
    assert s_ab == pytest.approx(s_ba, abs=1e-12)   # symmetric
    assert 0.0 <= s_ab <= 1.0                        # bounded
    if a and a == b:
        assert s_ab == 1.0                           # identity
    if (a == "") != (b == ""):
        assert s_ab == 0.0                           # empty vs non-empty


# -------------------------------------------------- hashed n-gram vec


@_settings
@given(text=_text, n=st.integers(1, 8), dim=st.sampled_from([32, 128]))
def test_hash_vector_mass_and_determinism(text, n, dim):
    v = _hash_vector(text, n=n, dim=dim)
    assert v.shape == (dim,)
    assert (v >= 0).all()
    nbytes = len(text.encode("utf-8"))
    # one count per sliding byte window; short/empty inputs: one padded
    # window (empty: zero vector)
    want_mass = 0 if nbytes == 0 else max(nbytes - n + 1, 1)
    assert v.sum() == want_mass
    assert (v == _hash_vector(text, n=n, dim=dim)).all()


@given(n=st.integers(1, 24))
@settings(max_examples=50, deadline=None)
def test_gram_coef_prefix_stable_distinct_odd(n):
    c = _gram_coef(n)
    assert len(c) == n
    assert (c[: min(n, 5)] == _gram_coef(5)[: min(n, 5)]).all()
    assert len(np.unique(c)) == n
    assert (c % 2 == 1).all()


# ------------------------------------------- swap_dir crash injection


class _Crash(RuntimeError):
    pass


def _write_version(d: Path, v: int) -> None:
    if d.exists():
        shutil.rmtree(d)
    d.mkdir()
    (d / "part-0.parquet").write_text(f"v{v}")


def _read_version(d: Path) -> int:
    return int((d / "part-0.parquet").read_text()[1:])


def _swap_with_crash(staging: Path, final: Path,
                     crash_before_op: int) -> bool:
    """Run the REAL swap_dir with a crash injected before its Nth
    filesystem operation (rename or rmtree). Returns True if the swap
    completed. crash_before_op larger than the op count = no crash."""
    counter = {"n": 0}
    real_rename = Path.rename
    real_rmtree = shutil.rmtree

    def tick():
        counter["n"] += 1
        if counter["n"] > crash_before_op:
            raise _Crash()

    def rename(self, target):
        tick()
        return real_rename(self, target)

    def rmtree(path, *a, **k):
        tick()
        return real_rmtree(path, *a, **k)

    # swap_dir does `import shutil` in its body, so it resolves rmtree
    # off the global shutil module at call time — patch that module
    with pytest.MonkeyPatch.context() as mp:
        mp.setattr(Path, "rename", rename)
        mp.setattr(shutil, "rmtree", rmtree)
        try:
            swap_dir(staging, final)
            return True
        except _Crash:
            return False


@settings(max_examples=120, deadline=None)
@given(crash_points=st.lists(st.integers(0, 5), min_size=1, max_size=6))
def test_swap_sequence_never_loses_live_table(crash_points):
    """Stateful durability property: across a sequence of versioned
    swaps, each crashed before an arbitrary filesystem operation of the
    real swap_dir, recover_dir always leaves a COMPLETE live table
    holding either the pre-swap or the post-swap version — never
    missing, never a partial or stale copy. (swap_dir's own op order:
    [rmtree stale .old,] [final -> .old,] staging -> final[, rmtree
    .old] — 0..4 ops depending on state.)"""
    with tempfile.TemporaryDirectory() as td:
        root = Path(td)
        final = root / "table"
        staging = root / "table.staging"
        _write_version(final, 0)
        current = 0
        for i, crash_at in enumerate(crash_points, start=1):
            _write_version(staging, i)
            completed = _swap_with_crash(staging, final, crash_at)
            recover_dir(final)
            assert final.exists(), "live table lost"
            got = _read_version(final)
            assert got in (current, i), (
                f"table holds v{got}, expected v{current} or v{i}")
            if completed:
                assert got == i
            current = got
            # a crashed swap may leave the staging dir; the next
            # iteration rewrites it (same as a retried job would)


def test_swap_crash_every_single_point_exhaustive():
    """Non-random twin of the property above: every crash point of a
    had-final + stale-.old swap (the maximal 4-op sequence), checked
    exhaustively so the invariant doesn't depend on hypothesis'
    sampling."""
    for crash_at in range(5):
        with tempfile.TemporaryDirectory() as td:
            root = Path(td)
            final, staging = root / "t", root / "t.staging"
            old = root / "t.old"
            _write_version(final, 1)
            _write_version(staging, 2)
            old.mkdir()
            (old / "part-0.parquet").write_text("stale")
            completed = _swap_with_crash(staging, final, crash_at)
            recover_dir(final)
            assert final.exists()
            got = (final / "part-0.parquet").read_text()
            assert got in ("v1", "v2"), got
            assert completed == (crash_at >= 4)
            if completed:
                assert got == "v2"
