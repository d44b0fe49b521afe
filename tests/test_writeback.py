"""K6 migrate + K5 patch-if-changed write-back semantics
(migrate.go:40-100; process.go:385-403's only-if-changed guard)."""

from __future__ import annotations

import hashlib
from pathlib import Path

from pyspark.sql import functions as F

from go_dedupe_spark.plans.writeback import (
    migrate_records,
    patch_if_changed,
    write_patches_if_changed,
)


def _table_digest(d: Path) -> str:
    h = hashlib.sha256()
    for p in sorted(d.rglob("*.parquet")):
        h.update(p.name.encode())
        h.update(p.read_bytes())
    return h.hexdigest()


def _write_src(spark, d: Path):
    df = spark.createDataFrame(
        [("r1", "repo-a", None), ("r2", "repo-a", "2021-01-01"),
         ("r3", "repo-a", None), ("r4", "repo-a", "2022-05-05")],
        ["id", "repo", "deprecated"],
    )
    df.repartition(1).write.mode("overwrite").parquet(str(d))


def test_migrate_moves_deprecated_rows(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _write_src(spark, src)
    stats = migrate_records(
        spark, src, dst,
        predicate=F.col("deprecated").isNotNull(),
        set_columns={"repo": F.lit("repo-deprecated")},   # wof:repo rewrite
    )
    assert stats == {"moved": 2, "retained": 2}
    left = {r["id"] for r in spark.read.parquet(str(src)).collect()}
    moved = spark.read.parquet(str(dst)).collect()
    assert left == {"r1", "r3"}                       # migrated rows LEFT the source
    assert {r["id"] for r in moved} == {"r2", "r4"}
    assert all(r["repo"] == "repo-deprecated" for r in moved)


def test_migrate_is_idempotent_on_rerun(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _write_src(spark, src)
    pred = F.col("deprecated").isNotNull()
    migrate_records(spark, src, dst, pred)
    stats2 = migrate_records(spark, src, dst, pred)    # nothing left to move
    assert stats2["moved"] == 0
    assert spark.read.parquet(str(dst)).count() == 2   # no duplicates


def test_patch_if_changed_flags_only_real_changes(spark):
    records = spark.createDataFrame(
        [("a", "x", 1), ("b", "y", 2), ("c", None, 3)],
        ["id", "val", "keep"])
    patches = spark.createDataFrame(
        [("a", "x"), ("b", "CHANGED"), ("c", "filled")], ["id", "val"])
    out, _ = patch_if_changed(records, patches)
    rows = {r["id"]: r for r in out.collect()}
    assert rows["a"]["_changed"] is False             # same value -> no change
    assert rows["b"]["_changed"] is True and rows["b"]["val"] == "CHANGED"
    assert rows["c"]["_changed"] is True and rows["c"]["val"] == "filled"
    assert rows["a"]["keep"] == 1                      # non-patch cols untouched


def test_noop_patch_leaves_table_byte_identical(spark, tmp_path):
    table = tmp_path / "locations"
    spark.createDataFrame([("a", "x"), ("b", "y")], ["id", "val"]) \
        .repartition(1).write.mode("overwrite").parquet(str(table))
    before = _table_digest(table)
    n = write_patches_if_changed(
        spark, table,
        spark.createDataFrame([("a", "x")], ["id", "val"]))  # no-op patch
    assert n == 0
    assert _table_digest(table) == before              # files untouched
    n2 = write_patches_if_changed(
        spark, table,
        spark.createDataFrame([("a", "z")], ["id", "val"]))
    assert n2 == 1
    rows = {r["id"]: r["val"] for r in spark.read.parquet(str(table)).collect()}
    assert rows == {"a": "z", "b": "y"}


def test_patch_unknown_column_raises(spark):
    """ADVICE r2: a patch column absent from the records schema must
    raise, not silently drop the requested patch."""
    import pytest

    records = spark.createDataFrame([("a", "x")], ["id", "val"])
    patches = spark.createDataFrame([("a", "x", 1)], ["id", "val", "nope"])
    with pytest.raises(ValueError, match="nope"):
        patch_if_changed(records, patches)


def test_swap_clears_leftover_and_replaces(tmp_path):
    from go_dedupe_spark.plans.writeback import _swap

    final, staging = tmp_path / "t", tmp_path / "t.staging"
    final.mkdir(); (final / "a.parquet").write_text("old")
    staging.mkdir(); (staging / "a.parquet").write_text("new")
    leftover = tmp_path / "t.old"
    leftover.mkdir(); (leftover / "junk").write_text("x")   # prior crash
    _swap(staging, final)
    assert (final / "a.parquet").read_text() == "new"
    assert not leftover.exists() and not staging.exists()


def test_swap_interrupted_leaves_recoverable_copy(tmp_path, monkeypatch):
    """ADVICE r2: a crash inside the swap window must never leave the
    live table deleted — the old dir is renamed aside first, so
    recovery is `mv t.old t`."""
    import pytest

    from go_dedupe_spark.plans import writeback

    final, staging = tmp_path / "t", tmp_path / "t.staging"
    final.mkdir(); (final / "a.parquet").write_text("old")
    staging.mkdir(); (staging / "a.parquet").write_text("new")
    real = Path.rename
    calls = {"n": 0}

    def flaky(self, target):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("simulated crash between renames")
        return real(self, target)

    monkeypatch.setattr(Path, "rename", flaky)
    with pytest.raises(OSError):
        writeback._swap(staging, final)
    monkeypatch.setattr(Path, "rename", real)
    old = tmp_path / "t.old"
    assert old.exists() and (old / "a.parquet").read_text() == "old"
    old.rename(final)                                   # documented recovery
    assert (final / "a.parquet").read_text() == "old"


def test_recover_dir_heals_between_renames_state(tmp_path):
    """The swap's one non-atomic window: final renamed aside, staging
    not yet renamed in. recover_dir must restore the old copy; in any
    other state it must change nothing."""
    from go_dedupe_spark.plans.writeback import recover_dir

    final = tmp_path / "table"
    old = tmp_path / "table.old"

    # mid-swap state: only .old exists
    old.mkdir()
    (old / "part-0.parquet").write_text("v1")
    assert recover_dir(final) is True
    assert final.exists() and not old.exists()
    assert (final / "part-0.parquet").read_text() == "v1"

    # healthy state (final exists, stale .old too): untouched
    old.mkdir()
    (old / "part-0.parquet").write_text("stale")
    assert recover_dir(final) is False
    assert (final / "part-0.parquet").read_text() == "v1"
    assert old.exists()   # cleanup is swap_dir's job, not recover's

    # nothing exists: no-op
    import shutil
    shutil.rmtree(final), shutil.rmtree(old)
    assert recover_dir(final) is False
    assert not final.exists() and not old.exists()


def test_patch_if_changed_heals_interrupted_swap(tmp_path, spark):
    """write_patches_if_changed on a table stranded mid-swap reads the
    healed copy instead of failing with PATH_NOT_FOUND."""
    from pyspark.sql import functions as F

    from go_dedupe_spark.plans.writeback import write_patches_if_changed

    tbl = tmp_path / "t"
    spark.createDataFrame([("a", 1), ("b", 2)], ["id", "v"]) \
        .write.parquet(str(tbl))
    tbl.rename(tmp_path / "t.old")          # simulate mid-swap crash

    patches = spark.createDataFrame([("a", 9)], ["id", "v"])
    n = write_patches_if_changed(spark, tbl, patches)
    assert n == 1
    got = {r["id"]: r["v"] for r in spark.read.parquet(str(tbl)).collect()}
    assert got == {"a": 9, "b": 2}
