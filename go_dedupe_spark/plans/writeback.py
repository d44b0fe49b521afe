"""Write-back operations: migrate (K6) and patch-if-changed (K5/C4).

Ancestors in the reference:
- K6 — deprecated-record migrator (app/whosonfirst/deprecated/migrate/
  migrate.go:40-100): select records matching a predicate (deprecated),
  rewrite their repo property, write them to the target repo, DELETE
  them from the source. Spark shape: one predicate split, two writes —
  the os.Remove-per-file loop becomes a delete-where (Iceberg row-level
  delete; on the parquet seam, a rewrite of the retained rows).
- K5/C4 — property patch-if-changed (process.go:385-403
  ``AssignPropertiesIfChanged``; assign.go:53-170 concordance patches):
  apply updates to matched records but write ONLY when something
  actually changed, so no-op runs leave the store byte-identical.
  Spark shape: left join + coalesce + a changed-count gate on the
  write (the MERGE INTO pattern on an Iceberg catalog).

Both operate on the CheckpointStore's parquet seam — the same seam
where Iceberg slots in on a cluster (plans/checkpoint.py docstring).
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def migrate_records(
    spark: SparkSession,
    source_dir: str | Path,
    target_dir: str | Path,
    predicate: Column,
    set_columns: dict[str, Column] | None = None,
) -> dict[str, int]:
    """K6: move rows matching ``predicate`` from the source table to the
    target table, applying ``set_columns`` rewrites to the moved rows
    (the reference rewrites ``properties.wof:repo``, migrate.go:57-59),
    then delete them from the source.

    Returns {"moved": n, "retained": m}. The source rewrite goes through
    a staging directory then an atomic-ish swap, so a crash mid-migrate
    never truncates the source (the moved rows are written to the
    target FIRST — re-running after a crash re-moves them idempotently
    because the target write is an overwrite-by-content upsert via
    unionByName + dropDuplicates on id)."""
    source_dir, target_dir = Path(source_dir), Path(target_dir)
    # heal a previous run's swap interrupted between its two renames
    # (table stranded at <dir>.old) before reading either side
    recover_dir(source_dir)
    recover_dir(target_dir)
    src = spark.read.parquet(str(source_dir))

    moving = src.where(predicate)
    for name, expr in (set_columns or {}).items():
        moving = moving.withColumn(name, expr)
    retained = src.where(~F.coalesce(predicate, F.lit(False)))

    # 1. append-style upsert into the target (idempotent on id)
    if target_dir.exists() and any(target_dir.glob("*.parquet")):
        existing = spark.read.parquet(str(target_dir))
        merged = existing.unionByName(moving).dropDuplicates(["id"])
    else:
        merged = moving
    n_moved = moving.count()
    staging_t = target_dir.with_name(target_dir.name + ".staging")
    merged.write.mode("overwrite").parquet(str(staging_t))
    _swap(staging_t, target_dir)

    # 2. delete-where on the source = rewrite of the retained rows
    n_retained = retained.count()
    staging_s = source_dir.with_name(source_dir.name + ".staging")
    retained.write.mode("overwrite").parquet(str(staging_s))
    _swap(staging_s, source_dir)
    return {"moved": n_moved, "retained": n_retained}


def swap_dir(staging: Path, final: Path) -> None:
    """Replace ``final`` with ``staging`` without a window in which the
    live table is GONE: the old dir is renamed aside first (rename is
    atomic on one filesystem), the staging dir renamed in, and only
    then is the old copy deleted. A crash between the two renames
    leaves ``final.old`` intact — ``recover_dir`` (or a manual
    `mv final.old final`) restores it, and a leftover ``final.old``
    from a previous crash is cleared up front."""
    import shutil

    staging, final = Path(staging), Path(final)
    # self-heal first: if a PRIOR swap crashed between its renames,
    # final.old IS the live table, not stale garbage — restoring it
    # before the rmtree below means a caller who skips recover_dir can
    # never destroy the sole rollback copy (review r6)
    recover_dir(final)
    old = final.with_name(final.name + ".old")
    if old.exists():
        shutil.rmtree(old)
    had_final = final.exists()
    if had_final:
        final.rename(old)
    staging.rename(final)
    if had_final:
        shutil.rmtree(old)


_swap = swap_dir  # internal alias kept for existing call sites/tests


def recover_dir(final: Path) -> bool:
    """Heal the one non-atomic window ``swap_dir`` leaves: a crash
    between its two renames strands the live table at ``final.old``
    with ``final`` missing. If exactly that state is found, rename the
    old copy back and return True; otherwise change nothing. Safe to
    call unconditionally before reading a swap-managed table."""
    final = Path(final)
    old = final.with_name(final.name + ".old")
    if not final.exists() and old.exists():
        old.rename(final)
        return True
    return False


def patch_if_changed(
    records: DataFrame,
    patches: DataFrame,
    key: str = "id",
) -> tuple[DataFrame, Column]:
    """K5: join-update — apply every patch column that exists in the
    records schema to the matching record, marking rows where at least
    one value actually changed. Returns
    (patched_df_with_changed_flag, changed_condition).

    Semantics (the coherent ones after a left join, where "no matching
    patch row" and "patch value NULL" are indistinguishable): a non-NULL
    patch value differing from the record's (including NULL->value)
    counts as a change; a NULL patch value is a NO-OP, never a
    value->NULL erase — erasure needs an explicit sentinel, exactly as
    the reference patches whole property values rather than deleting
    keys (export.AssignPropertiesIfChanged, process.go:387-393). Patch
    columns absent from the records schema raise — silently dropping a
    requested patch is a data-loss bug."""
    patch_cols = [c for c in patches.columns if c != key]
    missing = [c for c in patch_cols if c not in records.columns]
    if missing:
        raise ValueError(
            f"patch columns not in records schema: {missing} "
            f"(records has {records.columns})")
    p = patches.select(
        key, *[F.col(c).alias(f"_patch_{c}") for c in patch_cols])
    joined = records.join(p, key, "left")
    changed = F.lit(False)
    out_cols = []
    for c in records.columns:
        if c == key or c not in patch_cols:
            out_cols.append(F.col(c))
            continue
        pc = F.col(f"_patch_{c}")
        out_cols.append(F.coalesce(pc, F.col(c)).alias(c))
        changed = changed | (pc.isNotNull() & ~pc.eqNullSafe(F.col(c)))
    return joined.select(*out_cols, changed.alias("_changed")), changed


def write_patches_if_changed(
    spark: SparkSession,
    table_dir: str | Path,
    patches: DataFrame,
    key: str = "id",
) -> int:
    """Apply ``patch_if_changed`` against a parquet stage table and
    rewrite it ONLY if >= 1 row changed; a no-op patch leaves the
    on-disk files byte-identical (the only-if-changed write guard,
    process.go:385-403). Returns the changed-row count."""
    table_dir = Path(table_dir)
    recover_dir(table_dir)   # heal a prior interrupted swap first
    records = spark.read.parquet(str(table_dir))
    patched, _ = patch_if_changed(records, patches, key=key)
    n_changed = patched.where("_changed").count()
    if n_changed == 0:
        return 0
    staging = table_dir.with_name(table_dir.name + ".staging")
    # deterministic layout for rerun-stable bytes (same rule as
    # CheckpointStore.write)
    patched.drop("_changed").repartition(key).sortWithinPartitions(key) \
        .write.mode("overwrite").parquet(str(staging))
    _swap(staging, table_dir)
    return n_changed
