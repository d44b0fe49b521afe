"""End-to-end ``spark-submit --py-files`` deployment test.

The north rule's deployment shape — "run via spark-submit --py-files on
a multi-executor cluster ... resumable from checkpoint with
per-partition lineage + metrics" — exercised for real: the package is
zipped, shipped via --py-files to a fresh spark-submit JVM (NOT the
pytest session's), the full pipeline runs from scripts/run_pipeline.py,
and a second submission with the same input snapshot resumes from the
checkpoints instead of recomputing (reference resume ancestry:
iterator start-after, location/database.go checkpoint reads).

One subprocess pipeline run covers submit + checkpoint + output; the
rerun asserts idempotent resume through the same public entry point.
"""

from __future__ import annotations

import json
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

SPARK_SUBMIT = shutil.which("spark-submit")
REPO = Path(__file__).resolve().parent.parent


def _submit(zip_path: str, args: list[str], cwd: Path) -> dict:
    cmd = [
        SPARK_SUBMIT,
        "--master", "local[4]",
        "--conf", "spark.sql.shuffle.partitions=8",
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        str(REPO / "scripts" / "run_pipeline.py"),
    ] + args
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=600, cwd=str(cwd),
    )
    assert out.returncode == 0, out.stderr[-4000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary in stdout: {out.stdout[-2000:]}"
    return json.loads(lines[-1])


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_spark_submit_pipeline_and_resume(tmp_path, corpus):
    # input table written by plain pandas (the submitted JVM is the one
    # under test; don't warm anything through the pytest session)
    input_dir = tmp_path / "files_parquet"
    input_dir.mkdir()
    corpus.files[["repo", "path", "commit", "lang", "content"]].to_parquet(
        input_dir / "part-0.parquet", index=False
    )

    from go_dedupe_spark.session import package_zip

    zip_path = package_zip()
    ckpt = tmp_path / "ckpt"
    out1 = tmp_path / "out1"
    base = [
        "--input", str(input_dir),
        "--checkpoint-root", str(ckpt),
        "--snapshot", "snap-e2e-1",
    ]

    summary1 = _submit(zip_path, base + ["--output", str(out1)], tmp_path)
    stages1 = summary1["stages"]
    assert stages1, "first run must compute and checkpoint stages"

    # resume: same snapshot, fresh JVM -> every stage is a checkpoint
    # hit, so NO new metric rows are appended (metrics.jsonl is
    # cumulative across runs at the same checkpoint root)
    out2 = tmp_path / "out2"
    summary2 = _submit(zip_path, base + ["--output", str(out2)], tmp_path)
    assert summary2["stages"] == stages1, (
        "rerun with the same input snapshot must resume from checkpoints "
        f"(no new metric rows); got {summary2['stages']} vs {stages1}"
    )

    # both runs' outputs agree (read back with plain pyarrow — no Spark)
    import pandas as pd

    def read(out_dir: Path) -> pd.DataFrame:
        parts = sorted(out_dir.glob("*.parquet"))
        assert parts, f"no parquet output in {out_dir}"
        df = pd.concat([pd.read_parquet(p) for p in parts])
        # resolution carries array columns (supersedes/superseded_by);
        # sort on the scalar primary key only
        df = df.sort_values("id").reset_index(drop=True)
        for c in df.columns:
            if df[c].map(lambda v: isinstance(v, (list, tuple))
                         or hasattr(v, "__len__") and not isinstance(v, str)
                         ).any():
                df[c] = df[c].map(
                    lambda v: ",".join(map(str, v)) if v is not None else "")
        return df

    df1, df2 = read(out1), read(out2)
    assert len(df1) > 0
    pd.testing.assert_frame_equal(df1, df2)
    assert {"id", "cluster_id"} <= set(df1.columns)
    # clusters are non-trivial: the synth corpus plants dup groups
    assert df1["cluster_id"].nunique() < len(df1)
