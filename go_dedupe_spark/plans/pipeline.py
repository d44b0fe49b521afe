"""The end-to-end dedupe plan: files -> records -> blocks -> pairs ->
scores -> components -> resolution.

This is the Spark replacement for the reference's three CLI tools
chained by CSV files (index-locations -> compare-locations ->
wof-process-duplicates, SURVEY.md §3): one declarative plan, each stage
checkpointed and individually resumable.
"""

from __future__ import annotations

import hashlib
import json
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_dedupe_spark.operators.blocking import make_blocks
from go_dedupe_spark.operators.components import (
    DRIVER_MAX_EDGES_DEFAULT as CC_DRIVER_MAX_EDGES,
    connected_components,
)
from go_dedupe_spark.operators.normalize import normalize
from go_dedupe_spark.operators.pairs import candidate_pairs
from go_dedupe_spark.operators.resolve import resolve_clusters
from go_dedupe_spark.operators.scoring import build_features, score_pairs
from go_dedupe_spark.plans.checkpoint import CheckpointStore


@dataclass
class PipelineConfig:
    threshold: float = 0.52
    num_hashes: int = 12
    band_rows: int = 3
    content_num_hashes: int = 9
    content_band_rows: int = 3
    max_block: int = 64
    salt_cap: int = 32
    with_cosine: bool = True
    cc_max_iter: int = 25
    # driver union-find fast path bound — single source of truth (with
    # the measured rationale) lives in operators.components
    cc_driver_max_edges: int = CC_DRIVER_MAX_EDGES
    # survivors' cluster-sized supersedes arrays (reference parity) —
    # set False at corpus scale; edges stay on the loser rows
    # (operators.resolve.resolve_clusters docstring)
    supersedes_arrays: bool = True
    # materialize independent DAG branches (features || blocks->pairs)
    # from concurrent driver threads. OFF by default: a pinned-core A/B
    # (bench_scaling SCALING_CONCURRENT, 100k rows) measured sequential
    # ~5% FASTER at both 1 and 4 cores — at executor-like core counts
    # the two jobs' memory footprints and python-worker sets overlap
    # more than they fill scheduling gaps. Enable on slot-rich clusters
    # where a single job cannot keep every executor busy.
    concurrent_stages: bool = False
    extra: dict = field(default_factory=dict)

    def fingerprint(self) -> str:
        """Deterministic hash of every stage-relevant field. Folded into
        the checkpoint snapshot key: a rerun with a changed threshold /
        band geometry / max_block must NOT silently reuse stage outputs
        computed under the old config."""
        return hashlib.sha256(
            json.dumps(asdict(self), sort_keys=True, default=str).encode()
        ).hexdigest()[:16]


@dataclass
class PipelineResult:
    records: DataFrame
    blocks: DataFrame
    pairs: DataFrame
    scores: DataFrame
    components: DataFrame
    resolution: DataFrame


def run_pipeline(
    spark: SparkSession,
    files: DataFrame,
    cfg: PipelineConfig | None = None,
    store: CheckpointStore | None = None,
    input_snapshot: str = "adhoc",
) -> PipelineResult:
    """Run all six stages. With a ``store``, each stage checkpoints and
    resumes idempotently (same input_snapshot AND same config -> reuse;
    the config fingerprint is folded into the snapshot key so a changed
    threshold/band geometry recomputes instead of serving stale stages)."""
    cfg = cfg or PipelineConfig()
    input_snapshot = f"{input_snapshot}:cfg={cfg.fingerprint()}"

    def stage(name: str, compute, sort_by=None) -> DataFrame:
        if store is None:
            # No durable checkpoint requested — still CUT THE PLAN.
            # Stage outputs are referenced many times downstream (pair
            # generation alone reads blocks six ways); without
            # truncation every action re-analyzes the full upstream
            # MinHash expression tree (measured: ~3s of single-threaded
            # Catalyst planning per action, ~100KB plans) and the
            # driver becomes the scaling bottleneck. Eager (one action
            # per stage): measured equal-or-faster than lazy fusion
            # here, and materialization is deterministic — a lazy
            # checkpoint referenced from both sides of a self-join can
            # duplicate partition compute in the racing first job.
            return compute().localCheckpoint(eager=True)
        return store.get_or_compute(spark, name, input_snapshot, compute,
                                    sort_by=sort_by)

    records = stage("records", lambda: normalize(files), sort_by=["id"])

    # DAG-aware concurrency: ``features`` depends only on ``records``,
    # not on blocks/pairs — so the Python-UDF-heavy feature job runs
    # CONCURRENTLY with the JVM-heavy blocks->pairs chain (Spark's
    # scheduler interleaves jobs submitted from separate threads). Each
    # job's scheduling gaps and low-parallelism tails fill with the
    # other's tasks; on one core this is a no-op (same total work), so
    # it purely improves N->4N scaling efficiency and cluster
    # utilization. Exceptions propagate on join.
    def run_blocks_pairs() -> tuple[DataFrame, DataFrame]:
        blocks = stage(
            "blocks",
            lambda: make_blocks(
                records,
                num_hashes=cfg.num_hashes, band_rows=cfg.band_rows,
                content_num_hashes=cfg.content_num_hashes,
                content_band_rows=cfg.content_band_rows,
            ),
            sort_by=["block_key", "id"],
        )
        pairs = stage(
            "pairs",
            lambda: candidate_pairs(blocks, max_block=cfg.max_block,
                                    salt_cap=cfg.salt_cap),
            sort_by=["id_a", "id_b"],
        )
        return blocks, pairs

    def run_features() -> DataFrame:
        return stage(
            "features",
            lambda: build_features(records, with_cosine=cfg.with_cosine),
            sort_by=["id"],
        )

    if cfg.concurrent_stages:
        with ThreadPoolExecutor(max_workers=2) as pool:
            f_bp = pool.submit(run_blocks_pairs)
            f_feat = pool.submit(run_features)
            blocks, pairs = f_bp.result()
            features = f_feat.result()
    else:
        blocks, pairs = run_blocks_pairs()
        features = run_features()
    scores = stage(
        "scores",
        lambda: score_pairs(pairs, threshold=cfg.threshold,
                            with_cosine=cfg.with_cosine, features=features),
        sort_by=["id_a", "id_b"],
    )
    matches = scores.where("is_match").select("id_a", "id_b")

    def compute_components() -> DataFrame:
        comp = connected_components(matches, max_iter=cfg.cc_max_iter,
                                    driver_max_edges=cfg.cc_driver_max_edges)
        singletons = (
            records.select("id")
            .join(comp.select("id"), "id", "left_anti")
            .withColumn("cluster_id", F.col("id"))
        )
        return comp.unionByName(singletons)

    components = stage("components", compute_components, sort_by=["id"])
    resolution = stage(
        "resolution",
        lambda: resolve_clusters(components, records,
                                 supersedes_arrays=cfg.supersedes_arrays),
        sort_by=["cluster_id", "id"],
    )
    return PipelineResult(records, blocks, pairs, scores, components, resolution)
