"""Plans: end-to-end pipeline orchestration + checkpoint/resume/lineage."""

from go_dedupe_spark.plans.checkpoint import CheckpointStore  # noqa: F401
from go_dedupe_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: F401
