"""Plans: end-to-end pipeline orchestration + checkpoint/resume/lineage."""

from go_dedupe_spark.plans.checkpoint import (  # noqa: F401
    CheckpointStore,
    IcebergBackend,
    MemoryBackend,
    ParquetBackend,
)
from go_dedupe_spark.plans.pipeline import PipelineConfig, run_pipeline  # noqa: F401
from go_dedupe_spark.plans.writeback import (  # noqa: F401
    migrate_records,
    patch_if_changed,
    write_patches_if_changed,
)
