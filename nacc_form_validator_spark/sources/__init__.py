"""Sources & sinks: pages generation, testdata tables, checkpointed sinks."""

from nacc_form_validator_spark.sources.pages import (pages_from_documents,
                                                     synthetic_pages)
from nacc_form_validator_spark.sources.sinks import (completed_buckets,
                                                     resume_filter,
                                                     run_checkpointed,
                                                     write_decisions)

__all__ = [
    "pages_from_documents", "synthetic_pages", "completed_buckets",
    "resume_filter", "run_checkpointed", "write_decisions",
]
