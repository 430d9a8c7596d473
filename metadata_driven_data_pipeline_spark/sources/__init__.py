from metadata_driven_data_pipeline_spark.sources.reader import SourceReadResult, read_source
from metadata_driven_data_pipeline_spark.sources.discovery import (
    discover_batches,
    filter_new_batches,
)

__all__ = ["SourceReadResult", "read_source", "discover_batches", "filter_new_batches"]
