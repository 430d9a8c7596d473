from metadata_driven_data_pipeline_spark.sinks.writer import write_df, write_sink

__all__ = ["write_df", "write_sink"]
