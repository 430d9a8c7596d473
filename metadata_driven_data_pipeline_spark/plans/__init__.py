from metadata_driven_data_pipeline_spark.plans.compiler import (
    CompiledDataflow,
    compile_dataflow,
    validate_metadata,
)

__all__ = ["CompiledDataflow", "compile_dataflow", "validate_metadata"]
