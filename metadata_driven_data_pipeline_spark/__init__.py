"""metadata_driven_data_pipeline_spark — a PySpark-native metadata-driven analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference repo markomilosevic9/Metadata-driven-data-pipeline (a pure-Python
declarative dataflow interpreter over Spark SQL), rebuilt Spark-first:

- metadata JSON is *compiled* to DataFrame/Column plans (no string SQL),
  Catalyst does all optimization;
- validation annotates once, splits OK/KO from a single cached DataFrame;
- counts come from ``df.observe()`` metrics instead of extra jobs;
- the transform surface is generalized (filter/project/join/aggregate/
  window/sort/set-ops) and extended with LLM-data-pipeline operators
  (dedup, similarity search, text analysis, multimodal plumbing)
  designed for 100 TB scale.

See SURVEY.md for the reference analysis and file:line parity citations.
"""

from metadata_driven_data_pipeline_spark.session import get_spark
from metadata_driven_data_pipeline_spark.schema import build_struct_type
from metadata_driven_data_pipeline_spark.engine import Engine, run_pipeline

__all__ = ["get_spark", "build_struct_type", "Engine", "run_pipeline"]
__version__ = "0.1.0"
