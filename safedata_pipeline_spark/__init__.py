"""safedata_pipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of Ashwathi1901/Safedata-Pipeline.

The reference (/root/reference) is a single-process pandas privacy/
anonymization pipeline (risk scoring, SDC suppression, generalization,
DP noise, synthetic sampling, profiling, drift metrics, ML utility,
compliance reporting). This package re-expresses every one of those
operations as lazy, declarative Spark DataFrame plans designed for a
multi-executor cluster at 100 TB scale, plus the LLM-data-pipeline
extensions (dedup, similarity search, multimodal columns, text
analysis) the reference lacks.

Design rules (see SURVEY.md §4):
  * everything is Column expressions / built-in functions — the hot
    path never leaves the JVM; pandas UDFs only where semantics demand
    per-batch Python (multimodal decode stubs).
  * per-column work is fused into single wide aggregations — never the
    reference's ``for col in df.columns`` one-pass-per-column shape.
  * small derived tables (bin edges, rare-value sets, category
    vocabularies) are broadcast; big-big joins get explicit keys.
  * AQE is on by default (runtime coalesce, skew-join splitting).
"""

from safedata_pipeline_spark.session import get_spark
from safedata_pipeline_spark.sources.tables import TABLES, load_table

__version__ = "0.1.0"

__all__ = ["get_spark", "load_table", "TABLES", "__version__"]
