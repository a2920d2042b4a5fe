"""hudi_demo_spark — a PySpark-native transactional-lakehouse engine.

Re-expresses the capability surface of the reference repo
(dongkelun/hudi-demo: Apache Hudi usage demos, see SURVEY.md) as an
idiomatic PySpark 4 library: keyed/partitioned/versioned parquet tables
with a JSON commit timeline, COW/MOR write paths, snapshot + incremental
reads, streaming ingest, table services, and LLM-data-pipeline extension
operators (dedup, similarity search, text analysis, multimodal columns).

Everything is stock DataFrame API — no custom Catalyst rules (SURVEY §4).
"""

from hudi_demo_spark.engine import Engine, TableConfig
from hudi_demo_spark.session import get_spark

__all__ = ["Engine", "TableConfig", "get_spark"]
__version__ = "0.1.0"
