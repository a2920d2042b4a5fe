from hudi_demo_spark.engine.config import (
    COMMIT_TIME_META,
    DELETED_META,
    META_COLS,
    PARTITION_PATH_META,
    RECORD_KEY_META,
    TableConfig,
)
from hudi_demo_spark.engine.engine import Engine

__all__ = [
    "Engine",
    "TableConfig",
    "META_COLS",
    "COMMIT_TIME_META",
    "RECORD_KEY_META",
    "PARTITION_PATH_META",
    "DELETED_META",
]
