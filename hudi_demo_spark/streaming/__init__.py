from hudi_demo_spark.streaming.read import (
    CdcPuller,
    IncrementalPuller,
    stream_read,
)
from hudi_demo_spark.streaming.stateful import running_totals
from hudi_demo_spark.streaming.write import stream_write

__all__ = [
    "stream_write", "stream_read", "IncrementalPuller", "CdcPuller",
    "running_totals",
]
