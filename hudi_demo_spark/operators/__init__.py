from hudi_demo_spark.operators import (
    dedup,
    events,
    graph,
    multimodal,
    similarity,
    text,
)

__all__ = ["dedup", "events", "graph", "similarity", "text", "multimodal"]
