from hudi_demo_spark.operators import (
    dedup,
    events,
    graph,
    multimodal,
    sampling,
    similarity,
    text,
)

__all__ = ["dedup", "events", "graph", "similarity", "sampling", "text", "multimodal"]
