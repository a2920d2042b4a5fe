from hudi_demo_spark.operators import (
    dedup,
    events,
    graph,
    multimodal,
    profile,
    sampling,
    similarity,
    text,
)

__all__ = ["dedup", "events", "graph", "similarity", "profile", "sampling", "text", "multimodal"]
