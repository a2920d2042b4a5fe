"""Reusable Column-expression builders (all JVM-side built-ins — no UDFs,
so every expression stays inside whole-stage codegen)."""

from hudi_demo_spark.functions.textfn import (
    bpe_tokens,
    fingerprint_md5,
    normalize_text,
    punct_ratio,
    tokens,
    upper_ratio,
    word_trigrams,
)
from hudi_demo_spark.functions.vectorfn import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "tokens",
    "bpe_tokens",
    "word_trigrams",
    "normalize_text",
    "fingerprint_md5",
    "punct_ratio",
    "upper_ratio",
    "dot_product",
    "l2_norm",
    "cosine_similarity",
]
