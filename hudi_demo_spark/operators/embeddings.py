"""Corpus-level embedding statistics — mean/covariance and PCA.

Extension operators (BASELINE.json mandate) beyond the reference surface;
the reference has no vector types at all (SURVEY.md §1.3).

Scale design: covariance needs Σ x·xᵀ over the corpus. Exploding the
dim² outer product per row (rows × 4096 for dim=64) shuffles the corpus;
instead each partition computes its partial (n, Σx, Σx·xᵀ) with numpy
inside one Arrow-batched ``mapInPandas`` pass — the shuffle then moves
ONE dim²-sized row per partition, independent of corpus size. This is
the textbook partial-aggregation shape for any moment statistic. PCA is
then a driver-side eigh of the dim×dim matrix (dim ≤ a few thousand)
and a map-side matmul projection — no iteration, no corpus shuffle.
"""

from __future__ import annotations
from hudi_demo_spark.operators.util import rows_df as _rows_df

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),       # Σx (dim)
        T.StructField("g", T.ArrayType(T.DoubleType())),       # Σx·xᵀ (dim², row-major)
    ]
)


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One (n, Σx, Σx·xᵀ) row per input partition, numpy-accumulated."""

    def part(batches):
        import numpy as np
        import pandas as pd

        n, s, g = 0, None, None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(0) if s is None else s + x.sum(0)
            gg = x.T @ x
            g = gg if g is None else g + gg
        if n:
            yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})

    return df.select(vec_col).mapInPandas(part, _PARTIAL_SCHEMA)


def embedding_moments(df: DataFrame, vec_col: str):
    """(n, mean: np.ndarray[dim], cov: np.ndarray[dim, dim]) of the
    embedding column, population covariance. Driver holds only dim²."""
    import numpy as np

    parts = _moment_partials(df, vec_col).collect()
    if not parts:
        raise ValueError("embedding_moments: empty input")
    n = sum(p["n"] for p in parts)
    s = np.sum([np.asarray(p["s"]) for p in parts], axis=0)
    g = np.sum([np.asarray(p["g"]) for p in parts], axis=0)
    dim = s.shape[0]
    mean = s / n
    cov = g.reshape(dim, dim) / n - np.outer(mean, mean)
    return n, mean, cov


def embedding_covariance(
    df: DataFrame, vec_col: str, round_to: int = 6
) -> DataFrame:
    """Upper-triangle covariance entries as a DataFrame (i, j, cov),
    i <= j, 0-based — the differential-testable face of
    `embedding_moments`."""
    n, mean, cov = embedding_moments(df, vec_col)
    dim = mean.shape[0]
    rows = [
        (i, j, round(float(cov[i, j]), round_to))
        for i in range(dim)
        for j in range(i, dim)
    ]
    return _rows_df(df.sparkSession, 
        rows, "i int, j int, cov double"
    )


def pca_project(
    df: DataFrame, vec_col: str, k: int, out_col: str = "pca"
) -> DataFrame:
    """Append a k-dim PCA projection of `vec_col`. Components come from
    a driver-side eigh of the dim×dim covariance (deterministic: sign
    fixed so each component's largest-|coord| entry is positive); the
    projection itself is a map-side literal-matrix expression — no UDF,
    no shuffle, fully codegen'd."""
    import numpy as np

    _, mean, cov = embedding_moments(df, vec_col)
    vals, vecs = np.linalg.eigh(cov)          # ascending
    comp = vecs[:, ::-1][:, :k]               # top-k columns
    for c in range(k):
        j = int(np.abs(comp[:, c]).argmax())
        if comp[j, c] < 0:
            comp[:, c] = -comp[:, c]
    dim = mean.shape[0]
    centered = [
        F.col(vec_col)[i].cast("double") - float(mean[i]) for i in range(dim)
    ]
    proj = F.array(
        *[
            sum(centered[i] * float(comp[i, c]) for i in range(dim))
            for c in range(k)
        ]
    )
    return df.withColumn(out_col, proj)
