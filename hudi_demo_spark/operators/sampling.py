"""Deterministic sampling and dataset splitting for training pipelines.

RNG-based sampling (`df.sample`) is not reproducible across engines,
partitionings, or reruns — a training pipeline needs the SAME split for
the same key every time, on any engine. The standard fix is hash-based
assignment: bucket each key by a stable hash of its id and carve the
bucket space into splits. Pure map-side expression work — no shuffle, no
state, and a row's split never changes when the dataset grows.

md5 is used (not xxhash64) so the assignment is bit-identical in any
engine that can compute md5 of the same string — the DuckDB oracle
checks the split row-by-row.
"""

from __future__ import annotations

from hudi_demo_spark.operators.util import local_relation
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column | str, buckets: int = 16) -> Column:
    """Stable bucket in [0, buckets) from the md5 of the key's string
    form. buckets must divide 16**k for exact uniformity; 16 uses the
    first hex nibble."""
    c = F.col(key) if isinstance(key, str) else key
    nibbles = 1
    space = 16
    while space < buckets:
        nibbles += 1
        space *= 16
    return (
        F.conv(F.substring(F.md5(c.cast("string")), 1, nibbles), 16, 10)
        .cast("int")
        % buckets
    )


def hash_sample(df: DataFrame, key: str, fraction_16ths: int) -> DataFrame:
    """Deterministic ~fraction_16ths/16 sample by key hash (same rows on
    every engine and every run)."""
    return df.filter(hash_bucket(key, 16) < fraction_16ths)


def weighted_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    rates_256ths: dict[str, int],
    default_256ths: int = 256,
) -> DataFrame:
    """Domain mixing: deterministically sample each group (source /
    domain / language) at its own rate — the standard pretraining-mixture
    op ("keep 10% of CommonCrawl, 100% of Wikipedia"). Rates are in
    256ths so the assignment is an exact integer comparison on a 2-hex-
    nibble bucket of the stable key hash: reproducible on any engine, no
    RNG, map-side only, and a row's fate never changes as data grows.

    Unknown groups keep `default_256ths` (256 = keep all)."""
    for g, r in rates_256ths.items():
        if not 0 <= r <= 256:
            raise ValueError(f"rate for {g!r} must be in [0, 256]")
    b = hash_bucket(key, 256)
    rate = F.lit(default_256ths)
    for g, r in rates_256ths.items():
        rate = F.when(F.col(group_col) == g, F.lit(r)).otherwise(rate)
    return df.filter(b < rate)


def token_budget_mix(
    df: DataFrame,
    key: str,
    group_col: str,
    token_col: str,
    weights: dict[str, float],
    budget: int,
) -> DataFrame:
    """Token-BUDGET mixture planner: build a training mix of exactly
    ~`budget` tokens honoring `weights` (the DoReMi/Llama-style "60%
    web, 20% code, 20% books" recipe stated in tokens, not rows), from
    per-doc token counts. Each group g gets target = floor(w_g·budget
    + 0.5) tokens: `target // available` FULL EPOCHS of every doc
    (upsampling domains smaller than their share — the standard
    practice for high-quality sources) plus a deterministic
    hash-ordered prefix of docs covering the remainder (the doc
    crossing the boundary is included, so the budget is met, never
    undershot). Emits selected docs with an `epochs` count; groups
    outside `weights` drop.

    Deterministic and engine-portable: the prefix order is
    (md5(key), key), so the same docs are chosen on every engine and
    every rerun — no RNG. One shuffle keyed by group for the prefix
    window; the per-group token totals are a bounded driver collect
    (#groups rows). At 100 TB the hottest group's window is a single
    ordered pass over that group — if one domain dominates, pre-split
    it into shards and weight the shards."""
    import math

    stats = {
        r[0]: int(r[1])
        for r in df.filter(F.col(group_col).isin(list(weights)))
        .groupBy(group_col)
        .agg(F.sum(token_col))
        .collect()
    }
    plans = []
    for g, w in weights.items():
        avail = stats.get(g, 0)
        if avail <= 0:
            continue
        target = int(math.floor(float(w) * budget + 0.5))
        full = target // avail
        rem = target - full * avail
        plans.append((g, full, rem))
    if not plans:
        return df.limit(0).withColumn("epochs", F.lit(0).cast("long"))
    spark = df.sparkSession
    plan_df = F.broadcast(
        local_relation(
            spark, plans, f"{group_col} string, __full long, __rem long"
        )
    )
    w_ord = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key).cast("string")), F.col(key)
    )
    cum_before = F.coalesce(
        F.sum(token_col).over(
            w_ord.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return (
        df.join(plan_df, group_col)
        .withColumn("__cb", cum_before)
        .withColumn(
            "epochs",
            (
                F.col("__full")
                + F.when(F.col("__cb") < F.col("__rem"), 1).otherwise(0)
            ).cast("long"),
        )
        .filter(F.col("epochs") > 0)
        .drop("__full", "__rem", "__cb")
    )


def seeded_shuffle(
    df: DataFrame,
    key: str,
    seed: str | int,
    pos_col: str = "shuffle_pos",
) -> DataFrame:
    """Deterministic global permutation for training-order shuffling:
    every row gets a contiguous position 0..n-1 in the order of
    ``md5(seed:key)`` (ties broken by key). Changing the seed reshuffles;
    the same seed gives the same order on any engine, any parallelism,
    any run — which is what makes a training run reproducible.

    Scale: a global ``row_number() OVER (ORDER BY hash)`` collapses to
    one partition. The first two hex nibbles of the hash are a 256-way
    range bucket that is a PREFIX of the sort key, so global order ==
    (bucket, hash, key) order: positions are computed with per-bucket
    windows (parallel) plus a broadcast 256-row base-offset table —
    the pack_offsets two-phase shape, one keyed shuffle total."""
    k = F.col(key)
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), k.cast("string")))
    b = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    tagged = df.withColumn("__ss_h", h).withColumn("__ss_b", b)
    counts = {
        r[0]: r[1]
        for r in tagged.groupBy("__ss_b").count().collect()
    }
    base, acc = {}, 0
    for bucket in sorted(counts):
        base[bucket] = acc
        acc += counts[bucket]
    spark = df.sparkSession
    offsets = local_relation(
        spark,
        [(int(bk), int(off)) for bk, off in base.items()],
        "__ss_b int, __ss_base long",
    )
    w = Window.partitionBy("__ss_b").orderBy(F.col("__ss_h").asc(), k.asc())
    return (
        tagged.join(F.broadcast(offsets), "__ss_b")
        .withColumn(
            pos_col,
            (F.row_number().over(w) - 1 + F.col("__ss_base")).cast("long"),
        )
        .drop("__ss_h", "__ss_b", "__ss_base")
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    group_col: str,
    n_per_group: int,
) -> DataFrame:
    """Exactly ``n_per_group`` rows per stratum (fewer when the stratum
    is smaller), chosen as the n smallest stable key hashes — a
    deterministic uniform sample per group (eval-set carving, per-domain
    inspection samples). One keyed shuffle; the hash makes membership
    independent of row order and reproducible cross-engine."""
    if n_per_group <= 0:
        raise ValueError("n_per_group must be positive")
    k = F.col(key)
    h = F.md5(k.cast("string"))
    w = Window.partitionBy(group_col).orderBy(h.asc(), k.asc())
    return (
        df.withColumn("__st_rn", F.row_number().over(w))
        .filter(F.col("__st_rn") <= n_per_group)
        .drop("__st_rn")
    )


def train_val_test_split(
    df: DataFrame,
    key: str,
    val_16ths: int = 2,
    test_16ths: int = 2,
) -> DataFrame:
    """Adds a `split` column ('train' | 'val' | 'test') keyed on the
    stable hash bucket: the last `test_16ths` buckets are test, the
    `val_16ths` before them val, the rest train. NULL keys get a NULL
    split (consistent with `hash_sample`, which excludes them) — they
    must never silently leak into the evaluation splits."""
    if val_16ths < 0 or test_16ths < 0 or val_16ths + test_16ths >= 16:
        raise ValueError(
            "val_16ths + test_16ths must leave at least one train bucket"
        )
    b = hash_bucket(key, 16)
    train_hi = 16 - val_16ths - test_16ths
    return df.withColumn(
        "split",
        F.when(b.isNull(), F.lit(None).cast("string"))
        .when(b < train_hi, F.lit("train"))
        .when(b < 16 - test_16ths, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    val_16ths: int = 2,
    test_16ths: int = 2,
) -> DataFrame:
    """Train/val/test split that keeps near-duplicate CLUSTERS atomic:
    rows split by the hash of their near-dup connected-component
    canonical id (min member id), so a near-duplicate of a training
    document can never land in val/test — the contamination channel a
    plain per-doc hash split leaves open (near-dups of train docs in
    the eval split inflate benchmarks exactly like verbatim leakage).
    `pairs` is near-dup edge evidence (a, b) from any miner (n-gram
    Jaccard, MinHash, SimHash, embedding cosine); rows with no edge
    split by their own id, which reduces to train_val_test_split.
    Adds `split_key` (the component canonical) and `split`.

    Scale shape: components run on the PAIR set (edges, not the
    corpus), the component map joins back broadcast-or-shuffle on the
    id, and the bucket hash is map-side — no new corpus-sized state."""
    from hudi_demo_spark.operators.graph import connected_components

    comp = connected_components(pairs).select(
        F.col("node"), F.col("component")
    )
    keyed = df.join(
        comp, df[id_col] == comp["node"], "left"
    ).withColumn(
        "split_key", F.coalesce(F.col("component"), df[id_col])
    ).drop("node", "component")
    return train_val_test_split(
        keyed, "split_key", val_16ths=val_16ths, test_16ths=test_16ths
    )


def temperature_rates(
    df: DataFrame,
    group_col: str,
    alpha: float = 0.5,
) -> dict[str, int]:
    """Multinomial temperature mixing rates (the XLM / mT5 resampling
    shape, q_g ∝ p_g^alpha) realized as DOWN-sampling keep-rates for
    `weighted_mix`: rate_g = 256 * (n_min / n_g)^(1 - alpha), so the
    rarest group keeps everything and bigger groups are thinned toward
    the temperature-flattened distribution — no row duplication, fully
    deterministic. alpha=1 keeps natural proportions; alpha=0 equalizes
    group sizes. One group-count aggregate (driver gets #groups rows);
    floor(x + 0.5) rounding so any engine reproduces the rates."""
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(group_col).agg(F.count("*").alias("n")).collect()
    }
    if not counts:
        return {}
    n_min = min(counts.values())
    return {
        g: max(
            1,
            min(
                256,
                math.floor(256 * (n_min / n) ** (1.0 - alpha) + 0.5),
            ),
        )
        for g, n in counts.items()
    }
