"""_pinned_session (plans/queries.py): the conf-pinned clone that
replaced the round-8 shared-session mutate-and-restore."""

from hudi_demo_spark.plans.queries import _PINNED_SESSIONS, _pinned_session


def test_pin_is_isolated_and_inherits_runtime_confs(spark):
    key = "spark.sql.shuffle.partitions"
    parent_val = spark.conf.get(key)
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # runtime conf
    s = _pinned_session(spark, 8)
    # the clone is pinned; the parent is untouched
    assert s.conf.get(key) == "8"
    assert spark.conf.get(key) == parent_val
    # explicitly-set runtime confs carried over to the clone
    assert s.conf.get("spark.sql.session.timeZone") == "UTC"
    # same JVM/context, different session
    assert s is not spark
    assert s.sparkContext is spark.sparkContext


def test_pin_is_cached_per_parent_and_width(spark):
    a = _pinned_session(spark, 8)
    b = _pinned_session(spark, 8)
    c = _pinned_session(spark, 16)
    assert a is b and a is not c
    assert c.conf.get("spark.sql.shuffle.partitions") == "16"
    assert (id(spark), 8) in _PINNED_SESSIONS


def test_pinned_work_does_not_leak_into_parent(spark):
    """A shuffle on the clone plans at the pinned width while the
    parent's concurrent shuffles keep the parent's own setting (AQE
    coalescing is disabled for the observation — it legitimately
    shrinks tiny shuffle reads below the planned width)."""
    coalesce = "spark.sql.adaptive.coalescePartitions.enabled"
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    s = _pinned_session(spark, 8)
    spark.conf.set("spark.sql.shuffle.partitions", "12")
    spark.conf.set(coalesce, "false")
    s.conf.set(coalesce, "false")
    try:
        assert s.range(100).repartition("id").rdd.getNumPartitions() == 8
        assert (
            spark.range(100).repartition("id").rdd.getNumPartitions() == 12
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
        spark.conf.set(coalesce, "true")
        s.conf.set(coalesce, "true")


def test_cache_hit_resyncs_parent_confs(spark):
    """A runtime conf set on the parent AFTER the clone was first built
    must propagate on the next cache hit — gates never run against a
    stale conf snapshot — while the shuffle pin survives the sync."""
    key = "spark.sql.session.timeZone"
    saved = spark.conf.get(key)
    first = _pinned_session(spark, 8)
    spark.conf.set(key, "America/New_York")
    try:
        again = _pinned_session(spark, 8)
        assert again is first
        assert again.conf.get(key) == "America/New_York"
        assert again.conf.get("spark.sql.shuffle.partitions") == "8"
    finally:
        spark.conf.set(key, saved)
        first.conf.set(key, saved)
