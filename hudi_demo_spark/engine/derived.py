"""Incrementally-maintained derived tables (materialized rollups).

The DeltaStreamer-style pattern the reference's streaming demos gesture
at (continuous source → derived Hudi table): a rollup table is refreshed
from its source's INCREMENTAL read — each refresh processes only the
commits since the last one and folds them into the rollup with an
additive upsert. At 100 TB this is the difference between re-aggregating
the world per refresh and touching just the new slice: refresh cost
scales with data ARRIVED, not data STORED.

Scope: additive aggregates (count/sum — avg derivable as sum/count).
INSERT-only windows fold additively (no source re-read at all); windows
containing updates/deletes/merges switch to partial-recompute
maintenance — the CDC read names the changed row identities, their
groups (before- and after-image sides) are re-aggregated exactly from
the snapshot, emptied groups are deleted. Refresh cost scales with
changed groups, never with table size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hudi_demo_spark.engine.config import (
    COMMIT_TIME_META,
    PARTITION_PATH_META,
    RECORD_KEY_META,
)
from hudi_demo_spark.engine.timeline import Timeline

_OFFSET_PROP = "derived.last_refresh_instant"
_ALLOWED = {"insert", "bootstrap_full", "bootstrap_metadata"}


def create_rollup(
    engine,
    source: str,
    name: str,
    group_cols: list[str],
    sum_cols: list[str],
):
    """Define `name` as an incrementally-maintained rollup of `source`:
    per group, a row count and one sum per `sum_cols` entry. Returns the
    rollup's TableConfig; call `refresh_rollup` to fold in new commits."""
    return engine.create_table(
        name,
        record_key=group_cols,
        partition_by=None,
        props={
            "derived.source": source,
            "derived.group_cols": ",".join(group_cols),
            "derived.sum_cols": ",".join(sum_cols),
        },
    )


def refresh_rollup(engine, name: str) -> dict | None:
    """Fold source commits since the last refresh into the rollup:
    incremental read → partial aggregate of JUST the new rows →
    key-joined additive combine with the current rollup state → upsert.
    Returns the commit meta, or None when the source has no new commits.
    """
    cfg = engine._resolve(name)
    source = cfg.props["derived.source"]
    group_cols = cfg.props["derived.group_cols"].split(",")
    sum_cols = [c for c in cfg.props["derived.sum_cols"].split(",") if c]
    src_cfg = engine._resolve(source)
    tl = Timeline(src_cfg.path)
    begin = cfg.props.get(_OFFSET_PROP)
    end = tl.last_instant()
    if end is None or begin == end:
        return None
    window = [
        m for m in tl.instants()
        if (begin is None or m["instant"] > begin) and m["instant"] <= end
    ]
    bad = [m["operation"] for m in window if m["operation"] not in _ALLOWED]
    if bad:
        # updates/deletes in the window: additive folding would need
        # retractions — switch to PARTIAL RECOMPUTE maintenance instead
        # (exact re-aggregation of only the groups whose rows changed,
        # located via the CDC read; cost scales with changed groups,
        # not table size)
        out = _refresh_recompute(
            engine, name, source, group_cols, sum_cols, begin, end
        )
        cfg.props[_OFFSET_PROP] = end
        cfg.save()
        return out
    delta = engine.read_incremental(source, begin=begin, end=end)
    partial = delta.groupBy(*group_cols).agg(
        F.count("*").alias("n_rows"),
        *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
    )
    meta = {RECORD_KEY_META, PARTITION_PATH_META, COMMIT_TIME_META}
    try:
        current = engine.read(name).drop(*meta)
    except Exception:
        current = None
    if current is not None and current.take(1):
        agg_cols = ["n_rows"] + [f"sum_{c}" for c in sum_cols]
        cur = current.select(
            *group_cols, *[F.col(c).alias(f"__old_{c}") for c in agg_cols]
        )
        combined = partial.join(cur, group_cols, "full_outer").select(
            *group_cols,
            *[
                (
                    F.coalesce(F.col(c), F.lit(0))
                    + F.coalesce(F.col(f"__old_{c}"), F.lit(0))
                ).alias(c)
                for c in agg_cols
            ],
        )
    else:
        combined = partial
    out = engine.upsert(combined, name)
    cfg.props[_OFFSET_PROP] = end
    cfg.save()
    return out


def create_join_view(
    engine,
    name: str,
    left: str,
    right: str,
    on: list[str],
):
    """Define `name` as an incrementally-maintained INNER equi-join view
    of two engine tables — the second classic derived-table shape next
    to rollups (dimension enrichment: fact ⋈ dim materialized once,
    refreshed by deltas). The view's record key is the union of both
    sources' record keys (a join row's identity); non-join data columns
    must not collide. Refresh with `refresh_join_view`."""
    lcfg, rcfg = engine._resolve(left), engine._resolve(right)
    if not lcfg.record_key_fields or not rcfg.record_key_fields:
        raise ValueError("join view requires keyed sources")
    lcols = {f.name for f in engine.read(left).schema.fields}
    rcols = {f.name for f in engine.read(right).schema.fields}
    clash = (lcols & rcols) - set(on) - {
        RECORD_KEY_META, PARTITION_PATH_META, COMMIT_TIME_META,
    }
    if clash:
        raise ValueError(f"join view column collision: {sorted(clash)}")
    key = list(
        dict.fromkeys(
            lcfg.record_key_fields + rcfg.record_key_fields
        )
    )
    return engine.create_table(
        name,
        record_key=key,
        partition_by=None,
        props={
            "derived.join.left": left,
            "derived.join.right": right,
            "derived.join.on": ",".join(on),
        },
    )


def refresh_join_view(engine, name: str) -> dict | None:
    """Fold both sources' new commits into the join view. Insert-only
    windows: candidates = ΔL ⋈ R ∪ L ⋈ ΔR, collapsed by the view key in
    the upsert — refresh cost scales with data ARRIVED on either side
    (each delta joins the other side's pruned snapshot), never with view
    size. Windows containing updates/deletes switch to partial
    recompute: the CDC reads name the changed row identities, every view
    row built from one of them is re-derived exactly from the current
    snapshots, and pairs that no longer join are deleted. Returns the
    last upsert's commit meta, or None when neither source moved."""
    cfg = engine._resolve(name)
    left = cfg.props["derived.join.left"]
    right = cfg.props["derived.join.right"]
    on = cfg.props["derived.join.on"].split(",")
    lcfg, rcfg = engine._resolve(left), engine._resolve(right)
    lkey, rkey = lcfg.record_key_fields, rcfg.record_key_fields
    meta_cols = [RECORD_KEY_META, PARTITION_PATH_META, COMMIT_TIME_META]

    def window(src_cfg, prop):
        tl = Timeline(src_cfg.path)
        begin = cfg.props.get(prop)
        end = tl.last_instant()
        if end is None or begin == end:
            return begin, None, []
        return begin, end, [
            m for m in tl.instants()
            if (begin is None or m["instant"] > begin)
            and m["instant"] <= end
        ]

    lb, le, lwin = window(lcfg, "derived.join.left_offset")
    rb, re_, rwin = window(rcfg, "derived.join.right_offset")
    if le is None and re_ is None:
        return None
    mutated = any(
        m["operation"] not in _ALLOWED for m in (lwin + rwin)
    )
    lsnap = engine.read(left).drop(*meta_cols)
    rsnap = engine.read(right).drop(*meta_cols)
    out = None
    if not mutated:
        cands = []
        if le is not None:
            dl = engine.read_incremental(left, begin=lb, end=le).drop(*meta_cols)
            cands.append(dl.join(rsnap, on))
        if re_ is not None:
            dr = engine.read_incremental(right, begin=rb, end=re_).drop(*meta_cols)
            cands.append(lsnap.join(dr, on))
        combined = cands[0] if len(cands) == 1 else cands[0].unionByName(cands[1])
        # ΔL⋈ΔR rows appear on both sides; the upsert's key dedup
        # collapses them (identical images), so no distinct shuffle here
        out = engine.upsert(combined, name)
    else:
        # changed identities on either side (CDC = inserts+updates+deletes)
        changed_l = (
            engine.read_cdc(left, begin=lb, end=le).select(*lkey).distinct()
            if le is not None else None
        )
        changed_r = (
            engine.read_cdc(right, begin=rb, end=re_).select(*rkey).distinct()
            if re_ is not None else None
        )
        parts = []
        if changed_l is not None:
            parts.append(
                lsnap.join(F.broadcast(changed_l), lkey, "left_semi")
                .join(rsnap, on)
            )
        if changed_r is not None:
            parts.append(
                lsnap.join(
                    rsnap.join(F.broadcast(changed_r), rkey, "left_semi"),
                    on,
                )
            )
        fresh = parts[0] if len(parts) == 1 else parts[0].unionByName(parts[1])
        # a field shared by both sources' record keys (e.g. both keyed
        # 'id', joined on it) appears once in the join output — dedupe
        # the composite view key or every select/join below is ambiguous
        vkey = list(dict.fromkeys(lkey + rkey))
        # persisted: consumed by the upsert AND the orphan anti-join —
        # uncached, the 3-way recompute join would run twice
        fresh = fresh.dropDuplicates(vkey).persist()
        out = engine.upsert(fresh, name)
        # view rows built from a changed identity that did not re-derive
        # no longer join — delete them by view key
        try:
            view = engine.read(name).drop(*meta_cols)
        except Exception:
            view = None
        if view is not None:
            stale = None
            if changed_l is not None:
                stale = view.join(F.broadcast(changed_l), lkey, "left_semi")
            if changed_r is not None:
                sr = view.join(F.broadcast(changed_r), rkey, "left_semi")
                stale = sr if stale is None else stale.unionByName(sr)
            gone = stale.select(*vkey).join(
                fresh.select(*vkey), vkey, "left_anti"
            ).persist()  # take(1) probe + delete both consume it
            if gone.take(1):
                engine.delete_keys(name, gone)
            gone.unpersist()
        fresh.unpersist()
    if le is not None:
        cfg.props["derived.join.left_offset"] = le
    if re_ is not None:
        cfg.props["derived.join.right_offset"] = re_
    cfg.save()
    return out


def _refresh_recompute(
    engine, name, source, group_cols, sum_cols, begin, end
):
    """View maintenance under arbitrary source DML: the CDC read names
    every changed row identity in (begin, end]; the affected GROUPS are
    those identities' groups in the before- and after-snapshots (both
    sides, so a group-moving update repairs its old group too). Those
    groups — and only those — are re-aggregated exactly from the current
    snapshot and upserted; groups that lost their last row are deleted
    from the rollup. Group columns are assumed non-null (they are the
    rollup's record key)."""
    cdc = engine.read_cdc(source, begin=begin, end=end)
    keys = cdc.select(RECORD_KEY_META).distinct()
    snap = engine.read(source)
    affected = snap.join(keys, RECORD_KEY_META, "left_semi").select(*group_cols)
    if begin is not None:
        prev = engine.read(source, as_of=begin)
        affected = affected.union(
            prev.join(keys, RECORD_KEY_META, "left_semi").select(*group_cols)
        )
    groups = affected.distinct()
    fresh = (
        snap.join(groups, group_cols, "left_semi")
        .groupBy(*group_cols)
        .agg(
            F.count("*").alias("n_rows"),
            *[F.sum(c).alias(f"sum_{c}") for c in sum_cols],
        )
    )
    meta = engine.upsert(fresh, name)
    gone = groups.join(fresh.select(*group_cols), group_cols, "left_anti")
    if gone.take(1):
        engine.delete_keys(name, gone)
    return meta
