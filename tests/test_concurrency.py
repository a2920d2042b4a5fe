"""Multi-writer OCC under real thread concurrency: disjoint-partition
writers commit without coordination; same-file-group writers conflict
loudly and retries converge with NO lost updates (the property OCC
exists to guarantee)."""

import pytest
import threading
import time

from hudi_demo_spark.engine.timeline import ConcurrentWriteError


def _mkdf(spark, rows):
    return spark.createDataFrame(rows, "id int, v int, ts long, dt string")


def test_concurrent_disjoint_partition_upserts_all_commit(engine, spark):
    engine.create_table("t", record_key="id", precombine="ts",
                        partition_by="dt")
    seed = [(i, 0, 1, f"p{i % 4}") for i in range(8)]
    engine.insert(_mkdf(spark, seed), "t")
    errors = []

    def writer(part):
        try:
            upd = _mkdf(spark, [(part, 100 + part, 2, f"p{part}")])
            engine.upsert(upd, "t")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(p,)) for p in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    state = {r["id"]: r["v"] for r in engine.read("t").collect()}
    assert all(state[p] == 100 + p for p in range(4))
    assert len(state) == 8


@pytest.mark.slow
def test_concurrent_contended_upserts_converge_with_retries(engine, spark):
    """8 writers hammer ONE file group (seed coalesced to a single
    file so every writer's key-range lookup hits it). OCC admits one at
    a time; each loser re-reads the new snapshot and retries. Every
    update must land — lost updates are the failure mode OCC prevents.
    (With the natural multi-file seed the writers land in DISJOINT file
    groups and commit with zero conflicts — that path is the first
    test.)"""
    engine.create_table("c", record_key="id", precombine="ts")
    engine.insert(
        _mkdf(spark, [(i, 0, 1, "x") for i in range(8)]).coalesce(1), "c"
    )
    conflicts = [0]
    errors = []
    # all writers release together so their first snapshot reads
    # overlap — at most one can win, so contention is guaranteed, not
    # a scheduling accident (under a bursty-load box, staggered thread
    # starts can otherwise serialize the writers by luck)
    barrier = threading.Barrier(8)

    def writer(i):
        barrier.wait()
        # generous retry budget + per-writer jittered backoff: worst
        # case the 8 writers fully serialize, but a loser that retries
        # in lockstep with another loser can collide repeatedly — the
        # backoff is what real OCC clients do, and starvation here must
        # mean a liveness BUG, not an unlucky scheduler
        for attempt in range(30):
            try:
                engine.upsert(_mkdf(spark, [(i, 1000 + i, 2, "x")]), "c")
                return
            except ConcurrentWriteError:
                conflicts[0] += 1
                time.sleep(0.05 * ((i % 4) + 1))
                continue
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return
        errors.append(RuntimeError(f"writer {i} starved"))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    state = {r["id"]: r["v"] for r in engine.read("c").collect()}
    assert state == {i: 1000 + i for i in range(8)}, state
    # the point of the test: contention actually happened and was
    # resolved by retry, not by silent last-writer-wins
    assert conflicts[0] > 0


def test_mor_delta_writers_commit_without_conflict(engine, spark):
    """Non-blocking concurrency for MOR delta appends (Hudi 1.0 NBCC
    shape): concurrent upserts to the SAME file group of a MOR table
    append delta files and replace nothing, so the file-group OCC has
    nothing to conflict on — every writer commits first try, no
    retries, no lock. The snapshot read then merges all deltas, and
    concurrent versions of the SAME key resolve deterministically by
    preCombine, not commit order. Compaction folds the concurrent
    deltas into one base with the same answer."""
    engine.create_table("nb", record_key="id", precombine="ts",
                        table_type="mor")
    engine.insert(
        _mkdf(spark, [(i, 0, 1, "x") for i in range(8)]).coalesce(1), "nb"
    )
    errors = []

    def writer(i):
        try:
            # writers 0-5: distinct keys; 6 and 7: BOTH write key 6
            # with different preCombine versions
            if i < 6:
                rows = [(i, 1000 + i, 2, "x")]
            else:
                rows = [(6, 2000 + i, 10 + i, "x")]
            engine.upsert(_mkdf(spark, rows), "nb")
        except Exception as e:
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # the NBCC property: zero conflicts, zero failures, no retries
    assert errors == []

    def state():
        return {r["id"]: r["v"] for r in engine.read("nb").collect()}

    want = {i: 1000 + i for i in range(6)} | {6: 2007, 7: 0}
    assert state() == want  # key 6: ts=17 beats ts=16, not commit order
    meta = engine.compact("nb")
    assert meta is not None
    assert state() == want  # compaction folds the concurrent deltas


def test_pessimistic_lock_serializes_writers(engine, spark):
    """Timeline.lock(): writers that take the table lock never see an
    OCC conflict — fully serialized."""
    from hudi_demo_spark.engine.timeline import Timeline

    engine.create_table("l", record_key="id", precombine="ts")
    engine.insert(_mkdf(spark, [(i, 0, 1, "x") for i in range(4)]), "l")
    cfg = engine._resolve("l")
    errors = []

    def writer(i):
        try:
            with Timeline(cfg.path).lock(timeout_s=120):
                engine.upsert(_mkdf(spark, [(i, 500 + i, 2, "x")]), "l")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    state = {r["id"]: r["v"] for r in engine.read("l").collect()}
    assert state == {i: 500 + i for i in range(4)}
