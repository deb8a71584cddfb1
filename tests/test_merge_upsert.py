"""Unit tests for the streaming MERGE/upsert sink's batch engine
(plans/stream.py merge_upsert_batch): accumulation semantics and the
per-bucket batch-id high-water-mark replay guard — the exactly-once
property the stream query's doc claims but availableNow never exercises
(it never re-delivers a batch)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _batch(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1, 0, 0, sec), uid, et, val)
            for (eid, sec, uid, et, val) in rows
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )


def _state_rows(spark, state):
    return sorted(
        (r["user_id"], r["bucket"], r["n"], str(r["v"]), r["last_eid"], r["last_type"], r["batch_hwm"])
        for r in spark.read.parquet(state).collect()
    )


def test_merge_accumulates_and_updates_latest(spark, tmp_path):
    from python_btc_etl_spark.plans.stream import merge_upsert_batch

    state = str(tmp_path / "state")
    merge_upsert_batch(
        spark, state, _batch(spark, [(1, 1, 1, "view", 1.5), (2, 2, 1, "click", 2.0), (3, 1, 2, "view", 3.0)]), 0
    )
    st = {r[0]: r for r in _state_rows(spark, state)}
    assert st[1][2] == 2 and st[1][5] == "click"  # n=2, latest by ts
    assert st[2][2] == 1 and st[2][5] == "view"

    # Batch 1: user 1 gets a LATER event; new user 17 shares bucket 1.
    merge_upsert_batch(
        spark, state, _batch(spark, [(4, 9, 1, "purchase", 4.0), (5, 3, 17, "signup", 0.5)]), 1
    )
    st = {r[0]: r for r in _state_rows(spark, state)}
    assert st[1][2] == 3 and st[1][5] == "purchase" and st[1][6] == 1
    assert st[17][2] == 1 and st[17][5] == "signup"
    assert st[2][2] == 1  # untouched user persists


def test_replay_guard_makes_same_batch_a_noop(spark, tmp_path):
    from python_btc_etl_spark.plans.stream import merge_upsert_batch

    state = str(tmp_path / "state")
    b0 = _batch(spark, [(1, 1, 1, "view", 1.5), (2, 2, 2, "click", 2.0)])
    merge_upsert_batch(spark, state, b0, 0)
    before = _state_rows(spark, state)
    # Re-delivery of the SAME batch id (failure-recovery replay): the
    # per-bucket high-water mark must reject it outright.
    merge_upsert_batch(spark, state, b0, 0)
    assert _state_rows(spark, state) == before

    # An out-of-order stale batch id after progress is also rejected.
    merge_upsert_batch(spark, state, _batch(spark, [(3, 5, 1, "purchase", 1.0)]), 1)
    after_b1 = _state_rows(spark, state)
    merge_upsert_batch(spark, state, b0, 0)
    assert _state_rows(spark, state) == after_b1

    # An earlier-arriving LATE event (older ts, new batch id) still
    # accumulates counts but must NOT steal latest-event-type.
    merge_upsert_batch(spark, state, _batch(spark, [(0, 0, 1, "error", 9.0)]), 2)
    st = {r[0]: r for r in _state_rows(spark, state)}
    assert st[1][2] == 3 and st[1][5] == "purchase" and st[1][6] == 2
