"""Incremental rollup maintenance (operators/incremental.py): the
continuous-aggregate twin of A1's stateful upsert.

The contracts that matter at scale:
- merging arbitrary batch slices == one-shot recompute, EXACTLY (the
  decomposed decimal-sum/count monoid is associative);
- a batch touching one day rewrites ONLY that day's partition — history
  partitions stay byte-identical on disk.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from kafkastreamsproject_spark.operators.incremental import (
    finalize_rollup,
    merge_daily_rollup,
    partial_daily_rollup,
)
from kafkastreamsproject_spark.plans.registry import all_queries
from kafkastreamsproject_spark.sources.testdata import load_table

_SPECS = all_queries()


def _rows(df):
    return sorted(
        (
            (r.user_id, r.event_day, r.avg_value, r.started_events,
             r.ended_events, r.update_time)
            for r in df.collect()
        )
    )


def test_two_batch_merge_equals_full_recompute(spark, sf_dir, tmp_path):
    """Split events by id parity (every day lands in BOTH batches, so
    every store row is a genuine merge), fold both into the store, and
    the finalized rollup must equal daily_agg's one-shot answer exactly
    — including avg_value, because the store keeps the decimal sum."""
    store = str(tmp_path / "rollup_store")
    ev = load_table(spark, "events", sf_dir)

    merge_daily_rollup(spark, store, ev.filter(F.col("event_id") % 2 == 0))
    merge_daily_rollup(spark, store, ev.filter(F.col("event_id") % 2 == 1))

    got = _rows(finalize_rollup(spark, store))
    want = _rows(_SPECS["daily_agg"].spark(spark, sf_dir))
    assert got == want


def test_merge_touches_only_affected_day_partitions(spark, sf_dir, tmp_path):
    """A second batch confined to one day must leave every other day's
    partition byte-identical (same files, sizes, mtimes) — the property
    that bounds maintenance cost by batch size, not history size."""
    store = str(tmp_path / "rollup_store")
    ev = load_table(spark, "events", sf_dir)

    days = merge_daily_rollup(spark, store, ev)
    assert len(days) > 1
    target_day = days[0]

    def snapshot(day: str):
        part_dir = Path(store) / f"event_day={day}"
        return {
            p.name: (p.stat().st_size, p.stat().st_mtime_ns)
            for p in part_dir.iterdir()
            if p.suffix == ".parquet"
        }

    before = {d: snapshot(d) for d in days[1:]}
    affected = merge_daily_rollup(
        spark, store, ev.filter(F.to_date("ts").cast("string") == target_day)
    )
    assert affected == [target_day]
    for d in days[1:]:
        assert snapshot(d) == before[d], f"partition {d} was rewritten"

    # and the touched day now holds twice the original batch's events
    final = finalize_rollup(spark, store).filter(F.col("event_day") == target_day)
    one_shot = (
        partial_daily_rollup(ev)
        .filter(F.col("event_day") == target_day)
        .collect()
    )
    doubled = {(r.user_id): 2 * r.n_events for r in one_shot}
    got_started = {
        r.user_id: (r.started_events, r.ended_events) for r in final.collect()
    }
    for r in one_shot:
        assert got_started[r.user_id] == (2 * r.started_events, 2 * r.ended_events)
    assert doubled  # non-degenerate


def test_first_merge_creates_store(spark, sf_dir, tmp_path):
    store = str(tmp_path / "fresh_store")
    ev = load_table(spark, "events", sf_dir).limit(100)
    days = merge_daily_rollup(spark, store, ev)
    assert days
    assert finalize_rollup(spark, store).count() > 0


def test_empty_batch_is_a_no_op(spark, sf_dir, tmp_path):
    store = str(tmp_path / "rollup_store")
    ev = load_table(spark, "events", sf_dir)
    merge_daily_rollup(spark, store, ev)
    before = sorted(p.name for p in Path(store).rglob("*.parquet"))
    assert merge_daily_rollup(spark, store, ev.filter(F.lit(False))) == []
    assert sorted(p.name for p in Path(store).rglob("*.parquet")) == before
