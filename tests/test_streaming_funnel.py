"""Streaming funnel: multi-batch stateful correctness vs the batch
funnel — including the ordered-micro-batch contract with per-batch
intra-batch disorder."""

from __future__ import annotations

import datetime as dt

from kafkastreamsproject_spark.streaming.funnel import funnel_stream


def _write_batches(spark, tmp_path, batches):
    src = tmp_path / "events_src"
    src.mkdir(parents=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        df.coalesce(1).write.parquet(str(src / f"batch_{i}.parquet"))
    return src


def _run_stream(spark, tmp_path, src, files_per_trigger=1):
    from pyspark.sql import functions as F, types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(str(src) + "/*")
    )
    out = funnel_stream(stream)
    name = f"funnel_t_{abs(hash(str(src))) % 10**8}"
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    final = (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("reached_step").alias("reached"))
    )
    return {r.user_id: r.reached for r in final.collect()}


def _ts(minute):
    return dt.datetime(2024, 1, 1, 10, minute)


def test_multi_batch_state_carries_across_triggers(spark, tmp_path):
    # user 1 completes the funnel across THREE micro-batches;
    # user 2 clicks before viewing (never progresses past view);
    # user 3 only views.  Batch 1 is internally out of order.
    b0 = [(1, _ts(0), 1, "view"), (2, _ts(0), 2, "click"), (3, _ts(1), 3, "view")]
    b1 = [(5, _ts(3), 1, "click"), (4, _ts(2), 2, "view")]  # intra-batch disorder
    b2 = [(6, _ts(5), 1, "purchase"), (7, _ts(6), 2, "purchase")]
    src = _write_batches(spark, tmp_path, [b0, b1, b2])
    got = _run_stream(spark, tmp_path, src, files_per_trigger=1)
    # user 2: click@0 ignored (no prior view), view@2, purchase@6 without
    # click -> stuck at step 1
    assert got == {1: 3, 2: 1, 3: 1}


def test_single_batch_equals_multi_batch(spark, tmp_path):
    rows = [
        (1, _ts(0), 1, "view"),
        (2, _ts(1), 1, "click"),
        (3, _ts(2), 1, "purchase"),
        (4, _ts(0), 2, "view"),
        (5, _ts(1), 2, "purchase"),  # no click: stuck at 1
    ]
    src1 = _write_batches(spark, tmp_path / "a", [rows])
    src2 = _write_batches(spark, tmp_path / "b", [rows[:2], rows[2:]])
    one = _run_stream(spark, tmp_path / "a", src1, files_per_trigger=10)
    two = _run_stream(spark, tmp_path / "b", src2, files_per_trigger=1)
    assert one == two == {1: 3, 2: 1}


def test_strictly_after_semantics(spark, tmp_path):
    # click at the SAME timestamp as the first view must NOT count
    rows = [(1, _ts(0), 1, "view"), (2, _ts(0), 1, "click")]
    src = _write_batches(spark, tmp_path, [rows])
    got = _run_stream(spark, tmp_path, src)
    assert got == {1: 1}
