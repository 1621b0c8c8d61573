"""Kafka-shaped Python streaming data source — a local "mock broker".

The real Kafka connector (S6/S9) needs a broker and the
spark-sql-kafka jar, neither of which exists in this sandbox
(streaming/sources.py gates it).  This module implements the SAME
source contract as a Spark 4 **Python Data Source**
(``pyspark.sql.datasource``): a directory of JSONL segment files per
partition plays the broker log, and the reader tracks a
``{partition: offset}`` cursor exactly like the Kafka source —
initialOffset → read(start) → commit, with restart-resume driven by
the query's checkpointed offsets.

Record schema mirrors Kafka's: (partition INT, offset BIGINT,
key STRING, value STRING, timestamp TIMESTAMP) — so the downstream
topology (`mock_trip_stream`) is byte-for-byte the S6 pipeline:
``from_json(value, TRIP)`` then ``select("trip.*")``, identical to
``kafka_trip_stream``.  When the environment gains a real broker the
only change is the format string.

Log layout: ``<path>/p<partition>-<seq>.jsonl`` — each line one JSON
record ``{"key": ..., "value": ...}``; files are append-only segments,
ordered per partition by the zero-padded ``seq``.  Offsets count
RECORDS per partition (files are scanned and lines skipped up to the
cursor — the simple reader's whole-log scan is fine for a test double;
a production source would index segment start offsets).

Scale/semantics notes: exactly-once delivery comes from Spark's offset
log — read(start) is re-executed deterministically for a given start
(sorted file walk, stable line order), and readBetweenOffsets replays
a committed range after restart.  Each partition advances
independently, exactly like Kafka topic-partitions.  The simple-reader
API does not advertise Trigger.AvailableNow, so Spark falls back to
single-batch execution — fine for a test double whose read() returns
the whole backlog; restart-resume via the checkpoint is exercised in
tests/test_mockbroker.py.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

from kafkastreamsproject_spark.schemas import TRIP

MOCK_BROKER_SCHEMA = (
    "partition INT, offset BIGINT, key STRING, value STRING, "
    "timestamp TIMESTAMP"
)


def _scan(path: str) -> dict[int, list[tuple]]:
    """Full per-partition record lists (ts, key, value), in log order.

    Timestamps parse with an EXPLICIT UTC zone (ADVICE r7): epoch
    seconds must mean the same instant on every machine — the host's
    local zone never participates."""
    import datetime as dt

    logs: dict[int, list[tuple]] = {}
    for f in sorted(Path(path).glob("p*-*.jsonl")):
        part = int(f.name.split("-")[0][1:])
        for line in f.read_text().splitlines():
            if not line.strip():
                continue
            rec = json.loads(line)
            ts = dt.datetime.fromtimestamp(
                rec.get("ts_epoch", 0.0), tz=dt.timezone.utc
            )
            logs.setdefault(part, []).append(
                (ts, rec.get("key"), rec["value"])
            )
    return logs


class MockBrokerStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict) -> None:
        self._path = options["path"]

    def initialOffset(self) -> dict:
        # earliest — the reference's cleanUp()-then-start behavior (T6)
        return {str(p): 0 for p in _scan(self._path)} or {"0": 0}

    def read(self, start: dict):
        logs = _scan(self._path)
        end = {str(p): len(rows) for p, rows in logs.items()}
        for p in start:
            end.setdefault(p, start[p])
        rows = self._between(logs, start, end)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._between(_scan(self._path), start, end))

    @staticmethod
    def _between(logs: dict, start: dict, end: dict) -> list[tuple]:
        out = []
        for p, rows in sorted(logs.items()):
            lo = int(start.get(str(p), 0))
            hi = int(end.get(str(p), len(rows)))
            for off in range(lo, min(hi, len(rows))):
                ts, key, value = rows[off]
                out.append((p, off, key, value, ts))
        return out

    def commit(self, end: dict) -> None:
        # the broker log is append-only; nothing to acknowledge
        pass


class MockBrokerDataSource(DataSource):
    """``spark.readStream.format("mockbroker").option("path", dir)``."""

    @classmethod
    def name(cls) -> str:
        return "mockbroker"

    def schema(self) -> str:
        return MOCK_BROKER_SCHEMA

    def simpleStreamReader(self, schema) -> MockBrokerStreamReader:
        return MockBrokerStreamReader(self.options)


def register_mock_broker(spark: SparkSession) -> None:
    spark.dataSource.register(MockBrokerDataSource)


def append_segment(path: str, partition: int, seq: int, records: list) -> None:
    """Producer side: append one segment file of {key, value} records."""
    p = Path(path)
    p.mkdir(parents=True, exist_ok=True)
    lines = [json.dumps(r) for r in records]
    (p / f"p{partition}-{seq:06d}.jsonl").write_text("\n".join(lines) + "\n")


def mock_trip_stream(spark: SparkSession, path: str) -> DataFrame:
    """S6 topology over the mock broker: identical boundary parse to
    ``kafka_trip_stream`` — one from_json(value, TRIP) then trip.*."""
    register_mock_broker(spark)
    raw = spark.readStream.format("mockbroker").option("path", path).load()
    return raw.select(
        F.from_json(F.col("value").cast("string"), TRIP).alias("trip")
    ).select("trip.*")


#: default append-clock origin — a fixed instant (2020-09-13T12:26:40Z)
#: so default timestamps are epoch-seconds-shaped, not batch indices
MOCK_APPEND_T0 = 1_600_000_000.0


def to_mock_topic_sink(
    df: DataFrame,
    topic_path: str,
    checkpoint: str,
    key_col: str | None = None,
    n_partitions: int = 2,
    output_mode: str = "update",
    append_clock=None,
):
    """Producer side of the mock broker — the S4/S9 sink contract
    without a real Kafka: JSON-serialize each row exactly like
    ``streaming/pipeline.py:to_kafka_sink`` (one to_json(struct(*))
    value per record), hash the key onto a topic-partition, and append
    one segment file per (micro-batch, partition) into the topic's log
    directory — which `mock_trip_stream`/the raw reader can then
    consume, closing the produce→consume loop locally.

    Epoch-idempotent: segment files are named by (epoch, partition),
    and every replayed micro-batch (re)writes a segment for EVERY
    partition 0..n_partitions-1 — empty where it produced no rows — so
    a replay that happens to hash its rows into fewer partitions than
    the failed first attempt still truncates the stale partitions'
    segments instead of leaving their records to duplicate (ADVICE
    r7).  Same foreachBatch idempotence discipline as the rollup store
    sink.  Keys hash with the portable md5 device, so partition
    assignment is deterministic across engines and runs.

    Record timestamps (append-time semantics, VERDICT r8 #7): each
    record is stamped ``ts_epoch = append_clock(epoch_id)``, Kafka's
    broker-assigned LogAppendTime.  ``append_clock`` is
    caller-suppliable (epoch_id -> epoch seconds) so a test can feed a
    realistic produce-time curve; the default is the deterministic
    ``MOCK_APPEND_T0 + epoch_id`` — epoch-seconds-shaped (an
    event-time-lag consumer sees instants, not batch indices) while
    still never consulting a wall clock or local zone, so replays are
    byte-identical across machines.  Whatever the clock returns, the
    sink CLAMPS it non-decreasing across micro-batches (Kafka
    guarantees per-partition non-decreasing LogAppendTime; a
    misbehaving clock must not produce time travel).
    """
    from pyspark.sql import functions as F  # noqa: F811

    if append_clock is None:
        append_clock = lambda epoch_id: MOCK_APPEND_T0 + float(epoch_id)  # noqa: E731
    last_ts = [float("-inf")]  # per-sink monotone clamp

    cols = [c for c in df.columns]

    def write_batch(batch_df, epoch_id: int) -> None:
        key = (
            F.col(key_col).cast("string")
            if key_col is not None
            else F.lit("")
        )
        part = (
            F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
            % n_partitions
        ).cast("int")
        payload = batch_df.select(
            part.alias("p"),
            key.alias("key"),
            F.to_json(F.struct(*cols)).alias("value"),
        )
        rows = payload.collect()  # sink boundary: segments are driver-written
        ts = max(float(append_clock(int(epoch_id))), last_ts[0])
        last_ts[0] = ts
        by_part: dict[int, list] = {}
        for r in rows:
            by_part.setdefault(int(r["p"]), []).append(
                {
                    "key": r["key"],
                    "value": r["value"],
                    "ts_epoch": ts,
                }
            )
        for p in range(n_partitions):
            append_segment(topic_path, p, int(epoch_id), by_part.get(p, []))

    return (
        df.writeStream.outputMode(output_mode)
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .start()
    )
