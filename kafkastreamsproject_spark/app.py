"""CLI entry points mirroring the reference's two mains.

Reference surface:
- consumer main: ``[stationsFile, P, D]`` with defaults P=50, D=60,
  Divvy_Bicycle_Stations.csv (consumer/KafkaConsumer.kt:19-31) →
  builds the ETL+aggregation topology and runs it;
- producer main: ``[folder]`` (producer/KafkaProducer.kt:17-23) →
  replays CSVs into the input topic at a throttled rate.

Engine equivalents (a reference user's switch path):

    python -m kafkastreamsproject_spark.app consume \
        --input DIR --stations FILE.csv [--period 50] [--threshold 60] \
        [--output DIR] [--checkpoint DIR] [--anomalies]

    python -m kafkastreamsproject_spark.app produce \
        --input DIR_OR_FILE.csv --output DIR [--chunk-rows 500]

    python -m kafkastreamsproject_spark.app curate \
        --input DOCS.parquet --output SHARDS_DIR \
        [--quality-min 0.5] [--langs en,fr] [--holdout EVAL.parquet] \
        [--pack-budget 2048]

``consume`` runs the streaming topology over a file-stream input
(Kafka variant available via streaming.sources.kafka_trip_stream when
the connector jar is present) and writes to console or parquet.
``produce`` is the replay producer: it splits trip CSVs into
sequentially named chunks that the consumer's file stream picks up —
the reference's throttled replay without per-row sleeps.
``curate`` runs the full training-data funnel (pipelines/curation.py)
over a documents parquet — dedup → filters → decontamination →
packing — and writes training shards, printing the per-stage funnel.
"""

from __future__ import annotations

import argparse
import sys
import tempfile

from kafkastreamsproject_spark.session import get_spark
from kafkastreamsproject_spark.sources.csv import read_stations_csv, read_trips_csv
from kafkastreamsproject_spark.streaming.pipeline import (
    daily_agg_stream,
    to_console_sink,
    to_parquet_sink,
    windowed_anomaly_stream,
)
from kafkastreamsproject_spark.streaming.replay import write_trip_chunk
from kafkastreamsproject_spark.streaming.sources import trip_file_stream


def _consume(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="kafkastreamsproject-consume")
    stations = read_stations_csv(spark, args.stations)
    trips = trip_file_stream(spark, args.input)
    if args.anomalies:
        out = windowed_anomaly_stream(
            trips,
            stations,
            period_minutes=args.period,
            threshold_pct=args.threshold,
            watermark=args.watermark,
        )
        mode = "append"
    else:
        out = daily_agg_stream(trips, stations, watermark=args.watermark)
        mode = "update" if not args.output else "append"
    ckpt = args.checkpoint or tempfile.mkdtemp(prefix="ksp_ckpt_")
    if args.output:
        q = to_parquet_sink(out, args.output, ckpt, mode)
        q.processAllAvailable()
        q.stop()
    else:
        q = to_console_sink(out, ckpt, mode)
        q.awaitTermination(args.timeout) if args.timeout else q.awaitTermination()
        q.stop()
    return 0


def _produce(args: argparse.Namespace) -> int:
    spark = get_spark(app_name="kafkastreamsproject-produce")
    trips = read_trips_csv(spark, args.input).orderBy("dateTime")
    # toLocalIterator streams one partition at a time through the
    # driver (order preserved after the sort), so peak driver memory is
    # one partition + one chunk — not the whole dataset as collect()
    # would hold.  Mirrors the reference's single-producer replay
    # (producer/KafkaProducer.kt) which is inherently a serial walk.
    n_rows, n_chunks, chunk = 0, 0, []
    for r in trips.toLocalIterator():
        chunk.append(tuple(r))
        n_rows += 1
        if len(chunk) == args.chunk_rows:
            write_trip_chunk(args.output, chunk, n_chunks)
            n_chunks += 1
            chunk = []
    if chunk:
        write_trip_chunk(args.output, chunk, n_chunks)
        n_chunks += 1
    print(f"wrote {n_rows} trips in {n_chunks} chunks to {args.output}")
    return 0


def _curate(args: argparse.Namespace) -> int:
    from kafkastreamsproject_spark.pipelines.curation import (
        curate_corpus,
        write_training_shards,
    )

    spark = get_spark(app_name="kafkastreamsproject-curate")
    docs = spark.read.parquet(args.input)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    dsir_target = (
        spark.read.parquet(args.dsir_target) if args.dsir_target else None
    )
    langs = tuple(args.langs.split(",")) if args.langs else None
    classifier_seed = (
        spark.read.parquet(args.classifier_seed)
        if args.classifier_seed
        else None
    )
    if args.source_blocklist is None or args.source_blocklist == "auto":
        blocklist = args.source_blocklist
    else:
        blocklist = tuple(args.source_blocklist.split(","))
    if args.classifier_tau in (None, "auto"):
        tau = args.classifier_tau
    else:
        tau = float(args.classifier_tau)
    packed, stats = curate_corpus(
        docs,
        quality_min=args.quality_min,
        source_blocklist=blocklist,
        classifier_seed=classifier_seed,
        classifier_steps=args.classifier_steps,
        classifier_tau=tau,
        langs=langs,
        holdout=holdout,
        containment_max=args.containment_max,
        dsir_target=dsir_target,
        dsir_base_m=args.dsir_base_m,
        pack_budget=args.pack_budget,
    )
    write_training_shards(packed, docs, args.output)
    print(
        f"input={stats.input} exact_dedup={stats.after_exact_dedup} "
        f"neardup={stats.after_neardup_dedup} "
        f"blocklist={stats.after_blocklist} quality={stats.after_quality} "
        f"classifier={stats.after_classifier} "
        f"classifier_tau={stats.classifier_tau} "
        f"lang={stats.after_lang} decontaminated={stats.after_decontamination} "
        f"dsir={stats.after_dsir} packs={stats.packs} -> {args.output}"
    )
    return 0


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="kafkastreamsproject_spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("consume", help="run the ETL + aggregation topology")
    c.add_argument("--input", required=True, help="trip CSV stream directory")
    c.add_argument("--stations", required=True, help="stations CSV (S7 side input)")
    c.add_argument("--period", type=int, default=50, help="window period P, minutes")
    c.add_argument("--threshold", type=float, default=60.0, help="anomaly D, %% docks")
    c.add_argument("--anomalies", action="store_true", help="run topology 2 instead")
    c.add_argument(
        "--watermark",
        default="1 day",
        help="late-data delay; append sinks seal windows only once the "
        "watermark passes them",
    )
    c.add_argument("--output", help="parquet output dir (default: console sink)")
    c.add_argument("--checkpoint", help="checkpoint dir (default: temp)")
    c.add_argument("--timeout", type=int, help="console-mode run seconds")
    c.set_defaults(fn=_consume)

    p = sub.add_parser("produce", help="replay trip CSVs into stream chunks")
    p.add_argument("--input", required=True, help="trip CSV file or directory")
    p.add_argument("--output", required=True, help="chunk output directory")
    p.add_argument("--chunk-rows", type=int, default=500)
    p.set_defaults(fn=_produce)

    k = sub.add_parser("curate", help="run the training-data curation funnel")
    k.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    k.add_argument("--output", required=True, help="training-shard output directory")
    k.add_argument("--quality-min", type=float, default=0.5)
    k.add_argument("--langs", help="comma-separated lang allow-list (default: all)")
    k.add_argument("--holdout", help="eval parquet for decontamination")
    k.add_argument("--containment-max", type=float, default=0.5)
    k.add_argument(
        "--classifier-seed",
        help="labeled seed parquet (text, y: +1 drop / -1 keep) — trains "
        "the perceptron quality gate (stage 3d); omit to skip the stage",
    )
    k.add_argument(
        "--classifier-steps",
        type=int,
        default=12,
        help="full-batch perceptron training steps for stage 3d",
    )
    k.add_argument(
        "--classifier-tau",
        help="stage 3d operating point: a number (drop at w.x > tau), "
        "'auto' (max-F1 over the seed's PR sweep), or omit for tau=0",
    )
    k.add_argument(
        "--source-blocklist",
        help="stage 2b: comma-separated blocked sources, or 'auto' to "
        "derive the list from the Gopher failure rate per source "
        "(block iff fails > 3/5 of the source's docs); omit to skip",
    )
    k.add_argument(
        "--dsir-target",
        help="target-domain parquet (doc_id, text) for DSIR importance "
        "resampling (stage 5b); omit to skip the stage",
    )
    k.add_argument(
        "--dsir-base-m",
        type=int,
        default=500,
        help="DSIR base keep-rate per mille at log-ratio 0",
    )
    k.add_argument("--pack-budget", type=int, default=2048)
    k.set_defaults(fn=_curate)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
