"""Replay producer (S1–S5) — test utility.

The reference's producer walks a folder of CSVs in sorted order and
replays rows to Kafka at 1 rec/s (producer/KafkaProducer.kt:37-65).
Here the replay target is a directory consumed by the file-stream
source: each call writes one more sequentially-named CSV "chunk", and
``maxFilesPerTrigger=1`` gives the paced-replay effect without per-row
sleeps.
"""

from __future__ import annotations

import os

import pandas as pd

from kafkastreamsproject_spark.schemas import TRIP

_TS_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def write_trip_chunk(directory: str, rows: list[tuple], chunk_id: int) -> str:
    """Write one headerless CSV chunk in the reference's column order.

    Timestamps are rendered in the reference's
    ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` format (KafkaProducer.kt:28-29).
    """
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"trips-{chunk_id:05d}.csv")
    cols = [f.name for f in TRIP.fields]
    pdf = pd.DataFrame(rows, columns=cols)
    pdf["dateTime"] = pd.to_datetime(pdf["dateTime"]).dt.strftime(_TS_FMT).str[:-3] + "Z"
    pdf.to_csv(path, header=False, index=False)
    return path
