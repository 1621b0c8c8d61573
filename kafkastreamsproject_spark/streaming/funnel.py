"""Stateful streaming funnel: per-user sequential-step progress via
``applyInPandasWithState``.

The batch funnel (plans/behavior.py:funnel_conversion) decorrelates the
sequential-min recurrence into three aggregations; a stream cannot —
each user's progress (first view, first later click, first later
purchase) is genuinely incremental state.  This operator keeps exactly
three timestamps per user (24 bytes of state — 100 TB of events still
means |users|-bounded state), updates them per micro-batch with rows
sorted by event time, and emits the user's current reached-step.

Correctness contract: the recurrence is MONOTONE under in-order
processing — each of t1/t2/t3 is set once and never moves earlier —
so per-user output is correct whenever micro-batches arrive in
event-time order (the directory-replay source's sorted-walk guarantee,
SURVEY.md S1).  Within a batch, rows are explicitly sorted, so intra-
batch disorder is always absorbed.  ``reached_step`` is monotone
non-decreasing across emissions, which lets any downstream consumer
reduce duplicates with a plain max — no dependence on sink mode.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: micros since epoch for (first view, first later click, first later
#: purchase); 0 = not reached (all fixture timestamps are > 0).
STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("reached_step", T.IntegerType()),
    ]
)

STEPS = ("view", "click", "purchase")


def _funnel_fn(
    key: tuple,
    pdf_iter: Iterable[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    t1 = t2 = t3 = 0
    if state.exists:
        t1, t2, t3 = state.get
    pdfs = [pdf for pdf in pdf_iter if len(pdf)]
    if pdfs:
        batch = pd.concat(pdfs).sort_values(["ts", "event_id"])
        for typ, ts in zip(batch["event_type"], batch["ts"]):
            us = int(ts.value) // 1_000  # ns -> us
            if typ == "view":
                if t1 == 0:
                    t1 = us
            elif typ == "click":
                if t1 and not t2 and us > t1:
                    t2 = us
            elif typ == "purchase":
                if t2 and not t3 and us > t2:
                    t3 = us
    state.update((t1, t2, t3))
    reached = 3 if t3 else 2 if t2 else 1 if t1 else 0
    yield pd.DataFrame({"user_id": [user_id], "reached_step": [reached]})


def funnel_stream(events: DataFrame) -> DataFrame:
    """Per-user funnel progress over a streaming events frame with
    columns (user_id, event_type, ts, event_id).  Emits (user_id,
    reached_step) each micro-batch the user appears in; reached_step is
    monotone, so the latest value per user is also the max."""
    return (
        events.select("user_id", "event_type", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )
