"""Custom stateful streaming operator — gap-based sessionization over an
event stream via ``applyInPandasWithState`` (extension surface; the
reference has no streaming at all, SURVEY.md §2.9).

A session = consecutive events of one user with gaps < ``gap``; a session
closes when no event arrives for ``gap`` (event time) — the canonical
"custom stateful operator Spark lacks as a single built-in" (session windows
exist for aggregation, but emitting one enriched record per *closed* session
with arbitrary per-session state is the applyInPandasWithState shape).

The batch twin :func:`sessionize_batch` computes identical sessions with a
window-gap cumulative-sum (the standard sessionization idiom), so tests can
assert stream == batch.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "start long, end long, n long, s double"


def _normalize_ts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    dtype = dict(events.dtypes).get(ts_col)
    if dtype == "bigint":  # nanosAsLong reads
        # integer `div`, NOT `/1000`: double division loses the last
        # microsecond above 2^53 nanoseconds (i.e. for any modern epoch)
        return events.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    if dtype == "timestamp_ntz":
        # parquet timestamp[us] without tz reads as TIMESTAMP_NTZ, which
        # unix_micros rejects; pin the wall-clock as UTC (explicit, so the
        # mapping is session-timezone independent and matches DuckDB's
        # epoch_us on the same naive values)
        return events.withColumn(
            ts_col, F.to_utc_timestamp(F.col(ts_col), "UTC")
        )
    return events


def sessionize_stream(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization: emits one row per CLOSED session.

    State per user = (start, end, count, value sum); a session closes via
    event-time timeout once the watermark passes end+gap, or in-batch when
    a later event arrives more than ``gap`` after the previous one.
    """
    ev = _normalize_ts(events).withWatermark("ts", watermark)

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        gap_us = gap_seconds * 1_000_000
        closed: list[tuple] = []

        if state.hasTimedOut:
            start, end, n, s = state.get
            closed.append((user_id, start, end, n, s))
            state.remove()
        else:
            rows = pd.concat(list(pdfs)).sort_values("ts")
            if state.exists:
                start, end, n, s = state.get
            else:
                start, end, n, s = None, 0, 0, 0.0
            for ts, value in zip(rows["ts"], rows["value"]):
                ts_us = int(ts.value // 1000)  # pandas ns -> us
                v = float(value) if value == value else 0.0
                if start is None:
                    start, end, n, s = ts_us, ts_us, 1, v
                elif ts_us - end > gap_us:
                    closed.append((user_id, start, end, n, s))
                    start, end, n, s = ts_us, ts_us, 1, v
                else:
                    end, n, s = ts_us, n + 1, s + v
            state.update((start, end, n, s))
            state.setTimeoutTimestamp(end // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [round(c[4], 2) for c in closed],
                }
            )

    return ev.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin: gap-flagged cumulative session ids per user, then one
    aggregate row per session — identical output to the streaming operator
    for fully-arrived data (all sessions closed)."""
    from pyspark.sql import Window

    ev = _normalize_ts(events)
    w = Window.partitionBy("user_id").orderBy("ts")
    # gaps measured in MICROSECONDS (unix_micros), the same unit the
    # streaming twin compares (`ts_us - end > gap_us`): a second-truncated
    # cast would close sessions the stream keeps open for sub-second gaps
    gap_us = gap_seconds * 1_000_000
    flagged = ev.withColumn(
        "__new_session",
        (
            F.unix_micros("ts") - F.lag(F.unix_micros("ts"), 1, 0).over(w) > gap_us
        ).cast("int"),
    ).withColumn("__session_id", F.sum("__new_session").over(w))
    return (
        flagged.groupBy("user_id", "__session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 2).alias("sum_value"),
        )
        .drop("__session_id")
    )
