"""Stateful streaming anomaly detection — running per-key z-scores via
``applyInPandasWithState`` (second custom stateful operator next to
:mod:`.sessionize`; extension surface, the reference has no streaming).

Each key (user) carries (n, Σv, Σv²) state; every arriving event is
scored against the moments of STRICTLY EARLIER events (leakage-free by
construction — the score exists before the event updates the state),
and events with |z| > threshold after a warm-up of ``min_obs`` prior
observations are emitted.  Moments are exact and additive, so state is
three numbers per key forever — no window buffer, no history re-read:
the canonical streaming-anomaly shape at any scale.

The batch twin :func:`running_anomalies_batch` computes the identical
prior-only moments with expanding window frames, so stream == batch is
a testable equation (and the batch twin is DuckDB-oracle-graded as
`events_anomaly_running`).
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ANOMALY_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("key", LongType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
    ]
)

_STATE_SCHEMA = "n long, s double, ss double"


def running_anomalies_batch(
    events: DataFrame,
    z_threshold: float = 3.0,
    min_obs: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Batch twin: per-key prior-only expanding moments via window
    frames ordered by (ts, id) — each event scored against everything
    strictly before it.  (event_id, key, value, z)."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.col(value_col).cast("double")
    n = F.count(v).over(w)
    mean = F.sum(v).over(w) / n
    var = F.sum(v * v).over(w) / n - mean * mean
    std = F.sqrt(var)
    z = (v - mean) / std
    return (
        events.withColumn("__n", n)
        .withColumn("__std", std)
        .withColumn("__z", z)
        .filter(
            (F.col("__n") >= min_obs)
            & (F.col("__std") > 0)
            & (F.abs(F.col("__z")) > z_threshold)
        )
        .select(
            F.col(id_col).alias("event_id"),
            F.col(key_col).alias("key"),
            v.alias("value"),
            F.round("__z", 3).alias("z"),
        )
    )


def make_anomaly_batch_fn(z_threshold: float = 3.0, min_obs: int = 5):
    """The applyInPandasWithState function: score-then-update per event
    in (ts, id) order; state = exact additive moments."""

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, s, ss = state.get
        else:
            n, s, ss = 0, 0.0, 0.0
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ev_id, val in zip(pdf["event_id"], pdf["value"]):
                v = float(val)
                if n >= min_obs:
                    mean = s / n
                    var = ss / n - mean * mean
                    if var > 0:
                        z = (v - mean) / math.sqrt(var)
                        if abs(z) > z_threshold:
                            out_rows.append((int(ev_id), key[0], v, round(z, 3)))
                n, s, ss = n + 1, s + v, ss + v * v
        state.update((n, s, ss))
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["event_id", "key", "value", "z"]
            )

    return fn


def anomaly_stream(
    events: DataFrame,
    z_threshold: float = 3.0,
    min_obs: int = 5,
) -> DataFrame:
    """Streaming running-anomaly detector over (event_id, user_id,
    ts_us, value) rows.  State never times out: the moments ARE the
    full history (three numbers), so there is nothing to expire."""
    return events.groupBy(F.col("user_id")).applyInPandasWithState(
        make_anomaly_batch_fn(z_threshold, min_obs),
        outputStructType=ANOMALY_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
