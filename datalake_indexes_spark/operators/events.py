"""Event-stream relational operators — as-of (most-recent-prior) joins.

An as-of join attaches, to every probe-side event, the latest build-side
event with the same key whose timestamp is <= the probe's (backward
inclusive — the financial-data / feature-store semantics DuckDB exposes
as ``ASOF JOIN`` and pandas as ``merge_asof``).  Spark has no native
as-of join; the classic sort-merge formulation here is the union trick:

    tag build rows 0 and probe rows 1, union, and take
    ``last(payload, ignorenulls=True)`` over a per-key window ordered by
    (ts, tag, seq) — every probe row sees exactly the most recent build
    payload at or before its timestamp.

That is ONE shuffle, keyed by the join key (user, instrument, ...), which
is precisely the partitioning a feature-store pipeline wants; both inputs
are scanned once and no row expansion ever happens (contrast a range join,
which is quadratic per key).  Ties: a build row at exactly the probe's
timestamp DOES match (inclusive); multiple build rows on the same (key,
ts) resolve to the largest ``seq_col`` — deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _period_bucket(ts_col: str, period_us: int):
    """Exact integer floor-div period bucket: ``(ts - pmod(ts, p)) div p``.

    ``div`` is Spark's true integer division (LONG for integral inputs),
    exact for every long timestamp.  The earlier double-division form
    ``((ts - pmod) / p).cast('long')`` is only exact while the numerator
    stays below 2**53 — a latent cross-engine divergence vs the DuckDB
    twins' integer ``//`` for very large timestamp values.
    """
    p = int(period_us)
    return F.expr(f"((`{ts_col}` - pmod(`{ts_col}`, {p})) div {p})")


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    ts_col: str,
    build_cols: list[str],
    seq_col: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Backward-inclusive as-of join: every ``probe`` row gains
    ``prefix + c`` for each c in ``build_cols``, taken from the latest
    ``build`` row with the same ``key_col`` and ``ts_col`` <= the probe's
    (NULLs when no such row exists — left-join semantics).

    ``seq_col`` breaks build-side ties on equal (key, ts): the row with
    the largest value wins.
    """
    payload = F.struct(*[F.col(c) for c in build_cols])
    b = build.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.col(seq_col).cast("long").alias("__seq"),
        payload.alias("__payload"),
        F.lit(None).cast(
            probe.select(F.struct(*probe.columns).alias("s")).schema["s"].dataType
        ).alias("__prow"),
    )
    p = probe.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast("long").alias("__seq"),
        F.lit(None).cast(b.schema["__payload"].dataType).alias("__payload"),
        F.struct(*probe.columns).alias("__prow"),
    )
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__tag"), F.asc_nulls_last("__seq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        b.unionByName(p)
        .withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__tag") == 1)
    )
    out_cols = [F.col(f"__prow.{c}").alias(c) for c in probe.columns]
    out_cols += [
        F.col(f"__match.{c}").alias(f"{prefix}{c}") for c in build_cols
    ]
    return matched.select(*out_cols)


def range_join_binned(
    probe: DataFrame,
    build: DataFrame,
    key_col: str,
    ts_col: str,
    window: int,
    agg_cols: dict[str, str] | None = None,
    prefix: str = "win_",
) -> DataFrame:
    """Sliding-interval range join, binned to stay an equi-join: for every
    ``probe`` row, aggregate the ``build`` rows with the same key whose
    timestamp lies in the half-open interval (probe.ts - window, probe.ts]
    — "what happened for this user in the last hour".

    Returns every probe row plus ``prefix+n`` (match count) and one
    ``prefix+<alias>`` per requested aggregate (``agg_cols`` maps build
    column -> 'sum'|'min'|'max'; counts are always emitted).  Probe rows
    with no in-window build rows keep zero/NULL aggregates (left
    semantics).

    Scale shape: a naive t BETWEEN a AND b join predicate plans as
    BroadcastNestedLoopJoin — quadratic per key and the classic Spark
    range-join trap.  Binning restores an equi-join: build rows land in
    bucket floor(ts/window); each probe checks buckets {b-1, b} (two
    probe-side rows via a 2-element explode — the PROBE side is
    duplicated, never the build side, so a hot build key is not
    amplified).  The join is then (key, bucket) equality + a residual
    range filter, hash-partitioned and AQE-skew-splittable like any
    equi-join, with shuffle volume 2·|probe| + |build|.
    """
    aggs = agg_cols or {}
    b = build.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__bts"),
        *[F.col(c).alias(f"__v_{c}") for c in aggs],
    ).withColumn(
        # integer floor division — no double rounding at bucket boundaries
        "__bucket",
        F.expr(f"(__bts - pmod(__bts, {window})) div {window}"),
    )
    pbucket = F.expr(
        f"({ts_col} - pmod({ts_col}, {window})) div {window}"
    )
    p = probe.select(
        F.struct(*probe.columns).alias("__prow"),
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__pts"),
        F.explode(F.array(pbucket - 1, pbucket)).alias("__bucket"),
    )
    joined = p.join(b, ["__k", "__bucket"], "left").withColumn(
        "__in_window",
        F.col("__bts").isNotNull()
        & (F.col("__bts") > F.col("__pts") - window)
        & (F.col("__bts") <= F.col("__pts")),
    )
    agg_exprs = [
        F.sum(F.when(F.col("__in_window"), 1).otherwise(0)).cast("long").alias(f"{prefix}n")
    ]
    for c, how in aggs.items():
        src = F.when(F.col("__in_window"), F.col(f"__v_{c}"))
        agg_exprs.append(getattr(F, how)(src).alias(f"{prefix}{how}_{c}"))
    out = joined.groupBy("__prow", "__pts").agg(*agg_exprs)
    return out.select(
        *[F.col(f"__prow.{c}").alias(c) for c in probe.columns],
        *[c for c in out.columns if c.startswith(prefix)],
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """N-step funnel analysis: for every key, the earliest timestamp of
    step 1, then the earliest step-2 event AT OR AFTER it, and so on —
    the standard product-analytics conversion sequence ("viewed, then
    clicked, then purchased, in that order").

    (key, step1_us, step2_us, ..., depth): per-step first-reach times
    (-1 sentinel once the chain breaks) and how many steps were reached.

    Scale shape: one conditional min-aggregate per step, each keyed by
    ``key_col`` (uniform), with the previous step's result broadcast-
    joined back — N-1 small joins, no windows over the event stream and
    no self-join of events against events.  len(steps) is a constant
    (3-6 in practice), so the plan depth is bounded.
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least 2 steps")
    reached = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(key_col).alias("__k"))
        .agg(F.min(ts_col).alias("step1_us"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col(type_col) == step)
            .select(F.col(key_col).alias("__k"), F.col(ts_col).alias("__ts"))
            # no broadcast hint: the reached-set is user-cardinality (can
            # be huge); the equi-join shuffles uniformly on the key and
            # AQE downgrades it to broadcast when it IS small
            .join(reached.select("__k", f"step{i - 1}_us"), "__k")
            .filter(F.col("__ts") >= F.col(f"step{i - 1}_us"))
            .groupBy("__k")
            .agg(F.min("__ts").alias(f"step{i}_us"))
        )
        reached = reached.join(nxt, "__k", "left")
    depth = sum(
        F.when(F.col(f"step{i}_us").isNotNull(), 1).otherwise(0)
        for i in range(1, len(steps) + 1)
    )
    return reached.select(
        F.col("__k").alias(key_col),
        *[
            F.coalesce(F.col(f"step{i}_us"), F.lit(-1)).cast("long").alias(f"step{i}_us")
            for i in range(1, len(steps) + 1)
        ],
        depth.cast("int").alias("depth"),
    )


def rollup_cube_agg(
    events: DataFrame,
    dims: list[str],
    value_col: str = "value",
    mode: str = "rollup",
) -> DataFrame:
    """OLAP rollup/cube over event dimensions: one output row per
    grouping-set combination (``rollup`` = hierarchical prefixes,
    ``cube`` = all subsets), each carrying ``grouping_id`` so consumers
    can tell a real NULL dimension value from a rolled-up one — the
    standard warehouse pre-aggregation surface (reference has no OLAP
    layer; this is part of the analytics extension).

    Scale shape: Spark plans rollup/cube as ONE Expand + one hash
    aggregate — the input is scanned once and each row is expanded to its
    len(dims)+1 (rollup) grouping sets BEFORE the shuffle, so partial
    (map-side) aggregation still applies and the shuffle carries only
    per-(grouping-set, key) partials.  No per-level re-scan, no union of
    N aggregates.
    """
    grouped = events.rollup(*dims) if mode == "rollup" else events.cube(*dims)
    return grouped.agg(
        F.grouping_id().cast("int").alias("grouping_id"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(value_col), 2).alias("sum_value"),
        F.round(F.avg(value_col), 4).alias("avg_value"),
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Cohort retention analysis: users are cohorted by their first-ever
    activity period (day by default); for each (cohort, periods-since-
    cohort) cell, how many of that cohort's users were active — the
    standard product-analytics retention triangle.

    (cohort_period, period_offset, n_active): period indices are integer
    floor-divisions of the epoch (no calendar/timezone machinery, so the
    arithmetic is engine-exact and oracle-checkable).

    Scale shape: one min-aggregate keyed by user (uniform), one distinct
    over (user, period) — both map-side-combinable — and one equi-join of
    activity against the per-user cohort frame on the same user key (no
    broadcast hint: user cardinality is unbounded; AQE downgrades when
    small).  The output is cohort x offset — bounded by time², not data.
    """
    period = _period_bucket(ts_col, period_us)
    activity = events.select(
        F.col(key_col).alias("__k"), period.cast("long").alias("__p")
    ).distinct()
    cohorts = activity.groupBy("__k").agg(F.min("__p").alias("__c"))
    return (
        activity.join(cohorts, "__k")
        .groupBy(
            F.col("__c").alias("cohort_period"),
            (F.col("__p") - F.col("__c")).alias("period_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def value_anomalies(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    z_threshold: float = 2.5,
) -> DataFrame:
    """Per-group z-score outliers: events whose value deviates more than
    ``z_threshold`` population standard deviations from their group mean
    (event_id, group, value, z) — the screening pass a metrics pipeline
    runs before alerting/imputation.

    Moments come from one sum/sum-of-squares aggregate (population
    variance in closed form — both engines evaluate the identical
    formula, keeping the oracle comparison deterministic), broadcast back
    onto the scan: the events table is read once and never shuffled.
    Zero-variance groups yield no anomalies by definition.
    """
    v = F.col(value_col).cast("double")
    stats = events.groupBy(group_col).agg(
        (F.sum(v) / F.count(v)).alias("__mean"),
        F.sqrt(
            F.sum(v * v) / F.count(v) - (F.sum(v) / F.count(v)) ** 2
        ).alias("__std"),
    )
    z = (v - F.col("__mean")) / F.col("__std")
    return (
        events.join(F.broadcast(stats), group_col)
        .filter((F.col("__std") > 0) & (F.abs(z) > z_threshold))
        .select(
            F.col(id_col).alias("event_id"),
            F.col(group_col).alias("grp"),
            v.alias("value"),
            F.round(z, 3).alias("z"),
        )
    )


def rolling_features(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 3,
) -> DataFrame:
    """Per-key ordered time-series features — the feature-store
    transform that turns an event stream into model inputs: previous
    value (lag 1), trailing mean over the ``window_rows`` PRECEDING
    events (current excluded — no label leakage), running max, and the
    per-key event sequence number.

    Ordering is (ts, event_id) — total and deterministic, so window
    frames are engine-exact.  Scale shape: ONE shuffle keyed by
    ``key_col`` (uniform user-cardinality), every feature from the same
    sorted run — Spark evaluates all four windows in a single
    WindowExec over one sort, no per-feature re-shuffle.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    trail = w.rowsBetween(-window_rows, -1)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value_col).cast("double")
    return events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts_us"),
        v.alias("value"),
        F.row_number().over(w).cast("long").alias("seq"),
        # NaN (not NULL) marks "no prior rows" — the package's cross-
        # engine convention for undefined doubles (a pandas fetch
        # collapses NULL to NaN anyway; see column_profiles)
        F.coalesce(F.lag(v, 1).over(w), F.lit(float("nan"))).alias("prev_value"),
        F.coalesce(
            F.round(F.avg(v).over(trail), 4), F.lit(float("nan"))
        ).alias("trail_mean"),
        F.max(v).over(run).alias("run_max"),
    )


def growth_accounting(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Daily growth accounting: per period, how many users were active,
    how many were NEW (first-ever activity), and the cumulative user
    count — the DAU/new/cumulative triple every product dashboard leads
    with.  (period, n_active, n_new, cum_users).

    Scale shape: the same two uniform user-keyed aggregates as
    :func:`cohort_retention`; the final cumulative sum is a window over
    per-PERIOD rows (bounded by time, not data)."""
    period = _period_bucket(ts_col, period_us)
    act = events.select(
        F.col(key_col).alias("__k"), period.cast("long").alias("period")
    ).distinct()
    firsts = act.groupBy("__k").agg(F.min("period").alias("__first"))
    daily = (
        act.join(firsts, "__k")
        .groupBy("period")
        .agg(
            F.count(F.lit(1)).alias("n_active"),
            F.sum((F.col("period") == F.col("__first")).cast("long")).alias("n_new"),
        )
    )
    w = Window.orderBy("period").rowsBetween(Window.unboundedPreceding, 0)
    return daily.withColumn("cum_users", F.sum("n_new").over(w))


def resample_forward_fill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Per-key periodic resampling with forward fill: aggregate the
    value per (key, period), then emit ONE row per key per period from
    the key's first active period to the global last period, carrying
    the most recent observed aggregate forward across gaps — the
    regularization step between an event stream and any fixed-frequency
    model input.  (key, period, value, observed).

    Scale shape: the dense grid is a per-key ``sequence`` explode (row
    multiplication bounded by keys x periods — the OUTPUT size, stated
    up front), the fill is one `last(ignorenulls)` window per key over
    that grid, and the only data-sized shuffle is the initial (key,
    period) aggregate."""
    period = _period_bucket(ts_col, period_us)
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            period.cast("long").alias("period"),
            F.col(value_col).cast("double").alias("__v"),
        )
        .groupBy("key", "period")
        .agg(F.round(F.sum("__v"), 4).alias("__obs"))
    )
    gmax = daily.agg(F.max("period")).first()[0]
    grid = (
        daily.groupBy("key")
        .agg(F.min("period").alias("__lo"))
        .select(
            "key", F.explode(F.sequence("__lo", F.lit(gmax))).alias("period")
        )
    )
    w = (
        Window.partitionBy("key")
        .orderBy("period")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, ["key", "period"], "left")
        .select(
            "key",
            "period",
            F.last("__obs", ignorenulls=True).over(w).alias("value"),
            F.col("__obs").isNotNull().alias("observed"),
        )
    )


def scd2_history(
    df: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    ts_col: str = "ts_us",
    seq_col: str | None = None,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history: collapse a stream of
    per-key attribute observations into validity intervals.

    Consecutive observations with identical ``attr_cols`` merge into one
    interval; each interval runs ``[valid_from, valid_to)`` where
    ``valid_to`` is the next CHANGE's timestamp (NULL = still current).
    ``version`` numbers a key's intervals from 1 in time order.  Ordering
    is total — (ts, seq) — so same-timestamp observations resolve
    deterministically; null attrs compare null-safely (null == null is
    "no change").

    Scale shape: two window passes over the SAME (key, ts, seq) ordering
    — one shuffle keyed by the dimension key, partitions bounded by
    per-key history length, never corpus size.  This is the standard
    warehouse dimension build (Kimball SCD type 2) as one declarative
    plan; the reference has no temporal machinery at all.
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)

    changed = F.lit(False)
    for a in attr_cols:
        changed = changed | ~F.col(a).eqNullSafe(F.lag(F.col(a)).over(w))
    # lag(first row) is null for every attr -> eqNullSafe false vs a
    # non-null attr, but a null first attr needs the explicit row guard
    changed = changed | (F.row_number().over(w) == 1)

    starts = df.withColumn("__chg", changed).filter(F.col("__chg"))
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        starts.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .withColumn("version", F.row_number().over(w2))
        .select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            "version",
        )
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    seq_col: str | None = None,
) -> DataFrame:
    """First-order event-transition matrix: for every (from_type,
    to_type) pair of CONSECUTIVE events within a key's timeline, the
    transition count and its probability given ``from_type`` — the
    Markov-chain summary product analytics builds sankeys and
    next-action models from.

    Ordering is total ((ts, seq)) so same-timestamp events resolve
    deterministically.  Scale shape: one lag() pass keyed by the entity
    (per-key partitions, bounded by a user's history), then a
    map-side-combinable count over at most |types|² groups; the
    probability denominator joins on from_type — |types| rows, broadcast.
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    pairs = (
        events.withColumn("__prev", F.lag(F.col(type_col)).over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("from_type"), F.col(type_col).alias("to_type"))
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.groupBy("from_type").agg(F.sum("n").alias("__tot"))
    return counts.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.col("__tot"), 6).alias("p"),
    )


def concurrency_curve(
    intervals: DataFrame,
    start_col: str = "start_us",
    end_col: str = "end_us",
) -> DataFrame:
    """Sweep-line concurrency: for interval data (sessions, jobs, spans),
    the number of simultaneously-open intervals at every change point —
    (ts_us, concurrent), valid on [ts_us, next ts_us).  Ends are
    INCLUSIVE: an interval [s, e] counts at time e and releases at e+1.

    Scale shape: ±1 deltas aggregate per distinct timestamp (map-side
    combined), then the global running sum is the same DISTRIBUTED
    two-level prefix sum as sequence packing — timestamps bucket by an
    explicit value-range rule, local cumulative sums run per bucket, and
    only the ≤ n_partitions bucket totals pass through a single tiny
    window.  No global window over the event set.
    """
    from pyspark.sql import Window

    starts = intervals.select(F.col(start_col).cast("long").alias("ts_us"),
                              F.lit(1).alias("__d"))
    ends = intervals.select((F.col(end_col).cast("long") + 1).alias("ts_us"),
                            F.lit(-1).alias("__d"))
    deltas = starts.unionByName(ends).groupBy("ts_us").agg(
        F.sum("__d").alias("__delta")
    )

    spark = intervals.sparkSession
    n_part = max(spark.sparkContext.defaultParallelism, 1)
    bounds = deltas.agg(F.min("ts_us"), F.max("ts_us")).first()
    if bounds[0] is None:
        return deltas.select("ts_us", F.lit(0).cast("long").alias("concurrent"))
    mn, mx = int(bounds[0]), int(bounds[1])
    span = float(mx - mn + 1)
    bucket = F.least(
        F.lit(n_part - 1),
        F.floor((F.col("ts_us").cast("double") - mn) / span * n_part),
    ).cast("int")
    b = deltas.withColumn("__b", bucket)
    run_w = Window.partitionBy("__b").orderBy("ts_us").rowsBetween(
        Window.unboundedPreceding, 0
    )
    local = b.withColumn("__run", F.sum("__delta").over(run_w))
    offsets = (
        b.groupBy("__b")
        .agg(F.sum("__delta").alias("__tot"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__tot").over(
                    Window.orderBy("__b").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("__b", "__off")
    )
    return (
        local.join(F.broadcast(offsets), "__b")
        .select(
            "ts_us", (F.col("__run") + F.col("__off")).cast("long").alias("concurrent")
        )
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    seq_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per key: each observation's value is weighted
    by how long it REMAINED current (until the key's next observation) —
    the TWAP semantics a last-known-value time series needs, where the
    plain mean over-counts bursts.  The key's final observation carries
    no interval and is excluded from the weighting (standard half-open
    convention; keys with one observation fall back to that value).

    Returns (key, twap, n_obs).  One lag/lead pass keyed by the entity
    (bounded partitions), then a plain aggregate.
    """
    from pyspark.sql import Window

    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    gapped = events.withColumn(
        "__dt", (F.lead(F.col(ts_col)).over(w) - F.col(ts_col)).cast("double")
    )
    return (
        gapped.groupBy(key_col)
        .agg(
            F.round(
                F.coalesce(
                    F.sum(F.col(value_col) * F.col("__dt")) / F.sum("__dt"),
                    F.avg(value_col),
                ),
                6,
            ).alias("twap"),
            F.count(F.lit(1)).alias("n_obs"),
        )
    )


def seasonality_profile(
    events: DataFrame,
    group_col: str = "event_type",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Hour-of-day and day-of-week activity profiles per group — the
    seasonality fingerprint a metrics pipeline baselines before calling
    anything an anomaly (a Monday-morning spike is weather, not signal).

    (grp, period_type∈{hod,dow}, bucket, n_events, avg_value, lift):
    lift = observed/expected-under-uniformity (n·24/total for hours,
    n·7/total for weekdays), so 1.0 means "no seasonality in this
    bucket".  Buckets come from pure integer arithmetic on the epoch-µs
    column (epoch day 0 was a Thursday, hence the +4), identical on any
    engine — no timezone, no calendar library.

    One scan: both period types explode from the same row (2× map-side),
    one partial-aggregated groupBy; the per-group totals the lift needs
    come from re-aggregating the tiny bucket frame, never the raw events.
    """
    hod = F.expr(f"pmod({ts_col} div 3600000000, 24)").cast("long")
    dow = F.expr(f"pmod(({ts_col} div 86400000000) + 4, 7)").cast("long")
    both = events.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).cast("double").alias("__v"),
        F.explode(
            F.array(
                F.struct(F.lit("hod").alias("period_type"), hod.alias("bucket")),
                F.struct(F.lit("dow").alias("period_type"), dow.alias("bucket")),
            )
        ).alias("__p"),
    ).select("grp", "__v", "__p.period_type", "__p.bucket")
    agg = both.groupBy("grp", "period_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        # +1e-9 nudges averages sitting exactly on a .00005 rounding
        # boundary off it: a multi-term float sum is order-dependent
        # across engines by ~1 ulp, which is enough to flip round(_, 4)
        # at a tie (observed: 8 values averaging *.77885).  The nudge is
        # 5 orders below the rounding granularity, so non-tie values are
        # unaffected; the oracle applies the same shift.
        F.round(F.avg("__v") + F.lit(1e-9), 4).alias("avg_value"),
    )
    totals = agg.groupBy("grp", "period_type").agg(
        F.sum("n_events").alias("__total")
    )
    periods = F.when(F.col("period_type") == "hod", F.lit(24)).otherwise(F.lit(7))
    return (
        agg.join(F.broadcast(totals), ["grp", "period_type"])
        .select(
            "grp", "period_type", "bucket", "n_events", "avg_value",
            F.round(F.col("n_events") * periods / F.col("__total"), 4).alias("lift"),
        )
    )


def session_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Top-``k`` most common length-``n`` event-type paths across all
    sessions — the "what do users actually do" product-analytics staple
    (funnel discovery without declaring the funnel up front).

    Sessions are the same gap rule the sessionize twin uses; within a
    session events order by (ts, event_id) so equal timestamps stay
    deterministic.  Each session's type sequence collapses to one array
    row (bounded by session length, never by user history), n-gram
    windows slide over it as a native ``transform`` — map-side, no
    explode until the (path) aggregate, which carries partial combines.
    The final top-k is ``orderBy().limit()`` (TakeOrderedAndProject),
    ranked only after the k survivors exist.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    gap_us = gap_seconds * 1_000_000
    flagged = events.withColumn(
        "__new",
        (F.col(ts_col) - F.lag(F.col(ts_col), 1, 0).over(w) > gap_us).cast("int"),
    ).withColumn("__sid", F.sum("__new").over(w))
    seqs = (
        flagged.groupBy(user_col, "__sid")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(ts_col), F.col(id_col), F.col(type_col)))
            ).alias("__s")
        )
        .select(F.transform("__s", lambda s: s[type_col]).alias("__types"))
        .filter(F.size("__types") >= n)
    )
    grams = seqs.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__types") - (n - 1)),
                lambda i: F.concat_ws(">", F.slice("__types", i, n)),
            )
        ).alias("path")
    )
    counts = grams.groupBy("path").agg(F.count(F.lit(1)).alias("n_occurrences"))
    topk = counts.orderBy(F.desc("n_occurrences"), F.asc("path")).limit(k)
    rank_w = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return topk.withColumn("rank", F.row_number().over(rank_w)).select(
        "path", "n_occurrences", F.col("rank").cast("long").alias("rank")
    )


def seasonal_anomalies(
    events: DataFrame,
    z_threshold: float = 2.5,
    group_col: str = "event_type",
    ts_col: str = "ts_us",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Seasonality-adjusted z-score outliers: each event scores against
    the moments of ITS OWN (group, hour-of-day) cell instead of the
    group's global distribution — the de-seasonalized variant of
    :func:`value_anomalies` (a value that is normal at peak hour is an
    anomaly at 4am; the global z hides exactly that).

    Same scale shape as the global version: one closed-form
    sum/sum-of-squares aggregate over |groups|·24 cells, broadcast back
    onto the scan — the events table is read once and never shuffled.
    """
    v = F.col(value_col).cast("double")
    hod = F.expr(f"pmod({ts_col} div 3600000000, 24)").cast("long")
    cells = events.select(
        F.col(group_col).alias("grp"), hod.alias("bucket"),
        v.alias("__v"), F.col(id_col).alias("event_id"),
    )
    stats = cells.groupBy("grp", "bucket").agg(
        (F.sum("__v") / F.count("__v")).alias("__mean"),
        F.sqrt(
            F.sum(F.col("__v") * F.col("__v")) / F.count("__v")
            - (F.sum("__v") / F.count("__v")) ** 2
        ).alias("__std"),
    )
    z = (F.col("__v") - F.col("__mean")) / F.col("__std")
    return (
        cells.join(F.broadcast(stats), ["grp", "bucket"])
        .filter((F.col("__std") > 0) & (F.abs(z) > z_threshold))
        .select(
            "event_id", "grp", "bucket",
            F.col("__v").alias("value"), F.round(z, 3).alias("z"),
        )
    )


def frequent_event_pairs(
    events: DataFrame,
    min_support: int = 2,
    basket_col: str = "user_id",
    item_col: str = "event_type",
) -> DataFrame:
    """Frequent co-occurring event-type pairs per basket (A-priori at
    k=2): (item_1, item_2, n_baskets, confidence, lift) for every ordered
    item pair appearing together in >= ``min_support`` baskets.

    Shapes for scale (extension surface — market-basket mining over the
    event stream, the OLAP companion to ``event_transitions``):

    - baskets reduce to the DISTINCT (basket, item) table first, so the
      pair expansion is bounded by (items-per-basket)^2 — item vocabulary
      squared per basket, not events squared;
    - the A-priori prune runs BEFORE the self-join: only items whose own
      support clears ``min_support`` enter the pair join (broadcast
      semi-join, since the frequent-item table is vocabulary-sized);
    - the pair join is a basket-keyed equi-self-join (shuffle on basket;
      hot baskets are bounded by the item vocabulary) with ``item_1 <
      item_2`` so each pair is produced once.

    confidence = P(item_2 | item_1); lift = support / (s1 * s2 / n);
    both rounded for cross-engine comparability.
    """
    bi = (
        events.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    item_support = bi.groupBy("item").agg(F.count(F.lit(1)).alias("s"))
    frequent = item_support.filter(F.col("s") >= min_support)
    pruned = bi.join(
        F.broadcast(frequent.select("item")), "item", "left_semi"
    )
    a = pruned.select("basket", F.col("item").alias("item_1"))
    b = pruned.select("basket", F.col("item").alias("item_2"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_1") < F.col("item_2"))
        .groupBy("item_1", "item_2")
        .agg(F.count(F.lit(1)).alias("n_baskets"))
        .filter(F.col("n_baskets") >= min_support)
    )
    n_total = bi.select(F.count_distinct("basket").alias("n"))
    s1 = frequent.select(F.col("item").alias("item_1"), F.col("s").alias("s1"))
    s2 = frequent.select(F.col("item").alias("item_2"), F.col("s").alias("s2"))
    return (
        pairs.join(F.broadcast(s1), "item_1")
        .join(F.broadcast(s2), "item_2")
        .crossJoin(F.broadcast(n_total))
        .select(
            "item_1",
            "item_2",
            "n_baskets",
            F.round(F.col("n_baskets") / F.col("s1"), 6).alias("confidence"),
            F.round(
                F.col("n_baskets") * F.col("n") / (F.col("s1") * F.col("s2")), 6
            ).alias("lift"),
        )
    )


def dedup_bursts(
    events: DataFrame,
    tolerance_us: int,
    key_cols: list[str] | None = None,
    ts_col: str = "ts_us",
    seq_col: str = "event_id",
) -> DataFrame:
    """Burst deduplication: within each key's timeline, an event arriving
    within ``tolerance_us`` of the PREVIOUS event (kept or not) joins the
    same burst, and only the burst's first event survives — the standard
    duplicate-suppression rule for retried clicks / double-fired beacons
    (chained gap semantics, same rule sessionization uses, so a slow
    steady drip of retries collapses into one event even when the burst
    outlives the tolerance).

    Returns the surviving events as (key cols, ts_col, seq_col,
    burst_size, burst_span_us): size = events absorbed into the burst,
    span = last - first arrival.

    Scale shape: one lag() + one running-sum window, both keyed by the
    entity (per-key partitions, bounded by a key's history — never a
    global window), then a burst-keyed aggregate; identical partitioning
    across all three, so the chain is one shuffle.
    """
    keys = list(key_cols or ["user_id", "event_type"])
    order = [F.asc(ts_col), F.asc(seq_col)]
    w = Window.partitionBy(*keys).orderBy(*order)
    gap = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
    new_burst = F.when(
        gap.isNull() | (gap > tolerance_us), F.lit(1)
    ).otherwise(F.lit(0))
    bursts = events.withColumn(
        "__burst", F.sum(new_burst).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    )
    return (
        bursts.groupBy(*keys, "__burst")
        .agg(
            F.min(F.struct(F.col(ts_col), F.col(seq_col))).alias("__first"),
            F.count(F.lit(1)).alias("burst_size"),
            (F.max(ts_col) - F.min(ts_col)).alias("burst_span_us"),
        )
        .select(
            *keys,
            F.col(f"__first.{ts_col}").alias(ts_col),
            F.col(f"__first.{seq_col}").alias(seq_col),
            "burst_size",
            "burst_span_us",
        )
    )


def value_trend(
    events: DataFrame,
    group_cols: list[str] | None = None,
    ts_col: str = "ts_us",
    value_col: str = "value",
    round_to: int = 6,
    x_origin_us: int = 0,
) -> DataFrame:
    """Per-group ordinary-least-squares trend of ``value_col`` against
    time: (group cols, n, slope_per_day, intercept, r2) — the
    drift/regression detector behind "is this metric trending" alerts.

    Pure closed form from one aggregate pass (n, Σx, Σy, Σxy, Σx², Σy²)
    with x measured in DAYS since ``x_origin_us``.  Pass an origin near
    the data's start: the closed form subtracts Σx²-vs-(Σx)²/n, and with
    x ≈ 19,700 epoch-days that cancellation costs ~8 of a double's 15
    digits — an origin inside the window keeps x small so the subtraction
    is exact to rounding.  The intercept is reported AT the origin.
    Groups with < 2 points or a constant x get NULL slope/r2 (no trend
    is defined); a constant y gets slope 0 with r2 pinned to 0 (the 0/0
    case).
    """
    groups = list(group_cols or ["event_type"])
    x = (F.col(ts_col).cast("double") - F.lit(float(x_origin_us))) / F.lit(
        86400.0 * 1_000_000.0
    )
    y = F.col(value_col).cast("double")
    agg = events.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sx2"),
        F.sum(y * y).alias("sy2"),
    )
    n = F.col("n").cast("double")
    ssxx = F.col("sx2") - F.col("sx") * F.col("sx") / n
    ssyy = F.col("sy2") - F.col("sy") * F.col("sy") / n
    ssxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    slope = F.when((F.col("n") >= 2) & (ssxx > 0), ssxy / ssxx)
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    r2 = F.when(ssyy > 0, (ssxy * ssxy) / (ssxx * ssyy))
    return agg.select(
        *groups,
        "n",
        F.round(slope, round_to).alias("slope_per_day"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(F.when(slope.isNotNull(), F.coalesce(r2, F.lit(0.0))), round_to).alias("r2"),
    )


def interval_join_pairs(
    probe: DataFrame,
    build: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    lookback_us: int = 7_200_000_000,
    probe_cols: list[str] | None = None,
    build_cols: list[str] | None = None,
) -> DataFrame:
    """Interval join: every (probe, build) pair sharing ``key_col`` with
    the build event inside ``[probe.ts - lookback_us, probe.ts]`` — the
    candidate set behind attribution, impression-to-click matching and
    cause-window debugging.  INNER semantics (unmatched probes are the
    attribution reducer's job, :func:`last_touch_attribution`).

    One equi-join keyed by the entity with the range predicate evaluated
    inside the join — at scale this shuffles both sides once on the key;
    the per-key pair blowup is bounded by events-per-key within the
    lookback, which is what the window bounds.  The streaming twin
    (:mod:`..streaming.attribution_stream`) runs the IDENTICAL condition
    as a watermarked stream-stream join.
    """
    pcols = probe_cols or [c for c in probe.columns]
    bcols = build_cols or [c for c in build.columns]
    p = probe.select(
        F.col(key_col).alias("__k"), F.col(ts_col).alias("__pts"),
        F.struct(*pcols).alias("__p"),
    )
    b = build.select(
        F.col(key_col).alias("__k"), F.col(ts_col).alias("__bts"),
        F.struct(*bcols).alias("__b"),
    )
    joined = p.join(
        b,
        (p["__k"] == b["__k"])
        & (F.col("__bts") <= F.col("__pts"))
        & (F.col("__bts") >= F.col("__pts") - F.lit(lookback_us)),
    )
    out = [F.col(f"__p.{c}").alias(c) for c in pcols]
    out += [F.col(f"__b.{c}").alias(f"b_{c}") for c in bcols]
    return joined.select(*out)


def last_touch_attribution(
    probe: DataFrame,
    build: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    seq_col: str = "event_id",
    lookback_us: int = 7_200_000_000,
) -> DataFrame:
    """Last-touch attribution: each probe event gains the LATEST build
    event for its key within the lookback window (ties on build ts break
    to the larger ``seq_col``), NULLs when nothing is in-window — the
    left-join reduction of :func:`interval_join_pairs`.

    The reduce is ``max_by`` over the pair set grouped by the probe id —
    map-side-combinable, so the per-key pair blowup collapses before it
    travels; the unmatched probes come back via one left join on the
    probe id.
    """
    pairs = interval_join_pairs(
        probe, build, key_col, ts_col, lookback_us,
        probe_cols=[seq_col],
        build_cols=[seq_col, ts_col],
    )
    best = pairs.groupBy(F.col(seq_col)).agg(
        F.max_by(
            F.struct(
                F.col(f"b_{seq_col}").alias("attr_id"),
                F.col(f"b_{ts_col}").alias("attr_ts"),
            ),
            F.struct(F.col(f"b_{ts_col}"), F.col(f"b_{seq_col}")),
        ).alias("__w")
    )
    return probe.join(best, seq_col, "left").select(
        *probe.columns,
        F.col("__w.attr_id").alias("attributed_id"),
        F.col("__w.attr_ts").alias("attributed_ts_us"),
        (F.col(ts_col) - F.col("__w.attr_ts")).alias("attribution_lag_us"),
    )


def inter_arrival_stats(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts_us",
    seq_col: str = "event_id",
) -> DataFrame:
    """Per-entity inter-arrival profile: the distribution of gaps
    between an entity's consecutive events — (key cols, n_gaps,
    mean_gap_s, p50_gap_s, p95_gap_s, max_gap_s).  The cadence
    fingerprint behind bot detection (machine-regular p50≈p95), churn
    scoring (growing gaps), and capacity planning (p95 arrival rate);
    :func:`dedup_bursts` suppresses the sub-tolerance end of exactly
    this distribution.

    Gap ordering is total — (ts, seq) — so ties are deterministic and
    the profile is engine-portable; entities with fewer than two events
    report no row (no gaps is the answer, not zeros).  All stats are in
    exact MICROSECONDS, unrounded: the mean is an exact-integer-sum
    division (consecutive gaps telescope to last−first, far below 2^53),
    and the percentiles are hand-rolled lo + frac·(hi − lo)
    interpolations over the sorted integer gaps — every output double is
    bit-identical across engines, with no round() call whose
    half-boundary semantics could diverge (Spark rounds the shortest
    decimal repr HALF_UP; DuckDB rounds in binary — they disagree
    whenever the repr ends in 5 at the cut digit, which integer-µs
    medians hit EXACTLY at .5 µs).

    Scale shape: one lag() window partitioned by the entity (per-key
    partitions, never global) feeding a same-key aggregate — the window
    and the groupBy share partitioning, so the chain is one shuffle.
    Exact percentiles buffer per-entity gap lists on the reducer,
    bounded by the busiest single entity; ``approx_percentile`` is the
    drop-in above that.
    """
    keys = list(key_cols or ["user_id"])
    w = Window.partitionBy(*keys).orderBy(F.asc(ts_col), F.asc(seq_col))
    gap_us = F.col(ts_col) - F.lag(F.col(ts_col)).over(w)
    gaps = events.select(*keys, gap_us.alias("__us")).filter(F.col("__us").isNotNull())
    # percentile interpolation is hand-rolled over the sorted INTEGER
    # microsecond gaps (lo + frac·(hi − lo), identical operand order in
    # the DuckDB twin): engines' built-in continuous quantiles use
    # different but equivalent formulas whose last-ulp disagreement
    # surfaces under 6-decimal rounding at scale
    agg = gaps.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.avg("__us").alias("__mean_us"),
        F.max("__us").alias("__max_us"),
        F.sort_array(F.collect_list("__us")).alias("__gl"),
    )

    def _interp(q: float) -> "F.Column":
        n = F.col("n_gaps")
        pos = F.lit(q) * (n - F.lit(1)).cast("double")
        lo = F.floor(pos).cast("int")
        frac = pos - F.floor(pos)
        lov = F.element_at("__gl", lo + F.lit(1)).cast("double")
        hiv = F.element_at(
            "__gl", F.least(lo + F.lit(2), n.cast("int"))
        ).cast("double")
        return lov + frac * (hiv - lov)

    return agg.select(
        *keys,
        "n_gaps",
        F.col("__mean_us").alias("mean_gap_us"),
        _interp(0.5).alias("p50_gap_us"),
        _interp(0.95).alias("p95_gap_us"),
        F.col("__max_us").cast("double").alias("max_gap_us"),
    )


def rolling_active_users(
    events: DataFrame,
    window_periods: int = 7,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Trailing-window distinct actives per period — the WAU/MAU curve:
    for every period p, how many distinct users were active in
    [p − window + 1, p], plus that period's own actives and the
    stickiness ratio (DAU/WAU).  (period, n_active, rolling_active,
    stickiness); periods run through the data's last observed period,
    including mid-range quiet periods the rolling window still covers.

    Distinct-over-a-sliding-window does NOT decompose into per-period
    partials (distinct is not additive), so instead of a range
    self-join (|periods| × window scans) each distinct (user, period)
    activity row CONTRIBUTES itself to the ``window_periods`` periods
    it keeps alive (``explode(sequence(...))``) and one
    ``count_distinct`` per period does the rest.

    Scale shape: blowup is exactly ×window on the DEDUPLICATED
    (user, period) activity set (tiny vs raw events), the aggregates
    are user-uniform keyed shuffles, and the period bound arrives via a
    broadcast scalar aggregate — no window function over the full data,
    no range join, no driver action.
    """
    w = int(window_periods)
    period = _period_bucket(ts_col, period_us).cast("long")
    act = events.select(F.col(key_col).alias("__k"), period.alias("period")).distinct()
    bounds = act.agg(F.max("period").alias("__hi"))
    daily = act.groupBy("period").agg(F.count(F.lit(1)).alias("n_active"))
    contrib = act.select(
        "__k",
        F.explode(F.sequence(F.col("period"), F.col("period") + F.lit(w - 1))).alias("period"),
    )
    rolling = (
        contrib.crossJoin(F.broadcast(bounds))
        .filter(F.col("period") <= F.col("__hi"))
        .groupBy("period")
        .agg(F.count_distinct("__k").alias("rolling_active"))
    )
    return (
        rolling.join(daily, "period", "left")
        .select(
            "period",
            F.coalesce("n_active", F.lit(0)).alias("n_active"),
            "rolling_active",
            F.round(
                F.coalesce("n_active", F.lit(0)) / F.col("rolling_active"), 6
            ).alias("stickiness"),
        )
    )


def rolling_forecast_backtest(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    id_col: str = "event_id",
    window_rows: int = 5,
) -> DataFrame:
    """Per-key one-step-ahead forecast backtest: fit an OLS trend line
    over the ``window_rows`` PRECEDING observations (current excluded —
    no label leakage), predict the current value, and score the errors
    per key: (key, n_forecasts, mae, rmse, bias, naive_mae, skill).

    ``skill`` = 1 − mae/naive_mae against the lag-1 persistence
    forecast — the honest baseline every forecaster must beat; > 0 means
    the trend extrapolation adds information for that key.  Only rows
    with a FULL trailing window forecast (count == window_rows), so the
    fit is always over the same sample size.

    The regressor is the per-key event sequence number, so Sx/Sxx are
    integer window sums, and the value-side sums Sy/Sxy run over an
    exact DECIMAL image of the values — every window sum is exact in any
    summation order, hence engine-portable by construction.  Closed form:
    slope = (n·Sxy − Sx·Sy)/(n·Sxx − Sx²), intercept = (Sy − slope·Sx)/n,
    forecast at the current sequence number.

    Scale shape: ONE shuffle keyed by ``key_col`` (uniform user
    cardinality); all five window sums, the lag and the row number come
    out of a single sorted WindowExec run, then one map-side-combinable
    per-key aggregate.  No global window, no self-join, no iteration.
    """
    y = F.col(value_col).cast("double")
    # NULL values would silently bias the fit (window sum skips NULLs
    # while count counts the row) — they are not observations, drop them
    events = events.filter(F.col(value_col).isNotNull())
    scored = (
        events.select(
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("__ts"),
            F.col(id_col).alias("__id"),
            y.alias("__y"),
        )
        .select(
            "key",
            "__y",
            F.row_number()
            .over(Window.partitionBy("key").orderBy("__ts", "__id"))
            .cast("long")
            .alias("__x"),
            F.lag("__y", 1)
            .over(Window.partitionBy("key").orderBy("__ts", "__id"))
            .alias("__prev"),
        )
    )
    tw = Window.partitionBy("key").orderBy("__x").rowsBetween(-window_rows, -1)
    # value-side window sums run over an exact DECIMAL image of the
    # (rounded) values: decimal addition is order-independent, so the
    # sliding sums are bit-identical whether the engine replays the frame
    # (Spark) or merges a segment tree (DuckDB); the closed form below
    # then starts from exactly-equal doubles in both engines
    yd = F.round("__y", 6).cast("decimal(28,6)")
    fitted = scored.withColumn("__yd", yd).select(
        "key",
        "__y",
        "__x",
        "__prev",
        F.count(F.lit(1)).over(tw).alias("__n"),
        F.sum("__x").over(tw).alias("__sx"),
        F.sum(F.col("__x") * F.col("__x")).over(tw).alias("__sxx"),
        F.sum("__yd").over(tw).alias("__syd"),
        F.sum(F.col("__x") * F.col("__yd")).over(tw).alias("__sxyd"),
    ).filter(F.col("__n") == window_rows)
    n = F.col("__n").cast("double")
    sx = F.col("__sx").cast("double")
    sxx = F.col("__sxx").cast("double")
    sy = F.col("__syd").cast("double")
    sxy = F.col("__sxyd").cast("double")
    denom = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    slope = (n * sxy - sx * sy) / denom
    intercept = (sy - slope * sx) / n
    err = F.col("__y") - (intercept + slope * F.col("__x").cast("double"))
    naive_err = F.col("__y") - F.col("__prev")
    per_row = fitted.select(
        "key",
        err.alias("__err"),
        naive_err.alias("__nerr"),
    ).filter(F.col("__err").isNotNull())
    agg = per_row.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.avg(F.abs("__err")).alias("__mae"),
        F.sqrt(F.avg(F.col("__err") * F.col("__err"))).alias("__rmse"),
        F.avg("__err").alias("__bias"),
        F.avg(F.abs("__nerr")).alias("__nmae"),
    )
    return agg.select(
        "key",
        "n_forecasts",
        F.round("__mae", 4).alias("mae"),
        F.round("__rmse", 4).alias("rmse"),
        # +0.0 normalizes IEEE -0.0 (a tiny negative bias/skill rounding
        # to zero keeps the sign bit and hashes differently otherwise)
        (F.round("__bias", 4) + F.lit(0.0)).alias("bias"),
        F.round("__nmae", 4).alias("naive_mae"),
        (
            F.round(
                F.lit(1.0) - F.col("__mae") / F.nullif(F.col("__nmae"), F.lit(0.0)), 4
            )
            + F.lit(0.0)
        ).alias("skill"),
    )


def survival_curve(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
    censor_horizon_periods: int = 7,
) -> DataFrame:
    """Kaplan–Meier survival estimate of user lifetime: for every
    observed activity-span length (in periods), (duration, n_at_risk,
    n_events, n_censored, survival, is_event_time) — the
    retention/churn curve with honest right-censoring, which a naive
    "average lifetime" silently gets wrong (users still active at the
    end of the observation window haven't churned; dropping OR counting
    them as churned both bias the estimate).

    Per key: duration = (last − first) div period (exact integer math).
    A key whose last event falls within ``censor_horizon_periods`` of
    the corpus's last timestamp is CENSORED (its span may continue).
    KM: S(t) = Π_{event durations d ≤ t} (1 − events_d / at_risk_d),
    with at_risk_d = keys whose duration ≥ d; computed as
    exp(Σ ln(1 − d/n)) over the duration-ordered cumulative window.

    Scale shape: one per-key aggregate (uniform key shuffle), one
    count aggregate per DURATION — whose cardinality is bounded by the
    observation span in periods (calendar-bounded, not data-bounded) —
    then the cumulative window runs over that tiny aggregated frame:
    a global-order window over a calendar-sized input, the sanctioned
    k-bounded tier (same as a post-limit rank).  The corpus max
    timestamp travels via a broadcast scalar.
    """
    spans = events.groupBy(F.col(key_col).alias("__k")).agg(
        F.min(ts_col).alias("__first"), F.max(ts_col).alias("__last")
    )
    return survival_from_spans(
        spans,
        period_us=period_us,
        censor_horizon_periods=censor_horizon_periods,
    )


def survival_from_spans(
    spans: DataFrame,
    period_us: int = 86_400_000_000,
    censor_horizon_periods: int = 7,
) -> DataFrame:
    """The KM scan over an already-aggregated per-key span frame
    (__k, __first, __last) — shared by the batch estimator above and the
    streaming monitor (:mod:`..streaming.survival_stream`), whose
    per-batch min/max partials fold into exactly this shape."""
    last_seen = spans.agg(F.max("__last").alias("__corpus_last"))
    per_key = spans.crossJoin(F.broadcast(last_seen)).select(
        # integer floor division — no double rounding at period boundaries
        F.expr(
            f"(__last - __first - pmod(__last - __first, {int(period_us)}))"
            f" div {int(period_us)}"
        ).alias("duration"),
        (
            F.col("__last")
            >= F.col("__corpus_last") - F.lit(int(censor_horizon_periods) * period_us)
        ).alias("__censored"),
    )
    counts = per_key.groupBy("duration").agg(
        F.sum((~F.col("__censored")).cast("long")).alias("n_events"),
        F.sum(F.col("__censored").cast("long")).alias("n_censored"),
    )
    w = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, -1)
    run = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    leave = F.col("n_events") + F.col("n_censored")
    at_risk = F.sum(leave).over(tot) - F.coalesce(F.sum(leave).over(w), F.lit(0))
    # ln(1 - d/n) per duration, cumulative-summed in duration order; rows
    # with zero events contribute ln(1) = 0 exactly in both engines.  The
    # d == n step (everyone at risk churns) would be ln(0) — NULL in
    # Spark, which sum() silently SKIPS — so it is excluded from the log
    # sum and tracked as an explicit "curve hit zero" cumulative flag.
    dead = (F.col("n_events") == F.col("__at_risk")).cast("long")
    step = F.when(
        F.col("n_events") < F.col("__at_risk"),
        F.ln(F.lit(1.0) - F.col("n_events") / F.col("__at_risk")),
    )
    curve = (
        counts.withColumn("__at_risk", at_risk)
        .withColumn("__logs", F.coalesce(F.sum(step).over(run), F.lit(0.0)))
        .withColumn("__dead", F.sum(dead).over(run))
    )
    survival = F.when(F.col("__dead") > 0, F.lit(0.0)).otherwise(
        F.round(F.exp("__logs"), 6)
    )
    return curve.select(
        "duration",
        F.col("__at_risk").alias("n_at_risk"),
        "n_events",
        "n_censored",
        survival.alias("survival"),
        (F.col("n_events") > 0).alias("is_event_time"),
    )


def ab_conversion_test(
    events: DataFrame,
    convert_type: str = "purchase",
    baseline_type: str = "click",
    key_col: str = "user_id",
    type_col: str = "event_type",
    z_crit: float = 1.959963984540054,
) -> DataFrame:
    """Two-proportion A/B conversion test: users are deterministically
    split into variants by the engine-portable md5 bucket rule
    (:func:`..functions.hashes.md5_bucket` — the same one definition
    every split/sample/shard in the package shares), conversion = the
    user emitted MORE ``convert_type`` than ``baseline_type`` events
    (a scale-free outcome: an absolute threshold would saturate to
    all-converted or none-converted as the corpus grows, degenerating
    the test), and the pooled two-proportion z-statistic decides
    significance at α = 0.05 (two-sided).  One row: (n_a, n_b, conv_a,
    conv_b, rate_a, rate_b, lift, z_score, significant).

    z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)), p̂ pooled — the
    standard experimentation-platform readout; the md5 assignment makes
    the "experiment" reproducible on any engine, run and partitioning.
    A degenerate experiment (p̂ ∈ {0, 1}: zero pooled variance) reports
    z = NaN, the package's cross-engine convention for undefined
    doubles, with significant = false.

    Scale shape: one per-key aggregate (uniform user shuffle) then one
    two-group aggregate — both map-side combinable; the final row is
    arithmetic over four counters.  No window, no join, no collect.
    """
    per_user = events.groupBy(F.col(key_col).alias("__k")).agg(
        (
            F.sum((F.col(type_col) == convert_type).cast("long"))
            > F.sum((F.col(type_col) == baseline_type).cast("long"))
        ).cast("long").alias("__conv")
    )
    return ab_readout(per_user, z_crit=z_crit)


def ab_readout(per_user: DataFrame, z_crit: float = 1.959963984540054) -> DataFrame:
    """The z-test readout over a per-key conversion frame (__k, __conv ∈
    {0,1}) — shared by the batch test above and the streaming monitor
    (:mod:`..streaming.ab_stream`), so both surface the identical
    statistic from the identical variant assignment."""
    from datalake_indexes_spark.functions.hashes import md5_bucket

    tagged = per_user.withColumn("__v", md5_bucket("__k", 2))
    agg = tagged.agg(
        F.sum((F.col("__v") == 0).cast("long")).alias("n_a"),
        F.sum((F.col("__v") == 1).cast("long")).alias("n_b"),
        F.sum(F.when(F.col("__v") == 0, F.col("__conv")).otherwise(0)).alias("conv_a"),
        F.sum(F.when(F.col("__v") == 1, F.col("__conv")).otherwise(0)).alias("conv_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    pa, pb = ca / na, cb / nb
    pooled = (ca + cb) / (na + nb)
    se = F.sqrt(pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb))
    z = F.when(se > 0, (pa - pb) / se).otherwise(F.lit(float("nan")))
    return agg.select(
        "n_a",
        "n_b",
        "conv_a",
        "conv_b",
        F.round(pa, 6).alias("rate_a"),
        F.round(pb, 6).alias("rate_b"),
        F.round(pa / F.nullif(pb, F.lit(0.0)) - F.lit(1.0), 6).alias("lift"),
        F.round(z, 4).alias("z_score"),
        # NaN compares GREATER than everything in both engines, so the
        # degenerate (zero-variance) case must gate on se > 0 explicitly
        F.when(se > 0, F.abs(z) > F.lit(z_crit)).otherwise(F.lit(False)).alias(
            "significant"
        ),
    )


def cusum_changepoints(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
    score_crit: float = 1.358,
) -> DataFrame:
    """Event-rate changepoint detection per type — CUSUM over the dense
    per-period count series: (event_type, n_periods, change_period,
    max_cusum_abs, score, change_flag).

    CUSUM_t = Σ_{p ≤ t} c_p − t·(total/n): the cumulative surplus of
    observed counts over the constant-rate expectation; its |max| peaks
    AT the changepoint when the rate shifts once.  ``score`` normalizes
    by σ_c·√n (population std of the period counts) — a Brownian-bridge
    style statistic with the α = 0.05 KS critical value as the flag
    heuristic (documented approximation; CUSUM significance is
    classically bootstrap-calibrated).  Ties in |CUSUM| resolve to the
    earliest period, so argmax is deterministic even under exact ties.

    Quiet periods count as ZERO events (a type that stops emitting IS
    the changepoint), via a dense per-type period grid exploded from the
    corpus's global period bounds — calendar-bounded, not data-bounded.

    Engine parity is structural: period counts are integers, so every
    cumulative sum is exact; the only doubles are the final ratios.

    Scale shape: one (type, period) count aggregate over the scan, the
    dense grid is |types| × |periods| (catalog × calendar), the CUSUM
    window partitions by type, and the argmax is a per-type aggregate
    with min-period tie-break.  No global window, no self-join.
    """
    period = _period_bucket(ts_col, period_us).cast("long")
    counts = events.select(
        F.col(type_col).alias("event_type"), period.alias("period")
    ).groupBy("event_type", "period").agg(F.count(F.lit(1)).alias("c"))
    return cusum_readout(counts, score_crit=score_crit)


def cusum_readout(counts: DataFrame, score_crit: float = 1.358) -> DataFrame:
    """The CUSUM scan over an already-aggregated (event_type, period, c)
    count frame — shared by the batch detector above and the streaming
    monitor (:mod:`..streaming.changepoint_stream`), whose per-batch
    partials fold into exactly this shape."""
    bounds = counts.agg(
        F.min("period").alias("__lo"), F.max("period").alias("__hi")
    )
    grid = (
        counts.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("period"),
        )
    )
    dense = grid.join(counts, ["event_type", "period"], "left").select(
        "event_type", "period", F.coalesce("c", F.lit(0)).alias("c")
    )
    w = Window.partitionBy("event_type").orderBy("period")
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy("event_type")
    cum = F.sum("c").over(run)
    t = F.row_number().over(w).cast("long")
    total = F.sum("c").over(tot)
    n = F.count(F.lit(1)).over(tot)
    sq = F.sum(F.col("c") * F.col("c")).over(tot)
    cusum = cum.cast("double") - t.cast("double") * (
        total.cast("double") / n.cast("double")
    )
    scored = dense.select(
        "event_type",
        "period",
        F.abs(cusum).alias("__a"),
        n.alias("__n"),
        total.alias("__tot"),
        sq.alias("__sq"),
    )
    best = scored.groupBy("event_type").agg(
        F.first("__n").alias("n_periods"),
        F.max("__a").alias("__amax"),
        F.first("__tot").alias("__tot"),
        F.first("__sq").alias("__sq"),
    )
    # argmax with earliest-period tie-break: min(period) among rows whose
    # |cusum| equals the per-type max — a semi-join-free second aggregate
    # over the same scored frame
    arg = (
        scored.join(
            best.select("event_type", "__amax"), "event_type"
        )
        .filter(F.col("__a") == F.col("__amax"))
        .groupBy("event_type")
        .agg(F.min("period").alias("change_period"))
    )
    nd = F.col("n_periods").cast("double")
    mean = F.col("__tot").cast("double") / nd
    var = F.col("__sq").cast("double") / nd - mean * mean
    # gate on var > 0: the power-sum cancellation can land epsilon-negative
    # at huge counts, and sqrt(neg) = NaN would flip the flag TRUE (NaN
    # compares greater than everything) — the ab_readout hazard
    score = F.when(var > 0, F.col("__amax") / (F.sqrt(var) * F.sqrt(nd)))
    return (
        best.join(arg, "event_type")
        .select(
            "event_type",
            "n_periods",
            "change_period",
            F.round("__amax", 6).alias("max_cusum_abs"),
            F.round(score, 6).alias("score"),
            F.coalesce(score > F.lit(score_crit), F.lit(False)).alias("change_flag"),
        )
    )


def ab_cuped_test(
    events: DataFrame,
    metric_type: str = "purchase",
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    z_crit: float = 1.959963984540054,
) -> DataFrame:
    """CUPED variance-reduced A/B test on a count metric: per user, the
    PRE-period metric count (before the corpus's integer midpoint) is
    the covariate x, the POST-period count is the outcome y, variants
    come from the package's md5 bucket rule, and the readout compares
    adjusted means y′ = y − θ(x − x̄) with θ = cov(x,y)/var(x) pooled —
    the industry-standard experimentation trick (Deng et al., WSDM'13):
    pre-period behavior soaks up between-user variance the treatment
    can't explain, shrinking the CI at identical sample size.

    One row: (n_a, n_b, theta, var_reduction, mean_adj_a, mean_adj_b,
    z_raw, z_adj, significant) — ``var_reduction`` = var(y′)/var(y)
    pooled (< 1 when the covariate helps), ``z_adj`` the Welch-style
    statistic on adjusted means (population variances; large-n), with
    ``z_raw`` alongside so the reduction is visible.

    Engine parity is structural: x and y are integer counts, so every
    moment sum (Σx, Σy, Σx², Σy², Σxy per variant) is EXACT — θ,
    adjusted means and variances expand algebraically from those sums
    (ȳ′_v = ȳ_v − θ(x̄_v − x̄); var_v(y′) = var_v(y) − 2θ·cov_v +
    θ²·var_v(x)), so no per-row double ever accumulates.

    Scale shape: one per-user aggregate (uniform key shuffle), then ONE
    global aggregate of twelve conditional integer sums; the statistic
    is arithmetic over that single row.  No window, no join, no collect.
    """
    from datalake_indexes_spark.functions.hashes import md5_bucket

    mid = events.agg(
        F.min(ts_col).alias("__lo"), F.max(ts_col).alias("__hi")
    ).select(F.expr("(__lo + __hi) div 2").alias("__mid"))
    is_metric = (F.col(type_col) == metric_type).cast("long")
    per_user = (
        events.crossJoin(F.broadcast(mid))
        .groupBy(F.col(key_col).alias("__k"))
        .agg(
            F.sum(F.when(F.col(ts_col) < F.col("__mid"), is_metric).otherwise(0)).alias("__x"),
            F.sum(F.when(F.col(ts_col) >= F.col("__mid"), is_metric).otherwise(0)).alias("__y"),
        )
        .withColumn("__v", md5_bucket("__k", 2))
    )

    def sums(side: int, tag: str):
        inv = F.col("__v") == side
        return [
            F.sum(F.when(inv, 1).otherwise(0)).cast("long").alias(f"n_{tag}"),
            F.sum(F.when(inv, F.col("__x")).otherwise(0)).alias(f"__sx_{tag}"),
            F.sum(F.when(inv, F.col("__y")).otherwise(0)).alias(f"__sy_{tag}"),
            F.sum(F.when(inv, F.col("__x") * F.col("__x")).otherwise(0)).alias(f"__sxx_{tag}"),
            F.sum(F.when(inv, F.col("__y") * F.col("__y")).otherwise(0)).alias(f"__syy_{tag}"),
            F.sum(F.when(inv, F.col("__x") * F.col("__y")).otherwise(0)).alias(f"__sxy_{tag}"),
        ]

    agg = per_user.agg(*sums(0, "a"), *sums(1, "b"))

    def d(name: str):
        return F.col(name).cast("double")

    na, nb = d("n_a"), d("n_b")
    n = na + nb
    sx = d("__sx_a") + d("__sx_b")
    sy = d("__sy_a") + d("__sy_b")
    sxx = d("__sxx_a") + d("__sxx_b")
    syy = d("__syy_a") + d("__syy_b")
    sxy = d("__sxy_a") + d("__sxy_b")
    xbar, ybar = sx / n, sy / n
    var_x = sxx / n - xbar * xbar
    var_y = syy / n - ybar * ybar
    cov = sxy / n - xbar * ybar
    theta = cov / F.nullif(var_x, F.lit(0.0))
    var_adj = var_y - F.lit(2.0) * theta * cov + theta * theta * var_x

    def variant(tag: str):
        nv = d(f"n_{tag}")
        xv, yv = d(f"__sx_{tag}") / nv, d(f"__sy_{tag}") / nv
        mean_adj = yv - theta * (xv - xbar)
        var_yv = d(f"__syy_{tag}") / nv - yv * yv
        var_xv = d(f"__sxx_{tag}") / nv - xv * xv
        cov_v = d(f"__sxy_{tag}") / nv - xv * yv
        var_adj_v = var_yv - F.lit(2.0) * theta * cov_v + theta * theta * var_xv
        return nv, yv, mean_adj, var_yv, var_adj_v

    na_, ya, ma, vya, vaa = variant("a")
    nb_, yb, mb, vyb, vab = variant("b")
    # gate each z on a strictly positive combined variance: epsilon-negative
    # power-sum cancellation would make sqrt() NaN, and NaN > crit is TRUE
    se2_raw = vya / na_ + vyb / nb_
    se2_adj = vaa / na_ + vab / nb_
    z_raw = F.when(se2_raw > 0, (ya - yb) / F.sqrt(se2_raw))
    z_adj = F.when(se2_adj > 0, (ma - mb) / F.sqrt(se2_adj))
    return agg.select(
        "n_a",
        "n_b",
        F.round(theta, 6).alias("theta"),
        F.round(var_adj / F.nullif(var_y, F.lit(0.0)), 6).alias("var_reduction"),
        F.round(ma, 6).alias("mean_adj_a"),
        F.round(mb, 6).alias("mean_adj_b"),
        F.round(z_raw, 4).alias("z_raw"),
        F.round(z_adj, 4).alias("z_adj"),
        F.coalesce(F.when(se2_adj > 0, F.abs(z_adj) > F.lit(z_crit)), F.lit(False)).alias(
            "significant"
        ),
    )


def funnel_timing(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-transition funnel summary over :func:`funnel`'s per-user
    first-reach times: (transition, n_from, n_to, conversion_rate,
    median_s, p95_s) for every consecutive step pair — the report a
    growth team actually reads (WHERE the funnel leaks and HOW LONG
    converts take), where the raw funnel emits one row per user.

    Timing is over converters only (to-step reached), in seconds with
    exact percentiles (same p·(n−1) interpolation rule as
    column_percentiles, engine-portable).

    Scale shape: the funnel's per-user frame unpivots via ``stack`` —
    (steps−1)× row expansion of a USER-cardinality frame, not the event
    stream — then ONE aggregate grouped by the transition label
    (constant cardinality).  Exact percentiles buffer per-transition
    gap lists on the reducer; at extreme user counts swap
    ``percentile`` for ``percentile_approx`` (same shape as
    inter_arrival_stats' documented trade).
    """
    f = funnel(events, steps, key_col=key_col, ts_col=ts_col, type_col=type_col)
    n = len(steps)
    pairs = []
    for i in range(1, n):
        label = f"{i}:{steps[i - 1]}->{steps[i]}".replace("'", "\\'")
        pairs.append(f"'{label}', step{i}_us, step{i + 1}_us")
    stacked = f.selectExpr(
        f"stack({n - 1}, {', '.join(pairs)}) as (transition, __from, __to)"
    )
    gap_s = (F.col("__to") - F.col("__from")) / F.lit(1_000_000.0)
    converted = F.col("__to") != -1
    return (
        stacked.filter(F.col("__from") != -1)
        .groupBy("transition")
        .agg(
            F.count(F.lit(1)).alias("n_from"),
            F.sum(converted.cast("long")).alias("n_to"),
            F.round(
                F.sum(converted.cast("long")) / F.count(F.lit(1)), 6
            ).alias("conversion_rate"),
            F.round(
                F.percentile(F.when(converted, gap_s), F.lit(0.5)), 6
            ).alias("median_s"),
            F.round(
                F.percentile(F.when(converted, gap_s), F.lit(0.95)), 6
            ).alias("p95_s"),
        )
    )


def scd2_lookup(
    facts: DataFrame,
    history: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-time dimension lookup — the consumption half of
    :func:`scd2_history`: every fact row gains ``prefix+attr`` and
    ``prefix+version`` from the dimension interval VALID AT its
    timestamp (the feature-store primitive that makes training joins
    leakage-free: a fact never sees a dimension version from its
    future).

    Facts before the key's first interval get NULLs; facts falling in a
    GAP of a custom (non-contiguous) history also get NULLs — the
    interval end is checked, not just the as-of start.

    Scale shape: delegates to :func:`asof_join`'s tagged union-window —
    ONE shuffle keyed by the dimension key, no row expansion, no range
    join (histories produced by :func:`scd2_history` are per-key
    ordered; ``version`` breaks same-timestamp ties deterministically).
    """
    build = history.withColumnRenamed("valid_from", ts_col)
    out = asof_join(
        facts,
        build,
        key_col,
        ts_col,
        list(attr_cols) + ["valid_to", "version"],
        seq_col="version",
        prefix=prefix,
    )
    in_interval = F.col(f"{prefix}valid_to").isNull() | (
        F.col(ts_col) < F.col(f"{prefix}valid_to")
    )
    for c in list(attr_cols) + ["version"]:
        out = out.withColumn(
            f"{prefix}{c}", F.when(in_interval, F.col(f"{prefix}{c}"))
        )
    return out.drop(f"{prefix}valid_to")


def rfm_segments(
    events: DataFrame,
    purchase_type: str = "purchase",
    n_tiles: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
    type_col: str = "event_type",
) -> DataFrame:
    """RFM segmentation: (key, recency_us, frequency, monetary, r, f, m,
    segment) — the classic customer-value grid (recency = time from the
    key's last purchase to the corpus's last timestamp; frequency =
    purchase count; monetary = summed value), each dimension cut into
    ``n_tiles`` equal-count tiles (5 = best) and concatenated into the
    familiar segment code ("555" = recent, frequent, big).

    Tiles follow the engines' exact NTILE allocation over the TOTAL
    order (metric, key) — but computed as a distributed
    :func:`..functions.ranking.global_rank` plus the closed-form
    :func:`..functions.ranking.ntile_from_rank`, so no ntile window ever
    funnels the key frame through one task.  Recency ranks ascending
    (then flips so 5 = most recent); frequency/monetary rank descending.

    Scale shape: one per-key aggregate, three bucketed global ranks
    (two-level prefix sum each), one broadcast scalar count.
    Parallelism within a rank is bounded below by the largest TIED
    metric group (e.g. billions of frequency-1 customers sort in one
    bucket) — the documented bound every value-ordered total ranking
    shares; pre-bucketize the metric if that tier dominates.
    """
    from datalake_indexes_spark.functions.ranking import (
        global_rank,
        ntile_from_rank,
    )

    last_seen = events.agg(F.max(ts_col).alias("__last"))
    per_key = (
        events.filter(F.col(type_col) == purchase_type)
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.max(ts_col).alias("__last_p"),
            F.count(F.lit(1)).alias("frequency"),
            # all-NULL purchase values -> 0, not NULL: a NULL metric would
            # leave the global rank (and the m tile / segment code) NULL
            # while a native ntile orders it NULLS LAST — diverging engines
            F.round(
                F.coalesce(F.sum(F.col(value_col).cast("double")), F.lit(0.0)), 6
            ).alias("monetary"),
        )
        .crossJoin(F.broadcast(last_seen))
        .withColumn("recency_us", (F.col("__last") - F.col("__last_p")).cast("long"))
        .select("key", "recency_us", "frequency", "monetary")
    )
    ranked = global_rank(per_key, "recency_us", "key", ascending=True, out_col="__rr")
    ranked = global_rank(ranked, "frequency", "key", ascending=False, out_col="__rf")
    ranked = global_rank(ranked, "monetary", "key", ascending=False, out_col="__rm")
    total = per_key.agg(F.count(F.lit(1)).alias("__n"))
    out = ranked.crossJoin(F.broadcast(total))
    n = F.col("__n").cast("long")
    flip = lambda c: (  # noqa: E731
        F.lit(n_tiles + 1) - ntile_from_rank(F.col(c), n, n_tiles)
    ).cast("int")
    return out.select(
        "key",
        "recency_us",
        "frequency",
        "monetary",
        flip("__rr").alias("r"),
        flip("__rf").alias("f"),
        flip("__rm").alias("m"),
        F.concat(
            flip("__rr").cast("string"),
            flip("__rf").cast("string"),
            flip("__rm").cast("string"),
        ).alias("segment"),
    )


def rate_cross_correlation(
    events: DataFrame,
    type_a: str,
    type_b: str,
    max_lag: int = 7,
    type_col: str = "event_type",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Lead–lag cross-correlation between two event-rate series:
    (lag, n_periods, corr) for lag ∈ [−max_lag, max_lag], correlating
    a's per-period count at t with b's at t+lag over the shared dense
    period grid — "does signup lead purchase by N days?" answered as
    the lag maximizing corr.  Positive lag = a LEADS b.

    Quiet periods count as zero on both sides (a rate series has a
    value everywhere), and both series share the corpus's global period
    bounds, so every lag compares the same grid shifted — n_periods =
    grid − |lag|.  Pearson from raw integer sums (period counts are
    exact, so Σa, Σb, Σab, Σa², Σb² are order-independent in any
    engine); zero-variance windows report NULL corr.

    Scale shape: one (type, period) count aggregate, dense grids are
    calendar-bounded, the lag expansion is ×(2·max_lag+1) on the GRID
    (not the events), one equi-join on the shifted period, one
    per-lag aggregate.  No window at all.
    """
    period = _period_bucket(ts_col, period_us).cast("long")
    counts = (
        events.filter(F.col(type_col).isin(type_a, type_b))
        .select(F.col(type_col).alias("__t"), period.alias("period"))
        .groupBy("__t", "period")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bounds = counts.agg(F.min("period").alias("__lo"), F.max("period").alias("__hi"))

    def dense(t: str, out: str) -> DataFrame:
        grid = bounds.select(
            F.explode(F.sequence(F.col("__lo"), F.col("__hi"))).alias("period")
        )
        return grid.join(
            counts.filter(F.col("__t") == t).select("period", "c"), "period", "left"
        ).select("period", F.coalesce("c", F.lit(0)).alias(out))

    a, b = dense(type_a, "a"), dense(type_b, "b")
    lags = F.explode(
        F.sequence(F.lit(-int(max_lag)), F.lit(int(max_lag)))
    ).alias("lag")
    a_l = a.select("period", "a", lags)
    joined = a_l.join(
        b.withColumnRenamed("period", "__bp"),
        F.col("__bp") == F.col("period") + F.col("lag"),
    )
    agg = joined.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_periods"),
        F.sum("a").alias("__sa"),
        F.sum("b").alias("__sb"),
        F.sum(F.col("a") * F.col("b")).alias("__sab"),
        F.sum(F.col("a") * F.col("a")).alias("__saa"),
        F.sum(F.col("b") * F.col("b")).alias("__sbb"),
    )
    n = F.col("n_periods").cast("double")
    sa, sb = F.col("__sa").cast("double"), F.col("__sb").cast("double")
    sab = F.col("__sab").cast("double")
    saa, sbb = F.col("__saa").cast("double"), F.col("__sbb").cast("double")
    denom = F.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    corr = (n * sab - sa * sb) / F.nullif(denom, F.lit(0.0))
    return agg.select(
        "lag", "n_periods", F.round(corr, 6).alias("corr")
    ).orderBy("lag")


END_STATE = "__END__"


def markov_absorption(
    events: DataFrame,
    absorb_type: str = "purchase",
    steps: int = 50,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    seq_col: str | None = None,
) -> DataFrame:
    """Markov absorption probabilities: for every event type, the
    probability that a user in that state reaches ``absorb_type`` before
    their stream ends — (state, n_out, p_absorb).  This is the quantity
    behind Markov attribution and "how close is this action to
    converting" scoring; a plain next-step transition matrix
    (:func:`event_transitions`) can't see past one hop.

    The chain: first-order transitions over each key's total-ordered
    timeline, plus one terminal ``__END__`` transition after the last
    event; ``absorb_type`` and ``__END__`` absorb (p = 1 / 0).
    p is computed by ``steps`` fixed-point iterations of
    p(s) ← Σ_t P(s,t)·v(t) — geometric convergence, and the FIXED
    iteration count is the cross-engine parity contract (the DuckDB twin
    unrolls the same count in a recursive CTE; a closed-form matrix
    inverse would never hash-match an iterative oracle).

    Scale shape: the distributed work is exactly
    :func:`event_transitions`' one lag pass + |types|²-group count; the
    iteration runs driver-side over the collected ≤ (|types|+1)² matrix
    — the sanctioned catalog-sized tier (same as
    categorical_association's grid).  No per-row work scales with steps.
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(type_col)).over(w)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.coalesce(nxt, F.lit(END_STATE)).alias("to_type"),
    ).filter(F.col("from_type") != absorb_type)
    counts = (
        pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    ).collect()
    if any(r["from_type"] == END_STATE for r in counts):
        raise ValueError(
            f"markov_absorption: the data contains an event type equal to "
            f"the terminal sentinel {END_STATE!r} — rename it first (a "
            "silent collision would merge real transitions with stream ends)"
        )

    out_n: dict[str, int] = {}
    for r in counts:
        out_n[r["from_type"]] = out_n.get(r["from_type"], 0) + r["n"]
    trans: dict[str, list[tuple[str, float]]] = {}
    for r in sorted(counts, key=lambda r: (r["from_type"], r["to_type"])):
        trans.setdefault(r["from_type"], []).append(
            (r["to_type"], r["n"] / out_n[r["from_type"]])
        )
    p = {s: 0.0 for s in trans}
    for _ in range(int(steps)):
        new_p = {}
        for s, outs in trans.items():
            acc = 0.0
            for t, pr in outs:  # fixed (to_type-sorted) summation order
                if t == absorb_type:
                    acc += pr
                elif t != END_STATE:
                    acc += pr * p.get(t, 0.0)
            new_p[s] = acc
        p = new_p

    spark = events.sparkSession
    rows = [(st, out_n[st], p[st]) for st in sorted(trans)]
    rows.append((absorb_type, 0, 1.0))
    raw = spark.createDataFrame(rows, "state string, n_out long, p_absorb double")
    # round in Spark (HALF_UP) to match the oracle's rounding convention,
    # not Python's banker's rounding
    return raw.select(
        "state", "n_out", F.round("p_absorb", 6).alias("p_absorb")
    )


def markov_removal_effects(
    events: DataFrame,
    absorb_type: str = "purchase",
    steps: int = 50,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
    seq_col: str | None = None,
) -> DataFrame:
    """Markov-chain attribution by removal effect: for every non-absorbing
    channel, how much of the baseline conversion probability disappears
    when that channel is removed from the chain — (channel, p_base,
    p_removed, removal_effect), the data-driven alternative to last-touch
    attribution (:func:`last_touch_attribution` credits one touch; the
    removal effect credits a channel by what conversion it actually
    carries, multi-hop paths included).

    Chain and conversion: same construction as :func:`markov_absorption`
    (consecutive pairs + ``__END__``), baseline conversion = the
    start-distribution-weighted absorption Σ_s π(s)·p(s) with π = the
    distribution of users' FIRST events.  Removing channel c: edges INTO
    c re-route to ``__END__`` (the user journey dies there), edges OUT of
    c are dropped, and starts at c count as immediate non-conversion —
    the standard removal-effect convention.  removal_effect =
    1 − p_removed/p_base.  Same fixed ``steps`` iteration contract as
    markov_absorption (the DuckDB twin runs ONE recursive CTE over
    (channel, state) pairs).

    Scale shape: identical distributed footprint to markov_absorption —
    one lag pass + |types|²-group count + one first-event aggregate; the
    per-channel iterations run driver-side over ≤ |types| copies of the
    catalog-sized matrix.
    """
    order = [F.col(ts_col)] + ([F.col(seq_col)] if seq_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(F.col(type_col)).over(w)
    rn = F.row_number().over(w)
    base = events.select(
        F.col(type_col).alias("from_type"),
        F.coalesce(nxt, F.lit(END_STATE)).alias("to_type"),
        rn.alias("__rn"),
    )
    # ONE aggregation job over the single lag pass: transition counts and
    # first-event (start) counts share the same grouped frame — two
    # collect()s on separate aggregates would re-run the user-keyed
    # window shuffle twice
    grouped = (
        base.groupBy("from_type", "to_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("__rn") == 1).cast("long")).alias("n_start"),
        )
    ).collect()
    if any(r["from_type"] == END_STATE for r in grouped):
        raise ValueError(
            f"markov_removal_effects: the data contains an event type equal "
            f"to the terminal sentinel {END_STATE!r} — rename it first"
        )
    # '__BASE__' tags the no-removal variant in the removal-effect sweep
    # (and in the DuckDB twin's variant CTE); an event type with that
    # literal name would silently merge with the baseline there.
    if any(r["from_type"] == "__BASE__" for r in grouped):
        raise ValueError(
            "markov_removal_effects: the data contains an event type equal "
            "to the baseline sentinel '__BASE__' — rename it first"
        )

    out_n: dict[str, int] = {}
    start_n: dict[str, int] = {}
    for r in grouped:
        start_n[r["from_type"]] = start_n.get(r["from_type"], 0) + r["n_start"]
    edges = sorted(
        (r["from_type"], r["to_type"], r["n"])
        for r in grouped
        if r["from_type"] != absorb_type
    )
    for f, _, n in edges:
        out_n[f] = out_n.get(f, 0) + n
    n_starts = sum(start_n.values())
    pi = {s_: n / n_starts for s_, n in start_n.items() if n > 0}

    def absorb_p(removed: str | None) -> dict[str, float]:
        trans: dict[str, list[tuple[str, float]]] = {}
        for f, t, n in edges:
            if removed is not None and f == removed:
                continue
            t2 = END_STATE if (removed is not None and t == removed) else t
            trans.setdefault(f, []).append((t2, n / out_n[f]))
        p = {s: 0.0 for s in trans}
        for _ in range(int(steps)):
            p = {
                s: sum(
                    pr
                    if t == absorb_type
                    else (0.0 if t == END_STATE else pr * p.get(t, 0.0))
                    for t, pr in outs
                )
                for s, outs in trans.items()
            }
        return p

    def conversion(p: dict[str, float], removed: str | None) -> float:
        acc = 0.0
        for s in sorted(pi):  # fixed order
            if s == absorb_type:
                acc += pi[s]
            elif removed is not None and s == removed:
                acc += 0.0
            else:
                acc += pi[s] * p.get(s, 0.0)
        return acc

    p_base = conversion(absorb_p(None), None)
    channels = sorted(
        {f for f, _, _ in edges} - {absorb_type, END_STATE}
    )
    rows = []
    for c in channels:
        pc = conversion(absorb_p(c), c)
        rows.append((c, p_base, pc))
    spark = events.sparkSession
    raw = spark.createDataFrame(rows, "channel string, p_base double, p_removed double")
    return raw.select(
        "channel",
        F.round("p_base", 6).alias("p_base"),
        F.round("p_removed", 6).alias("p_removed"),
        F.round(
            F.lit(1.0) - F.col("p_removed") / F.nullif(F.col("p_base"), F.lit(0.0)), 6
        ).alias("removal_effect"),
    )


def holt_forecast(
    events: DataFrame,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Holt linear-trend exponential smoothing over each key's per-period
    event-count series: (key, n_periods, level, trend, rmse, forecast) —
    the classic double-exponential forecaster next to the window-OLS
    :func:`rolling_forecast_backtest` (which extrapolates a FIXED trailing
    window; Holt's level/trend pair discounts ALL history geometrically).

    Recurrence (Holt 1957), per key over the sequence of OBSERVED periods
    (gaps are skipped, not zero-filled — documented; zero-fill upstream
    if quiet periods should decay the trend), standard init l₁ = y₁,
    b₁ = y₂ − y₁:

        e_t = y_t − (l_{t−1} + b_{t−1})
        l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
        b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}

    rmse = sqrt(Σ e_t² / (n−1)) over the one-step-ahead errors (e₂ ≡ 0
    under this init), forecast = l_n + horizon·b_n.  Keys with a single
    observed period are dropped (the init needs two).

    The recursion is inherently sequential IN t but embarrassingly
    parallel ACROSS keys — exactly the applyInPandas tier (the per-key
    series is period-count-bounded, thousands of rows at most, and the
    counts are integers so y is exact on both engines).  The DuckDB twin
    runs the SAME arithmetic, in the same order, as one recursive CTE
    stepping every key simultaneously; parity is float-exact because
    both engines execute identical IEEE double chains, and the oracle
    writes (1.0 − α) as arithmetic rather than a literal so the
    discount factors match bit-for-bit.

    Scale shape: one (key, period) count aggregate, one shuffle keyed by
    ``key_col`` into applyInPandas, a per-key numpy loop over its own
    series — no global window, no driver-side state, no cross-key
    dependency.
    """
    if not 0.0 < alpha <= 1.0 or not 0.0 <= beta <= 1.0:
        raise ValueError("holt_forecast: need 0 < alpha <= 1 and 0 <= beta <= 1")
    import pandas as pd

    key_dtype = dict(events.dtypes)[key_col]
    series = (
        events.groupBy(
            F.col(key_col).alias("key"),
            _period_bucket(ts_col, period_us).cast("long").alias("__p"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("__y"))
    )

    out_schema = (
        f"key {key_dtype}, n_periods int, level double, trend double, "
        "rmse double, forecast double"
    )
    a, bt, h = float(alpha), float(beta), int(horizon)

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("__p")
        y = pdf["__y"].to_numpy(dtype="float64")
        n = len(y)
        if n < 2:
            return pd.DataFrame(
                columns=["key", "n_periods", "level", "trend", "rmse", "forecast"]
            )
        lvl = y[0]
        b = y[1] - y[0]
        se = 0.0
        for t in range(1, n):
            pred = lvl + b
            e = y[t] - pred
            se += e * e
            l_new = a * y[t] + (1.0 - a) * (lvl + b)
            b = bt * (l_new - lvl) + (1.0 - bt) * b
            lvl = l_new
        import math as _math

        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]],
                "n_periods": [n],
                "level": [lvl],
                "trend": [b],
                "rmse": [_math.sqrt(se / (n - 1))],
                "forecast": [lvl + h * b],
            }
        )

    out = series.groupBy("key").applyInPandas(fit, out_schema)
    # round OUTSIDE the UDF with F.round (half away from zero, like the
    # DuckDB twin) — Python's round() is banker's rounding
    return out.select(
        "key",
        "n_periods",
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("rmse", 6).alias("rmse"),
        F.round("forecast", 6).alias("forecast"),
    )


def decay_weighted_stats(
    events: DataFrame,
    half_life_us: int = 7 * 86_400_000_000,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    value_col: str = "value",
) -> DataFrame:
    """Exponential time-decay aggregates per key: every observation is
    weighted by w = exp(−ln2·(T−t)/half_life) with T the corpus's last
    timestamp, so yesterday counts ~2× last week at a 7-day half-life —
    (key, n, weight_sum, decayed_value, ewm_mean).  The recency-weighted
    "current customer value" every activation/churn model starts from,
    without the arbitrary hard cutoff of a trailing window.

    ``weight_sum`` is the key's decayed activity mass (all events);
    ``decayed_value``/``ewm_mean`` run over non-NULL values only (a NULL
    value is not an observation — same rule as the forecast operators).

    Scale shape: ONE scan, one broadcast scalar (T), one map-side-
    combinable aggregate keyed by ``key_col``; the weights are pure
    expressions, commutative sums, no window, no order dependency.
    Unlike a per-row running EWMA this closed form needs no sequential
    pass — decay from a FIXED anchor is order-independent algebra, which
    is also what makes the partials mergeable across batches (rescale by
    exp(−ln2·Δ/half_life) when the anchor advances).
    """
    if half_life_us <= 0:
        raise ValueError("decay_weighted_stats: half_life_us must be positive")
    import math as _math

    lam = _math.log(2.0) / float(half_life_us)
    t_max = events.agg(F.max(ts_col).alias("__T"))
    w = F.exp(-F.lit(lam) * (F.col("__T") - F.col(ts_col)))
    v = F.col(value_col).cast("double")
    return (
        events.crossJoin(F.broadcast(t_max))
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(w), 6).alias("weight_sum"),
            F.round(F.sum(F.when(v.isNotNull(), w * v)), 6).alias("decayed_value"),
            F.round(
                F.sum(F.when(v.isNotNull(), w * v))
                / F.nullif(F.sum(F.when(v.isNotNull(), w)), F.lit(0.0)),
                6,
            ).alias("ewm_mean"),
        )
    )


def _portable_median(list_col: str, n_col: "F.Column") -> "F.Column":
    """Median of a SORTED array column via the hand-rolled
    lo + frac·(hi − lo) interpolation — identical operand order to the
    DuckDB twins, no round() whose half-boundary semantics could diverge
    (see inter_arrival_stats)."""
    pos = F.lit(0.5) * (n_col - F.lit(1)).cast("double")
    lo = F.floor(pos).cast("int")
    frac = pos - F.floor(pos)
    lov = F.element_at(list_col, lo + F.lit(1)).cast("double")
    hiv = F.element_at(
        list_col, F.least(lo + F.lit(2), n_col.cast("int"))
    ).cast("double")
    return lov + frac * (hiv - lov)


def theil_sen_trend(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Theil–Sen robust trend of each key's per-period event counts:
    (key, n_periods, n_pairs, slope, intercept) with slope = the median
    of all pairwise slopes (y_j−y_i)/(x_j−x_i) and intercept = the
    median of y_i − slope·x_i — the estimator that shrugs off the
    outlier days OLS (and Holt) get dragged by, at a guaranteed 29.3%
    breakdown point.  Keys need ≥ 2 observed periods.

    Scale shape: the pairwise expansion is per-key over the PERIOD
    series (calendar-bounded — p periods → p(p−1)/2 pairs, ~5k at a
    quarter of daily data), one self-equi-join on the key, two keyed
    aggregates.  Medians use the portable interpolation over sorted
    lists, and every output double is unrounded — bit-identical across
    engines by operand-order construction.
    """
    period = _period_bucket(ts_col, period_us).cast("long")
    series = (
        events.groupBy(F.col(key_col).alias("key"), period.alias("__p"))
        .agg(F.count(F.lit(1)).cast("double").alias("__y"))
        .localCheckpoint(eager=False)  # consumed by the pair join twice + residuals
    )
    a = series.select("key", F.col("__p").alias("__p1"), F.col("__y").alias("__y1"))
    b = series.select("key", F.col("__p").alias("__p2"), F.col("__y").alias("__y2"))
    slopes = (
        a.join(b, "key")
        .filter(F.col("__p2") > F.col("__p1"))
        .select(
            "key",
            (
                (F.col("__y2") - F.col("__y1"))
                / (F.col("__p2") - F.col("__p1")).cast("double")
            ).alias("__s"),
        )
    )
    med = slopes.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sort_array(F.collect_list("__s")).alias("__sl"),
    ).select(
        "key",
        "n_pairs",
        _portable_median("__sl", F.col("n_pairs")).alias("slope"),
    )
    resid = (
        series.join(med, "key")
        .select(
            "key",
            "n_pairs",
            "slope",
            (F.col("__y") - F.col("slope") * F.col("__p").cast("double")).alias("__r"),
        )
        .groupBy("key", "n_pairs", "slope")
        .agg(
            F.count(F.lit(1)).alias("n_periods"),
            F.sort_array(F.collect_list("__r")).alias("__rl"),
        )
    )
    return resid.select(
        "key",
        F.col("n_periods").cast("int").alias("n_periods"),
        F.col("n_pairs").cast("long").alias("n_pairs"),
        "slope",
        _portable_median("__rl", F.col("n_periods").cast("long")).alias("intercept"),
    )


def mann_kendall_trend(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    period_us: int = 86_400_000_000,
) -> DataFrame:
    """Mann–Kendall monotone-trend test per key over the per-period event
    counts: (key, n_periods, s_stat, var_s, z) — S = Σ_{i<j}
    sign(y_j − y_i), tie-corrected variance
    (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))/18, and the continuity-corrected
    normal score z = (S∓1)/√var (0 when S = 0).  The non-parametric
    significance companion to :func:`theil_sen_trend`: Theil–Sen says how
    steep, Mann–Kendall says whether the monotone trend is real —
    together the standard robust trend kit.

    Everything is integer arithmetic until the final division and sqrt —
    S and both variance terms are exact counts, so cross-engine parity is
    by construction, with no rounding anywhere.  Keys need ≥ 2 periods;
    an all-tied key has S = 0 (zero variance implies zero S) and reports
    z = 0 — no evidence of trend.

    Scale shape: the same per-key calendar-bounded pair join as
    Theil–Sen plus one (key, count-value) tie census — two keyed
    aggregates, no window, no collect.
    """
    period = _period_bucket(ts_col, period_us).cast("long")
    series = (
        events.groupBy(F.col(key_col).alias("key"), period.alias("__p"))
        .agg(F.count(F.lit(1)).alias("__y"))
        .localCheckpoint(eager=False)  # pair join + tie census + n
    )
    a = series.select("key", F.col("__p").alias("__p1"), F.col("__y").alias("__y1"))
    b = series.select("key", F.col("__p").alias("__p2"), F.col("__y").alias("__y2"))
    s_stat = (
        a.join(b, "key")
        .filter(F.col("__p2") > F.col("__p1"))
        .groupBy("key")
        .agg(
            F.sum(F.signum((F.col("__y2") - F.col("__y1")).cast("double")))
            .cast("long")
            .alias("s_stat")
        )
    )
    n_per = series.groupBy("key").agg(F.count(F.lit(1)).alias("__n"))
    ties = (
        series.groupBy("key", "__y")
        .agg(F.count(F.lit(1)).alias("__t"))
        .groupBy("key")
        .agg(
            F.sum(
                F.col("__t") * (F.col("__t") - 1) * (2 * F.col("__t") + 5)
            ).alias("__tie_term")
        )
    )
    n = F.col("__n")
    var_s = (
        (n * (n - 1) * (2 * n + 5) - F.col("__tie_term")).cast("double") / F.lit(18.0)
    )
    z = F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1).cast("double")).when(
        F.col("s_stat") < 0, (F.col("s_stat") + 1).cast("double")
    ).otherwise(F.lit(0.0)) / F.sqrt(F.nullif(F.col("var_s"), F.lit(0.0)))
    return (
        n_per.filter(n >= 2)
        .join(s_stat, "key")
        .join(ties, "key")
        .withColumn("var_s", var_s)
        .select(
            "key",
            n.cast("int").alias("n_periods"),
            "s_stat",
            "var_s",
            F.when(F.col("s_stat") == 0, F.lit(0.0)).otherwise(z).alias("z"),
        )
    )


def mann_whitney_u(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str = "event_id",
) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) test between two groups: one
    row (n_0, n_1, u_1, mu, sigma, z) — the nonparametric "did variant B
    shift the value DISTRIBUTION" answer, robust where the two-sample
    z/t on means is wrecked by heavy tails.  Completes the package's
    nonparametric kit: Theil–Sen (robust slope), Mann–Kendall (monotone
    trend), Mann–Whitney (group shift).

    Mid-ranks per tied value come from the distributed
    :func:`..functions.ranking.global_rank` — mid = (min+max)/2 over a
    value's contiguous rank block, invariant to tie ordering, so any
    unique ``id_col`` works as the tie-breaker.  U₁ = R₁ − n₁(n₁+1)/2,
    σ carries the standard tie correction, z is continuity-corrected
    (±0.5), all-tied data reports z = 0.  Mid-ranks are exact halves and
    every sum stays below 2^53, so the statistic is bit-portable with no
    rounding.

    Scale shape: one global_rank (two-level bucket prefix sum, no
    single-partition window), one value-keyed aggregate, one scalar
    aggregate.  Groups must be 0/1 (e.g. the shared md5 bucket rule);
    NULL/NaN values are not observations.
    """
    from datalake_indexes_spark.functions.ranking import global_rank

    v = F.col(value_col).cast("double")
    base = df.filter(
        v.isNotNull() & ~F.isnan(v) & F.col(group_col).isin(0, 1)
    ).select(
        F.col(group_col).cast("long").alias("__g"),
        v.alias("__v"),
        F.col(id_col).alias("__id"),
    )
    ranked = global_rank(base, "__v", "__id", ascending=True, out_col="__rk")
    per_val = ranked.groupBy("__v").agg(
        F.min("__rk").alias("__mn"),
        F.max("__rk").alias("__mx"),
        F.count(F.lit(1)).alias("__t"),
        F.sum("__g").alias("__t1"),
    )
    mid = (F.col("__mn") + F.col("__mx")).cast("double") / F.lit(2.0)
    s = per_val.agg(
        F.sum("__t").alias("__n"),
        F.sum("__t1").alias("__n1"),
        F.sum(F.col("__t1").cast("double") * mid).alias("__r1"),
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias("__tie"),
    )
    n = F.col("__n")
    n1 = F.col("__n1")
    n0 = n - n1
    u1 = F.col("__r1") - (n1 * (n1 + 1)).cast("double") / F.lit(2.0)
    mu = (n0 * n1).cast("double") / F.lit(2.0)
    sigma = F.sqrt(
        (n0 * n1).cast("double")
        / F.lit(12.0)
        * (
            (n + 1).cast("double")
            - F.col("__tie").cast("double") / (n * (n - 1)).cast("double")
        )
    )
    diff = u1 - mu
    z = (
        F.when(diff > 0, diff - F.lit(0.5))
        .when(diff < 0, diff + F.lit(0.5))
        .otherwise(F.lit(0.0))
    ) / F.nullif(sigma, F.lit(0.0))
    return s.select(
        n0.alias("n_0"),
        n1.alias("n_1"),
        u1.alias("u_1"),
        mu.alias("mu"),
        sigma.alias("sigma"),
        F.when(diff == 0, F.lit(0.0)).otherwise(z).alias("z"),
    )
