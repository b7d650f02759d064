"""Event-analytics oracle twins.

Split from the former plans/oracle.py (round 9) — pure rearrangement,
every definition verbatim.  Import surface unchanged via the package
``__init__``.
"""

from __future__ import annotations
from datalake_indexes_spark.functions.text import NULLISH_TOKENS, tokenize_sql
from datalake_indexes_spark.sources.catalog import TESTDATA_LAKE_SPEC, LakeTableSpec


def events_window_agg_sql() -> str:
    return """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_sessionize_sql(gap_seconds: int = 1800) -> str:
    """Gap sessionization twin.  Gaps are measured in microseconds
    (``epoch_us``), the one unit shared by sessionize_batch
    (``unix_micros``) and sessionize_stream (``ts_us - end > gap_us``)."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, epoch_us(ts) AS us,
         coalesce(value, 0.0) AS v
  FROM events
),
flagged AS (
  SELECT *, CASE WHEN us - lag(us, 1, 0) OVER (PARTITION BY user_id ORDER BY ts)
                      > {gap_seconds}::BIGINT * 1000000 THEN 1 ELSE 0 END AS ns
  FROM ev
),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*) AS n_events,
       round(sum(v), 2) AS sum_value
FROM sess GROUP BY user_id, sid
"""


def events_json_extract_sql() -> str:
    return """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events
"""


def events_asof_join_sql() -> str:
    """As-of twin via DuckDB's native ASOF LEFT JOIN (independent engine
    machinery — not a re-transcription of the union-window trick).  The
    build side is pre-deduped to the max event_id per (user, ts), the same
    resolution the engine's seq tie-break yields."""
    return """
WITH b AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         max_by(event_id, event_id) AS event_id,
         max_by(value, event_id) AS value
  FROM events WHERE event_type = 'purchase'
  GROUP BY user_id, epoch_us(ts)
),
p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(coalesce(b.event_id, -1) AS BIGINT) AS asof_event_id,
       CAST(coalesce(b.ts_us, -1) AS BIGINT) AS asof_ts_us,
       coalesce(b.value, -1.0) AS asof_value
FROM p ASOF LEFT JOIN b
  ON p.user_id = b.user_id AND p.ts_us >= b.ts_us
"""


def events_range_join_sql(window_us: int = 3_600_000_000) -> str:
    """Range-join twin via a plain inequality join — DuckDB's optimizer
    handles the quadratic at oracle scale; the engine's binned equi-join
    must produce identical aggregates."""
    return f"""
WITH p AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
),
b AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts_us,
       CAST(count(b.user_id) AS BIGINT) AS win_n,
       round(coalesce(sum(b.value), 0.0), 4) AS win_sum_value
FROM p LEFT JOIN b
  ON p.user_id = b.user_id
 AND b.ts_us > p.ts_us - {window_us}
 AND b.ts_us <= p.ts_us
GROUP BY p.event_id, p.user_id, p.ts_us
"""


def events_funnel_sql(steps: list[str]) -> str:
    """Funnel twin: chained conditional-min CTEs, -1 sentinels, depth =
    reached step count."""
    ctes = [
        f"""s1 AS (
  SELECT user_id, min(ts_us) AS step1_us
  FROM e WHERE event_type = '{steps[0]}' GROUP BY user_id
)"""
    ]
    for i, step in enumerate(steps[1:], start=2):
        ctes.append(
            f"""s{i} AS (
  SELECT user_id, min(ts_us) AS step{i}_us
  FROM e JOIN s{i - 1} USING (user_id)
  WHERE event_type = '{step}' AND ts_us >= step{i - 1}_us
  GROUP BY user_id
)"""
        )
    n = len(steps)
    sel = ["s1.user_id", "s1.step1_us"]
    depth = ["1"]
    joins = []
    for i in range(2, n + 1):
        sel.append(f"CAST(coalesce(s{i}.step{i}_us, -1) AS BIGINT) AS step{i}_us")
        depth.append(f"CASE WHEN s{i}.step{i}_us IS NOT NULL THEN 1 ELSE 0 END")
        joins.append(f"LEFT JOIN s{i} USING (user_id)")
    return f"""
WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type FROM events),
{', '.join(ctes)}
SELECT {', '.join(sel)}, CAST({' + '.join(depth)} AS INT) AS depth
FROM s1 {' '.join(joins)}
"""


def events_rollup_sql() -> str:
    """OLAP rollup twin: GROUPING(a, b) uses the same bitmask convention
    (last dim = least-significant bit) as Spark's grouping_id().  avg is
    written sum/count on both engines so no engine-specific mean
    summation order enters the hash."""
    return """
WITH ev AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         value
  FROM events
)
SELECT event_type, window_start,
       CAST(GROUPING(event_type, window_start) AS INT) AS grouping_id,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM ev GROUP BY ROLLUP (event_type, window_start)
"""


def events_cohort_sql(period_us: int = 86_400_000_000) -> str:
    """Cohort-retention twin: integer floor-division period indices over
    epoch microseconds — no calendar machinery on either engine."""
    return f"""
WITH act AS (
  SELECT DISTINCT user_id AS k,
         CAST(epoch_us(ts) // {period_us} AS BIGINT) AS p
  FROM events
),
coh AS (SELECT k, min(p) AS c FROM act GROUP BY k)
SELECT c AS cohort_period, p - c AS period_offset, count(*) AS n_active
FROM act JOIN coh USING (k)
GROUP BY 1, 2
"""


def events_anomaly_sql(z_threshold: float = 2.5) -> str:
    """Z-score outlier twin: population moments via the identical
    sum/sum-of-squares closed form (no engine-native stddev, whose
    summation strategy would differ)."""
    return f"""
WITH s AS (
  SELECT event_type,
         sum(value) / count(value) AS m,
         sqrt(sum(value * value) / count(value)
              - (sum(value) / count(value)) * (sum(value) / count(value))) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type AS grp, CAST(e.value AS DOUBLE) AS value,
       round((e.value - s.m) / s.sd, 3) AS z
FROM events e JOIN s USING (event_type)
WHERE s.sd > 0 AND abs((e.value - s.m) / s.sd) > {z_threshold}
"""


def events_anomaly_seasonal_sql(z_threshold: float = 2.5) -> str:
    """Seasonal-anomaly twin: identical closed-form moments per
    (event_type, hour-of-day) cell."""
    return f"""
WITH e AS (
  SELECT event_id, event_type AS grp,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS bucket,
         CAST(value AS DOUBLE) AS v
  FROM events
),
s AS (
  SELECT grp, bucket,
         sum(v) / count(v) AS m,
         sqrt(sum(v * v) / count(v) - (sum(v) / count(v)) * (sum(v) / count(v))) AS sd
  FROM e GROUP BY 1, 2
)
SELECT e.event_id, e.grp, e.bucket, e.v AS value,
       round((e.v - s.m) / s.sd, 3) AS z
FROM e JOIN s USING (grp, bucket)
WHERE s.sd > 0 AND abs((e.v - s.m) / s.sd) > {z_threshold}
"""


def events_rolling_sql(window_rows: int = 3) -> str:
    """Rolling-feature twin: identical (key, ts, id) total ordering and
    identical window frames — trailing mean excludes the current row on
    both engines (no label leakage)."""
    return f"""
SELECT event_id,
       user_id AS key,
       epoch_us(ts) AS ts_us,
       CAST(value AS DOUBLE) AS value,
       row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS seq,
       lag(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_value,
       round(avg(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN {window_rows} PRECEDING AND 1 PRECEDING), 4) AS trail_mean,
       max(CAST(value AS DOUBLE)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_max
FROM events
"""


def events_growth_sql(period_us: int = 86_400_000_000) -> str:
    """Growth-accounting twin: same integer period indices, same
    active/new/cumulative definitions."""
    return f"""
WITH act AS (
  SELECT DISTINCT user_id AS k,
         CAST(epoch_us(ts) // {period_us} AS BIGINT) AS period
  FROM events
),
f AS (SELECT k, min(period) AS fp FROM act GROUP BY k),
d AS (
  SELECT period, count(*) AS n_active,
         sum(CASE WHEN period = fp THEN 1 ELSE 0 END) AS n_new
  FROM act JOIN f USING (k) GROUP BY period
)
SELECT period, n_active, CAST(n_new AS BIGINT) AS n_new,
       CAST(sum(n_new) OVER (ORDER BY period
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM d
"""


def events_resample_sql(period_us: int = 86_400_000_000) -> str:
    """Forward-fill resampling twin: same per-(key, period) rounded
    aggregate, same dense grid (key's first period .. global last), same
    last-non-null fill."""
    return f"""
WITH daily AS (
  SELECT user_id AS key,
         CAST(epoch_us(ts) // {period_us} AS BIGINT) AS period,
         round(sum(value), 4) AS obs
  FROM events GROUP BY 1, 2
),
g AS (SELECT max(period) AS gmax FROM daily),
lo AS (SELECT key, min(period) AS klo FROM daily GROUP BY key),
grid AS (
  SELECT key, unnest(generate_series(klo, gmax)) AS period FROM lo, g
)
SELECT grid.key, grid.period,
       last_value(obs IGNORE NULLS) OVER (
         PARTITION BY grid.key ORDER BY grid.period
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value,
       obs IS NOT NULL AS observed
FROM grid LEFT JOIN daily
  ON daily.key = grid.key AND daily.period = grid.period
"""


def events_cube_sql() -> str:
    """CUBE twin of :func:`events_rollup_sql` — adds the (window-only)
    cross level via GROUP BY CUBE."""
    return """
WITH ev AS (
  SELECT event_type,
         strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
         value
  FROM events
)
SELECT event_type, window_start,
       CAST(GROUPING(event_type, window_start) AS INT) AS grouping_id,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(sum(value) / count(*), 4) AS avg_value
FROM ev GROUP BY CUBE (event_type, window_start)
"""


def events_anomaly_running_sql(z_threshold: float = 3.0, min_obs: int = 5) -> str:
    """Running-anomaly twin: identical prior-only expanding moments
    (count/sum/sum-of-squares window frames), identical warm-up and
    positive-variance gates."""
    return f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS tu, CAST(value AS DOUBLE) AS v
  FROM events
),
m AS (
  SELECT event_id, user_id, v,
         count(v) OVER w AS n,
         sum(v) OVER w AS s,
         sum(v * v) OVER w AS ss
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id AS key, v AS value,
       round((v - s / n) / sqrt(ss / n - (s / n) * (s / n)), 3) AS z
FROM m
WHERE n >= {min_obs}
  AND sqrt(ss / n - (s / n) * (s / n)) > 0
  AND abs((v - s / n) / sqrt(ss / n - (s / n) * (s / n))) > {z_threshold}
"""


def events_scd2_sql() -> str:
    """Twin of :func:`..operators.events.scd2_history` over per-user
    event_type observations (Kimball SCD-2 dimension build)."""
    return """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
ordered AS (
  SELECT user_id, event_type, ts_us, event_id,
         lag(event_type) OVER w AS prev,
         row_number() OVER w AS rn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, event_type, ts_us, event_id FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM event_type
)
SELECT user_id, event_type, ts_us AS valid_from,
       coalesce(lead(ts_us) OVER w2, -1) AS valid_to,
       row_number() OVER w2 AS version
FROM starts
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)
"""


def events_seasonality_sql() -> str:
    """Seasonality twin: identical integer bucket arithmetic on epoch-µs
    (epoch day 0 = Thursday), uniformity lift from re-aggregated buckets."""
    return """
WITH e AS (SELECT event_type AS grp, epoch_us(ts) AS ts_us, value FROM events),
b AS (
  SELECT grp, 'hod' AS period_type,
         CAST((ts_us // 3600000000) % 24 AS BIGINT) AS bucket, value FROM e
  UNION ALL
  SELECT grp, 'dow' AS period_type,
         CAST(((ts_us // 86400000000) + 4) % 7 AS BIGINT) AS bucket, value FROM e
),
agg AS (
  SELECT grp, period_type, bucket,
         count(*) AS n_events, round(avg(value) + 1e-9, 4) AS avg_value
  FROM b GROUP BY 1, 2, 3
),
tot AS (SELECT grp, period_type, sum(n_events) AS total FROM agg GROUP BY 1, 2)
SELECT grp, period_type, bucket, n_events, avg_value,
       round(n_events * (CASE period_type WHEN 'hod' THEN 24 ELSE 7 END)
             / CAST(total AS DOUBLE), 4) AS lift
FROM agg JOIN tot USING (grp, period_type)
"""


def events_json_profile_sql() -> str:
    """Twin of :func:`..operators.discovery.json_key_profile` over the
    SAME planted props (tag/score/flag/note derived from event_id)."""
    return """
WITH planted AS (
  SELECT event_id,
         '{' || concat_ws(', ',
           '"k": ' || json_extract_string(props, '$.k'),
           CASE WHEN event_id % 3 = 0
                THEN '"tag": "t' || (event_id % 7) || '"' END,
           CASE WHEN event_id % 5 = 0
                THEN '"score": ' || (event_id % 100) || '.5' END,
           CASE WHEN event_id % 7 = 0
                THEN CASE WHEN event_id % 2 = 0 THEN '"flag": true'
                          ELSE '"flag": false' END END,
           CASE WHEN event_id % 11 = 0 THEN '"note": null' END
         ) || '}' AS props
  FROM events
),
keys AS (
  SELECT event_id, props, unnest(json_keys(props)) AS key FROM planted
),
typed AS (
  SELECT key, json_extract_string(props, '$."' || key || '"') AS value,
         CASE WHEN json_extract_string(props, '$."' || key || '"') IS NULL
                THEN 'null'
              WHEN regexp_full_match(
                     json_extract_string(props, '$."' || key || '"'),
                     '-?[0-9]+') THEN 'int'
              WHEN regexp_full_match(
                     json_extract_string(props, '$."' || key || '"'),
                     '-?[0-9]+\\.[0-9]+') THEN 'float'
              WHEN json_extract_string(props, '$."' || key || '"')
                     IN ('true', 'false') THEN 'bool'
              ELSE 'string' END AS t
  FROM keys
),
pt AS (SELECT key, t, count(*) AS n FROM typed GROUP BY 1, 2),
top AS (SELECT key, first(t ORDER BY n DESC, t) AS top_type FROM pt GROUP BY key),
stats AS (
  SELECT key, count(*) AS n_present, count(DISTINCT value) AS n_distinct
  FROM typed GROUP BY key
),
tot AS (SELECT count(*) AS total FROM events)
SELECT s.key, s.n_present,
       round(s.n_present * 1.0 / t.total + 1e-9, 4) AS coverage,
       s.n_distinct, top.top_type
FROM stats s CROSS JOIN tot t JOIN top ON top.key = s.key
"""


def events_session_paths_sql(gap_seconds: int = 1800, n: int = 3, k: int = 20) -> str:
    """Session-path twin: same gap rule, (ts, event_id) ordering, sliding
    n-gram over each session's type list."""
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT *, CASE WHEN ts_us - coalesce(lag(ts_us) OVER w, 0) > {gap_us}
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sid AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS s
  FROM flagged
),
seqs AS (
  SELECT list(event_type ORDER BY ts_us, event_id) AS types
  FROM sid GROUP BY user_id, s
  HAVING count(*) >= {n}
),
grams AS (
  SELECT unnest(list_transform(
           range(1, len(types) - {n - 2}),
           i -> array_to_string(types[i:i+{n - 1}], '>'))) AS path
  FROM seqs
),
counts AS (SELECT path, count(*) AS n_occurrences FROM grams GROUP BY 1)
SELECT path, n_occurrences, rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, path) AS rank
  FROM counts
) WHERE rank <= {k}
"""


def events_transitions_sql() -> str:
    """Twin of :func:`..operators.events.event_transitions` over per-user
    event streams."""
    return """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
pairs AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS from_type,
         event_type AS to_type
  FROM ev
),
counts AS (
  SELECT from_type, to_type, count(*) AS n
  FROM pairs WHERE from_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT c.from_type, c.to_type, c.n,
       round(c.n * 1.0 / sum(c.n) OVER (PARTITION BY c.from_type), 6) AS p
FROM counts c
"""


def events_concurrency_sql(gap_seconds: int = 1800) -> str:
    """Twin of sessionize → :func:`..operators.events.concurrency_curve`:
    concurrent open sessions at every change point (inclusive ends —
    release at end+1)."""
    return f"""
WITH ev AS (
  SELECT user_id, ts, epoch_us(ts) AS us FROM events
),
flagged AS (
  SELECT *, CASE WHEN us - lag(us, 1, 0) OVER (PARTITION BY user_id ORDER BY ts)
                      > {gap_seconds}::BIGINT * 1000000 THEN 1 ELSE 0 END AS ns
  FROM ev
),
sess AS (
  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
),
iv AS (
  SELECT epoch_us(min(ts)) AS s, epoch_us(max(ts)) AS e
  FROM sess GROUP BY user_id, sid
),
deltas AS (
  SELECT ts_us, sum(d) AS delta FROM (
    SELECT s AS ts_us, 1 AS d FROM iv
    UNION ALL
    SELECT e + 1 AS ts_us, -1 AS d FROM iv
  ) GROUP BY ts_us
)
SELECT ts_us,
       CAST(sum(delta) OVER (ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS concurrent
FROM deltas
"""


def events_twap_sql() -> str:
    """Twin of :func:`..operators.events.time_weighted_avg` per user."""
    return """
WITH ev AS (
  SELECT user_id, value, epoch_us(ts) AS us, event_id FROM events
),
gapped AS (
  SELECT user_id, value,
         CAST(lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id) - us
              AS DOUBLE) AS dt
  FROM ev
)
SELECT user_id,
       round(coalesce(sum(value * dt) / sum(dt), avg(value)), 6) AS twap,
       count(*) AS n_obs
FROM gapped GROUP BY user_id
"""


def events_item_pairs_sql(min_support: int = 2) -> str:
    """Twin of :func:`..operators.events.frequent_event_pairs` over
    user-id baskets of event types."""
    return f"""
WITH bi AS (
  SELECT DISTINCT user_id AS basket, event_type AS item FROM events
),
sup AS (
  SELECT item, count(*) AS s FROM bi GROUP BY item
  HAVING count(*) >= {min_support}
),
pruned AS (
  SELECT bi.basket, bi.item FROM bi JOIN sup ON bi.item = sup.item
),
pairs AS (
  SELECT a.item AS item_1, b.item AS item_2, count(*) AS n_baskets
  FROM pruned a JOIN pruned b ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING count(*) >= {min_support}
),
tot AS (SELECT count(DISTINCT basket) AS n FROM bi)
SELECT item_1, item_2, n_baskets,
       round(n_baskets * 1.0 / s1.s, 6) AS confidence,
       round(n_baskets * 1.0 * tot.n / (s1.s * s2.s), 6) AS lift
FROM pairs
JOIN sup s1 ON pairs.item_1 = s1.item
JOIN sup s2 ON pairs.item_2 = s2.item
CROSS JOIN tot
"""


def events_dedup_bursts_sql(tolerance_us: int) -> str:
    """Twin of :func:`..operators.events.dedup_bursts` on
    (user_id, event_type) with event_id tie-break."""
    return f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
),
g AS (
  SELECT *,
         CASE WHEN ts_us - lag(ts_us) OVER w IS NULL
                   OR ts_us - lag(ts_us) OVER w > {tolerance_us}
              THEN 1 ELSE 0 END AS nb
  FROM e
  WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts_us, event_id)
),
b AS (
  SELECT *,
         sum(nb) OVER (PARTITION BY user_id, event_type
                       ORDER BY ts_us, event_id
                       ROWS UNBOUNDED PRECEDING) AS burst
  FROM g
),
sel AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, event_type, burst
                            ORDER BY ts_us, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id, event_type, burst)
           AS burst_size,
         max(ts_us) OVER (PARTITION BY user_id, event_type, burst)
           - min(ts_us) OVER (PARTITION BY user_id, event_type, burst)
           AS burst_span_us
  FROM b
)
SELECT user_id, event_type, ts_us, event_id, burst_size, burst_span_us
FROM sel WHERE rn = 1
"""


def events_trend_sql(x_origin_us: int, round_to: int = 6) -> str:
    """Twin of :func:`..operators.events.value_trend` — identical closed
    form over identical doubles (x in days since the shared origin)."""
    return f"""
WITH e AS (
  SELECT event_type,
         (CAST(epoch_us(ts) AS DOUBLE) - {float(x_origin_us)})
           / (86400.0 * 1000000.0) AS x,
         CAST(value AS DOUBLE) AS y
  FROM events
),
a AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sx2, sum(y * y) AS sy2
  FROM e GROUP BY event_type
),
s AS (
  SELECT event_type, n,
         sx2 - sx * sx / n AS ssxx,
         sy2 - sy * sy / n AS ssyy,
         sxy - sx * sy / n AS ssxy,
         sx, sy
  FROM a
),
t AS (
  SELECT event_type, n,
         CASE WHEN n >= 2 AND ssxx > 0 THEN ssxy / ssxx END AS slope,
         ssxx, ssyy, ssxy, sx, sy
  FROM s
)
SELECT event_type, n,
       round(slope, {round_to}) AS slope_per_day,
       round((sy - slope * sx) / n, {round_to}) AS intercept,
       round(CASE WHEN slope IS NULL THEN NULL
                  WHEN ssyy > 0 THEN (ssxy * ssxy) / (ssxx * ssyy)
                  ELSE 0.0 END, {round_to}) AS r2
FROM t
"""


def events_attribution_sql(lookback_us: int) -> str:
    """Twin of :func:`..operators.events.last_touch_attribution` —
    clicks attributed to the latest in-window view (ties to the larger
    view id), left semantics."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
c AS (SELECT event_id, user_id, ts_us FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS vid, user_id, ts_us AS vts
      FROM e WHERE event_type = 'view'),
j AS (
  SELECT c.event_id, v.vid, v.vts,
         row_number() OVER (PARTITION BY c.event_id
                            ORDER BY v.vts DESC, v.vid DESC) AS rn
  FROM c JOIN v
    ON v.user_id = c.user_id
   AND v.vts <= c.ts_us AND v.vts >= c.ts_us - {lookback_us}
),
w AS (SELECT event_id, vid, vts FROM j WHERE rn = 1)
SELECT c.event_id, c.user_id, c.ts_us,
       coalesce(w.vid, -1) AS attributed_id,
       coalesce(w.vts, -1) AS attributed_ts_us,
       coalesce(c.ts_us - w.vts, -1) AS attribution_lag_us
FROM c LEFT JOIN w ON w.event_id = c.event_id
"""


def events_interval_pairs_sql(lookback_us: int) -> str:
    """Twin of the stream-stream interval join's candidate pairs."""
    return f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us FROM events
),
c AS (SELECT event_id AS probe_id, user_id AS key, ts_us AS probe_ts_us
      FROM e WHERE event_type = 'click'),
v AS (SELECT event_id AS build_id, user_id, ts_us AS build_ts_us
      FROM e WHERE event_type = 'view')
SELECT c.probe_id, c.key, c.probe_ts_us, v.build_id, v.build_ts_us
FROM c JOIN v
  ON v.user_id = c.key
 AND v.build_ts_us <= c.probe_ts_us
 AND v.build_ts_us >= c.probe_ts_us - {lookback_us}
"""


def inter_arrival_stats_sql() -> str:
    """Inter-arrival twin: identical (ts, event_id) total order for the
    lag, the SAME hand-rolled lo + frac·(hi − lo) interpolation over
    sorted integer microsecond gaps, and NO rounding anywhere — every
    output double is the identical IEEE value on both engines (round()
    half-boundary semantics differ between them)."""

    def interp(qlit: str) -> str:
        # CAST the quantile literal to DOUBLE: DuckDB parses 0.95 as
        # DECIMAL, whose exact frac diverges from Spark's double 0.95
        q = f"CAST({qlit} AS DOUBLE)"
        return f"""(CAST(gl[CAST(floor({q} * (n_gaps - 1)) AS INT) + 1] AS DOUBLE)
        + ({q} * (n_gaps - 1) - floor({q} * (n_gaps - 1)))
          * (CAST(gl[least(CAST(floor({q} * (n_gaps - 1)) AS INT) + 2,
                           CAST(n_gaps AS INT))] AS DOUBLE)
             - CAST(gl[CAST(floor({q} * (n_gaps - 1)) AS INT) + 1] AS DOUBLE)))"""

    return f"""
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
            PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ) AS gap_us
  FROM events
),
a AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         avg(gap_us) AS mean_us, max(gap_us) AS max_us,
         list_sort(list(gap_us)) AS gl
  FROM g WHERE gap_us IS NOT NULL GROUP BY 1
)
SELECT user_id, n_gaps,
       mean_us AS mean_gap_us,
       {interp("0.5")} AS p50_gap_us,
       {interp("0.95")} AS p95_gap_us,
       CAST(max_us AS DOUBLE) AS max_gap_us
FROM a
"""


def rolling_active_users_sql(
    window_periods: int = 7, period_us: int = 86_400_000_000
) -> str:
    """WAU twin: same contribute-forward decomposition (each distinct
    (user, period) row feeds the ``window_periods`` periods it keeps
    alive), same last-observed-period bound."""
    w = int(window_periods)
    return f"""
WITH act AS MATERIALIZED (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / {period_us}) AS BIGINT) AS period
  FROM events
),
bounds AS (SELECT max(period) AS hi FROM act),
contrib AS (
  SELECT a.user_id, a.period + o.o AS period
  FROM act a, (SELECT unnest(generate_series(0, {w - 1})) AS o) o
),
daily AS (SELECT period, count(*) AS n_active FROM act GROUP BY 1),
rolling AS (
  SELECT c.period, count(DISTINCT c.user_id) AS rolling_active
  FROM contrib c, bounds b WHERE c.period <= b.hi GROUP BY 1
)
SELECT r.period, coalesce(d.n_active, 0) AS n_active, r.rolling_active,
       round(coalesce(d.n_active, 0) * 1.0 / r.rolling_active, 6) AS stickiness
FROM rolling r LEFT JOIN daily d ON d.period = r.period
"""


def rolling_forecast_backtest_sql(window_rows: int = 5) -> str:
    """Per-key rolling-OLS backtest twin: identical sequence-number
    regressor, identical exact-DECIMAL value-side window sums (order-
    independent, so DuckDB's segment-tree sliding frames agree with
    Spark's frame replay bit for bit), identical closed form in doubles."""
    w = int(window_rows)
    return f"""
WITH base AS (
  SELECT user_id AS key, CAST(value AS DOUBLE) AS y,
         epoch_us(ts) AS tsu, event_id
  FROM events WHERE value IS NOT NULL
),
seqd AS (
  SELECT key, y,
         CAST(row_number() OVER (PARTITION BY key ORDER BY tsu, event_id) AS BIGINT) AS x,
         lag(y, 1) OVER (PARTITION BY key ORDER BY tsu, event_id) AS prev
  FROM base
),
fitted AS (
  SELECT key, y, x, prev,
         count(*) OVER tw AS n,
         sum(x) OVER tw AS sx,
         sum(x * x) OVER tw AS sxx,
         sum(CAST(round(y, 6) AS DECIMAL(28,6))) OVER tw AS syd,
         sum(x * CAST(round(y, 6) AS DECIMAL(28,6))) OVER tw AS sxyd
  FROM seqd
  WINDOW tw AS (PARTITION BY key ORDER BY x
                ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)
),
scored AS (
  SELECT key,
         y - ((CAST(syd AS DOUBLE)
               - ((CAST(n AS DOUBLE) * CAST(sxyd AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(syd AS DOUBLE))
                  / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
              + ((CAST(n AS DOUBLE) * CAST(sxyd AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(syd AS DOUBLE))
                 / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0))
                * CAST(x AS DOUBLE)) AS err,
         y - prev AS nerr
  FROM fitted WHERE n = {w}
),
agg AS (
  SELECT key, count(*) AS n_forecasts,
         avg(abs(err)) AS mae0,
         sqrt(avg(err * err)) AS rmse0,
         avg(err) AS bias0,
         avg(abs(nerr)) AS nmae0
  FROM scored WHERE err IS NOT NULL GROUP BY 1
)
SELECT key, CAST(n_forecasts AS BIGINT) AS n_forecasts,
       round(mae0, 4) AS mae,
       round(rmse0, 4) AS rmse,
       round(bias0, 4) + 0.0 AS bias,
       round(nmae0, 4) AS naive_mae,
       round(1.0 - mae0 / nullif(nmae0, 0.0), 4) + 0.0 AS skill
FROM agg
"""


def survival_curve_sql(
    period_us: int = 86_400_000_000, censor_horizon_periods: int = 7
) -> str:
    """Kaplan–Meier twin: identical integer-floor durations, identical
    censoring rule, identical exp(Σ ln(1−d/n)) cumulative form with the
    d == n step excluded from the log sum and tracked as a zero flag
    (Spark's ln(0) is NULL and sum() skips it — both engines must agree
    on the explicit handling instead)."""
    p = int(period_us)
    h = int(censor_horizon_periods) * p
    return f"""
WITH t0 AS (SELECT min(epoch_us(ts)) AS t0 FROM events),
planted AS (
  SELECT e.user_id, epoch_us(e.ts) AS tsu
  FROM events e, t0
  WHERE epoch_us(e.ts) < t0.t0 + ((e.user_id % 40) + 1) * 86400000000
),
spans AS (
  SELECT user_id, min(tsu) AS first_ts, max(tsu) AS last_ts
  FROM planted GROUP BY 1
),
bounds AS (SELECT max(last_ts) AS corpus_last FROM spans),
per_key AS (
  SELECT (last_ts - first_ts - ((last_ts - first_ts) % {p})) // {p} AS duration,
         (last_ts >= b.corpus_last - {h}) AS censored
  FROM spans, bounds b
),
counts AS (
  SELECT duration,
         sum(CASE WHEN censored THEN 0 ELSE 1 END) AS n_events,
         sum(CASE WHEN censored THEN 1 ELSE 0 END) AS n_censored
  FROM per_key GROUP BY 1
),
risk AS (
  SELECT duration, n_events, n_censored,
         sum(n_events + n_censored) OVER () -
           coalesce(sum(n_events + n_censored) OVER (
             ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS at_risk
  FROM counts
),
curve AS (
  SELECT duration, at_risk, n_events, n_censored,
         coalesce(sum(CASE WHEN n_events < at_risk
                           THEN ln(1.0 - n_events * 1.0 / at_risk) END)
           OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
           AS logs,
         sum(CASE WHEN n_events = at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY duration ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS dead
  FROM risk
)
SELECT duration,
       CAST(at_risk AS BIGINT) AS n_at_risk,
       CAST(n_events AS BIGINT) AS n_events,
       CAST(n_censored AS BIGINT) AS n_censored,
       CASE WHEN dead > 0 THEN 0.0 ELSE round(exp(logs), 6) END AS survival,
       n_events > 0 AS is_event_time
FROM curve
"""


def ab_conversion_test_sql(
    convert_type: str = "purchase",
    baseline_type: str = "click",
    z_crit: float = 1.959963984540054,
) -> str:
    """Two-proportion z twin: same md5-bucket variant assignment (the
    package's shared bucket rule), same scale-free more-X-than-Y
    conversion, same pooled-SE closed form, NaN on zero pooled
    variance."""
    se = ("sqrt(((conv_a + conv_b) * 1.0 / (n_a + n_b))"
          " * (1.0 - (conv_a + conv_b) * 1.0 / (n_a + n_b))"
          " * (1.0 / n_a + 1.0 / n_b))")
    z = (f"CASE WHEN {se} > 0 THEN"
         f" (conv_a * 1.0 / n_a - conv_b * 1.0 / n_b) / {se}"
         f" ELSE 'NaN'::DOUBLE END")
    return f"""
WITH per_user AS (
  SELECT user_id,
         CASE WHEN sum(CASE WHEN event_type = '{convert_type}' THEN 1 ELSE 0 END)
                 > sum(CASE WHEN event_type = '{baseline_type}' THEN 1 ELSE 0 END)
              THEN 1 ELSE 0 END AS conv
  FROM events GROUP BY 1
),
tagged AS (
  SELECT conv,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS v
  FROM per_user
),
agg AS (
  SELECT sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a,
         sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n_b,
         sum(CASE WHEN v = 0 THEN conv ELSE 0 END) AS conv_a,
         sum(CASE WHEN v = 1 THEN conv ELSE 0 END) AS conv_b
  FROM tagged
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(conv_a AS BIGINT) AS conv_a, CAST(conv_b AS BIGINT) AS conv_b,
       round(conv_a * 1.0 / n_a, 6) AS rate_a,
       round(conv_b * 1.0 / n_b, 6) AS rate_b,
       round((conv_a * 1.0 / n_a) / nullif(conv_b * 1.0 / n_b, 0.0) - 1.0, 6) AS lift,
       round({z}, 4) AS z_score,
       CASE WHEN {se} > 0 THEN abs({z}) > CAST({z_crit!r} AS DOUBLE) ELSE false END AS significant
FROM agg
"""


def cusum_changepoints_sql(
    period_us: int = 86_400_000_000,
    score_crit: float = 1.358,
    plant_predicate: str | None = None,
) -> str:
    """CUSUM twin: identical dense per-type period grid, identical
    integer-exact cumulative counts, identical surplus/score closed
    forms, earliest-period argmax tie-break.  ``plant_predicate``
    optionally filters the events first (mirrors a planted rate
    shift)."""
    p = int(period_us)
    where = f"WHERE {plant_predicate}" if plant_predicate else ""
    return f"""
WITH ev AS (
  SELECT event_type,
         (epoch_us(ts) - (epoch_us(ts) % {p})) // {p} AS period
  FROM events {where}
),
counts AS (
  SELECT event_type, period, count(*) AS c FROM ev GROUP BY 1, 2
),
bounds AS (SELECT min(period) AS lo, max(period) AS hi FROM counts),
grid AS (
  SELECT t.event_type, g.period
  FROM (SELECT DISTINCT event_type FROM counts) t,
       (SELECT unnest(generate_series((SELECT lo FROM bounds),
                                      (SELECT hi FROM bounds))) AS period) g
),
dense AS (
  SELECT g.event_type, g.period, coalesce(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c
    ON c.event_type = g.event_type AND c.period = g.period
),
scored AS (
  SELECT event_type, period,
         abs(CAST(sum(c) OVER (PARTITION BY event_type ORDER BY period
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             - CAST(row_number() OVER (PARTITION BY event_type ORDER BY period) AS DOUBLE)
               * (CAST(sum(c) OVER (PARTITION BY event_type) AS DOUBLE)
                  / CAST(count(*) OVER (PARTITION BY event_type) AS DOUBLE))) AS a,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(c) OVER (PARTITION BY event_type) AS tot,
         sum(c * c) OVER (PARTITION BY event_type) AS sq
  FROM dense
),
best AS (
  SELECT event_type, any_value(n) AS n_periods, max(a) AS amax,
         any_value(tot) AS tot, any_value(sq) AS sq
  FROM scored GROUP BY 1
),
arg AS (
  SELECT s.event_type, min(s.period) AS change_period
  FROM scored s JOIN best b ON b.event_type = s.event_type AND s.a = b.amax
  GROUP BY 1
)
SELECT b.event_type,
       CAST(b.n_periods AS BIGINT) AS n_periods,
       a.change_period,
       round(b.amax, 6) AS max_cusum_abs,
       round(CASE WHEN CAST(b.sq AS DOUBLE) / b.n_periods
                       - (CAST(b.tot AS DOUBLE) / b.n_periods)
                         * (CAST(b.tot AS DOUBLE) / b.n_periods) > 0
                  THEN b.amax / (sqrt(CAST(b.sq AS DOUBLE) / b.n_periods
                                      - (CAST(b.tot AS DOUBLE) / b.n_periods)
                                        * (CAST(b.tot AS DOUBLE) / b.n_periods))
                                 * sqrt(CAST(b.n_periods AS DOUBLE))) END, 6) AS score,
       coalesce(CASE WHEN CAST(b.sq AS DOUBLE) / b.n_periods
                          - (CAST(b.tot AS DOUBLE) / b.n_periods)
                            * (CAST(b.tot AS DOUBLE) / b.n_periods) > 0
                     THEN b.amax / (sqrt(CAST(b.sq AS DOUBLE) / b.n_periods
                                         - (CAST(b.tot AS DOUBLE) / b.n_periods)
                                           * (CAST(b.tot AS DOUBLE) / b.n_periods))
                                    * sqrt(CAST(b.n_periods AS DOUBLE)))
                          > CAST({score_crit!r} AS DOUBLE) END, false) AS change_flag
FROM best b JOIN arg a ON a.event_type = b.event_type
"""


def ab_cuped_test_sql(
    metric_type: str = "purchase", z_crit: float = 1.959963984540054
) -> str:
    """CUPED twin: same integer midpoint split, same md5 variant rule,
    same exact integer moment sums, same algebraic expansion of the
    adjusted means/variances (expression trees mirrored term for term)."""
    return f"""
WITH mid AS (
  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS m FROM events
),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN epoch_us(ts) < mid.m
                  AND event_type = '{metric_type}' THEN 1 ELSE 0 END) AS x,
         sum(CASE WHEN epoch_us(ts) >= mid.m
                  AND event_type = '{metric_type}' THEN 1 ELSE 0 END) AS y
  FROM events, mid GROUP BY user_id, mid.m
),
tagged AS (
  SELECT x, y,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 2 AS v
  FROM per_user
),
agg AS (
  SELECT
    sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS n_a,
    sum(CASE WHEN v = 0 THEN x ELSE 0 END) AS sx_a,
    sum(CASE WHEN v = 0 THEN y ELSE 0 END) AS sy_a,
    sum(CASE WHEN v = 0 THEN x * x ELSE 0 END) AS sxx_a,
    sum(CASE WHEN v = 0 THEN y * y ELSE 0 END) AS syy_a,
    sum(CASE WHEN v = 0 THEN x * y ELSE 0 END) AS sxy_a,
    sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS n_b,
    sum(CASE WHEN v = 1 THEN x ELSE 0 END) AS sx_b,
    sum(CASE WHEN v = 1 THEN y ELSE 0 END) AS sy_b,
    sum(CASE WHEN v = 1 THEN x * x ELSE 0 END) AS sxx_b,
    sum(CASE WHEN v = 1 THEN y * y ELSE 0 END) AS syy_b,
    sum(CASE WHEN v = 1 THEN x * y ELSE 0 END) AS sxy_b
  FROM tagged
),
pooled AS (
  SELECT *,
    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS n,
    (CAST(sx_a AS DOUBLE) + CAST(sx_b AS DOUBLE))
      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS xbar,
    (CAST(sy_a AS DOUBLE) + CAST(sy_b AS DOUBLE))
      / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) AS ybar
  FROM agg
),
stats AS (
  SELECT *,
    (CAST(sxx_a AS DOUBLE) + CAST(sxx_b AS DOUBLE)) / n - xbar * xbar AS var_x,
    (CAST(syy_a AS DOUBLE) + CAST(syy_b AS DOUBLE)) / n - ybar * ybar AS var_y,
    (CAST(sxy_a AS DOUBLE) + CAST(sxy_b AS DOUBLE)) / n - xbar * ybar AS cov
  FROM pooled
),
theta_t AS (SELECT *, cov / nullif(var_x, 0.0) AS theta FROM stats),
var_t AS (
  SELECT *, var_y - 2.0 * theta * cov + theta * theta * var_x AS var_adj
  FROM theta_t
),
sides AS (
  SELECT *,
    CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - theta * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE) - xbar) AS ma,
    CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - theta * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE) - xbar) AS mb,
    CAST(syy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS vya,
    CAST(syy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS vyb,
    CAST(sxx_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS vxa,
    CAST(sxx_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS vxb,
    CAST(sxy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      - (CAST(sx_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)) AS cva,
    CAST(sxy_b AS DOUBLE) / CAST(n_b AS DOUBLE)
      - (CAST(sx_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE)) AS cvb
  FROM var_t
),
final AS (
  SELECT *,
    vya - 2.0 * theta * cva + theta * theta * vxa AS vaa,
    vyb - 2.0 * theta * cvb + theta * theta * vxb AS vab
  FROM sides
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       round(theta, 6) AS theta,
       round(var_adj / nullif(var_y, 0.0), 6) AS var_reduction,
       round(ma, 6) AS mean_adj_a,
       round(mb, 6) AS mean_adj_b,
       round(CASE WHEN vya / CAST(n_a AS DOUBLE) + vyb / CAST(n_b AS DOUBLE) > 0
                  THEN (CAST(sy_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                        - CAST(sy_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                       / sqrt(vya / CAST(n_a AS DOUBLE)
                              + vyb / CAST(n_b AS DOUBLE)) END, 4) AS z_raw,
       round(CASE WHEN vaa / CAST(n_a AS DOUBLE) + vab / CAST(n_b AS DOUBLE) > 0
                  THEN (ma - mb) / sqrt(vaa / CAST(n_a AS DOUBLE)
                                        + vab / CAST(n_b AS DOUBLE)) END, 4) AS z_adj,
       coalesce(CASE WHEN vaa / CAST(n_a AS DOUBLE) + vab / CAST(n_b AS DOUBLE) > 0
                     THEN abs((ma - mb) / sqrt(vaa / CAST(n_a AS DOUBLE)
                                               + vab / CAST(n_b AS DOUBLE)))
                            > CAST({z_crit!r} AS DOUBLE) END, false) AS significant
FROM final
"""


def funnel_timing_sql(steps: list[str]) -> str:
    """Funnel-timing twin: the funnel CTE chain unpivoted to transitions,
    same converters-only exact-percentile gap stats."""
    inner = events_funnel_sql(steps).strip().rstrip()
    arms = []
    for i in range(1, len(steps)):
        label = f"{i}:{steps[i - 1]}->{steps[i]}"
        arms.append(
            f"SELECT '{label}' AS transition, step{i}_us AS f, step{i + 1}_us AS t FROM fn"
        )
    return f"""
WITH fn AS ({inner}),
stacked AS (
  {'  UNION ALL  '.join(arms)}
)
SELECT transition,
       CAST(count(*) AS BIGINT) AS n_from,
       CAST(sum(CASE WHEN t <> -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_to,
       round(sum(CASE WHEN t <> -1 THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS conversion_rate,
       round(quantile_cont(CASE WHEN t <> -1
                           THEN (t - f) / 1000000.0 END, 0.5), 6) AS median_s,
       round(quantile_cont(CASE WHEN t <> -1
                           THEN (t - f) / 1000000.0 END, 0.95), 6) AS p95_s
FROM stacked
WHERE f <> -1
GROUP BY transition
"""


def scd2_lookup_sql() -> str:
    """Point-in-time lookup twin: the signup-tier SCD2 history (same
    lag/lead CTE as events_scd2_sql) consumed via DuckDB's NATIVE
    ``ASOF LEFT JOIN`` — an independent engine feature standing in for
    the package's tagged union-window — plus the same interval-end
    check."""
    return """
WITH obs AS (
  SELECT user_id, CAST(floor(value / 20.0) AS BIGINT) AS tier,
         epoch_us(ts) AS ts_us, event_id
  FROM events WHERE event_type = 'signup'
),
ordered AS (
  SELECT user_id, tier, ts_us, event_id,
         lag(tier) OVER w AS prev, row_number() OVER w AS rn
  FROM obs WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
starts AS (
  SELECT user_id, tier, ts_us FROM ordered
  WHERE rn = 1 OR prev IS DISTINCT FROM tier
),
hist AS (
  SELECT user_id, tier, ts_us AS valid_from,
         lead(ts_us) OVER w2 AS valid_to,
         row_number() OVER w2 AS version
  FROM starts WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us)
),
facts AS (
  SELECT event_id, user_id, epoch_us(ts) AS ts_us
  FROM events WHERE event_type = 'purchase'
)
SELECT f.event_id, f.user_id, f.ts_us,
       coalesce(CASE WHEN h.valid_to IS NULL OR f.ts_us < h.valid_to
                     THEN h.tier END, -1) AS dim_tier,
       CAST(coalesce(CASE WHEN h.valid_to IS NULL OR f.ts_us < h.valid_to
                          THEN h.version END, -1) AS INT) AS dim_version
FROM facts f ASOF LEFT JOIN hist h
  ON f.user_id = h.user_id AND f.ts_us >= h.valid_from
"""


def rfm_segments_sql(purchase_type: str = "purchase", n_tiles: int = 5) -> str:
    """RFM twin: same per-key aggregates, same (metric, key) total-order
    ntile cuts, same flipped best-is-5 convention."""
    n = int(n_tiles)
    return f"""
WITH bounds AS (SELECT max(epoch_us(ts)) AS last FROM events),
per_key AS (
  SELECT user_id AS key,
         max(epoch_us(ts)) AS last_p,
         CAST(count(*) AS BIGINT) AS frequency,
         coalesce(round(sum(CAST(value AS DOUBLE)), 6), 0.0) AS monetary
  FROM events WHERE event_type = '{purchase_type}' GROUP BY 1
),
m AS (
  SELECT key, CAST(b.last - last_p AS BIGINT) AS recency_us,
         frequency, monetary
  FROM per_key, bounds b
),
tiled AS (
  SELECT key, recency_us, frequency, monetary,
         ntile({n}) OVER (ORDER BY recency_us ASC, key ASC) AS tr,
         ntile({n}) OVER (ORDER BY frequency DESC, key ASC) AS tf,
         ntile({n}) OVER (ORDER BY monetary DESC, key ASC) AS tm
  FROM m
)
SELECT key, recency_us, frequency, monetary,
       CAST({n + 1} - tr AS INT) AS r,
       CAST({n + 1} - tf AS INT) AS f,
       CAST({n + 1} - tm AS INT) AS m,
       CAST({n + 1} - tr AS VARCHAR) || CAST({n + 1} - tf AS VARCHAR)
         || CAST({n + 1} - tm AS VARCHAR) AS segment
FROM tiled
"""


def rate_cross_correlation_sql(
    type_a: str, type_b: str, max_lag: int = 7, period_us: int = 86_400_000_000
) -> str:
    """Cross-correlation twin: same shared dense grid, same lag-shifted
    equi-join, same integer-sum Pearson closed form."""
    p = int(period_us)
    L = int(max_lag)
    return f"""
WITH counts AS (
  SELECT event_type AS t,
         (epoch_us(ts) - (epoch_us(ts) % {p})) // {p} AS period,
         count(*) AS c
  FROM events WHERE event_type IN ('{type_a}', '{type_b}')
  GROUP BY 1, 2
),
bounds AS (SELECT min(period) AS lo, max(period) AS hi FROM counts),
grid AS (
  SELECT unnest(generate_series((SELECT lo FROM bounds),
                                (SELECT hi FROM bounds))) AS period
),
a AS (
  SELECT g.period, coalesce(c.c, 0) AS a FROM grid g
  LEFT JOIN counts c ON c.period = g.period AND c.t = '{type_a}'
),
b AS (
  SELECT g.period, coalesce(c.c, 0) AS b FROM grid g
  LEFT JOIN counts c ON c.period = g.period AND c.t = '{type_b}'
),
lagged AS (
  SELECT l.lag, a.a, b.b
  FROM a, (SELECT unnest(generate_series(-{L}, {L})) AS lag) l
  JOIN b ON b.period = a.period + l.lag
),
agg AS (
  SELECT lag, count(*) AS n_periods,
         sum(a) AS sa, sum(b) AS sb, sum(a * b) AS sab,
         sum(a * a) AS saa, sum(b * b) AS sbb
  FROM lagged GROUP BY 1
)
SELECT CAST(lag AS BIGINT) AS lag,
       CAST(n_periods AS BIGINT) AS n_periods,
       round((CAST(n_periods AS DOUBLE) * sab - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
             / nullif(sqrt((CAST(n_periods AS DOUBLE) * saa
                            - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                           * (CAST(n_periods AS DOUBLE) * sbb
                              - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))), 0.0), 6)
         AS corr
FROM agg ORDER BY lag
"""


def markov_absorption_sql(absorb_type: str = "purchase", steps: int = 50) -> str:
    """Absorption twin: same chain (consecutive pairs + __END__ terminal,
    absorb-state outgoing rows pruned), same FIXED iteration count as a
    recursive CTE — absorbing states ride the working table as
    self-loop rows with constant p, so every update is one pure
    matrix-vector join."""
    k = int(steps)
    return f"""
WITH RECURSIVE nxt AS (
  SELECT event_type AS from_type,
         coalesce(lead(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id
         ), '__END__') AS to_type
  FROM events
),
trans AS (
  SELECT from_type, to_type, count(*) AS n
  FROM nxt WHERE from_type <> '{absorb_type}' GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tot FROM trans GROUP BY 1),
probs AS (
  -- CAST to DOUBLE: bare 1.0 literals are DECIMAL in DuckDB and the
  -- decimal scale would quantize every iterated probability
  SELECT t.from_type, t.to_type, CAST(t.n AS DOUBLE) / o.tot AS pr
  FROM trans t JOIN tot o USING (from_type)
  UNION ALL SELECT '{absorb_type}', '{absorb_type}', CAST(1.0 AS DOUBLE)
  UNION ALL SELECT '__END__', '__END__', CAST(1.0 AS DOUBLE)
),
step AS (
  SELECT 0 AS k, from_type AS state,
         CAST(CASE WHEN from_type = '{absorb_type}' THEN 1.0 ELSE 0.0 END
              AS DOUBLE) AS p
  FROM (SELECT DISTINCT from_type FROM probs)
  UNION ALL
  SELECT max(s.k) + 1, p2.from_type, sum(p2.pr * s.p)
  FROM probs p2 JOIN step s ON s.state = p2.to_type
  WHERE s.k < {k}
  GROUP BY p2.from_type
)
SELECT st.state,
       CAST(coalesce(o.tot, 0) AS BIGINT) AS n_out,
       round(st.p, 6) AS p_absorb
FROM step st LEFT JOIN tot o ON o.from_type = st.state
WHERE st.k = {k} AND st.state <> '__END__'
"""


def markov_removal_effects_sql(
    absorb_type: str = "purchase", steps: int = 50
) -> str:
    """Removal-effect twin: one recursive CTE iterates EVERY variant
    (baseline + each removed channel) simultaneously over (variant,
    state) pairs; per-edge rows are kept un-reaggregated after the
    remap so the iteration sums the same terms as the engine."""
    k = int(steps)
    return f"""
WITH RECURSIVE nxt AS (
  SELECT event_type AS from_type,
         coalesce(lead(event_type) OVER w, '__END__') AS to_type,
         row_number() OVER w AS rn
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
trans AS (
  SELECT from_type, to_type, count(*) AS n
  FROM nxt WHERE from_type <> '{absorb_type}' GROUP BY 1, 2
),
tot AS (SELECT from_type, sum(n) AS tot FROM trans GROUP BY 1),
starts AS (
  SELECT from_type, count(*) AS n FROM nxt WHERE rn = 1 GROUP BY 1
),
probs0 AS (
  SELECT t.from_type, t.to_type, CAST(t.n AS DOUBLE) / o.tot AS pr
  FROM trans t JOIN tot o USING (from_type)
),
channels AS (
  SELECT DISTINCT from_type AS ch FROM trans
),
variants AS (
  SELECT '__BASE__' AS ch, from_type, to_type, pr FROM probs0
  UNION ALL
  SELECT c.ch, p.from_type,
         CASE WHEN p.to_type = c.ch THEN '__END__' ELSE p.to_type END,
         p.pr
  FROM probs0 p, channels c WHERE p.from_type <> c.ch
),
loops AS (
  SELECT ch, '{absorb_type}' AS from_type, '{absorb_type}' AS to_type,
         CAST(1.0 AS DOUBLE) AS pr
  FROM (SELECT '__BASE__' AS ch UNION ALL SELECT ch FROM channels)
  UNION ALL
  SELECT ch, '__END__', '__END__', CAST(1.0 AS DOUBLE)
  FROM (SELECT '__BASE__' AS ch UNION ALL SELECT ch FROM channels)
),
all_edges AS (SELECT * FROM variants UNION ALL SELECT * FROM loops),
step AS (
  SELECT 0 AS k, ch, from_type AS state,
         CAST(CASE WHEN from_type = '{absorb_type}' THEN 1.0 ELSE 0.0 END
              AS DOUBLE) AS p
  FROM (SELECT DISTINCT ch, from_type FROM all_edges)
  UNION ALL
  SELECT max(s.k) + 1, e.ch, e.from_type, sum(e.pr * s.p)
  FROM all_edges e JOIN step s ON s.ch = e.ch AND s.state = e.to_type
  WHERE s.k < {k}
  GROUP BY e.ch, e.from_type
),
final AS (SELECT ch, state, p FROM step WHERE k = {k}),
pi AS (
  SELECT from_type, CAST(n AS DOUBLE) / (SELECT sum(n) FROM starts) AS pi
  FROM starts
),
conv AS (
  SELECT v.ch,
         sum(pi.pi * CASE WHEN pi.from_type = '{absorb_type}' THEN 1.0
                          WHEN pi.from_type = v.ch THEN 0.0
                          ELSE coalesce(f.p, 0.0) END) AS conv
  FROM (SELECT '__BASE__' AS ch UNION ALL SELECT ch FROM channels) v
  CROSS JOIN pi
  LEFT JOIN final f ON f.ch = v.ch AND f.state = pi.from_type
  GROUP BY v.ch
)
SELECT c.ch AS channel,
       round(b.conv, 6) AS p_base,
       round(c.conv, 6) AS p_removed,
       round(1.0 - c.conv / nullif(b.conv, 0.0), 6) AS removal_effect
FROM conv c, (SELECT conv FROM conv WHERE ch = '__BASE__') b
WHERE c.ch <> '__BASE__'
"""


def holt_forecast_sql(
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 3,
    period_us: int = 86_400_000_000,
) -> str:
    """Holt double-exponential-smoothing twin: one recursive CTE steps
    EVERY key's series simultaneously, executing the identical IEEE
    double chain as the engine's per-key loop (same operand order;
    discount factors written as (1.0 - α) arithmetic, not literals)."""
    # bare decimal literals are DECIMAL in DuckDB and would quantize the
    # iterated state (the Markov-twin trap) — force DOUBLE
    a = f"CAST({float(alpha)!r} AS DOUBLE)"
    bt = f"CAST({float(beta)!r} AS DOUBLE)"
    h, p = int(horizon), int(period_us)
    return f"""
WITH RECURSIVE series AS MATERIALIZED (
  SELECT user_id AS key, epoch_us(ts) // {p} AS period,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
base AS MATERIALIZED (
  SELECT key, y,
         row_number() OVER (PARTITION BY key ORDER BY period) AS seq,
         count(*) OVER (PARTITION BY key) AS n
  FROM series
  QUALIFY count(*) OVER (PARTITION BY key) >= 2
),
rec AS (
  SELECT b1.key, 1 AS seq, b1.n,
         b1.y AS l, b2.y - b1.y AS b, CAST(0.0 AS DOUBLE) AS se
  FROM base b1 JOIN base b2 ON b2.key = b1.key AND b2.seq = 2
  WHERE b1.seq = 1
  UNION ALL
  SELECT r.key, r.seq + 1, r.n,
         {a} * p.y + (1.0 - {a}) * (r.l + r.b) AS l,
         {bt} * (({a} * p.y + (1.0 - {a}) * (r.l + r.b)) - r.l)
           + (1.0 - {bt}) * r.b AS b,
         r.se + (p.y - (r.l + r.b)) * (p.y - (r.l + r.b)) AS se
  FROM rec r JOIN base p ON p.key = r.key AND p.seq = r.seq + 1
)
SELECT key, CAST(n AS INT) AS n_periods,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(sqrt(se / (n - 1)), 6) AS rmse,
       round(l + {h} * b, 6) AS forecast
FROM rec WHERE seq = n
"""


def decay_weighted_stats_sql(half_life_us: int = 7 * 86_400_000_000) -> str:
    """Decay-stats twin: same fixed-anchor closed form, λ embedded as the
    identical Python-computed double so exp() sees the same argument."""
    import math as _math

    lam = repr(_math.log(2.0) / float(half_life_us))
    return f"""
WITH t AS (SELECT max(epoch_us(ts)) AS T FROM events),
w AS (
  SELECT user_id AS key,
         exp(-CAST({lam} AS DOUBLE) * (t.T - epoch_us(ts))) AS w,
         CAST(value AS DOUBLE) AS v
  FROM events, t
)
SELECT key,
       count(*) AS n,
       round(sum(w), 6) AS weight_sum,
       round(sum(CASE WHEN v IS NOT NULL THEN w * v END), 6) AS decayed_value,
       round(sum(CASE WHEN v IS NOT NULL THEN w * v END)
             / nullif(sum(CASE WHEN v IS NOT NULL THEN w END), 0.0), 6) AS ewm_mean
FROM w GROUP BY key
"""


def theil_sen_trend_sql(period_us: int = 86_400_000_000) -> str:
    """Theil–Sen twin: same per-period count series, same pairwise slope
    set, same portable median interpolation (quantile literal cast to
    DOUBLE), no rounding anywhere."""
    p = int(period_us)

    def med(list_col: str, n_col: str) -> str:
        q = "CAST(0.5 AS DOUBLE)"
        return f"""(CAST({list_col}[CAST(floor({q} * ({n_col} - 1)) AS INT) + 1] AS DOUBLE)
        + ({q} * ({n_col} - 1) - floor({q} * ({n_col} - 1)))
          * (CAST({list_col}[least(CAST(floor({q} * ({n_col} - 1)) AS INT) + 2,
                                   CAST({n_col} AS INT))] AS DOUBLE)
             - CAST({list_col}[CAST(floor({q} * ({n_col} - 1)) AS INT) + 1] AS DOUBLE)))"""

    return f"""
WITH series AS MATERIALIZED (
  SELECT user_id AS key, epoch_us(ts) // {p} AS p,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2
),
slopes AS (
  SELECT a.key, (b.y - a.y) / CAST(b.p - a.p AS DOUBLE) AS s
  FROM series a JOIN series b ON b.key = a.key AND b.p > a.p
),
med AS MATERIALIZED (
  SELECT key, CAST(count(*) AS BIGINT) AS n_pairs,
         list_sort(list(s)) AS sl
  FROM slopes GROUP BY 1
),
sl AS MATERIALIZED (
  SELECT key, n_pairs, {med("sl", "n_pairs")} AS slope FROM med
),
resid AS (
  SELECT s.key, m.n_pairs, m.slope,
         CAST(count(*) AS BIGINT) AS n_periods,
         list_sort(list(s.y - m.slope * CAST(s.p AS DOUBLE))) AS rl
  FROM series s JOIN sl m ON m.key = s.key
  GROUP BY 1, 2, 3
)
SELECT key, CAST(n_periods AS INT) AS n_periods, n_pairs, slope,
       {med("rl", "n_periods")} AS intercept
FROM resid
"""


def mann_kendall_trend_sql(period_us: int = 86_400_000_000) -> str:
    """Mann–Kendall twin: same integer S / tie census / variance closed
    form, same continuity-corrected z, no rounding."""
    p = int(period_us)
    return f"""
WITH series AS MATERIALIZED (
  SELECT user_id AS key, epoch_us(ts) // {p} AS p, count(*) AS y
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.key,
         CAST(sum(CASE WHEN b.y > a.y THEN 1
                       WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM series a JOIN series b ON b.key = a.key AND b.p > a.p
  GROUP BY 1
),
n AS (SELECT key, CAST(count(*) AS BIGINT) AS n FROM series GROUP BY 1),
ties AS (
  SELECT key, CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT key, y, count(*) AS t FROM series GROUP BY 1, 2)
  GROUP BY 1
),
j AS (
  SELECT n.key, n.n, s.s_stat, ties.tie_term,
         CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS DOUBLE)
           / 18.0 AS var_s
  FROM n JOIN s ON s.key = n.key JOIN ties ON ties.key = n.key
  WHERE n.n >= 2
)
SELECT key, CAST(n AS INT) AS n_periods, s_stat, var_s,
       CASE WHEN s_stat = 0 THEN 0.0
            WHEN s_stat > 0 THEN CAST(s_stat - 1 AS DOUBLE) / sqrt(nullif(var_s, 0.0))
            ELSE CAST(s_stat + 1 AS DOUBLE) / sqrt(nullif(var_s, 0.0)) END AS z
FROM j
"""


def mann_whitney_u_sql() -> str:
    """Mann–Whitney twin on the md5-variant split of event values: same
    mid-rank construction ((min+max)/2 over each value's rank block — tie
    ordering irrelevant), same U/μ/σ/z closed forms with identical
    operand order, no rounding."""
    return """
WITH base AS (
  SELECT CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % 2 AS g,
         CAST(value AS DOUBLE) AS v
  FROM events
  WHERE value IS NOT NULL AND NOT isnan(CAST(value AS DOUBLE))
),
rk AS (
  SELECT g, v, row_number() OVER (ORDER BY v) AS rk FROM base
),
pv AS (
  SELECT v, min(rk) AS mn, max(rk) AS mx,
         CAST(count(*) AS BIGINT) AS t, CAST(sum(g) AS BIGINT) AS t1
  FROM rk GROUP BY v
),
s AS (
  SELECT CAST(sum(t) AS BIGINT) AS n,
         CAST(sum(t1) AS BIGINT) AS n1,
         sum(CAST(t1 AS DOUBLE) * (CAST(mn + mx AS DOUBLE) / 2.0)) AS r1,
         CAST(sum(t * t * t - t) AS BIGINT) AS tie
  FROM pv
)
SELECT (n - n1) AS n_0,
       n1 AS n_1,
       r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u_1,
       CAST((n - n1) * n1 AS DOUBLE) / 2.0 AS mu,
       sqrt(CAST((n - n1) * n1 AS DOUBLE) / 12.0
            * (CAST(n + 1 AS DOUBLE)
               - CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))) AS sigma,
       CASE WHEN r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                 - CAST((n - n1) * n1 AS DOUBLE) / 2.0 = 0 THEN 0.0
            WHEN r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                 - CAST((n - n1) * n1 AS DOUBLE) / 2.0 > 0
            THEN (r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST((n - n1) * n1 AS DOUBLE) / 2.0 - 0.5)
                 / nullif(sqrt(CAST((n - n1) * n1 AS DOUBLE) / 12.0
                      * (CAST(n + 1 AS DOUBLE)
                         - CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))), 0.0)
            ELSE (r1 - CAST(n1 * (n1 + 1) AS DOUBLE) / 2.0
                  - CAST((n - n1) * n1 AS DOUBLE) / 2.0 + 0.5)
                 / nullif(sqrt(CAST((n - n1) * n1 AS DOUBLE) / 12.0
                      * (CAST(n + 1 AS DOUBLE)
                         - CAST(tie AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))), 0.0)
       END AS z
FROM s
"""


