"""Windowed / streaming aggregations over events.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    # ---- stream-shaped --------------------------------------------------
    def events_tumbling_1h(sf_dir):
        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

        def _cents(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy()
            cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {"user_id": t["user_id"], "ts": t["ts"],
                 "value_cents": pa.array(cents, pa.int64())}
            )

        from ray.data.aggregate import Count, Sum

        keyed = ev.map_batches(_cents, batch_format="pyarrow").map_batches(
            lambda t: pa.table(
                {
                    "user_id": t["user_id"],
                    "window_start": pc.floor_temporal(t["ts"], unit="hour"),
                    "value_cents": t["value_cents"],
                }
            ),
            batch_format="pyarrow",
        )
        return keyed.groupby(["user_id", "window_start"]).aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_cents"),
        )

    q["events_tumbling_1h"] = events_tumbling_1h

    def events_watermark_1h(sf_dir):
        """Tumbling windows under WATERMARK semantics: arrival order is a
        deterministic permutation shuffling events within 2-hour frames
        (bounded disorder), watermark = running max event time, lateness
        60 s; late events are dropped and counted per window."""
        from ..ops.streaming import watermark_tumbling_windows

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "value"],
        )
        return watermark_tumbling_windows(
            ev, window_sec=3600, lateness_sec=60, frame_sec=7200,
            arrival_cls_mod=7,
        )

    q["events_watermark_1h"] = events_watermark_1h

    def events_sessions(sf_dir):
        ev = read_parquet_clean(_t(sf_dir, "events"),
                             columns=["user_id", "ts", "event_id"])
        return sessionize(ev, gap_sec=1800, num_buckets=16)

    q["events_sessions"] = events_sessions

    def events_sliding_1h_15m(sf_dir):
        """SLIDING windows (1 h window, 15 min slide): explicit vectorized
        4x frame fan-out + one grouped shuffle (ops/windows.py)."""
        from ..ops.windows import sliding_window_agg

        ev = read_parquet_clean(_t(sf_dir, "events"),
                                columns=["user_id", "ts", "value"])
        return sliding_window_agg(ev, window_sec=3600, slide_sec=900)

    q["events_sliding_1h_15m"] = events_sliding_1h_15m

    def hourly_top_event_types(sf_dir):
        """Composed heavy-hitters-per-window (ops/windows.windowed_top_k):
        top-3 event types per tumbling hour by count, deterministic tie
        break (count DESC, type ASC). Partial (window, type) counts per
        block, one hash(window) bucketed shuffle, local rank."""
        from ..ops.windows import windowed_top_k

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["ts", "event_type"])
        return windowed_top_k(ev, k=3)

    q["hourly_top_event_types"] = hourly_top_event_types

    def running_user_totals(sf_dir):
        """Per-user cumulative event count / value-cents in event-time
        order (ops/windows.running_totals) — the cumulative
        window-function shape (SUM OVER ... ROWS UNBOUNDED PRECEDING).
        One hash(user_id) bucket shuffle of id-width rows; vectorized
        per-bucket sorted cum_sum."""
        from ..ops.windows import running_totals

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "value"])
        return running_totals(ev)

    q["running_user_totals"] = running_user_totals

    def moving_user_frame_sums(sf_dir):
        """Per-user moving sum over the last 3 events
        (ops/windows.moving_frame_sum) — the BOUNDED ROWS-frame window
        shape (SUM OVER ... ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        next to running_user_totals' unbounded frame. Same single
        user-bucket shuffle; vectorized per-user rolling_sum."""
        from ..ops.windows import moving_frame_sum

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "value"])
        return moving_frame_sum(ev, frame=3)

    q["moving_user_frame_sums"] = moving_user_frame_sums

    def trailing_1h_user_sums(sf_dir):
        """Per-row trailing 1-hour sums (ops/windows.trailing_time_sum)
        — the RANGE-interval frame shape (value-based window, peers with
        equal ts included, no tie-break needed). Completes the window
        frame family: unbounded / bounded ROWS / RANGE interval."""
        from ..ops.windows import trailing_time_sum

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "value"])
        return trailing_time_sum(ev, window="1h")

    q["trailing_1h_user_sums"] = trailing_1h_user_sums

    def event_type_transitions(sf_dir):
        """First-order event-type transition counts per user stream
        (ops/windows.event_transitions) — the Markov-chain mining shape:
        LAG over (ts, event_id) order inside one user-bucket shuffle,
        vocabulary-sized partials, tiny grouped sum."""
        from ..ops.windows import event_transitions

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "event_type"])
        return event_transitions(ev)

    q["event_type_transitions"] = event_type_transitions

    def user_value_trends(sf_dir):
        """Per-user least-squares value trend from integer sufficient
        statistics (ops/windows.user_value_trends) — the mergeable-
        moments shape of every distributed regression. slope in integer
        per-mille of cents/minute; value-exact SQL twin (floor-division
        identity for negative slopes)."""
        from ..ops.windows import user_value_trends

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["user_id", "ts", "value"])
        return user_value_trends(ev)

    q["user_value_trends"] = user_value_trends

    def funnel_click_purchase(sf_dir):
        """Funnel / sequential-pattern op (ops/windows.funnel_conversions):
        a purchase converts iff some click of the same user strictly
        precedes it within 1 h. Events pre-filtered to the two step types
        before the one user-bucket shuffle; per-bucket body is a
        vectorized polars cum_max window — no per-user Python."""
        from ..ops.windows import funnel_conversions

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "event_type"])
        return funnel_conversions(ev)

    q["funnel_click_purchase"] = funnel_click_purchase

    def event_value_ranks(sf_dir):
        """Global per-group rank of every event's value-cents within its
        event_type WITHOUT shuffling a single data row
        (ops/sketch.grouped_ranks): the domain-bounded value histogram is
        the only exchange; rank assignment is a stateless searchsorted
        pass. cnt_less == SQL rank()-1, deterministic under ties."""
        from ..ops.sketch import grouped_ranks

        ev = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "event_type", "value"])

        def _cents(t: pa.Table) -> pa.Table:
            return pa.table({
                "event_id": t["event_id"],
                "event_type": t["event_type"],
                "value_cents": np.floor(
                    t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64),
            })

        return grouped_ranks(
            ev.map_batches(_cents, batch_format="pyarrow"),
            "event_type", "value_cents")

    q["event_value_ranks"] = event_value_ranks

    def hourly_unique_users(sf_dir):
        """Exact distinct users per tumbling hour
        (ops/windows.windowed_distinct): per-block DISTINCT (window, key)
        partials bound the shuffle by windows x keys per block, never
        rows; the per-window count is a vocabulary-sized aggregate."""
        from ..ops.windows import windowed_distinct

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["ts", "user_id"])
        return windowed_distinct(ev)

    q["hourly_unique_users"] = hourly_unique_users

    def weekly_retention(sf_dir):
        """Cohort retention matrix (ops/windows.weekly_retention): users
        grouped by first-active week, counted per later active week.
        Per-block distinct (user, week) partials, one user-bucket shuffle
        (cohort min + partial counts local), matrix-sized final merge."""
        from ..ops.windows import weekly_retention as _wr

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["ts", "user_id"])
        return _wr(ev)

    q["weekly_retention"] = weekly_retention

    def daily_event_deltas(sf_dir):
        """LAG window shape (ops/windows.daily_deltas): daily event
        volume + day-over-day delta. Per-block day-count partials, a
        day-vocabulary grouped sum, lag in one vocabulary-sized task."""
        from ..ops.windows import daily_deltas

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["ts"])
        return daily_deltas(ev)

    q["daily_event_deltas"] = daily_event_deltas


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    o["events_tumbling_1h"] = """
SELECT user_id,
       time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
       count(*)::BIGINT AS n_events,
       sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))::BIGINT AS sum_cents
FROM events GROUP BY 1, 2"""

    o["events_sliding_1h_15m"] = """
WITH f AS (
  SELECT user_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         make_timestamp((epoch_us(ts) // 900000000 - k) * 900000000)
           AS window_start
  FROM events, range(0, 4) t(k)
)
SELECT user_id, window_start,
       count(*)::BIGINT AS n_events,
       sum(cents)::BIGINT AS sum_cents
FROM f GROUP BY 1, 2"""

    o["events_watermark_1h"] = """
WITH arr AS (
  SELECT event_id, user_id, ts, value,
         row_number() OVER (
           ORDER BY epoch_us(ts) // 7200000000, event_id % 7, event_id
         ) AS rn
  FROM events
),
wm AS (
  SELECT *, max(ts) OVER (ORDER BY rn
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS run_max
  FROM arr
),
flags AS (
  SELECT user_id,
         time_bucket(INTERVAL 1 HOUR, ts) AS window_start,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         (run_max IS NULL OR
          epoch_us(time_bucket(INTERVAL 1 HOUR, ts)) + 3600000000 + 60000000
            > epoch_us(run_max)) AS kept
  FROM wm
)
SELECT user_id, window_start,
       sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_events,
       sum(CASE WHEN kept THEN cents ELSE 0 END)::BIGINT AS sum_cents,
       sum(CASE WHEN kept THEN 0 ELSE 1 END)::BIGINT AS n_late
FROM flags GROUP BY 1, 2"""

    o["events_sessions"] = """
WITH ordered AS (
  SELECT user_id, ts, event_id,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sess AS (
  SELECT user_id, ts,
         sum(new_sess) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_idx
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*)::BIGINT AS n_events
FROM sess GROUP BY user_id, sess_idx"""

    # composed heavy hitters per tumbling hour; rank = row_number under
    # the same deterministic order (count DESC, type ASC).
    o["hourly_top_event_types"] = """
WITH c AS (
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT window_start, event_type, n,
         row_number() OVER (
           PARTITION BY window_start ORDER BY n DESC, event_type
         )::BIGINT AS rank
  FROM c
)
SELECT window_start, event_type, n, rank FROM r WHERE rank <= 3"""

    # cumulative window function: same integer-cents rule as the engine
    o["running_user_totals"] = """
SELECT event_id, user_id,
       count(*) OVER w AS cum_n,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS cum_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING)"""

    o["moving_user_frame_sums"] = """
SELECT event_id, user_id,
       count(*) OVER w AS frame_n,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS frame_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)"""

    # RANGE frame: value-based, includes ts peers — no tie-break exists
    # or is needed; closed='both' on the engine side mirrors the two
    # inclusive endpoints.
    o["trailing_1h_user_sums"] = """
SELECT event_id, user_id,
       count(*) OVER w AS w_n,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER w AS BIGINT) AS w_cents
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"""

    o["event_type_transitions"] = """
WITH lagged AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, count(*)::BIGINT AS n
FROM lagged WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type"""

    # least-squares slope from integer sufficient statistics; x and the
    # denominator are non-negative, but the NUMERATOR can be negative —
    # divisible-numerator identity makes DuckDB's truncating // a floor.
    o["user_value_trends"] = """
WITH b AS (
  SELECT user_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y,
         ((epoch_us(ts) - min(epoch_us(ts)) OVER (PARTITION BY user_id))
          // 60000000)::BIGINT AS x
  FROM events),
s AS (
  SELECT user_id, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx,
         sum(y)::BIGINT AS sy, sum(x * y)::BIGINT AS sxy,
         sum(x * x)::BIGINT AS sxx
  FROM b GROUP BY 1)
SELECT user_id, n AS n_events,
       CASE WHEN n * sxx - sx * sx > 0
            THEN ((1000 * (n * sxy - sx * sy))
                  - ((((1000 * (n * sxy - sx * sy))
                       % (n * sxx - sx * sx)) + (n * sxx - sx * sx))
                     % (n * sxx - sx * sx)))
                 // (n * sxx - sx * sx)
            ELSE 0 END::BIGINT AS slope_permille
FROM s"""

    # funnel: conversion = EXISTS a strictly-earlier click within 1 h,
    # stated as the distinct-purchase join the engine's cum_max window
    # computes.
    o["funnel_click_purchase"] = """
WITH fe AS (SELECT event_id, user_id, ts, event_type FROM events
            WHERE event_type IN ('click', 'purchase')),
b AS (SELECT event_id, user_id, ts FROM fe WHERE event_type = 'purchase'),
a AS (SELECT user_id, ts FROM fe WHERE event_type = 'click'),
conv AS (
  SELECT DISTINCT b.event_id, b.user_id, b.ts
  FROM b JOIN a ON a.user_id = b.user_id
   AND date_diff('microsecond', a.ts, b.ts) > 0
   AND date_diff('microsecond', a.ts, b.ts) <= 3600000000
),
agg AS (
  SELECT user_id,
         sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
           AS n_a,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
           AS n_b
  FROM fe GROUP BY user_id
),
cagg AS (
  SELECT user_id, count(*)::BIGINT AS n_conversions,
         min(ts) AS first_conversion_ts
  FROM conv GROUP BY user_id
)
SELECT agg.user_id, n_a, n_b,
       coalesce(cagg.n_conversions, 0)::BIGINT AS n_conversions,
       cagg.first_conversion_ts
FROM agg LEFT JOIN cagg USING (user_id)"""

    # per-group rank: rank() assigns the min rank to ties, so rank()-1 is
    # exactly "rows with a strictly smaller value".
    o["event_value_ranks"] = """
WITH c AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS value_cents
  FROM events
)
SELECT event_id, event_type, value_cents,
       (rank() OVER (PARTITION BY event_type ORDER BY value_cents)
        - 1)::BIGINT AS cnt_less,
       (count(*) OVER (PARTITION BY event_type))::BIGINT AS n_group
FROM c"""

    o["hourly_unique_users"] = """
SELECT date_trunc('hour', ts) AS window_start,
       count(DISTINCT user_id)::BIGINT AS n_distinct
FROM events GROUP BY 1"""

    # retention: date_trunc('week') is Monday-origin, matching the
    # engine's (epoch_days + 3) % 7 arithmetic.
    o["weekly_retention"] = """
WITH act AS (SELECT DISTINCT user_id,
                    date_trunc('week', ts)::TIMESTAMP AS week
             FROM events),
coh AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
SELECT c.cohort_week, a.week, count(*)::BIGINT AS n_users
FROM act a JOIN coh c USING (user_id) GROUP BY 1, 2"""

    # daily deltas: lag() over the day-aggregated table; day truncation
    # is epoch-floor like the engine's int64 // day arithmetic (the
    # fixture's timestamps are all post-1970, so floor == trunc).
    o["daily_event_deltas"] = """
WITH d AS (
  SELECT date_trunc('day', ts)::TIMESTAMP AS day,
         count(*)::BIGINT AS n_events
  FROM events GROUP BY 1)
SELECT day, n_events,
       (n_events - lag(n_events) OVER (ORDER BY day))::BIGINT AS delta
FROM d"""
