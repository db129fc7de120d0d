"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time window primitive; the engine treats the event
log as a keyed, time-sortable table (the ray_guide pattern): tumbling
windows are a derived key + grouped aggregate; session windows are a
per-key sorted gap scan inside hash buckets. Both are deterministic and
SQL-expressible (oracles in __ray_entry__).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ray.data.aggregate import Count, Max, Mean, Min, Sum


def tumbling_window_agg(events, window_sec: int = 3600):
    """→ (user_id, window_start, n_events, sum_value) per tumbling window."""

    def _key(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["user_id", "ts", "value"]))
        df = df.with_columns(
            window_start=(
                (pl.col("ts").cast(pl.Int64) // (window_sec * 1_000_000))
                * (window_sec * 1_000_000)
            ).cast(pl.Datetime("us"))
        ).drop("ts")
        return df.to_arrow()

    out = (
        events.map_batches(_key, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value", alias_name="sum_value"),
        )
    )
    return out


def sessionize(events, gap_sec: int = 1800, num_buckets: int = 32):
    """→ (user_id, session_start, session_end, n_events) where a session
    breaks when consecutive events of a user are more than ``gap_sec``
    apart. One shuffle keyed by user bucket; the gap scan is a vectorized
    polars window inside each bucket."""

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["user_id", "ts", "event_id"]))
        df = df.with_columns(
            (pl.col("user_id").hash(seed=21) % np.uint64(num_buckets))
            .cast(pl.Int32).alias("bucket")
        )
        return df.to_arrow()

    def _sessions(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort(["user_id", "ts", "event_id"])
        df = df.with_columns(
            new_sess=(
                (pl.col("ts").cast(pl.Int64)
                 - pl.col("ts").cast(pl.Int64).shift(1).over("user_id"))
                > gap_sec * 1_000_000
            ).fill_null(True).cast(pl.Int64)
        ).with_columns(
            sess_idx=pl.col("new_sess").cum_sum().over("user_id")
        )
        out = (
            df.group_by(["user_id", "sess_idx"])
            .agg(
                session_start=pl.col("ts").min(),
                session_end=pl.col("ts").max(),
                n_events=pl.len().cast(pl.Int64),
            )
            .drop("sess_idx")
            .sort(["user_id", "session_start"])
        )
        return out.to_arrow().cast(
            pa.schema(
                [("user_id", pa.int64()),
                 ("session_start", pa.timestamp("us")),
                 ("session_end", pa.timestamp("us")),
                 ("n_events", pa.int64())]
            )
        )

    from ..pipeline.shuffle import bucket_partition

    return bucket_partition(
        events.map_batches(_bucket, batch_format="pyarrow"),
        _sessions, num_buckets,
    )


def sliding_window_agg(events, window_sec: int = 3600, slide_sec: int = 900):
    """→ (user_id, window_start, n_events, sum_cents) per SLIDING window
    [window_start, window_start + window_sec) with starts every
    ``slide_sec``. An event at ts belongs to exactly F = window/slide
    windows (window must divide evenly); the fan-out is made explicit and
    vectorized — each batch emits F copies with derived frame keys (numpy
    repeat/tile, no Python rows) and the aggregate is one grouped shuffle
    carrying only (user_id, window_start, cents). At 100 TB the shuffled
    volume is F x the key columns, not F x the table. Monetary doubles go
    through integer cents (module float policy)."""
    if window_sec % slide_sec:
        raise ValueError("window_sec must be a multiple of slide_sec")
    F = window_sec // slide_sec
    s_us = np.int64(slide_sec) * 1_000_000

    def _frames(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        uid = t["user_id"].to_numpy()
        cents = np.floor(t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        # frame starts floor(ts/S)*S - k*S for k in 0..F-1 (all windows
        # whose [ws, ws+W) contains ts)
        last = (ts // s_us)[:, None]
        ws = (last - np.arange(F, dtype=np.int64)[None, :]) * s_us
        n = len(ts)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(uid, F), pa.int64()),
                "window_start": pa.array(ws.reshape(-1), pa.int64()).cast(
                    pa.timestamp("us")
                ),
                "cents": pa.array(np.repeat(cents, F), pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        events.map_batches(_frames, batch_format="pyarrow")
        .groupby(["user_id", "window_start"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
        )
    )


def running_totals(events, num_buckets: int = 32):
    """→ (event_id, user_id, cum_n, cum_cents): per-user cumulative event
    count and value-cents in event-time order — the cumulative
    window-function shape (``SUM(...) OVER (PARTITION BY user ORDER BY ts
    ROWS UNBOUNDED PRECEDING)``). Tie-break (ts, event_id) is total
    because event_id is unique, so the result is deterministic.

    Scale shape: ONE hash(user_id)-bucketed shuffle carrying only
    (event_id, user_id, ts, cents); each bucket task owns whole users and
    runs a vectorized sorted cum_sum. Monetary doubles go through integer
    cents (module float policy); output keys by event_id so row identity
    is partitioning-independent."""
    from ..pipeline.shuffle import bucket_partition

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["event_id", "user_id", "ts", "value"]))
        df = df.with_columns(
            cents=(pl.col("value") * 100.0 + 0.5).floor().cast(pl.Int64),
            bucket=(pl.col("user_id").hash(seed=33) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).drop("value")
        return df.to_arrow()

    def _cum(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select(["event_id", "user_id", "ts", "cents"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                cum_n=pl.int_range(1, pl.len() + 1).over("user_id")
                .cast(pl.Int64),
                cum_cents=pl.col("cents").cum_sum().over("user_id")
                .cast(pl.Int64),
            )
        )
        return df.select(
            ["event_id", "user_id", "cum_n", "cum_cents"]
        ).to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("cum_n", pa.int64()), ("cum_cents", pa.int64())]))

    return bucket_partition(
        events.map_batches(_bucket, batch_format="pyarrow"),
        _cum, num_buckets,
    )


def moving_frame_sum(events, frame: int = 3, num_buckets: int = 32):
    """→ (event_id, user_id, frame_n, frame_cents): per-user moving sum
    over the last ``frame`` events in event-time order — the BOUNDED
    ROWS-frame window shape (``SUM(...) OVER (PARTITION BY user ORDER BY
    ts, event_id ROWS BETWEEN frame-1 PRECEDING AND CURRENT ROW)``),
    complementing :func:`running_totals`' unbounded frame. frame_n is
    the actual row count in the frame (< frame near a user's start), so
    a caller gets the moving average as frame_cents / frame_n exactly.

    Scale shape: identical to running_totals — ONE hash(user_id) bucket
    shuffle of (event_id, user_id, ts, cents); each bucket owns whole
    users; the frame sum is a vectorized rolling_sum per user group.
    Tie-break (ts, event_id) is total (event_id unique) so the result
    is deterministic under any partitioning."""
    from ..pipeline.shuffle import bucket_partition

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["event_id", "user_id", "ts", "value"]))
        df = df.with_columns(
            cents=(pl.col("value") * 100.0 + 0.5).floor().cast(pl.Int64),
            bucket=(pl.col("user_id").hash(seed=33) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).drop("value")
        return df.to_arrow()

    def _frame(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select(["event_id", "user_id", "ts", "cents"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                frame_n=pl.min_horizontal(
                    pl.int_range(1, pl.len() + 1).over("user_id"),
                    pl.lit(frame),
                ).cast(pl.Int64),
                frame_cents=pl.col("cents")
                .rolling_sum(window_size=frame, min_samples=1)
                .over("user_id").cast(pl.Int64),
            )
        )
        return df.select(
            ["event_id", "user_id", "frame_n", "frame_cents"]
        ).to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("frame_n", pa.int64()), ("frame_cents", pa.int64())]))

    return bucket_partition(
        events.map_batches(_bucket, batch_format="pyarrow"),
        _frame, num_buckets,
    )


def trailing_time_sum(events, window: str = "1h", num_buckets: int = 32):
    """→ (event_id, user_id, w_n, w_cents): per-row trailing TIME-window
    sum — the RANGE-frame window shape (``SUM(...) OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT
    ROW)``), completing the frame family next to :func:`running_totals`
    (unbounded) and :func:`moving_frame_sum` (bounded ROWS). RANGE
    semantics are value-based: every row whose ts falls in
    [ts_i − window, ts_i] participates, INCLUDING peers that share ts_i
    — so the result is deterministic with no tie-break at all.

    Scale shape: one hash(user_id) bucket shuffle of id-width rows;
    per-bucket vectorized value-based rolling (closed='both' matches
    the SQL frame's two inclusive endpoints exactly)."""
    from ..pipeline.shuffle import bucket_partition

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["event_id", "user_id", "ts", "value"]))
        df = df.with_columns(
            cents=(pl.col("value") * 100.0 + 0.5).floor().cast(pl.Int64),
            bucket=(pl.col("user_id").hash(seed=33) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).drop("value")
        return df.to_arrow()

    def _trail(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select(["event_id", "user_id", "ts", "cents"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(one=pl.lit(1, dtype=pl.Int64))
            .with_columns(
                w_n=pl.col("one")
                .rolling_sum_by("ts", window_size=window, closed="both")
                .over("user_id").cast(pl.Int64),
                w_cents=pl.col("cents")
                .rolling_sum_by("ts", window_size=window, closed="both")
                .over("user_id").cast(pl.Int64),
            )
        )
        return df.select(
            ["event_id", "user_id", "w_n", "w_cents"]
        ).to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("w_n", pa.int64()), ("w_cents", pa.int64())]))

    return bucket_partition(
        events.map_batches(_bucket, batch_format="pyarrow"),
        _trail, num_buckets,
    )


def event_transitions(events, num_buckets: int = 32):
    """→ (prev_type, next_type, n): first-order transition counts over
    each user's event stream in (ts, event_id) order — the Markov-chain
    mining shape (a LAG window + group-count). Output is
    event-type-vocabulary-sized (|types|² rows max).

    Scale shape: one hash(user_id) bucket shuffle of (user_id, ts,
    event_id, event_type); each bucket owns whole users, computes its
    transition counts vectorized (sorted shift + drop user boundaries),
    and emits vocabulary-sized partials into a tiny grouped sum."""
    from ray.data.aggregate import Sum

    from ..pipeline.shuffle import bucket_partition

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(
            t.select(["event_id", "user_id", "ts", "event_type"]))
        return df.with_columns(
            bucket=(pl.col("user_id").hash(seed=33) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).to_arrow()

    def _trans(t: pa.Table) -> pa.Table:
        schema = pa.schema([("prev_type", pa.string()),
                            ("next_type", pa.string()),
                            ("n", pa.int64())])
        if t.num_rows == 0:
            return schema.empty_table()
        df = (
            pl.from_arrow(t.select(["event_id", "user_id", "ts",
                                    "event_type"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                prev_type=pl.col("event_type").shift(1),
                prev_user=pl.col("user_id").shift(1),
            )
            .filter(pl.col("prev_user") == pl.col("user_id"))
            .group_by(["prev_type", "event_type"])
            .agg(n=pl.len().cast(pl.Int64))
            .rename({"event_type": "next_type"})
        )
        return df.select(["prev_type", "next_type", "n"]).to_arrow().cast(
            schema)

    return (
        bucket_partition(
            events.map_batches(_bucket, batch_format="pyarrow"),
            _trans, num_buckets,
        )
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


def user_value_trends(events, num_buckets: int = 32):
    """→ (user_id, n_events, slope_permille): per-user least-squares
    trend of event value over time, computed entirely from integer
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) — the mergeable-moments
    shape every distributed regression/variance reduces to. x = whole
    minutes since the user's first event (floor of the µs delta — both
    non-negative, so SQL truncation equals floor); y = value cents;
    slope_permille = floor(1000·(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)), 0 for
    degenerate users (single event / all same minute). Negative slopes
    floor like Python — the SQL twin uses the divisible-numerator
    identity since DuckDB ``//`` truncates.

    Scale shape: one hash(user_id) bucket shuffle of id-width rows;
    whole users per bucket, so x's per-user origin and the final slope
    are local; at larger user cardinality the statistics themselves
    merge associatively (documented; here users fit their bucket)."""
    from ..pipeline.shuffle import bucket_partition

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["user_id", "ts", "value"]))
        return df.with_columns(
            cents=(pl.col("value") * 100.0 + 0.5).floor().cast(pl.Int64),
            bucket=(pl.col("user_id").hash(seed=33) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).drop("value").to_arrow()

    schema = pa.schema([("user_id", pa.int64()), ("n_events", pa.int64()),
                        ("slope_permille", pa.int64())])

    def _trend(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        df = pl.from_arrow(t.select(["user_id", "ts", "cents"]))
        s = (
            df.with_columns(
                x=((pl.col("ts").cast(pl.Int64)
                    - pl.col("ts").cast(pl.Int64).min().over("user_id"))
                   // 60_000_000).cast(pl.Int64))
            .group_by("user_id")
            .agg(
                n=pl.len().cast(pl.Int64),
                sx=pl.col("x").sum().cast(pl.Int64),
                sy=pl.col("cents").sum().cast(pl.Int64),
                sxy=(pl.col("x") * pl.col("cents")).sum().cast(pl.Int64),
                sxx=(pl.col("x") * pl.col("x")).sum().cast(pl.Int64),
            )
        )
        n = s["n"].to_numpy()
        num = 1000 * (n * s["sxy"].to_numpy() - s["sx"].to_numpy()
                      * s["sy"].to_numpy())
        den = n * s["sxx"].to_numpy() - s["sx"].to_numpy() ** 2
        slope = np.where(den > 0, num // np.where(den > 0, den, 1), 0)
        return pa.table({
            "user_id": pa.array(s["user_id"].to_numpy(), pa.int64()),
            "n_events": pa.array(n, pa.int64()),
            "slope_permille": pa.array(slope, pa.int64()),
        }).cast(schema)

    return bucket_partition(
        events.map_batches(_bucket, batch_format="pyarrow"),
        _trend, num_buckets,
    )


def funnel_conversions(events, step_a: str = "click",
                       step_b: str = "purchase",
                       within_sec: int = 3600, num_buckets: int = 32):
    """→ (user_id, n_a, n_b, n_conversions, first_conversion_ts): the
    sequential-pattern / funnel shape. A ``step_b`` event CONVERTS iff
    some ``step_a`` event of the same user STRICTLY precedes it by at
    most ``within_sec`` (equal timestamps don't convert, so the rule
    needs no tie-breaking and each b event's verdict is independent —
    the semantics SQL states as an EXISTS join). One output row per user
    having at least one step event.

    Scale shape: events are pre-filtered to the two step types before
    the ONE hash(user_id)-bucketed shuffle (id-width rows); the
    per-bucket body is fully vectorized over the whole bucket — a
    per-user-segment running "timestamp of the most recent a" via
    maximum.accumulate, reset at user boundaries, then one comparison
    per b event and a segmented aggregate. No per-user Python loop."""
    from ..pipeline.shuffle import bucket_partition

    w_us = np.int64(within_sec) * 1_000_000

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["event_id", "user_id", "ts",
                                     "event_type"]))
        df = df.filter(
            pl.col("event_type").is_in([step_a, step_b])
        ).with_columns(
            bucket=(pl.col("user_id").hash(seed=45) % np.uint64(num_buckets))
            .cast(pl.Int32),
        )
        return df.to_arrow().cast(pa.schema([
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")), ("event_type", pa.string()),
            ("bucket", pa.int32())]))

    def _scan(t: pa.Table) -> pa.Table:
        # sort order at equal (user, ts) is irrelevant: a conversion
        # requires a STRICTLY earlier a, and "most recent a at an earlier
        # position with the same ts" still fails the gap > 0 test.
        df = (
            pl.from_arrow(t.select(["event_id", "user_id", "ts",
                                    "event_type"]))
            .sort(["user_id", "ts", "event_id"])
            .with_columns(
                ts_i=pl.col("ts").cast(pl.Int64),
                # sentinel, not null: polars cum_max leaves nulls null
                # instead of carrying the running max through them
                a_ts=pl.when(pl.col("event_type") == step_a)
                .then(pl.col("ts").cast(pl.Int64))
                .otherwise(-(1 << 62)),
            )
            .with_columns(
                # running max a_ts at sort-position < current row
                pm=pl.col("a_ts").cum_max().shift(1, fill_value=-(1 << 62))
                .over("user_id")
            )
            .with_columns(
                # EXISTS needs "most recent a at a STRICTLY EARLIER ts",
                # not "earlier sort position": under timestamp ties a
                # same-ts a (gap 0) must not shadow an older valid a, so
                # take pm at the FIRST row of the (user, ts) group — every
                # position before the group has a strictly smaller ts.
                prev_a=pl.col("pm").first().over(["user_id", "ts_i"])
            )
            .with_columns(
                # prev_a < ts strictly by construction; the latest
                # strictly-earlier a has the smallest positive gap, so
                # "gap <= w" is exactly the EXISTS rule.
                conv=(pl.col("event_type") == step_b)
                & (pl.col("prev_a") > -(1 << 61))
                & ((pl.col("ts_i") - pl.col("prev_a")) <= int(w_us))
            )
        )
        out = (
            df.group_by("user_id", maintain_order=True)
            .agg(
                n_a=(pl.col("event_type") == step_a).sum().cast(pl.Int64),
                n_b=(pl.col("event_type") == step_b).sum().cast(pl.Int64),
                n_conversions=pl.col("conv").sum().cast(pl.Int64),
                first_conversion_ts=pl.col("ts").filter(pl.col("conv"))
                .min(),
            )
        )
        return out.to_arrow().cast(pa.schema([
            ("user_id", pa.int64()), ("n_a", pa.int64()),
            ("n_b", pa.int64()), ("n_conversions", pa.int64()),
            ("first_conversion_ts", pa.timestamp("us"))]))

    return bucket_partition(
        events.map_batches(_bucket, batch_format="pyarrow"),
        _scan, num_buckets,
    )


def windowed_top_k(events, ts_col: str = "ts", cat_col: str = "event_type",
                   k: int = 3, window_sec: int = 3600,
                   num_buckets: int = 8):
    """Top-k categories per tumbling window by count — the composed
    "heavy hitters per hour" shape (windowed aggregate × per-group
    top-k). Deterministic total order (count DESC, category ASC) so the
    oracle is a SQL row_number().

    Scale shape: per-block partial (window, category) counts — bounded
    by windows × category vocabulary per block, never rows — then ONE
    hash(window) bucketed shuffle; each bucket task merges partials and
    ranks locally. Rows out: k per window."""
    from ..pipeline.shuffle import bucket_partition

    us = window_sec * 1_000_000

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([ts_col, cat_col]))
        df = df.with_columns(
            window_start=((pl.col(ts_col).cast(pl.Int64) // us) * us)
            .cast(pl.Datetime("us"))
        )
        out = (
            df.group_by(["window_start", cat_col])
            .agg(n=pl.len().cast(pl.Int64))
            .with_columns(
                bucket=(pl.col("window_start").hash(seed=0)
                        % np.uint64(num_buckets)).cast(pl.Int32))
        )
        return out.to_arrow().cast(pa.schema([
            ("window_start", pa.timestamp("us")), (cat_col, pa.string()),
            ("n", pa.int64()), ("bucket", pa.int32())]))

    def _select(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select(["window_start", cat_col, "n"]))
            .group_by(["window_start", cat_col])
            .agg(n=pl.col("n").sum())
            .sort(["window_start", "n", cat_col],
                  descending=[False, True, False])
            .with_columns(
                rank=pl.col("n").cum_count().over("window_start")
                .cast(pl.Int64))
            .filter(pl.col("rank") <= k)
        )
        return df.to_arrow().cast(pa.schema([
            ("window_start", pa.timestamp("us")), (cat_col, pa.string()),
            ("n", pa.int64()), ("rank", pa.int64())]))

    return bucket_partition(
        events.map_batches(_partial, batch_format="pyarrow"),
        _select, num_buckets,
    )


def windowed_distinct(events, ts_col: str = "ts", key_col: str = "user_id",
                      window_sec: int = 3600):
    """→ (window_start, n_distinct): EXACT distinct keys per tumbling
    window — the streaming-analytics staple next to the mergeable-HLL
    approximate twin (ops/sketch.hll_registers composes per window the
    same way when exactness can be traded for register-sized shuffles).

    Scale shape: per-block DISTINCT (window, key) partials bound the
    shuffle by windows x keys per block, never rows; the grouped
    distinct collapses duplicates and the final per-window count is a
    vocabulary-sized aggregate."""
    us = window_sec * 1_000_000

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([ts_col, key_col]))
        df = df.with_columns(
            window_start=((pl.col(ts_col).cast(pl.Int64) // us) * us)
            .cast(pl.Datetime("us"))
        ).select(["window_start", key_col]).unique()
        return df.to_arrow().cast(pa.schema([
            ("window_start", pa.timestamp("us")),
            (key_col, pa.int64())]))

    def _count(t: pa.Table) -> pa.Table:
        return pa.table({
            "window_start": t["window_start"],
            "n_distinct": t["count()"].cast(pa.int64()),
        })

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby(["window_start", key_col])
        .count()
        .map_batches(lambda t: t.select(["window_start"]),
                     batch_format="pyarrow")
        .groupby("window_start")
        .count()
        .map_batches(_count, batch_format="pyarrow")
    )


def weekly_retention(events, ts_col: str = "ts", key_col: str = "user_id",
                     num_buckets: int = 32):
    """→ (cohort_week, week, n_users): the retention matrix — users whose
    FIRST active week is cohort_week and who were active in week. Weeks
    are Monday-origin (date_trunc('week') semantics: 1970-01-01 was a
    Thursday, so day-of-week = (epoch_days + 3) % 7 with Monday = 0).

    Scale shape: per-block DISTINCT (user, week) partials, then ONE
    hash(user) bucket shuffle so each task owns whole users — the
    per-user min (cohort) and the (cohort, week) partial counts are
    local; the final merge is a matrix-sized grouped sum (weeks^2, never
    rows)."""
    from ray.data.aggregate import Sum

    from ..pipeline.shuffle import bucket_partition

    day_us = 86_400_000_000

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([ts_col, key_col]))
        days = pl.col(ts_col).cast(pl.Int64) // day_us
        df = df.with_columns(
            week=((days - (days + 3) % 7) * day_us).cast(pl.Datetime("us"))
        ).select([key_col, "week"]).unique().with_columns(
            bucket=(pl.col(key_col).hash(seed=63) % np.uint64(num_buckets))
            .cast(pl.Int32)
        )
        return df.to_arrow().cast(pa.schema([
            (key_col, pa.int64()), ("week", pa.timestamp("us")),
            ("bucket", pa.int32())]))

    def _cohort_counts(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([key_col, "week"])).unique()
        df = df.with_columns(
            cohort_week=pl.col("week").min().over(key_col)
        )
        out = df.group_by(["cohort_week", "week"]).agg(
            n=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(pa.schema([
            ("cohort_week", pa.timestamp("us")),
            ("week", pa.timestamp("us")), ("n", pa.int64())]))

    return (
        bucket_partition(
            events.map_batches(_partial, batch_format="pyarrow"),
            _cohort_counts, num_buckets)
        .groupby(["cohort_week", "week"])
        .aggregate(Sum("n", alias_name="n_sum"))
        .map_batches(
            lambda t: pa.table({
                "cohort_week": t["cohort_week"], "week": t["week"],
                "n_users": t["n_sum"].cast(pa.int64()),
            }),
            batch_format="pyarrow")
    )


def daily_deltas(events, ts_col: str = "ts"):
    """→ (day, n_events, delta): daily event volume and its change vs
    the PREVIOUS day present in the data (first day's delta is NULL) —
    the LAG window-function shape as a distributed op.

    Scale shape: per-block (day, n) partial counts (the combiner — a
    block contributes one row per distinct day, never per event), a
    day-vocabulary-sized grouped sum, then the lag runs in ONE
    repartition(1) task — sound because the post-aggregate table is
    bounded by the calendar (days), not the data; the lag needs total
    order over days, and a boundary hand-off between partitions would
    buy nothing at vocabulary size."""
    from ray.data.aggregate import Sum

    day_us = 86_400_000_000

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([ts_col]))
        out = (
            df.select(day=(pl.col(ts_col).cast(pl.Int64) // day_us
                           * day_us).cast(pl.Datetime("us")))
            .group_by("day").agg(n=pl.len().cast(pl.Int64))
        )
        return out.to_arrow().cast(pa.schema([
            ("day", pa.timestamp("us")), ("n", pa.int64())]))

    def _lag(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t).sort("day")
        df = df.with_columns(
            delta=(pl.col("n_events") - pl.col("n_events").shift(1))
            .cast(pl.Int64))
        return df.to_arrow().cast(pa.schema([
            ("day", pa.timestamp("us")), ("n_events", pa.int64()),
            ("delta", pa.int64())]))

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("n", alias_name="n_sum"))
        .map_batches(
            lambda t: pa.table({
                "day": t["day"],
                "n_events": t["n_sum"].cast(pa.int64())}),
            batch_format="pyarrow")
        .repartition(1)
        .map_batches(_lag, batch_format="pyarrow", batch_size=None)
    )
