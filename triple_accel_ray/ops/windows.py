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
