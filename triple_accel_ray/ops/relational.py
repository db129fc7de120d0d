"""Relational operators over the shared tables: bucketed as-of join and
grouped pricing aggregates — the generic wide-op building blocks (every
piece is a hash-bucket shuffle + a vectorized polars body).

Float policy for oracle-checked outputs: monetary doubles go through
floor(v*100 + 0.5) integer cents before summation (distributed double sums
are order-dependent; integer sums are not).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def events_last_order(events, orders, num_buckets: int = 16):
    """(event_id, user_id, ts, last_order_date): per event, the latest
    order date of the same customer with o_orderdate <= ts (backward
    as-of; NULL when the customer has no prior order)."""

    def _tag_events(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["user_id"].cast(pa.int64()),
                "ts": t["ts"],
                "event_id": t["event_id"],
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
            }
        )

    def _tag_orders(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t["o_custkey"].cast(pa.int64()),
                "ts": t["o_orderdate"],
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
            }
        )

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return df.with_columns(
            (pl.col("key").hash(seed=17) % np.uint64(num_buckets))
            .cast(pl.Int32).alias("bucket")
        ).to_arrow()

    def _asof(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        ev = (
            df.filter(pl.col("side") == 0)
            .select(["key", "ts", "event_id"])
            .sort("ts")
        )
        od = (
            df.filter(pl.col("side") == 1)
            .select(["key", "ts"])
            .rename({"ts": "last_order_date"})
            .sort("last_order_date")
        )
        out = ev.join_asof(
            od, left_on="ts", right_on="last_order_date", by="key",
            strategy="backward",
        ).rename({"key": "user_id"})
        return out.select(
            ["event_id", "user_id", "ts", "last_order_date"]
        ).to_arrow().cast(
            pa.schema(
                [("event_id", pa.int64()), ("user_id", pa.int64()),
                 ("ts", pa.timestamp("us")),
                 ("last_order_date", pa.timestamp("us"))]
            )
        )

    tagged = events.map_batches(_tag_events, batch_format="pyarrow").union(
        orders.map_batches(_tag_orders, batch_format="pyarrow")
    )
    return (
        tagged.map_batches(_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_asof, batch_format="pyarrow")
    )


def pricing_summary(lineitem):
    """TPC-H-Q1-shaped grouped aggregate with integer-cent sums:
    (l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_cents, count_order)."""
    from ray.data.aggregate import Count, Sum

    def _prep(t: pa.Table) -> pa.Table:
        qty = t["l_quantity"].to_numpy()
        price = t["l_extendedprice"].to_numpy()
        disc = t["l_discount"].to_numpy()
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty_i": pa.array(
                    np.floor(qty + 0.5).astype(np.int64), pa.int64()
                ),
                "base_cents": pa.array(
                    np.floor(price * 100.0 + 0.5).astype(np.int64), pa.int64()
                ),
                "disc_cents": pa.array(
                    np.floor(disc * 10000.0 + 0.5).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        lineitem.map_batches(_prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty_i", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )
