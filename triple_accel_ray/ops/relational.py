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
    from ..pipeline.shuffle import bucket_partition

    return bucket_partition(
        tagged.map_batches(_bucket, batch_format="pyarrow"),
        _asof, num_buckets,
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


def interval_point_count(
    intervals,
    points,
    *,
    key_col: str,
    start_col: str,
    point_col: str,
    width_us: int,
    out_col: str = "n_points",
):
    """Distributed RANGE JOIN (interval x point, NO equi-key): for every
    interval [start, start + width) count the points whose timestamp falls
    inside it. The scale shape is the canonical bucket-replication range
    join: time is cut into buckets exactly ``width_us`` wide, so an
    interval overlaps at most TWO buckets (replicated <=2x) while every
    point lands in exactly one — the all-to-all is a single hash shuffle
    on the bucket id carrying only (key, t, side), and the per-bucket body
    is a sort + np.searchsorted (O(n log n), no pairwise scan). Per-bucket
    partial counts are exact because points are uniquely bucketed; a final
    small groupby sums an interval's <=2 partials. Intervals with zero
    points are kept (count 0) because every interval emits in >=1 bucket.
    """
    w = np.int64(width_us)

    def _tag_intervals(t: pa.Table) -> pa.Table:
        start = t[start_col].cast(pa.int64()).to_numpy()
        key = t[key_col].cast(pa.int64()).to_numpy()
        b0 = start // w
        # end-exclusive last covered bucket: floor((start + w - 1) / w)
        b1 = (start + w - np.int64(1)) // w
        dup = b1 != b0
        bucket = np.concatenate([b0, b1[dup]])
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "key": pa.array(np.concatenate([key, key[dup]]), pa.int64()),
                "t": pa.array(np.concatenate([start, start[dup]]), pa.int64()),
                "side": pa.array(
                    np.zeros(len(bucket), dtype=np.int8), pa.int8()
                ),
            }
        )

    def _tag_points(t: pa.Table) -> pa.Table:
        ts = t[point_col].cast(pa.int64()).to_numpy()
        return pa.table(
            {
                "bucket": pa.array(ts // w, pa.int64()),
                "key": pa.array(np.zeros(len(ts), dtype=np.int64), pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "side": pa.array(np.ones(len(ts), dtype=np.int8), pa.int8()),
            }
        )

    def _count(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy()
        tt = t["t"].to_numpy()
        iv = side == 0
        starts = tt[iv]
        keys = t["key"].to_numpy()[iv]
        pts = np.sort(tt[~iv])
        lo = np.searchsorted(pts, starts, side="left")
        hi = np.searchsorted(pts, starts + w, side="left")
        return pa.table(
            {
                "key": pa.array(keys, pa.int64()),
                "n": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    tagged = intervals.map_batches(
        _tag_intervals, batch_format="pyarrow"
    ).union(points.map_batches(_tag_points, batch_format="pyarrow"))
    out = (
        tagged.groupby("bucket")
        .map_groups(_count, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name=out_col))
    )
    return out.map_batches(
        lambda t: t.rename_columns([key_col, out_col]),
        batch_format="pyarrow",
    )


def rollup_counts(ds, dim_a: str, dim_b: str, val_col: str,
                  all_label: str = "ALL"):
    """Grouping-sets / ROLLUP aggregate: row counts and an integer sum at
    THREE grouping levels in one pass — (dim_a, dim_b), (dim_a), () —
    with coarser levels labeled ``all_label`` and a ``level`` column
    (0 = finest) so rows are unambiguous even if a dimension value is
    literally "ALL".

    Scale shape: each block computes its finest-level partial ONCE and
    derives the coarser partials locally from it (vocabulary-sized, no
    second pass over rows); all three levels ride ONE grouped-sum
    shuffle whose row count is bounded by ~2x the (dim_a x dim_b)
    vocabulary per block, never by input rows."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([dim_a, dim_b, val_col]))
        fine = df.group_by([dim_a, dim_b]).agg(
            n=pl.len().cast(pl.Int64),
            s=pl.col(val_col).sum().cast(pl.Int64),
        ).with_columns(level=pl.lit(0, dtype=pl.Int64))
        mid = fine.group_by(dim_a).agg(
            n=pl.col("n").sum(), s=pl.col("s").sum()
        ).with_columns(
            pl.lit(all_label).alias(dim_b), level=pl.lit(1, dtype=pl.Int64))
        top = fine.select(
            n=pl.col("n").sum(), s=pl.col("s").sum()
        ).with_columns(
            pl.lit(all_label).alias(dim_a), pl.lit(all_label).alias(dim_b),
            level=pl.lit(2, dtype=pl.Int64))
        out = pl.concat([fine, mid, top], how="diagonal").select(
            [dim_a, dim_b, "level", "n", "s"])
        return out.to_arrow().cast(pa.schema([
            (dim_a, pa.string()), (dim_b, pa.string()),
            ("level", pa.int64()), ("n", pa.int64()), ("s", pa.int64())]))

    def _rename(t: pa.Table) -> pa.Table:
        return pa.table({
            dim_a: t[dim_a], dim_b: t[dim_b], "level": t["level"],
            "n_rows": t["n_sum"].cast(pa.int64()),
            "sum_val": t["s_sum"].cast(pa.int64()),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby([dim_a, dim_b, "level"])
        .aggregate(Sum("n", alias_name="n_sum"), Sum("s", alias_name="s_sum"))
        .map_batches(_rename, batch_format="pyarrow")
    )


def revenue_by_nation(lineitem, orders, customer, supplier, nation, region,
                      num_buckets: int = 16):
    """TPC-H Q5-shaped multi-join: revenue per (region, nation) from
    lineitems whose SUPPLIER nation equals the ordering CUSTOMER's nation
    (the local-supplier rule). Revenue is the exact integer
    cents x (100 - discount_hundredths) product (centi-cent units), so
    the distributed sum is order-independent and the SQL twin matches
    bit-for-bit.

    Join strategy by side size (the broadcast-or-join discipline):
    - nation/region are CONSTANT-size vocabulary tables (25 / 5 rows in
      TPC-H) -> driver dicts, carried by value into the map stages.
    - supplier GROWS with scale (1:15 of customers), so its lookup
      arrays are built in a REMOTE task straight from the dataset's
      arrow refs and broadcast as one object-store ref — the driver
      never materializes it (round-3 verdict: the to_pandas here was
      the one scale-unsafe collect left); at a scale where even the
      broadcast outgrows worker heaps it moves to a third bucket_join
      unchanged.
    - orders |><| customer and lineitem |><| (orders x customer) are the
      two big-side joins -> bucketed hash joins (one shuffle each).
    """
    import ray

    from ..pipeline.shuffle import bucket_join

    @ray.remote
    def _sup_lookup(refs):
        tabs = [t for t in ray.get(list(refs)) if t.num_rows]
        if not tabs:
            e = np.empty(0, np.int64)
            return e, e
        tab = pa.concat_tables(tabs)
        sk = tab["s_suppkey"].to_numpy().astype(np.int64)
        sn = tab["s_nationkey"].to_numpy().astype(np.int64)
        o = np.argsort(sk)
        return sk[o], sn[o]

    sup_ref = _sup_lookup.remote(
        supplier.select_columns(["s_suppkey", "s_nationkey"]).to_arrow_refs())
    nat = nation.to_pandas()
    reg = region.to_pandas()
    nat_name = dict(zip(nat["n_nationkey"].astype(np.int64), nat["n_name"]))
    nat_region = dict(zip(
        nat["n_nationkey"].astype(np.int64),
        nat["n_regionkey"].map(dict(zip(
            reg["r_regionkey"].astype(np.int64), reg["r_name"]))),
    ))

    def _ord(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": t["o_orderkey"].cast(pa.int64()),
            "o_custkey": t["o_custkey"].cast(pa.int64()),
        })

    def _cust(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": t["c_custkey"].cast(pa.int64()),
            "c_nat": t["c_nationkey"].cast(pa.int64()),
        })

    ord_cust = bucket_join(
        orders.map_batches(_ord, batch_format="pyarrow"),
        customer.map_batches(_cust, batch_format="pyarrow"),
        "o_custkey", "c_custkey",
        pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64())]),
        pa.schema([("c_custkey", pa.int64()), ("c_nat", pa.int64())]),
        num_buckets=num_buckets,
    ).map_batches(
        lambda t: t.select(["o_orderkey", "c_nat"]), batch_format="pyarrow")

    def _li(t: pa.Table) -> pa.Table:
        cents = np.floor(
            t["l_extendedprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        disc = np.floor(
            t["l_discount"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        sk = t["l_suppkey"].to_numpy().astype(np.int64)
        # zero-copy plasma read of the broadcast lookup, once per task
        sup_keys, sup_nats = ray.get(sup_ref)
        s_nat = sup_nats[np.searchsorted(sup_keys, sk)]
        return pa.table({
            "l_orderkey": t["l_orderkey"].cast(pa.int64()),
            "rev_cc": cents * (100 - disc),
            "s_nat": s_nat,
        })

    li_nat = bucket_join(
        lineitem.map_batches(_li, batch_format="pyarrow"),
        ord_cust,
        "l_orderkey", "o_orderkey",
        pa.schema([("l_orderkey", pa.int64()), ("rev_cc", pa.int64()),
                   ("s_nat", pa.int64())]),
        pa.schema([("o_orderkey", pa.int64()), ("c_nat", pa.int64())]),
        num_buckets=num_buckets,
    )

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["rev_cc", "s_nat", "c_nat"]))
        df = df.filter(pl.col("s_nat") == pl.col("c_nat"))
        out = df.group_by("c_nat").agg(rev=pl.col("rev_cc").sum())
        ck = out["c_nat"].to_numpy()
        return pa.table({
            "region": pa.array([nat_region[int(k)] for k in ck], pa.string()),
            "nation": pa.array([nat_name[int(k)] for k in ck], pa.string()),
            "rev": out["rev"].to_numpy().astype(np.int64),
        })

    from ray.data.aggregate import Sum

    return (
        li_nat.map_batches(_partial, batch_format="pyarrow")
        .groupby(["region", "nation"])
        .aggregate(Sum("rev", alias_name="rev_sum"))
        .map_batches(
            lambda t: pa.table({
                "region": t["region"], "nation": t["nation"],
                "revenue_cc": t["rev_sum"].cast(pa.int64()),
            }),
            batch_format="pyarrow")
    )


def dataset_set_op(left, right, col: str, op: str = "except"):
    """Distinct-key set operation between two datasets' ``col`` columns —
    SQL EXCEPT ("except": in left, not in right) or INTERSECT
    ("intersect": in both). Output: the distinct qualifying values.

    Scale shape: each side's blocks emit per-block DISTINCT values
    tagged with side presence bits, so the ONE grouped max-merge shuffle
    carries at most the per-block distinct count (never the row count);
    the filter after the merge is stateless. Symmetric difference or
    right-except compose by swapping/duplicating sides."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Max

    if op not in ("except", "intersect"):
        raise ValueError(f"unknown set op: {op}")

    def _tag(is_left: bool):
        def _f(t: pa.Table) -> pa.Table:
            u = pc.unique(t[col])
            n = len(u)
            return pa.table({
                col: u,
                "l": pa.array(np.full(n, 1 if is_left else 0, np.int8)),
                "r": pa.array(np.full(n, 0 if is_left else 1, np.int8)),
            })
        return _f

    merged = (
        left.map_batches(_tag(True), batch_format="pyarrow")
        .union(right.map_batches(_tag(False), batch_format="pyarrow"))
        .groupby(col)
        .aggregate(Max("l", alias_name="in_l"), Max("r", alias_name="in_r"))
    )

    def _filter(t: pa.Table) -> pa.Table:
        in_l = t["in_l"].to_numpy()
        in_r = t["in_r"].to_numpy()
        keep = (in_l == 1) & ((in_r == 1) if op == "intersect" else (in_r == 0))
        return t.select([col]).filter(pa.array(keep))

    return merged.map_batches(_filter, batch_format="pyarrow")


def snapshot_diff(old, new, id_col: str = "doc_id",
                  content_col: str = "text", num_buckets: int = 32):
    """CDC between two snapshots of a table → (doc_id, change,
    old_len, new_len) with change in {'added', 'removed', 'changed'};
    unchanged rows emit nothing. Comparison is BYTE-exact: the
    hash(id) bucket shuffle colocates both versions of a row, so
    equality is decided on the actual content, never on a content hash
    (a constructible hash collision cannot mask an edit — the
    exact-dedup rule from ops/dedup.exact_dup_groups applied to diffs).

    Scale shape: one union + one hash(id) bucket shuffle carrying each
    snapshot once (inherent to CDC — every row's twin must be found);
    the per-bucket body is a vectorized polars pivot (group by id,
    first-per-side), no Python per row. IDs must be unique per
    snapshot (enforced; duplicate-id snapshots are a corrupt input)."""
    from ..pipeline.shuffle import bucket_partition

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t.select([id_col, content_col]))
            df = df.with_columns(
                side=pl.lit(side, dtype=pl.Int8),
                bucket=(pl.col(id_col).hash(seed=41)
                        % np.uint64(num_buckets)).cast(pl.Int32),
            )
            return df.to_arrow().cast(pa.schema([
                (id_col, pa.int64()), (content_col, pa.string()),
                ("side", pa.int8()), ("bucket", pa.int32())]))
        return _f

    def _classify(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([id_col, content_col, "side"]))
        g = df.group_by(id_col).agg(
            n_old=(pl.col("side") == 0).sum().cast(pl.Int64),
            n_new=(pl.col("side") == 1).sum().cast(pl.Int64),
            old_c=pl.col(content_col).filter(pl.col("side") == 0).first(),
            new_c=pl.col(content_col).filter(pl.col("side") == 1).first(),
        )
        bad = g.filter((pl.col("n_old") > 1) | (pl.col("n_new") > 1))
        if len(bad):
            raise ValueError(
                f"duplicate {id_col} within a snapshot: "
                f"{bad[id_col].head(3).to_list()}")
        g = g.with_columns(
            change=pl.when(pl.col("n_old") == 0).then(pl.lit("added"))
            .when(pl.col("n_new") == 0).then(pl.lit("removed"))
            .when(pl.col("old_c") != pl.col("new_c"))
            .then(pl.lit("changed")).otherwise(pl.lit(None)),
            old_len=pl.col("old_c").str.len_bytes().cast(pl.Int64),
            new_len=pl.col("new_c").str.len_bytes().cast(pl.Int64),
        ).filter(pl.col("change").is_not_null())
        return g.select([id_col, "change", "old_len", "new_len"]).to_arrow(
        ).cast(pa.schema([
            (id_col, pa.int64()), ("change", pa.string()),
            ("old_len", pa.int64()), ("new_len", pa.int64())]))

    tagged = old.map_batches(_tag(0), batch_format="pyarrow").union(
        new.map_batches(_tag(1), batch_format="pyarrow"))
    return bucket_partition(tagged, _classify, num_buckets)


def fk_orphans(fact, dim, fk_col: str, pk_col: str,
               num_buckets: int = 32):
    """Referential-integrity check → (fk, n_rows): every foreign-key
    value in ``fact`` that has no matching primary key in ``dim``, with
    the number of fact rows it strands. The data-quality gate a join
    pipeline runs before trusting an equi-join.

    Scale shape: both sides are reduced to per-block DISTINCT keys
    BEFORE the exchange — fact keys carry a per-block row count
    (combiner, so hot keys are one partial per block), dim keys carry a
    presence marker. One grouped merge (sum counts, max presence) keyed
    by the key value, then a stateless filter keeps presence == 0. The
    shuffle is key-vocabulary-sized per block, never row-sized; no
    text, no fact payload."""
    from ray.data.aggregate import Max, Sum

    def _fact_partial(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t.select([fk_col]))
            .group_by(fk_col).agg(n=pl.len().cast(pl.Int64))
            .with_columns(present=pl.lit(0, dtype=pl.Int64))
        )
        return out.rename({fk_col: "key"}).to_arrow().cast(pa.schema([
            ("key", pa.int64()), ("n", pa.int64()),
            ("present", pa.int64())]))

    def _dim_partial(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t.select([pk_col])).unique()
            .with_columns(n=pl.lit(0, dtype=pl.Int64),
                          present=pl.lit(1, dtype=pl.Int64))
        )
        return out.rename({pk_col: "key"}).to_arrow().cast(pa.schema([
            ("key", pa.int64()), ("n", pa.int64()),
            ("present", pa.int64())]))

    merged = (
        fact.map_batches(_fact_partial, batch_format="pyarrow")
        .union(dim.map_batches(_dim_partial, batch_format="pyarrow"))
        .groupby("key")
        .aggregate(Sum("n", alias_name="n_rows"),
                   Max("present", alias_name="present_max"))
    )
    def _orphans(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        t = t.filter(pc.equal(t["present_max"], 0))
        return pa.table({
            "fk": t["key"],
            "n_rows": t["n_rows"].cast(pa.int64()),
        })

    return merged.map_batches(_orphans, batch_format="pyarrow")


def pivot_counts(ds, row_col: str, cat_col: str, categories: list[str],
                 other_label: str = "other"):
    """PIVOT: one output row per ``row_col`` value, one count column per
    category in ``categories`` plus ``n_<other_label>`` for everything
    else — the category set is a PINNED CONTRACT (fixed output schema,
    unknown values coerced to other), which is what makes a distributed
    pivot well-defined without a driver-side vocabulary discovery pass.

    Scale shape: each block pre-pivots to the WIDE form (one row per
    distinct row-key per block, one int64 column per category — the
    combiner), so the single grouped-sum shuffle carries
    row-vocabulary-sized wide rows and hot categories never skew a key:
    the category dimension lives in columns, not keys."""
    from ray.data.aggregate import Sum

    cats = list(categories)
    names = [f"n_{c}" for c in cats] + [f"n_{other_label}"]

    def _partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([row_col, cat_col]))
        aggs = [
            (pl.col(cat_col) == c).sum().cast(pl.Int64).alias(f"n_{c}")
            for c in cats
        ] + [
            (~pl.col(cat_col).is_in(cats)).sum().cast(pl.Int64)
            .alias(f"n_{other_label}")
        ]
        out = df.group_by(row_col).agg(aggs)
        return out.to_arrow().cast(pa.schema(
            [(row_col, t.schema.field(row_col).type)]
            + [(n, pa.int64()) for n in names]))

    merged = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(row_col)
        .aggregate(*[Sum(n, alias_name=f"{n}_sum") for n in names])
    )
    return merged.map_batches(
        lambda t: pa.table(
            {row_col: t[row_col]}
            | {n: t[f"{n}_sum"].cast(pa.int64()) for n in names}),
        batch_format="pyarrow")


def upsert_latest(base, patch, key_col: str, ts_col: str,
                  num_buckets: int = 32):
    """MERGE/upsert → the merged table: per key, the row with the
    greatest ``ts_col``; on an exact timestamp tie the PATCH side wins
    (the deterministic last-writer-wins rule every CDC merge needs
    stated explicitly). Patch rows with unseen keys insert. Both inputs
    must share a schema; column order follows ``base``.

    Scale shape: one hash(key) bucket shuffle of the tagged union —
    each key's rows co-locate, one vectorized sort + last-per-key pick
    per bucket. At 100 TB the patch is normally much smaller than the
    base; the shuffle still prices the base once, which is what MERGE
    costs anywhere — partition-pruned layouts (skip base buckets with
    no patch keys) are the documented next step, not a semantic
    change."""
    from ..pipeline.shuffle import bucket_partition

    def _tag(side: int):
        def _f(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            return df.with_columns(
                __side=pl.lit(side, pl.Int8),
                bucket=(pl.col(key_col).hash(seed=41)
                        % np.uint64(num_buckets)).cast(pl.Int32),
            ).to_arrow()
        return _f

    def _pick(t: pa.Table) -> pa.Table:
        names = [c for c in t.schema.names
                 if c not in ("__side", "bucket")]
        if t.num_rows == 0:
            return t.select(names)
        df = (
            pl.from_arrow(t)
            .sort([key_col, ts_col, "__side"])
            .group_by(key_col, maintain_order=True)
            .last()
        )
        return df.select(names).to_arrow()

    tagged = base.map_batches(_tag(0), batch_format="pyarrow").union(
        patch.map_batches(_tag(1), batch_format="pyarrow"))
    return bucket_partition(tagged, _pick, num_buckets)


def dense_rank_ids(ds, col: str, num_partitions: int = 32):
    """Dictionary-encode a key column → (value, id) with DENSE,
    CONTIGUOUS 0-based ids in sorted value order — the distributed
    zipWithIndex every 100 TB pipeline needs to turn string keys into
    machine ids (graph node ids, embedding row numbers, dictionary
    pages).

    Scale shape: per-block distinct combiner → one grouped distinct →
    one SORT of the distinct values (range partition; blocks emerge in
    global order) → per-block counts (metadata-sized) → driver computes
    the exclusive prefix (one int per block) → per-block ids are offset
    + local arange. No row ever carries more than the value itself; the
    only driver data is one count per block."""
    import pyarrow.compute as pc
    import ray
    import ray.data as rd

    def _uniq(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t[col])})

    distinct = (
        ds.map_batches(_uniq, batch_format="pyarrow")
        .groupby(col).count().select_columns([col])
        .sort(col)
        .repartition(num_partitions)
    )
    refs = distinct.to_arrow_refs()
    if not refs:
        return rd.from_arrow(pa.table({"value": pa.array([], pa.string()),
                                       "id": pa.array([], pa.int64())}))

    @ray.remote
    def _count(t: pa.Table) -> int:
        return t.num_rows

    @ray.remote
    def _assign(t: pa.Table, off: int) -> pa.Table:
        # blocks arrive in global sort order; rows within a block are
        # sorted — ids are the global rank
        vals = t[col]
        order = pc.sort_indices(vals)
        return pa.table({
            "value": vals.take(order),
            "id": pa.array(off + np.arange(t.num_rows), pa.int64()),
        })

    counts = ray.get([_count.remote(r) for r in refs])
    offs = np.zeros(len(counts), dtype=np.int64)
    np.cumsum(counts[:-1], out=offs[1:])
    return rd.from_arrow_refs(
        [_assign.remote(r, int(o)) for r, o in zip(refs, offs)])
