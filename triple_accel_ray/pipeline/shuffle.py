"""Generic partitioned hash join built from Ray Data primitives.

``bucket_join(left, right, ...)`` tags each side, unions them, hash-buckets
by key, and performs a vectorized polars join inside each bucket — one
groupby shuffle total, no specialized join operators. This is the portable
join pattern from the Ray guide (explicit partitioned hash join), used
where the built-in ``Dataset.join``'s per-partition aggregator actors are
too heavy for the cluster shape (it spawned 100+ workers on an 8-CPU local
node for a 38k-row join).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def bucket_partition(ds, fn, num_buckets: int, *, bucket_col: str = "bucket",
                     fn_kwargs: dict | None = None):
    """``groupby(bucket_col).map_groups(fn)`` expressed as a sort with
    EXPLICIT boundaries at every bucket value, followed by whole-block
    ``map_batches``. ``fn`` receives exactly the rows of one bucket per
    call (each reduce partition is one bucket), so results are identical
    to the groupby form — but two things change that matter at scale:

    - reduce-partition BALANCE: the sort-based shuffle range-partitions
      the key, and with only ~32 distinct bucket values and the reducer
      count tied to the input block count, range boundaries quantize to
      whole buckets — partitions get 1-4 buckets each (measured at sf0.4:
      reduce blocks of 32k-100k rows from count-balanced buckets).
      Boundaries at every bucket value pin each partition to one bucket.
    - downstream task GRANULARITY: the reducer count becomes num_buckets
      instead of len(input_blocks) (ray sort planner: ``num_outputs =
      num_mappers`` unless boundaries are given — planner/sort.py), so a
      map stage fused after the shuffle gets num_buckets tasks, sized by
      config rather than by the upstream read parallelism. Measured at
      sf0.4/16cpu: the scorer ran as 15 tasks of 8.9-26.4 s (230 core-s
      total) — stage wall = the single longest task; one task per bucket
      restores wall ≈ total/ncpus.

    ``batch_size=None`` is load-bearing: the per-bucket bodies (pair
    dedup, join, doc assembly) need the WHOLE bucket in one batch, and
    whole-block batches never re-bundle (an explicit batch_size measured
    5-8x slower on the blocking stage).
    """
    if num_buckets < 2:
        # boundaries=[] would make the sort fall back to mapper-count
        # partitioning, splitting the single bucket across blocks and
        # handing ``fn`` PARTIAL buckets; one partition is exact here.
        return ds.repartition(1).map_batches(
            fn, batch_format="pyarrow", batch_size=None,
            fn_kwargs=fn_kwargs or {},
        )
    return ds.sort(
        bucket_col, boundaries=list(range(1, num_buckets))
    ).map_batches(
        fn,
        batch_format="pyarrow",
        batch_size=None,
        fn_kwargs=fn_kwargs or {},
    )


def raw_exchange(refs, map_fn, reduce_fn, num_buckets: int, extra=None):
    """One lean map/reduce exchange over object-store-resident parts,
    bypassing the Dataset sort machinery: ``map_fn(part) -> tuple of B
    payloads`` fans each input part out with ``num_returns=B`` (payload b
    is routed to reduce task b without ever leaving the object store);
    ``reduce_fn(b, payloads, extra_b) -> payload`` combines the b-th slice
    of every map output (``extra`` is an optional B-list of per-bucket
    side inputs — refs are dereferenced by Ray; None when absent).
    Returns the B reduce ObjectRefs.

    Use this (not bucket_partition/bucket_join) when an operator chains
    SEVERAL exchanges over intermediate data that never needs to be a
    Dataset — each Dataset all-to-all pays union/tag/sort scheduling that
    dominates wall time when the per-row work is tiny (measured on
    triangle counting over 1.7M edges: 6 Dataset all-to-alls = 41 s wall
    with <1.5 s of UDF work per stage — see ops/graph.py). Payloads are
    whatever Arrow/numpy values the caller wants; determinism is the
    caller's contract (integer/exact merges, order-insensitive reduces)."""
    import ray

    B = max(2, int(num_buckets))  # num_returns=1 returns a bare ref

    @ray.remote
    def _map(part):
        return map_fn(part)

    @ray.remote
    def _reduce(b, extra_b, *payloads):
        return reduce_fn(b, payloads, extra_b)

    side = extra if extra is not None else [None] * B
    outs = [_map.options(num_returns=B).remote(r) for r in refs]
    return [
        _reduce.remote(b, side[b], *[outs[m][b] for m in range(len(outs))])
        for b in range(B)
    ]


def bucket_join(
    left,
    right,
    left_key: str,
    right_key: str,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
    num_buckets: int = 32,
    how: str = "inner",
):
    """Join two Datasets on a string key. Right columns (minus the key) are
    appended to left rows. Column names must not collide (besides keys).

    Schemas are passed explicitly: calling ``Dataset.schema()`` on a lazy
    dataset executes its upstream pipeline, which would silently double the
    work for chained joins."""
    left_cols = list(left_schema.names)
    right_cols = [c for c in right_schema.names if c != right_key]
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"column collision: {overlap}")

    l_types = dict(zip(left_schema.names, left_schema.types))
    r_types = dict(zip(right_schema.names, right_schema.types))
    out_fields = [(c, l_types[c]) for c in left_cols] + [
        (c, r_types[c]) for c in right_cols
    ]

    def _tag_left(t: pa.Table) -> pa.Table:
        cols = {"__key": t[left_key].cast(pa.string()),
                "__side": pa.array(np.zeros(t.num_rows, dtype=np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = t[c]
        for c in right_cols:
            cols[f"r_{c}"] = pa.nulls(t.num_rows, r_types[c])
        return pa.table(cols)

    def _tag_right(t: pa.Table) -> pa.Table:
        cols = {"__key": t[right_key].cast(pa.string()),
                "__side": pa.array(np.ones(t.num_rows, dtype=np.int8))}
        for c in left_cols:
            cols[f"l_{c}"] = pa.nulls(t.num_rows, l_types[c])
        for c in right_cols:
            cols[f"r_{c}"] = t[c]
        return pa.table(cols)

    def _bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return df.with_columns(
            (pl.col("__key").hash(seed=9) % np.uint64(num_buckets))
            .cast(pl.Int32).alias("__bucket")
        ).to_arrow()

    def _join(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        lhs = df.filter(pl.col("__side") == 0).select(
            ["__key"] + [f"l_{c}" for c in left_cols]
        )
        rhs = df.filter(pl.col("__side") == 1).select(
            ["__key"] + [f"r_{c}" for c in right_cols]
        )
        joined = lhs.join(rhs, on="__key", how=how).drop("__key")
        joined = joined.rename(
            {f"l_{c}": c for c in left_cols} | {f"r_{c}": c for c in right_cols}
        )
        schema = pa.schema(out_fields)
        out = joined.to_arrow()
        return out.select(schema.names).cast(schema)

    tagged = left.map_batches(_tag_left, batch_format="pyarrow").union(
        right.map_batches(_tag_right, batch_format="pyarrow")
    )
    return bucket_partition(
        tagged.map_batches(_bucket, batch_format="pyarrow"),
        _join, num_buckets, bucket_col="__bucket",
    )
