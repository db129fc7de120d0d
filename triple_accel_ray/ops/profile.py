"""Table profiling: per-column stats in one streaming pass.

The pass every pipeline should run before committing to a plan — null
rates, value ranges and exact cardinalities drive the engine's own
broadcast-or-join and skew decisions (SCALING.md). One row out per
profiled column: (col_name, n_rows, n_null, n_distinct, min_str,
max_str).

Scale shape: counts and typed min/max ride per-block partials merged by
a column-vocabulary-sized grouped aggregate (never a data shuffle).
Exact distinct counts melt every column's PER-BLOCK DISTINCT values into
(col_name, val) rows — the only value-sized exchange, one hash(val)
bucket shuffle shared by all columns — then a per-bucket distinct count
per column and a tiny grouped sum. For columns where exact cardinality
isn't worth a value shuffle at 100 TB, ops/sketch.hll_registers is the
register-sized approximate twin (same pairing as distinct_count).

min/max are computed on the TYPED column (lexicographic string min of
int64 would be wrong) and only then cast to string for the uniform
output schema; the int -> string cast matches DuckDB's VARCHAR cast, so
the SQL twin is value-exact.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa
import pyarrow.compute as pc


def profile_columns(ds, columns: list[str], num_buckets: int = 32):
    """→ one row per column in ``columns``: (col_name, n_rows, n_null,
    n_distinct, min_str, max_str). Exact, deterministic, value-checked
    against a per-column UNION ALL SQL twin."""
    from ray.data.aggregate import Count, Max, Min, Sum

    from ..pipeline.shuffle import bucket_partition

    cols = list(columns)

    # Typed scalar aggregates in ONE streaming pass (Ray merges per-block
    # partials internally; the result is a ncols-sized dict, the
    # legitimate small-result consumption). min/max MUST merge on the
    # typed column and stringify only afterwards — a per-block
    # stringify-then-string-merge ranks "95" above "499".
    def _null_flags(t: pa.Table) -> pa.Table:
        out = {c: t[c] for c in cols}
        for c in cols:
            out[f"__null_{c}"] = pc.cast(pc.is_null(t[c]), pa.int64())
        return pa.table(out)

    aggs = [Count(alias_name="n_rows")]
    for c in cols:
        aggs += [Min(c, alias_name=f"min_{c}"),
                 Max(c, alias_name=f"max_{c}"),
                 Sum(f"__null_{c}", alias_name=f"nnull_{c}")]
    res = ds.map_batches(_null_flags, batch_format="pyarrow").aggregate(*aggs)
    stats = {
        c: {
            "n_rows": int(res["n_rows"]),
            "n_null": int(res[f"nnull_{c}"] or 0),
            "min_str": None if res[f"min_{c}"] is None
            else str(res[f"min_{c}"]),
            "max_str": None if res[f"max_{c}"] is None
            else str(res[f"max_{c}"]),
        }
        for c in cols
    }

    def _distinct_partial(t: pa.Table) -> pa.Table:
        parts = []
        for c in cols:
            u = pc.unique(t[c]).drop_null().cast(pa.string())
            parts.append(pa.table({
                "col_name": pa.array([c] * len(u), pa.string()),
                "val": u,
            }))
        out = pa.concat_tables(parts)
        df = pl.from_arrow(out).with_columns(
            bucket=(pl.col("val").hash(seed=29) % np.uint64(num_buckets))
            .cast(pl.Int32))
        return df.to_arrow().cast(pa.schema([
            ("col_name", pa.string()), ("val", pa.string()),
            ("bucket", pa.int32())]))

    def _bucket_distinct(t: pa.Table) -> pa.Table:
        out = (
            pl.from_arrow(t.select(["col_name", "val"]))
            .unique()
            .group_by("col_name")
            .agg(nd=pl.len().cast(pl.Int64))
        )
        return out.to_arrow().cast(pa.schema([
            ("col_name", pa.string()), ("nd", pa.int64())]))

    def _attach(t: pa.Table) -> pa.Table:
        names = t["col_name"].to_pylist()
        return pa.table({
            "col_name": pa.array(names, pa.string()),
            "n_rows": pa.array(
                [stats[c]["n_rows"] for c in names], pa.int64()),
            "n_null": pa.array(
                [stats[c]["n_null"] for c in names], pa.int64()),
            "n_distinct": t["n_distinct"].cast(pa.int64()),
            "min_str": pa.array(
                [stats[c]["min_str"] for c in names], pa.string()),
            "max_str": pa.array(
                [stats[c]["max_str"] for c in names], pa.string()),
        })

    distinct = (
        bucket_partition(
            ds.map_batches(_distinct_partial, batch_format="pyarrow"),
            _bucket_distinct, num_buckets)
        .groupby("col_name")
        .aggregate(Sum("nd", alias_name="n_distinct"))
        .map_batches(_attach, batch_format="pyarrow")
    )

    allnull = [c for c in cols
               if stats[c]["n_null"] == stats[c]["n_rows"]]
    if allnull:
        import ray.data as rd
        extra = pa.table({
            "col_name": pa.array(allnull, pa.string()),
            "n_rows": pa.array(
                [stats[c]["n_rows"] for c in allnull], pa.int64()),
            "n_null": pa.array(
                [stats[c]["n_null"] for c in allnull], pa.int64()),
            "n_distinct": pa.array([0] * len(allnull), pa.int64()),
            "min_str": pa.nulls(len(allnull), pa.string()),
            "max_str": pa.nulls(len(allnull), pa.string()),
        })
        distinct = distinct.union(rd.from_arrow(extra))
    return distinct


def key_skew_stats(ds, key_col: str, top_n: int = 10):
    """→ (rank, key, n_rows, permille): the ``top_n`` heaviest keys and
    their integer per-mille share of all rows — the skew diagnosis a
    planner runs before hash-partitioning on a key (the engine's own
    hot-block cap and key salting want exactly this number). Ties break
    (n DESC, key ASC) so the SQL row_number twin is value-exact;
    permille = n * 1000 // total keeps the share integer.

    Scale shape: per-block (key, n) partial counts (hot keys are ONE
    partial per block — the combiner is the skew mitigation), a
    key-vocabulary grouped sum, and the rank + total in one
    vocabulary-sized task (same argument as daily_deltas: the
    post-aggregate table is key-vocabulary-sized)."""
    from ray.data.aggregate import Sum

    tn = int(top_n)

    def _partial(t: pa.Table) -> pa.Table:
        df = (pl.from_arrow(t.select([key_col]))
              .group_by(key_col).agg(n=pl.len().cast(pl.Int64))
              .rename({key_col: "key"}))
        return df.to_arrow().cast(pa.schema([
            ("key", pa.int64()), ("n", pa.int64())]))

    def _rank(t: pa.Table) -> pa.Table:
        k = t["key"].to_numpy()
        n = t["n_sum"].to_numpy().astype(np.int64)
        total = int(n.sum())
        order = np.lexsort((k, -n))[:tn]
        nn = n[order]
        return pa.table({
            "rank": pa.array(np.arange(1, len(order) + 1,
                                       dtype=np.int64)),
            "key": pa.array(k[order]),
            "n_rows": pa.array(nn),
            "permille": pa.array(nn * 1000 // max(total, 1)),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n_sum"))
        .repartition(1)
        .map_batches(_rank, batch_format="pyarrow", batch_size=None)
    )


def source_length_drift(docs, group_col: str = "source",
                        val_col: str = "n_chars"):
    """→ (source, n_docs, drift_permille): per-source distribution drift
    — the L1 distance between the source's document-length histogram and
    the GLOBAL one, both quantized to integer per-mille over floor(log2)
    buckets: drift = Σ_b |1000·n_sb/N_s − 1000·n_b/N| floored. The
    slice-skew monitor a mixing pipeline alarms on (0 = identical shape,
    up to 2000 = disjoint support).

    Scale shape: per-block (source, bucket, n) partials (sources × ≤64
    rows) into one grouped sum; a single scalar-sized merge computes the
    global distribution and every source's L1 — no data row ever
    shuffles."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[val_col].to_numpy(zero_copy_only=False), np.int64)
        e = np.full(len(x), -1, np.int64)
        pos = x >= 1
        if pos.any():
            e[pos] = np.frexp(x[pos].astype(np.float64))[1] - 1
        df = pl.DataFrame({
            "source": np.asarray(t[group_col].to_numpy(
                zero_copy_only=False)),
            "bucket": e,
        }).group_by(["source", "bucket"]).agg(n=pl.len().cast(pl.Int64))
        return df.to_arrow().cast(pa.schema(
            [("source", pa.string()), ("bucket", pa.int64()),
             ("n", pa.int64())]))

    regs = (
        docs.map_batches(_partial, batch_format="pyarrow")
        .groupby(["source", "bucket"]).aggregate(Sum("n", alias_name="n"))
    )

    out_schema = pa.schema([("source", pa.string()),
                            ("n_docs", pa.int64()),
                            ("drift_permille", pa.int64())])

    def _merge(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t.select(["source", "bucket", "n"]))
        glob = df.group_by("bucket").agg(gn=pl.col("n").sum())
        N = int(glob["gn"].sum())
        sizes = df.group_by("source").agg(ns=pl.col("n").sum())
        full = (sizes.join(glob, how="cross")
                .join(df, on=["source", "bucket"], how="left")
                .with_columns(n=pl.col("n").fill_null(0)))
        ps = (1000 * full["n"].to_numpy()) // full["ns"].to_numpy()
        pg = (1000 * full["gn"].to_numpy()) // N
        out = (full.with_columns(d=pl.Series(np.abs(ps - pg)))
               .group_by("source")
               .agg(n_docs=pl.col("ns").first().cast(pl.Int64),
                    drift_permille=pl.col("d").sum().cast(pl.Int64)))
        return out.to_arrow().cast(out_schema)

    return regs.repartition(1).map_batches(
        _merge, batch_format="pyarrow", batch_size=None)
