"""Stage 1: transcripts → one document row per conversation.

Ray-Data shape: one hash-bucket shuffle (``shuffle.bucket_partition`` —
sort with explicit per-bucket boundaries, one reduce partition per bucket)
followed by a *vectorized* per-bucket aggregation in polars — the
per-conversation work is columnar inside each bucket task, so Python is
invoked once per bucket, not once per conversation. This is the engine's first shuffle (key = conv_id
via bucket) and establishes the per-row invariant from BASELINE.json
input_hint: doc_text = turn texts concatenated under stable turn_idx order.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

DOC_JOINER = "\n"


def _add_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    df = pl.from_arrow(batch)
    df = df.with_columns(
        (pl.col("conv_id").hash(seed=0) % np.uint64(num_buckets))
        .cast(pl.Int32)
        .alias("bucket")
    )
    return df.to_arrow()


def _bucket_to_docs(batch: pa.Table) -> pa.Table:
    df = pl.from_arrow(batch)
    docs = (
        df.sort(["conv_id", "turn_idx"])
        .group_by("conv_id", maintain_order=True)
        .agg(
            doc_text=pl.col("text").str.join(DOC_JOINER),
            n_turns=pl.len().cast(pl.Int64),
            role_sig=pl.col("role").str.slice(0, 1).str.join(""),
            tool_sig=pl.col("tool")
            .filter(pl.col("tool") != "")
            .unique()
            .sort()
            .str.join(","),
            ts_min=pl.col("ts").min(),
            ts_max=pl.col("ts").max(),
        )
        .with_columns(
            doc_len=pl.col("doc_text").str.len_bytes().cast(pl.Int64)
        )
    )
    out = docs.to_arrow()
    # polars emits large_string; normalize to string for stable schemas
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("doc_text", pa.string()),
            ("n_turns", pa.int64()),
            ("role_sig", pa.string()),
            ("tool_sig", pa.string()),
            ("ts_min", pa.timestamp("us")),
            ("ts_max", pa.timestamp("us")),
            ("doc_len", pa.int64()),
        ]
    )
    return out.select(schema.names).cast(schema)


def build_docs(transcripts, num_buckets: int = 64):
    """transcripts Dataset → docs Dataset (one row per conv_id).

    A conversation's turns land in one bucket (hash(conv_id)), so the
    per-bucket aggregation sees every turn of each of its conversations —
    the partitioning assumption this stage relies on.
    """
    from .shuffle import bucket_partition

    return bucket_partition(
        transcripts.map_batches(
            _add_bucket,
            batch_format="pyarrow",
            fn_kwargs={"num_buckets": num_buckets},
        ),
        _bucket_to_docs, num_buckets,
    )


def build_docs_local(transcripts_table: pa.Table) -> pa.Table:
    """Single-process variant (tests / oracle comparisons)."""
    return _bucket_to_docs(transcripts_table)
