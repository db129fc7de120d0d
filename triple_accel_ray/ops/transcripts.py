"""Transcript-native analytics: per-conversation structure/timing stats
straight over the raw turns table (conv_id, turn_idx, role, text, tool,
ts) — the profiling pass an agent-transcript pipeline runs before any
document build (role mix, tool-call density, wall-clock span, step gaps).

Ray-Data shape: identical to the docs-build stage — one hash-bucket
shuffle keyed by conv_id (the pipeline's single partitioning key, reused
across every stage) via ``shuffle.bucket_partition``, then a vectorized
per-bucket polars aggregation: Python runs once per bucket, never per
conversation. All outputs are integers (timestamps as epoch
microseconds) so the DuckDB oracle reproduces them exactly.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

_STATS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("n_user", pa.int64()),
    ("n_assistant", pa.int64()),
    ("n_tool_calls", pa.int64()),
    ("n_distinct_tools", pa.int64()),
    ("text_bytes", pa.int64()),
    ("span_us", pa.int64()),
    ("max_step_us", pa.int64()),
])


def _project_turns(batch: pa.Table, num_buckets: int) -> pa.Table:
    """Pre-shuffle projection: replace text with its BYTE LENGTH and add
    the conv bucket. Text is ~95% of a turn row — the stats only need the
    length, so it must not ride the shuffle (measured at sf1.0: the
    text-carrying variant took 3.4x the docs build's identical shuffle)."""
    df = pl.from_arrow(batch)
    df = df.select(
        "conv_id", "turn_idx", "role", "tool", "ts",
        text_len=pl.col("text").str.len_bytes().cast(pl.Int64),
        bucket=(pl.col("conv_id").hash(seed=0) % np.uint64(num_buckets))
        .cast(pl.Int32),
    )
    return df.to_arrow()


def _bucket_to_stats(batch: pa.Table) -> pa.Table:
    df = pl.from_arrow(batch)
    ep = pl.col("ts").cast(pl.Int64)  # Datetime('us') -> epoch microseconds
    out = (
        df.sort(["conv_id", "turn_idx"])
        .group_by("conv_id", maintain_order=True)
        .agg(
            n_turns=pl.len().cast(pl.Int64),
            n_user=(pl.col("role") == "user").sum().cast(pl.Int64),
            n_assistant=(pl.col("role") == "assistant").sum().cast(pl.Int64),
            n_tool_calls=(pl.col("tool") != "").sum().cast(pl.Int64),
            n_distinct_tools=pl.col("tool")
            .filter(pl.col("tool") != "")
            .n_unique()
            .cast(pl.Int64),
            text_bytes=pl.col("text_len").sum().cast(pl.Int64),
            span_us=(ep.max() - ep.min()).cast(pl.Int64),
            # step = ts delta between consecutive turns in turn_idx order
            # (the fixture's ts are NOT monotone in turn_idx, so steps can
            # be negative; max is still well-defined). 0 for 1-turn convs.
            max_step_us=ep.diff().max().fill_null(0).cast(pl.Int64),
        )
    )
    return out.to_arrow().select(_STATS_SCHEMA.names).cast(_STATS_SCHEMA)


def conv_stats(transcripts, num_buckets: int = 64):
    """transcripts Dataset -> one stats row per conv_id.

    Partitioning assumption (same as the docs build): every turn of a
    conversation lands in one bucket (hash(conv_id)), so each per-bucket
    aggregation sees whole conversations. Unlike the docs build, the
    shuffle carries text LENGTHS, not text — the projection happens
    before the exchange.
    """
    from ..pipeline.shuffle import bucket_partition

    return bucket_partition(
        transcripts.map_batches(
            _project_turns,
            batch_format="pyarrow",
            fn_kwargs={"num_buckets": num_buckets},
        ),
        _bucket_to_stats, num_buckets,
    )


_LINT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("n_turns", pa.int64()),
    ("same_role_adjacent", pa.int64()),
    ("orphan_tool_turns", pa.int64()),
    ("ts_regressions", pa.int64()),
])


def conv_lint(transcripts, num_buckets: int = 32):
    """→ per-conversation structural lint counts — the data-quality gate
    an agent-transcript pipeline runs before training on the turns:

      same_role_adjacent  adjacent turns (by turn_idx) with equal role
      orphan_tool_turns   role='tool' turns whose previous turn is not
                          'assistant' (or that open the conversation)
      ts_regressions      adjacent turns whose timestamp goes backwards

    Same single conv_id-bucket shuffle as conv_turn_stats (text never
    rides — only the id-width columns move); the adjacent checks are
    one vectorized sorted shift per bucket. All counts integer; the SQL
    twin is LAG windows over (conv_id, turn_idx)."""
    from ..pipeline.shuffle import bucket_partition

    def _project(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            "conv_id", "turn_idx", "role", "ts",
            bucket=(pl.col("conv_id").hash(seed=0) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).to_arrow()

    def _lint(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _LINT_SCHEMA.empty_table()
        df = (
            pl.from_arrow(batch.select(["conv_id", "turn_idx", "role", "ts"]))
            .sort(["conv_id", "turn_idx"])
            .with_columns(
                prev_conv=pl.col("conv_id").shift(1),
                prev_role=pl.col("role").shift(1),
                prev_ts=pl.col("ts").shift(1),
            )
            .with_columns(first=pl.col("prev_conv") != pl.col("conv_id"))
            .with_columns(first=pl.col("first").fill_null(True))
        )
        out = df.group_by("conv_id").agg(
            n_turns=pl.len().cast(pl.Int64),
            same_role_adjacent=(~pl.col("first")
                                & (pl.col("role") == pl.col("prev_role")))
            .sum().cast(pl.Int64),
            orphan_tool_turns=((pl.col("role") == "tool")
                               & (pl.col("first")
                                  | (pl.col("prev_role") != "assistant")))
            .sum().cast(pl.Int64),
            ts_regressions=(~pl.col("first")
                            & (pl.col("ts") < pl.col("prev_ts")))
            .sum().cast(pl.Int64),
        )
        return out.to_arrow().cast(_LINT_SCHEMA)

    return bucket_partition(
        transcripts.map_batches(
            _project, batch_format="pyarrow", batch_size=4096),
        _lint, num_buckets,
    )


_SFT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int64()),        # the assistant turn's index
    ("prompt", pa.string()),
    ("response", pa.string()),
])


def sft_pairs(transcripts, num_buckets: int = 32):
    """→ (conv_id, turn_idx, prompt, response): every adjacent
    user → assistant turn pair, in turn order — the SFT training-pair
    extraction every LLM data pipeline runs over raw transcripts. A
    pair emits only when the assistant turn DIRECTLY follows the user
    turn (tool turns or same-role runs in between suppress it);
    turn_idx keys the assistant turn so row identity is stable.

    One conv_id-bucket shuffle (the pipeline's shared key) carrying
    (conv_id, turn_idx, role, text); one vectorized sorted shift per
    bucket. Text rides exactly once — unavoidable here, the text IS the
    output."""
    from ..pipeline.shuffle import bucket_partition

    def _project(batch: pa.Table) -> pa.Table:
        df = pl.from_arrow(batch)
        return df.select(
            "conv_id", "turn_idx", "role", "text",
            bucket=(pl.col("conv_id").hash(seed=0) % np.uint64(num_buckets))
            .cast(pl.Int32),
        ).to_arrow()

    def _pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return _SFT_SCHEMA.empty_table()
        df = (
            pl.from_arrow(batch.select(["conv_id", "turn_idx", "role",
                                        "text"]))
            .sort(["conv_id", "turn_idx"])
            .with_columns(
                prev_conv=pl.col("conv_id").shift(1),
                prev_role=pl.col("role").shift(1),
                prev_text=pl.col("text").shift(1),
            )
            .filter((pl.col("role") == "assistant")
                    & (pl.col("prev_role") == "user")
                    & (pl.col("prev_conv") == pl.col("conv_id")))
            .select(
                "conv_id",
                pl.col("turn_idx").cast(pl.Int64),
                prompt=pl.col("prev_text"),
                response=pl.col("text"),
            )
        )
        return df.to_arrow().cast(_SFT_SCHEMA)

    return bucket_partition(
        transcripts.map_batches(
            _project, batch_format="pyarrow", batch_size=4096),
        _pairs, num_buckets,
    )
