"""Stage 4: candidate pairs → scored pairs (the kernel hot loop).

Ray-Data shape: stateless-or-actor-pool ``map_batches`` whose body is the
whole-batch banded DP from ``kernels.batch`` (numpy across the pair
dimension — no per-row Python). Fast paths per batch, in order:

  1. exact equality (``pyarrow.compute.equal``) → dist 0, no DP;
  2. per-pair bound k = clip(rel_k·max_len, abs_min_k, abs_max_k); pairs
     whose length gap exceeds the band are -1 without touching the DP;
  3. banded DP with early exit for the rest.

This stage mirrors the reference's role split exactly: the engine moves the
data, the kernel (triple_accel semantics, levenshtein.rs:376-607) decides
``Some(dist) | None`` per pair.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.batch import bag_distance_batch, levenshtein_k_batch, to_byte_rows
from ..kernels.types import EditCosts, LEVENSHTEIN_COSTS


class PairScorer:
    def __init__(
        self,
        rel_k: float = 0.15,
        abs_min_k: int = 4,
        abs_max_k: int = 128,
        costs: EditCosts = LEVENSHTEIN_COSTS,
        min_similarity: float = 0.85,
    ):
        self.rel_k = rel_k
        self.abs_min_k = abs_min_k
        self.abs_max_k = abs_max_k
        self.costs = costs
        self.min_similarity = min_similarity

    def __call__(self, batch: pa.Table) -> pa.Table:
        a = batch["a_text"]
        b = batch["b_text"]
        _, oa = to_byte_rows(a)
        _, ob = to_byte_rows(b)
        la = np.diff(oa)
        lb = np.diff(ob)
        max_len = np.maximum(la, lb)
        kvec = np.clip(
            np.ceil(self.rel_k * max_len).astype(np.int64),
            self.abs_min_k,
            self.abs_max_k,
        )

        equal = pc.equal(
            a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
            b.combine_chunks() if isinstance(b, pa.ChunkedArray) else b,
        ).to_numpy(zero_copy_only=False)
        equal = np.asarray(equal, dtype=bool)

        dist = np.full(batch.num_rows, -1, dtype=np.int64)
        dist[equal] = 0
        # bag-distance lower bound: dist >= bag * min(mismatch, gap); pairs
        # whose bound already exceeds their k never touch the DP.
        bag = bag_distance_batch(a, b) * min(
            self.costs.mismatch_cost, self.costs.gap_cost
        )
        todo = np.nonzero(~equal & (bag <= kvec))[0]
        # exponential search on k (the reference's levenshtein_exp schedule,
        # levenshtein.rs:1445-1454, vectorized): most candidate pairs are
        # near-dups that resolve at a narrow band; only unresolved pairs pay
        # for wider bands — and a pair sits out rounds its lower bound
        # already rules out.
        k_round = 8
        while todo.size:
            ready = bag[todo] <= np.minimum(k_round, kvec[todo])
            run = todo[ready]
            if run.size:
                k_sub = np.minimum(k_round, kvec[run])
                sub = batch.take(pa.array(run))
                d = levenshtein_k_batch(
                    sub["a_text"], sub["b_text"], k_sub, self.costs
                )
                dist[run] = d
                done = (d >= 0) | (k_sub >= kvec[run])
                todo = np.concatenate([run[~done], todo[~ready]])
            k_round *= 2

        sim = np.where(
            dist >= 0,
            1.0 - dist / np.maximum(1, max_len),
            0.0,
        )
        is_match = (dist >= 0) & (sim >= self.min_similarity)
        return pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "dist": pa.array(dist, pa.int64()),
                "k": pa.array(kvec, pa.int64()),
                "a_len": pa.array(la, pa.int64()),
                "b_len": pa.array(lb, pa.int64()),
                "sim": pa.array(sim, pa.float64()),
                "is_match": pa.array(is_match, pa.bool_()),
            }
        )


def score_pairs(
    pairs,
    batch_size: int = 1024,
    concurrency=None,
    **scorer_kwargs,
):
    """pairs Dataset → scored Dataset. With ``concurrency`` set this becomes
    an actor pool (scorer state built once per actor); otherwise stateless
    tasks (the scorer is cheap to construct, so tasks are the default —
    elastic and no pool sizing to get wrong)."""
    if concurrency:
        return pairs.map_batches(
            PairScorer,
            fn_constructor_kwargs=scorer_kwargs,
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    scorer = PairScorer(**scorer_kwargs)
    return pairs.map_batches(
        scorer, batch_format="pyarrow", batch_size=batch_size
    )


def dedup_edges(scored, num_buckets: int = 32):
    """Scored pairs → unique match edges (a_id, b_id), deduping the
    cross-block duplicates. One hash-bucket shuffle keyed by the pair,
    vectorized first-wins inside each bucket."""
    import polars as pl

    def _filter_bucket(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["is_match"], True)).select(
            ["a_id", "b_id", "dist", "sim"]
        )
        df = pl.from_arrow(t)
        df = df.with_columns(
            ((pl.col("a_id").hash(seed=2) ^ pl.col("b_id").hash(seed=3))
             % np.uint64(num_buckets)).cast(pl.Int32).alias("bucket")
        )
        return df.to_arrow()

    def _dedup(batch: pa.Table) -> pa.Table:
        return (
            pl.from_arrow(batch)
            .unique(subset=["a_id", "b_id"], keep="first", maintain_order=True)
            .drop("bucket")
            .to_arrow()
            .cast(
                pa.schema(
                    [("a_id", pa.string()), ("b_id", pa.string()),
                     ("dist", pa.int64()), ("sim", pa.float64())]
                )
            )
        )

    return (
        scored.map_batches(_filter_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dedup, batch_format="pyarrow")
    )
