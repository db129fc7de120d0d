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
        # per-pair exponential search on k (the reference's levenshtein_exp
        # schedule, levenshtein.rs:1445-1454, vectorized): each pair starts
        # at a power-of-two informed by its bag lower bound (so the first,
        # narrow-band DP usually resolves it) and doubles only on failure.
        # Identical results to a single full-k run — a k-bounded DP's
        # Some/None boundary is exact at every k.
        if todo.size:
            # start rung: first power of two covering ~the bag estimate, so
            # most pairs resolve in ONE uniform-k call (a call mixes one k
            # only — the chunk band is the call's max k, so heterogeneous k
            # in one call makes narrow pairs pay the widest band)
            start = np.maximum(8, np.ceil(1.25 * bag[todo]).astype(np.int64) + 4)
            rung = (1 << np.ceil(np.log2(start)).astype(np.int64))
            rung = np.minimum(rung, kvec[todo])
            while todo.size:
                kb = int(rung.min())
                grp = rung == kb
                run = todo[grp]
                k_sub = np.minimum(kb, kvec[run])
                sub = batch.take(pa.array(run))
                d = levenshtein_k_batch(
                    sub["a_text"], sub["b_text"], k_sub, self.costs
                )
                dist[run] = d
                done = (d >= 0) | (k_sub >= kvec[run])
                next_rung = np.minimum(kb * 2, kvec[run][~done])
                todo = np.concatenate([run[~done], todo[~grp]])
                rung = np.concatenate([next_rung, rung[~grp]])

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


def build_text_index(docs_table: pa.Table):
    """(conv_id arrow array, aligned doc_text arrow array) for broadcast
    lookup: `ray.put` once, `pc.index_in` (C++ hash lookup) + `take` per
    batch — no per-row Python, no object-dtype string comparisons (a
    numpy searchsorted over to_numpy'd strings compares python objects
    in the scoring hot path)."""
    ids = docs_table["conv_id"]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    texts = docs_table["doc_text"]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    return ids, texts


def build_text_index_remote(doc_part_refs=None, docs_dir: str = None):
    """Build the broadcast text index in a REMOTE task and return the
    ObjectRef of its result.

    The driver-side form (collect parts -> concat -> combine_chunks ->
    ray.put) is serial O(corpus bytes) on the critical path BEFORE the
    scored stream can start: the collect and the combine are each a full
    memcpy of the text, and ray.put is a third. Building in a worker task
    instead (a) moves those copies off the driver and (b) overlaps the
    build with the read/block/pair stages — the scorer's first batch
    blocks on ``ray.get(index_ref)`` only if the index isn't ready yet.

    Pass either ``doc_part_refs`` (ObjectRefs of arrow tables with
    conv_id/doc_text — e.g. ``ds.to_arrow_refs()`` of a materialized
    dataset) or ``docs_dir`` (a checkpoint directory of parquet parts,
    read inside the task so the driver never touches the bytes).
    """
    import ray

    @ray.remote(num_cpus=1)
    def _from_parts(*parts):
        tab = pa.concat_tables([t for t in parts if t.num_rows > 0])
        return build_text_index(tab)

    @ray.remote(num_cpus=1)
    def _from_dir(d):
        import pyarrow.parquet as pq

        return build_text_index(
            pq.read_table(d, columns=["conv_id", "doc_text"])
        )

    if docs_dir is not None:
        return _from_dir.remote(docs_dir)
    return _from_parts.remote(*doc_part_refs)


class BroadcastTextScorer(PairScorer):
    """PairScorer over id-only pairs; texts resolved from a broadcast
    (ray.put) index. The small-side-broadcast alternative to the two text
    joins — valid while the docs table fits comfortably in the object store
    (config threshold); the join path is the 100TB-scale default."""

    def __init__(self, index_ref, **kw):
        super().__init__(**kw)
        self.index_ref = index_ref
        self._index = None

    def _lookup(self, id_col) -> pa.Array:
        if self._index is None:
            import ray

            self._index = ray.get(self.index_ref)
        ids, texts = self._index
        import pyarrow.compute as pc

        pos = pc.index_in(id_col, value_set=ids)
        if pos.null_count:
            raise KeyError("pair references unknown conv_id")
        return texts.take(pos)

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = pa.table(
            {
                "a_id": batch["a_id"],
                "b_id": batch["b_id"],
                "a_text": self._lookup(batch["a_id"]),
                "b_text": self._lookup(batch["b_id"]),
            }
        )
        return super().__call__(batch)


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


def explain_edges(edges_with_texts, costs: EditCosts = LEVENSHTEIN_COSTS,
                  k_col: str = "k"):
    """Attach the RLE edit traceback (reference Edit semantics,
    levenshtein.rs:376-607 trace path) to match edges as a
    ``list<struct<edit, count>>`` column.

    Uses the batch-vectorized trace DP (``levenshtein_k_batch_trace``,
    trace-parity-tested against the scalar kernel) traced at k = dist, the
    tightest valid band."""
    import numpy as np

    from ..kernels.batch import levenshtein_k_batch_trace

    trace_type = pa.list_(
        pa.struct([("edit", pa.string()), ("count", pa.int64())])
    )

    def _explain(t: pa.Table) -> pa.Table:
        # the known distance is the tightest valid bound — tracing at
        # k=dist uses the narrowest band (identical trace semantics)
        if "dist" in t.column_names:
            ks = np.maximum(0, t["dist"].to_numpy(zero_copy_only=False))
        elif k_col in t.column_names:
            ks = np.maximum(0, t[k_col].to_numpy(zero_copy_only=False))
        else:
            ks = np.full(t.num_rows, 1 << 30, dtype=np.int64)
        _, raw = levenshtein_k_batch_trace(
            t["a_text"], t["b_text"], np.asarray(ks, dtype=np.int64), costs
        )
        traces = [
            None if tr is None else [
                {"edit": e.edit, "count": e.count} for e in tr
            ]
            for tr in raw
        ]
        return t.append_column("trace", pa.array(traces, trace_type))

    return edges_with_texts.map_batches(_explain, batch_format="pyarrow")


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

    from .shuffle import bucket_partition

    return bucket_partition(
        scored.map_batches(_filter_bucket, batch_format="pyarrow"),
        _dedup, num_buckets,
    )
