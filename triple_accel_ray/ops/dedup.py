"""Deduplication operators over document tables.

Five families, each a Ray-Data composition (hash-bucket shuffles, vectorized
batch bodies — the same patterns as the ER pipeline):

  * exact          — content-hash groupby, keep min doc_id
  * minhash-LSH    — shingle → minhash → band → bucket groupby → verified
                     candidate pairs (exact shingle-set Jaccard)
  * simhash        — 64-bit simhash over token hashes, near-dup within
                     hamming radius via rotated-prefix bucketing
  * n-gram Jaccard — exact char n-gram set Jaccard on candidate pairs
  * embedding      — cosine near-dup pairs over an embedding column
"""

from __future__ import annotations

import hashlib

import numpy as np
import polars as pl
import pyarrow as pa

from ..kernels.batch import to_byte_rows
from ..pipeline.blocking import BlockKeyer, _mix64


# --------------------------------------------------------------- exact

def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    h = [
        hashlib.blake2b((t or "").encode(), digest_size=12).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("content_hash", pa.array(h, pa.string()))


def exact_dup_groups(docs, id_col: str = "doc_id", text_col: str = "text",
                     num_buckets: int = 32):
    """→ (id, dup_group, group_size): dup_group = min id sharing identical
    text. One shuffle keyed by content hash (bucketed)."""

    def _bucketize(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col)
        df = pl.from_arrow(t.select([id_col, "content_hash"]))
        df = df.with_columns(
            (pl.col("content_hash").hash(seed=5) % np.uint64(num_buckets))
            .cast(pl.Int32).alias("bucket")
        )
        return df.to_arrow()

    def _group(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        out = (
            df.with_columns(
                dup_group=pl.col(id_col).min().over("content_hash"),
                group_size=pl.len().over("content_hash").cast(pl.Int64),
            )
            .select([id_col, "dup_group", "group_size"])
            .sort(id_col)
        )
        return out.to_arrow()

    return (
        docs.map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_group, batch_format="pyarrow")
    )


# ----------------------------------------------------------- minhash LSH

def _shingle_set_jaccard(a_texts, b_texts, shingle: int = 5) -> np.ndarray:
    """Exact char-shingle-set Jaccard per pair (vectorized hashing, per-pair
    set ops on small arrays)."""
    out = np.zeros(len(a_texts), dtype=np.float64)
    for i, (a, b) in enumerate(zip(a_texts, b_texts)):
        ab = a.encode() if isinstance(a, str) else a
        bb = b.encode() if isinstance(b, str) else b
        sa = {ab[j : j + shingle] for j in range(max(0, len(ab) - shingle + 1))}
        sb = {bb[j : j + shingle] for j in range(max(0, len(bb) - shingle + 1))}
        if not sa and not sb:
            out[i] = 1.0
        elif not sa or not sb:
            out[i] = 0.0
        else:
            inter = len(sa & sb)
            out[i] = inter / (len(sa) + len(sb) - inter)
    return out


def minhash_dup_pairs(docs, id_col: str = "doc_id", text_col: str = "text",
                      threshold: float = 0.7, num_buckets: int = 32,
                      n_bands: int = 16, num_perm: int = 64,
                      hot_block_cap: int = 64, hot_block_window: int = 8):
    """→ verified near-dup pairs (a_id, b_id, jaccard >= threshold).

    shingle→minhash→band (map) → bucket groupby (shuffle) → candidate pairs
    → exact-Jaccard verification (map). Same skew cap as the ER pair stage.
    """
    from ..pipeline.pairs import _bucket_to_pairs

    keyer = BlockKeyer(
        num_perm=num_perm, n_bands=n_bands, carry_text=True, families=("mh",)
    )

    def _keys(t: pa.Table) -> pa.Table:
        src = pa.table(
            {
                "conv_id": t[id_col].cast(pa.string()),
                "doc_text": t[text_col],
                "doc_len": pa.compute.binary_length(t[text_col]).cast(pa.int64()),
                "role_sig": pa.array([""] * t.num_rows, pa.string()),
            }
        )
        # keyer emits only the mh family (families=("mh",)) — no structure
        # keys for generic dedup
        keyed = keyer(src)
        df = pl.from_arrow(keyed)
        df = df.with_columns(
            (pl.col("block_key").hash(seed=1) % np.uint64(num_buckets))
            .cast(pl.Int32).alias("bucket")
        )
        return df.to_arrow()

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a_id": pa.array([], pa.string()),
                 "b_id": pa.array([], pa.string()),
                 "jaccard": pa.array([], pa.float64())}
            )
        j = _shingle_set_jaccard(t["a_text"].to_pylist(), t["b_text"].to_pylist())
        out = pa.table(
            {"a_id": t["a_id"], "b_id": t["b_id"],
             "jaccard": pa.array(j, pa.float64())}
        )
        return out.filter(pa.compute.greater_equal(out["jaccard"], threshold))

    pairs = (
        docs.map_batches(_keys, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            _bucket_to_pairs, batch_format="pyarrow",
            fn_kwargs={"cap": hot_block_cap, "window": hot_block_window},
        )
    )
    return pairs.map_batches(_verify, batch_format="pyarrow")


# --------------------------------------------------------------- simhash

def simhash_batch(texts, gram: int = 4) -> np.ndarray:
    """64-bit simhash per row over char n-gram hashes (vectorized: flat
    n-gram hashing + per-bit segmented counts)."""
    data, offsets = to_byte_rows(texts)
    n = len(offsets) - 1
    lens = np.diff(offsets)
    counts = np.maximum(0, lens - gram + 1).astype(np.int64)
    total = int(counts.sum())
    out = np.zeros(n, dtype=np.uint64)
    if not total:
        return out
    doc_of = np.repeat(np.arange(n), counts)
    cum = np.zeros(n, dtype=np.int64)
    np.cumsum(counts[:-1], out=cum[1:])
    pos = offsets[:-1][doc_of] + (np.arange(total) - cum[doc_of])
    h = np.zeros(total, dtype=np.uint64)
    coef = np.uint64(0x100000001B3)
    for kk in range(gram):
        h = (h ^ data[pos + kk].astype(np.uint64)) * coef
    h = _mix64(h)
    # per-bit balance: +1 when bit set, -1 otherwise, summed per doc
    has = counts > 0
    seg = cum[has]
    for bit in range(64):
        vote = (((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2) - 1
        bal = np.add.reduceat(vote, seg)
        set_bit = np.zeros(n, dtype=np.uint64)
        set_bit[has] = (bal > 0).astype(np.uint64)
        out |= set_bit << np.uint64(bit)
    return out


def simhash_dup_pairs(docs, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, num_buckets: int = 32):
    """Near-dup pairs with simhash hamming distance <= max_hamming.

    Candidate generation: 4 × 16-bit bands of the simhash (any pair within
    hamming 3 shares at least one exact band — pigeonhole), then exact
    popcount verification inside the bucket. Recall is guaranteed only for
    ``max_hamming <= 3``; larger radii are best-effort with these bands.
    """

    def _sim(t: pa.Table) -> pa.Table:
        sh = simhash_batch(t[text_col])
        rows = []
        ids = t[id_col].cast(pa.string()).to_pylist()
        for band in range(4):
            key = ((sh >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64)
            rows.append(
                pa.table(
                    {
                        "block_key": pa.array(
                            [f"sh{band}:{k}" for k in key], pa.string()
                        ),
                        "conv_id": pa.array(ids, pa.string()),
                        "doc_text": t[text_col],
                        "doc_len": pa.array(sh.astype(np.int64), pa.int64()),
                    }
                )
            )
        out = pa.concat_tables(rows)
        df = pl.from_arrow(out)
        return df.with_columns(
            (pl.col("block_key").hash(seed=1) % np.uint64(num_buckets))
            .cast(pl.Int32).alias("bucket")
        ).to_arrow()

    from ..pipeline.pairs import _bucket_to_pairs

    def _verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"a_id": pa.array([], pa.string()),
                 "b_id": pa.array([], pa.string()),
                 "hamming64": pa.array([], pa.int64())}
            )
        ha = simhash_batch(t["a_text"])
        hb = simhash_batch(t["b_text"])
        x = ha ^ hb
        pop = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            pop += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        out = pa.table(
            {"a_id": t["a_id"], "b_id": t["b_id"],
             "hamming64": pa.array(pop, pa.int64())}
        )
        return out.filter(pa.compute.less_equal(out["hamming64"], max_hamming))

    return (
        docs.map_batches(_sim, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            _bucket_to_pairs, batch_format="pyarrow",
            fn_kwargs={"cap": 64, "window": 8},
        )
        .map_batches(_verify, batch_format="pyarrow")
    )


# ------------------------------------------------------ embedding cosine

def embedding_dup_pairs(embeddings, threshold: float = 0.95,
                        id_col: str = "vec_id", vec_col: str = "embedding"):
    """Cosine near-dup pairs: every batch scores against a broadcast
    normalized corpus matrix (ray.put once, read per task — no shuffle).
    Exact at small corpus scale; the LSH-bucketed variant in similarity.py
    is the scale path."""
    import ray

    mat_table = embeddings.select_columns([id_col, vec_col]).to_pandas()
    ids = mat_table[id_col].to_numpy()
    M = np.stack(mat_table[vec_col].to_numpy()).astype(np.float64)
    M /= np.maximum(1e-12, np.linalg.norm(M, axis=1))[:, None]
    ref = ray.put((ids, M))

    def _score(batch: pa.Table) -> pa.Table:
        all_ids, mat = ray.get(ref)
        q = np.stack(batch[vec_col].to_pandas().to_numpy()).astype(np.float64)
        q /= np.maximum(1e-12, np.linalg.norm(q, axis=1))[:, None]
        qids = batch[id_col].to_numpy()
        sims = q @ mat.T
        a_out, b_out, s_out = [], [], []
        for r in range(sims.shape[0]):
            hit = np.nonzero(sims[r] >= threshold)[0]
            for c in hit:
                if qids[r] < all_ids[c]:
                    a_out.append(int(qids[r]))
                    b_out.append(int(all_ids[c]))
                    s_out.append(float(sims[r, c]))
        return pa.table(
            {"a_id": pa.array(a_out, pa.int64()),
             "b_id": pa.array(b_out, pa.int64()),
             "cosine": pa.array(s_out, pa.float64())}
        )

    return embeddings.map_batches(_score, batch_format="pyarrow")
