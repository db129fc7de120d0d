"""Training-data export operators: deterministic shuffle-shard export,
weighted source mixing, and greedy sequence packing.

The three shapes that sit between a curated corpus and a training job:

* ``shuffle_shard_export`` — a seeded GLOBAL shuffle expressed without a
  ``random_shuffle`` all-to-all: every row gets a 64-bit pseudo-random
  rank ``mix64(id ^ SHUFFLE_SALT)``; shard = rank % n_shards is a
  stateless ``map_batches`` tag, and only the per-shard ORDER needs a
  shuffle — one boundary-partitioned bucket shuffle carrying id-width
  rows, then a local vectorized sort per shard.  The (shard, pos)
  assignment depends only on ids, so reruns, resumed runs and different
  partitionings produce byte-identical shards (resumable export — a
  failed run re-writes only missing shards).
* ``mixture_sample`` — compose a training mix to TARGET proportions
  (e.g. 50% src0 / 30% src1 / 20% src2) without upsampling: the largest
  total T with T*w_s <= n_s for every weighted source is computed from a
  vocabulary-sized count aggregate, then each source keeps its target
  count via the same salted-hash threshold rule as
  ``curation.stratified_sample`` (zero shuffle, order-independent).  All
  arithmetic is integer, so a DuckDB oracle replays it exactly.
* ``pack_sequences`` — greedy first-fit-in-order packing of documents
  into fixed token budgets (the classic LLM pretraining step): docs are
  laid out in the seeded shuffle order, cut into shards, and each shard
  packs independently — pack k ends at the last doc whose running token
  sum still fits the budget (an over-budget doc gets a pack of its own).
  The per-shard body loops over PACKS (one ``np.searchsorted`` into the
  cumulative token sum each), never over rows; shards bound the
  sequential span, so parallelism = n_shards regardless of corpus size.

No counterpart in the reference repo (/root/reference is a pairwise
string-distance library); these cover the export tail of the brief's
training-data-pipeline list.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..pipeline.blocking import _mix64
from ..pipeline.shuffle import bucket_partition

# public wyhash secret constants — decorrelated from every other salt in
# the repo (curation.SAMPLE_SALT is 0xA0761D6478BD642F)
SHUFFLE_SALT = np.uint64(0xE7037ED1A0B428DB)
MIXTURE_SALT = np.uint64(0x8EBC6AF09C88C6E3)


def _rank_of(ids: np.ndarray, salt: np.uint64) -> np.ndarray:
    return _mix64(ids.astype(np.uint64) ^ salt)


def _tag_ranked(n_shards: int, id_col: str, text_col: str,
                token_col: str | None, with_tokens: bool):
    """Shared shuffle-tag stage: (shard, rank[, id, token_count]) from the
    seeded rank ``mix64(id ^ SHUFFLE_SALT)``.  One definition so every
    export entry point shards and orders identically (reruns across entry
    points stay byte-compatible)."""
    from .text import token_count_batch

    n = np.uint64(n_shards)

    def _tag(t: pa.Table) -> pa.Table:
        cols = {}
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        r = _rank_of(ids, SHUFFLE_SALT)
        cols["shard"] = pa.array((r % n).astype(np.int64))
        cols["rank"] = pa.array(r)
        cols[id_col] = t[id_col]
        if with_tokens:
            if token_col is not None:
                cols["token_count"] = t[token_col].cast(pa.int64())
            else:
                cols["token_count"] = token_count_batch(
                    t.select([id_col, text_col]), text_col)["token_count"]
        return pa.table(cols)

    return _tag


def shuffle_shard_export(docs, n_shards: int, id_col: str = "doc_id"):
    """Deterministic global shuffle into ``n_shards`` ordered shards:
    rank = mix64(id ^ SHUFFLE_SALT); shard = rank % n_shards; pos = the
    row's 0-based position within its shard under (rank, id) order.

    Output columns: (shard int64, pos int64, id_col).  Only id-width rows
    ride the single bucket shuffle; at scale n_shards grows with the data
    (target rows per shard), and each output shard is one write task —
    the resumable-export layout.
    """
    n = int(n_shards)
    _tag = _tag_ranked(n, id_col, "", None, with_tokens=False)

    def _order(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "pos": pa.array([], pa.int64()),
                id_col: pa.array([], t.schema.field(id_col).type),
            })
        r = t["rank"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, r))
        return pa.table({
            "shard": t["shard"].take(pa.array(order)),
            "pos": pa.array(np.arange(len(r), dtype=np.int64)),
            id_col: t[id_col].take(pa.array(order)),
        })

    tagged = docs.map_batches(_tag, batch_format="pyarrow")
    return bucket_partition(tagged, _order, n, bucket_col="shard")


def mixture_targets(counts: dict, weights_permille: dict) -> dict:
    """Exact integer mixture math, shared with the SQL oracle: given
    per-source row counts and target weights (permille), the largest
    total ``T = min_s floor(n_s * 1000 / w_s)`` keeps every weighted
    source fully proportional without upsampling; source s then targets
    ``t_s = floor(T * w_s / 1000)`` rows via acceptance threshold
    ``floor(t_s * 2^64 / n_s)`` on the salted hash rank.  Empty when no
    weighted source has rows (the mix is then empty, not an error)."""
    eligible = [
        (counts[s] * 1000) // w
        for s, w in weights_permille.items()
        if w > 0 and counts.get(s, 0) > 0
    ]
    if not eligible:
        return {}
    t_total = min(eligible)
    out = {}
    for s, w in weights_permille.items():
        n_s = counts.get(s, 0)
        if n_s <= 0 or w <= 0:
            continue
        t_s = (t_total * w) // 1000
        out[s] = ((t_s << 64) // n_s) if t_s < n_s else (1 << 64)
    return out


def _source_counts(docs, strat_col: str) -> dict:
    """Vocabulary-sized per-source count aggregate: per-block partial
    counts merged on the driver (one row per source, never per document).
    Null sources are counted under ``None`` (never weighted -> dropped by
    the mixture filter rather than crashing the job).

    NOTE: consuming the counts executes the upstream pipeline once; the
    later filter pass executes it again.  Callers whose upstream is more
    than a column-pruned read should ``materialize()`` first (see
    ``curation_pipeline``, which materializes its id-width survivors)."""
    import ray

    def _partial(t: pa.Table) -> pa.Table:
        col = t[strat_col]
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        src = col.to_numpy(zero_copy_only=False)[valid]
        uniq, cnt = np.unique(src, return_counts=True)
        n_null = int((~valid).sum())
        if n_null:
            uniq = np.concatenate([uniq, [None]])
            cnt = np.concatenate([cnt, [n_null]])
        return pa.table({
            strat_col: pa.array(uniq),
            "n": pa.array(cnt.astype(np.int64)),
        })

    counts: dict = {}
    for part in ray.get(
        docs.map_batches(_partial, batch_format="pyarrow").to_arrow_refs()
    ):
        for s, c in zip(part[strat_col].to_pylist(), part["n"].to_pylist()):
            counts[s] = counts.get(s, 0) + c
    return counts


def _mixture_filter(thr: dict, id_col: str, strat_col: str,
                    keep_cols: list | None):
    """Stateless keep-iff-``mix64(id ^ MIXTURE_SALT) < thr[source]``
    batch filter; rows with null or unweighted sources are dropped."""
    def _flt(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = _rank_of(ids, MIXTURE_SALT)
        col = t[strat_col]
        valid = col.is_valid().to_numpy(zero_copy_only=False)
        src = col.to_numpy(zero_copy_only=False)
        keep = np.zeros(len(t), dtype=bool)
        for s in np.unique(src[valid]) if valid.any() else ():
            lim = thr.get(s)
            if lim is None:
                continue
            m = valid & (src == s)
            if lim >= (1 << 64):
                keep |= m
            else:
                keep |= m & (h < np.uint64(lim))
        out = t if keep_cols is None else t.select(keep_cols)
        return out.filter(pa.array(keep))

    return _flt


def mixture_sample(
    docs,
    weights_permille: dict,
    id_col: str = "doc_id",
    strat_col: str = "source",
):
    """Weighted source mixing to target proportions (downsampling only).

    Two passes, no shuffle: (1) a vocabulary-sized per-source count
    aggregate; (2) a stateless deterministic filter: keep iff
    ``mix64(id ^ MIXTURE_SALT) < threshold(source)``.  Unweighted (and
    null) sources are dropped.  The keep decision depends only on
    (id, source), so the mix is reproducible across reruns and
    partitionings.  Both passes execute the upstream pipeline — pass a
    materialized dataset when the upstream is expensive (see
    ``_source_counts``).
    """
    thr = mixture_targets(_source_counts(docs, strat_col), weights_permille)
    return docs.map_batches(
        _mixture_filter(thr, id_col, strat_col, [id_col, strat_col]),
        batch_format="pyarrow",
    )


def pack_greedy(token_counts: np.ndarray, budget: int) -> np.ndarray:
    """First-fit-in-order pack ids for an ordered token-count vector:
    pack k ends at the last index whose running sum since the pack start
    fits ``budget``; an over-budget document always advances by one (a
    pack of its own).  Loops over packs, not rows: each boundary is one
    ``np.searchsorted`` into the cumulative sum."""
    n = len(token_counts)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    cum = np.cumsum(token_counts.astype(np.int64))
    sizes = []
    start = 0
    while start < n:
        base = cum[start - 1] if start else 0
        j = int(np.searchsorted(cum, base + budget, side="right")) - 1
        j = max(j, start)  # force progress for over-budget docs
        sizes.append(j - start + 1)
        start = j + 1
    return np.repeat(np.arange(len(sizes), dtype=np.int64),
                     np.asarray(sizes))


def pack_sequences(
    docs,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
):
    """Greedy sequence packing: documents in seeded shuffle order, cut
    into ``n_shards`` independent shards (rank % n_shards), each shard
    packed first-fit-in-order into ``budget``-token packs.

    Token counts (whitespace rule, ``ops.text.token_count_batch``) are
    computed BEFORE the shuffle so only (shard, rank, id, token_count)
    rides it — text never does.  Pass ``token_col`` to reuse counts a
    prior stage already computed (``text_col`` is then ignored).
    Output: (shard int64, pack_id int64, id_col, token_count int64);
    pack_id is 0-based within its shard.
    """
    n = int(n_shards)
    b = int(budget)
    _tag = _tag_ranked(n, id_col, text_col, token_col, with_tokens=True)

    def _pack(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "shard": pa.array([], pa.int64()),
                "pack_id": pa.array([], pa.int64()),
                id_col: pa.array([], t.schema.field(id_col).type),
                "token_count": pa.array([], pa.int64()),
            })
        r = t["rank"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        tc = t["token_count"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, r))
        packs = pack_greedy(tc[order], b)
        idx = pa.array(order)
        return pa.table({
            "shard": t["shard"].take(idx),
            "pack_id": pa.array(packs),
            id_col: t[id_col].take(idx),
            "token_count": t["token_count"].take(idx),
        })

    tagged = docs.map_batches(_tag, batch_format="pyarrow")
    return bucket_partition(tagged, _pack, n, bucket_col="shard")


def curation_pipeline(
    docs,
    weights_permille: dict,
    budget: int,
    n_shards: int,
    min_tokens: int = 5,
    min_alpha_permille: int = 400,
    dedup_buckets: int = 32,
    id_col: str = "doc_id",
    strat_col: str = "source",
    text_col: str = "text",
):
    """The composed curation flagship: quality filter -> exact dedup
    (keep-first) -> weighted source mixing -> greedy sequence packing,
    end to end as one lazy Ray pipeline.

    Stage shapes (each the same discipline as its standalone operator):

    1. quality filter — stateless ``map_batches``: integer token count
       (whitespace rule) + byte-class counts; keep iff ``token_count >=
       min_tokens`` and ``alpha_count * 1000 >= n_bytes *
       min_alpha_permille``.  Text survives this stage only to feed the
       dedup shuffle.
    2. exact dedup keep-first — one text-wide bucketed shuffle keyed by
       the 2x64-bit content hash; group membership decided on the actual
       bytes (``ops.dedup`` discipline), survivors keep (id, source,
       token_count) and DROP the text.
    3. survivors materialize — id-width rows only (~24 B/row, object
       store, spillable): the mixture stage needs a count aggregate AND
       a filter pass over the same rows; materializing here prevents the
       dedup shuffle from executing twice.
    4. mixture — exact integer thresholds from ``mixture_targets`` over
       the survivor counts, stateless salted-hash filter.
    5. packing — ``pack_sequences`` on the precomputed token counts
       (id-width bucket shuffle, per-shard searchsorted greedy).

    Output: (shard int64, pack_id int64, id_col, token_count int64).
    """
    from .dedup import add_content_hash
    from .text import _byte_class_counts, token_count_batch

    def _quality(t: pa.Table) -> pa.Table:
        tc = token_count_batch(
            t.select([id_col, text_col]), text_col)["token_count"]
        bc = _byte_class_counts(t[text_col])
        tc_np = tc.to_numpy(zero_copy_only=False)
        keep = (tc_np >= min_tokens) & (
            bc["alpha_count"] * 1000 >= bc["n_bytes"] * min_alpha_permille
        )
        return pa.table({
            id_col: t[id_col],
            strat_col: t[strat_col],
            text_col: t[text_col],
            "token_count": tc,
        }).filter(pa.array(keep))

    def _bucketize(t: pa.Table) -> pa.Table:
        t = add_content_hash(t, text_col)
        bucket = (
            t["content_h1"].to_numpy() % np.uint64(dedup_buckets)
        ).astype(np.int32)
        return t.append_column("bucket", pa.array(bucket, pa.int32()))

    def _keep_first(t: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(t)
        out = df.filter(
            pl.col(id_col)
            == pl.col(id_col).min().over(
                ["content_h1", "content_h2", text_col])
        ).select([id_col, strat_col, "token_count"])
        return out.to_arrow()

    survivors = bucket_partition(
        docs.map_batches(_quality, batch_format="pyarrow")
        .map_batches(_bucketize, batch_format="pyarrow"),
        _keep_first, dedup_buckets,
    ).materialize()

    thr = mixture_targets(
        _source_counts(survivors, strat_col), weights_permille)
    mixed = survivors.map_batches(
        _mixture_filter(thr, id_col, strat_col, None),
        batch_format="pyarrow",
    )
    return pack_sequences(
        mixed, budget=budget, n_shards=n_shards,
        id_col=id_col, token_col="token_count",
    )


def write_packed_shards(
    docs,
    out_dir: str,
    budget: int,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
):
    """Resumable sharded export of ``pack_sequences``: each shard writes
    its pack table to ``out_dir/shard=K/part.parquet`` plus a MANIFEST
    written only after the data file is in place (write-temp + atomic
    rename).  A rerun SKIPS every shard whose manifest exists — and
    because shard contents are deterministic functions of the ids, the
    rerun regenerates byte-identical rows for only the missing shards.

    Manifests are VALIDATED on the skip path: a manifest recording a
    different (budget, n_shards) aborts the run (silently keeping shards
    packed under other parameters would corrupt the export), and a
    manifest written by THIS run for the same shard aborts too — it means
    the shard's reduce partition arrived split across blocks (the
    one-block-per-bucket contract of ``bucket_partition`` broke, e.g. a
    shard outgrew the dynamic block-split threshold; use more shards).

    The write happens INSIDE the per-shard task (workers write in
    parallel, nothing funnels through the driver); the returned Dataset
    is the vocabulary-sized summary (shard, rows, tokens, skipped).
    Shards that received zero rows write nothing and emit no summary row
    — a rerun re-derives them for free (zero rows), so absence from the
    summary means "empty", not "failed".
    """
    import json
    import os
    import uuid

    n = int(n_shards)
    b = int(budget)
    os.makedirs(out_dir, exist_ok=True)
    _tag = _tag_ranked(n, id_col, text_col, token_col, with_tokens=True)
    run_nonce = uuid.uuid4().hex

    def _summary(shard: int, rows: int, tokens: int, skipped: bool):
        return pa.table({
            "shard": pa.array([shard], pa.int64()),
            "rows": pa.array([rows], pa.int64()),
            "tokens": pa.array([tokens], pa.int64()),
            "skipped": pa.array([skipped], pa.bool_()),
        })

    def _pack_write(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _summary(-1, 0, 0, False).slice(0, 0)
        shard = int(t["shard"][0].as_py())
        sdir = os.path.join(out_dir, f"shard={shard}")
        manifest = os.path.join(sdir, "MANIFEST.json")
        if os.path.exists(manifest):
            with open(manifest) as f:
                m = json.load(f)
            if m.get("budget") != b or m.get("n_shards") != n:
                raise ValueError(
                    f"{manifest} was written with budget="
                    f"{m.get('budget')}, n_shards={m.get('n_shards')} — "
                    f"this run uses budget={b}, n_shards={n}; refusing to "
                    f"mix parameters in one export dir")
            if m.get("run_nonce") == run_nonce:
                raise RuntimeError(
                    f"shard {shard} arrived split across blocks in one "
                    f"run (bucket_partition's one-block-per-bucket "
                    f"contract broke — shard too large?); rows would be "
                    f"silently lost. Increase n_shards.")
            return _summary(shard, m["rows"], m["tokens"], True)
        r = t["rank"].to_numpy(zero_copy_only=False)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        tc = t["token_count"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, r))
        packs = pack_greedy(tc[order], b)
        idx = pa.array(order)
        table = pa.table({
            "pack_id": pa.array(packs),
            id_col: t[id_col].take(idx),
            "token_count": t["token_count"].take(idx),
        })
        import pyarrow.parquet as pq

        os.makedirs(sdir, exist_ok=True)
        tmp = os.path.join(sdir, "part.parquet.tmp")
        pq.write_table(table, tmp)
        os.replace(tmp, os.path.join(sdir, "part.parquet"))
        tokens = int(tc.sum())
        tmp_m = manifest + ".tmp"
        with open(tmp_m, "w") as f:
            json.dump({"shard": shard, "rows": t.num_rows,
                       "tokens": tokens, "budget": b, "n_shards": n,
                       "run_nonce": run_nonce}, f)
        os.replace(tmp_m, manifest)
        return _summary(shard, t.num_rows, tokens, False)

    tagged = docs.map_batches(_tag, batch_format="pyarrow")
    return bucket_partition(tagged, _pack_write, n, bucket_col="shard")


def zorder_keys(ds, col_x: str, col_y: str, bits: int = 16,
                id_col: str = "event_id"):
    """→ (id, zkey): the Morton/Z-order interleave of two columns, each
    first quantized to a ``bits``-bit rank within its own value range —
    the multi-dimensional LAYOUT key behind OPTIMIZE ZORDER: sorting a
    100 TB table by zkey co-locates rows that are close in BOTH columns,
    so min/max zone maps prune scans with predicates on either.

    Quantization is rank-free and exact: q = ((v − min) · (2^bits − 1))
    // (max − min) using the GLOBAL min/max (one streaming aggregate —
    the only pre-pass). Interleave places bit i of q_x at position 2i
    and of q_y at 2i+1. Deterministic integers end-to-end; the SQL twin
    unrolls the same shifts.

    The key computation itself is a stateless vectorized map — rows
    never shuffle here; the subsequent sort/write is the caller's
    existing export path."""
    import ray

    B = int(bits)

    mm = ds.map_batches(
        lambda t: pa.table({
            "xmin": pa.array([int(np.min(t[col_x].to_numpy()))], pa.int64()),
            "xmax": pa.array([int(np.max(t[col_x].to_numpy()))], pa.int64()),
            "ymin": pa.array([int(np.min(t[col_y].to_numpy()))], pa.int64()),
            "ymax": pa.array([int(np.max(t[col_y].to_numpy()))], pa.int64()),
        }) if t.num_rows else pa.table(
            {"xmin": pa.array([], pa.int64()),
             "xmax": pa.array([], pa.int64()),
             "ymin": pa.array([], pa.int64()),
             "ymax": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    parts = [t for t in ray.get(mm.to_arrow_refs()) if t.num_rows]
    if not parts:
        # empty/all-empty-block input: no min/max exists (ADVICE r3 —
        # pa.concat_tables([]) raises); emit the empty keyed table
        import ray.data as rd

        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "zkey": pa.array([], pa.int64()),
        }))
    tab = pa.concat_tables(parts)
    xmin = int(pa.compute.min(tab["xmin"]).as_py())
    xmax = int(pa.compute.max(tab["xmax"]).as_py())
    ymin = int(pa.compute.min(tab["ymin"]).as_py())
    ymax = int(pa.compute.max(tab["ymax"]).as_py())

    def _q(v, lo, hi):
        span = hi - lo
        if span == 0:
            return np.zeros(len(v), np.int64)
        return ((v - lo) * ((1 << B) - 1)) // span

    def _key(t: pa.Table) -> pa.Table:
        x = np.asarray(t[col_x].to_numpy(), np.int64)
        y = np.asarray(t[col_y].to_numpy(), np.int64)
        qx = _q(x, xmin, xmax).astype(np.uint64)
        qy = _q(y, ymin, ymax).astype(np.uint64)
        z = np.zeros(len(x), np.uint64)
        for i in range(B):
            z |= ((qx >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i)
            z |= ((qy >> np.uint64(i)) & np.uint64(1)) << np.uint64(2 * i + 1)
        return pa.table({
            id_col: t[id_col],
            "zkey": pa.array(z.astype(np.int64), pa.int64()),
        })

    return ds.map_batches(_key, batch_format="pyarrow")


def chunk_documents(docs, chunk_bytes: int = 200, stride: int = 150,
                    id_col: str = "doc_id", text_col: str = "text"):
    """→ (doc_id, chunk_idx, chunk_text, n_bytes): split every document
    into fixed-grammar overlapping byte windows — the RAG / training
    chunking pass. Chunk i covers [i·stride, i·stride + chunk_bytes);
    chunks start at every stride offset < len (so a document shorter
    than one chunk still yields its single short chunk), and the final
    window clips at the document end. The grammar is pure arithmetic,
    so the SQL twin (substr over a generated range) is byte-exact.

    Stateless row EXPANSION (flat_map shape) — vectorized: per batch,
    one repeat/arange builds every (doc, chunk) pair and one zero-copy
    substring gather cuts the windows; no shuffle anywhere."""
    import pyarrow.compute as pc

    out_schema = pa.schema([
        ("doc_id", pa.int64()), ("chunk_idx", pa.int64()),
        ("chunk_text", pa.string()), ("n_bytes", pa.int64()),
    ])

    def _chunks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        lens = pc.binary_length(t[text_col]).to_numpy().astype(np.int64)
        # number of stride-aligned starts < len (min 1 so empty docs
        # still emit one empty chunk row? no: zero-length docs emit 0)
        n_chunks = np.where(
            lens > 0, (np.maximum(lens - 1, 0) // stride) + 1, 0)
        doc_of = np.repeat(np.arange(len(lens)), n_chunks)
        cum = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(n_chunks, out=cum[1:])
        idx = np.arange(int(cum[-1])) - cum[doc_of]
        start = idx * stride
        width = np.minimum(chunk_bytes, lens[doc_of] - start)
        ids = np.asarray(t[id_col].to_numpy(), np.int64)
        # per-row differing slice bounds: one flat byte gather over the
        # docs (ASCII-agnostic — byte windows by contract)
        from ..kernels.batch import to_byte_rows

        data, offsets = to_byte_rows(t[text_col])
        starts = offsets[:-1][doc_of] + start
        new_off = np.zeros(len(starts) + 1, np.int64)
        np.cumsum(width, out=new_off[1:])
        flat = np.empty(int(new_off[-1]), np.uint8)
        rows = np.repeat(np.arange(len(starts)), width)
        local = np.arange(int(new_off[-1]))
        flat[local] = data[starts[rows] + (local - new_off[rows])]
        if int(new_off[-1]) >= 2**31:
            # int32 StringArray offsets would silently wrap (ADVICE r3);
            # a batch this size means batch_size is mis-tuned upstream
            raise ValueError(
                f"chunk_documents: batch emits {int(new_off[-1])} chunk "
                "bytes (>= 2 GiB) — lower batch_size for this stage")
        col = pa.StringArray.from_buffers(
            len(starts), pa.py_buffer(new_off.astype(np.int32).tobytes()),
            pa.py_buffer(flat.tobytes()))
        return pa.table({
            "doc_id": pa.array(ids[doc_of], pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "chunk_text": col,
            "n_bytes": pa.array(width, pa.int64()),
        }).cast(out_schema)

    return docs.map_batches(_chunks, batch_format="pyarrow")
