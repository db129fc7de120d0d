"""Shard/mixture/packing/Z-order export queries.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    # ---- training-data export (ops/export.py) ---------------------------
    def shuffle_export_shards(sf_dir):
        """Deterministic global shuffle into 8 ordered shards: rank =
        mix64(doc_id ^ SHUFFLE_SALT), shard = rank % 8, pos = row_number
        within shard under (rank, id) order. Id-only rows ride one
        boundary-partitioned bucket shuffle; byte-identical on rerun."""
        from ..ops.export import shuffle_shard_export

        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id"])
        return shuffle_shard_export(docs, n_shards=8)

    q["shuffle_export_shards"] = shuffle_export_shards

    def mixture_sample(sf_dir):
        """Weighted source mixing to target proportions 50/30/20 across
        src0/src1/src2 (downsampling only): vocabulary-sized count
        aggregate -> exact integer thresholds -> stateless salted-hash
        filter. Unweighted sources are dropped."""
        from ..ops.export import mixture_sample as _mixture

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "source"])
        return _mixture(docs, {"src0": 500, "src1": 300, "src2": 200})

    q["mixture_sample"] = mixture_sample

    def packed_sequences(sf_dir):
        """Greedy first-fit sequence packing into 256-token packs, docs
        in seeded shuffle order cut into 4 independent shards; token
        counts (whitespace rule) computed before the shuffle so text
        never rides it. Per-shard body loops over packs (searchsorted
        into the token cumsum), never over rows."""
        from ..ops.export import pack_sequences

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return pack_sequences(docs, budget=256, n_shards=4)

    q["packed_sequences"] = packed_sequences

    def curated_packed(sf_dir):
        """The composed curation flagship (ops/export.curation_pipeline):
        quality filter (>=5 tokens, >=40% alpha bytes) -> exact dedup
        keep-first (text-wide bucket shuffle, byte-verified groups) ->
        50/30/20 source mixing (integer thresholds over survivor counts)
        -> 256-token greedy packing in 4 shards. One lazy pipeline; the
        only materialize is the id-width survivor set."""
        from ..ops.export import curation_pipeline

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "source", "text"])
        return curation_pipeline(
            docs, {"src0": 500, "src1": 300, "src2": 200},
            budget=256, n_shards=4, min_tokens=5, min_alpha_permille=400,
            dedup_buckets=16)

    q["curated_packed"] = curated_packed

    def event_zorder_keys(sf_dir):
        """Morton/Z-order layout keys (ops/export.zorder_keys) over
        (user_id, value cents) — the OPTIMIZE ZORDER primitive: sorting
        by zkey co-locates rows close in BOTH dimensions so zone maps
        prune on either. Global min/max pre-pass + stateless vectorized
        interleave; SQL twin unrolls the same 16-bit shifts."""
        from ..ops.export import zorder_keys

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["event_id", "user_id", "value"])
        cents = ev.map_batches(
            lambda t: pa.table({
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "cents": pa.array(np.floor(
                    t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)),
            }), batch_format="pyarrow")
        return zorder_keys(cents, "user_id", "cents", bits=16)

    q["event_zorder_keys"] = event_zorder_keys

    def doc_chunks(sf_dir):
        """RAG/training chunking (ops/export.chunk_documents): every
        document split into 200-byte windows at 150-byte stride (final
        window clips; chunk grammar pure arithmetic) — the stateless
        flat_map row-expansion shape, one vectorized byte gather per
        batch, no shuffle. Byte-exact substr twin."""
        from ..ops.export import chunk_documents

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return chunk_documents(docs, chunk_bytes=200, stride=150)

    q["doc_chunks"] = doc_chunks


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    # --- training-data export (ops/export.py) ---
    from ..ops.export import MIXTURE_SALT, SHUFFLE_SALT

    _se_sql, _se_f = _mix64_chain_sql("se0", "doc_id", "se")
    o["shuffle_export_shards"] = f"""
WITH se0 AS (
  SELECT doc_id,
         CAST(xor(CAST(doc_id AS UBIGINT), {int(SHUFFLE_SALT)}::UBIGINT) AS HUGEINT) AS h
  FROM documents
),
{_se_sql}
SELECT CAST(h % 8 AS BIGINT) AS shard,
       (row_number() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1)::BIGINT AS pos,
       doc_id
FROM {_se_f}"""

    # exact HUGEINT twin of export.mixture_targets: T = min_s floor(n_s *
    # 1000 / w_s); t_s = floor(T * w_s / 1000); threshold floor(t_s * 2^64
    # / n_s), keep-all encoded as 2^64 (h < 2^64 always)
    _mx_sql, _mx_f = _mix64_chain_sql("mx0", "doc_id, source", "mx")
    _P2_64 = 1 << 64
    o["mixture_sample"] = f"""
WITH w(source, wt) AS (VALUES ('src0', 500), ('src1', 300), ('src2', 200)),
cnt AS (SELECT source, count(*)::HUGEINT AS n FROM documents GROUP BY 1),
tt AS (SELECT min((c.n * 1000) // w.wt) AS t_total
       FROM cnt c JOIN w ON c.source = w.source WHERE c.n > 0),
thr AS (
  SELECT c.source,
         CASE WHEN ((SELECT t_total FROM tt) * w.wt) // 1000 >= c.n
              THEN {_P2_64}::HUGEINT
              ELSE ((((SELECT t_total FROM tt) * w.wt) // 1000)
                    * {_P2_64}::HUGEINT) // c.n
         END AS lim
  FROM cnt c JOIN w ON c.source = w.source WHERE c.n > 0
),
mx0 AS (
  SELECT doc_id, source,
         CAST(xor(CAST(doc_id AS UBIGINT), {int(MIXTURE_SALT)}::UBIGINT) AS HUGEINT) AS h
  FROM documents
),
{_mx_sql}
SELECT m.doc_id, m.source
FROM {_mx_f} m JOIN thr t ON m.source = t.source
WHERE m.h < t.lim"""

    # greedy first-fit packing replayed in SQL: per shard, pack boundary
    # b_{{k+1}} = max rn with cum(rn) - cum(b_k) <= budget (at least b_k+1 —
    # an over-budget doc packs alone); recursion steps = packs per shard.
    # pack_id of a doc = completed boundaries strictly before its rn.
    _ps_sql, _ps_f = _mix64_chain_sql("ps0", "doc_id", "ps")
    o["packed_sequences"] = f"""
WITH RECURSIVE tok AS (
  SELECT doc_id,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
              ELSE len(regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+'))
         END::BIGINT AS tc
  FROM documents
),
ps0 AS (
  SELECT doc_id,
         CAST(xor(CAST(doc_id AS UBIGINT), {int(SHUFFLE_SALT)}::UBIGINT) AS HUGEINT) AS h
  FROM documents
),
{_ps_sql},
x AS (SELECT p.doc_id, CAST(p.h % 4 AS BIGINT) AS shard, p.h, t.tc
      FROM {_ps_f} p JOIN tok t USING (doc_id)),
ord AS (SELECT shard, doc_id, tc,
               row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
        FROM x),
c AS (SELECT shard, doc_id, tc, rn,
             sum(tc) OVER (PARTITION BY shard ORDER BY rn) AS cum
      FROM ord),
maxrn AS (SELECT shard, max(rn) AS mr FROM c GROUP BY 1),
b(shard, k, b_end) AS (
  SELECT shard, 0::BIGINT, 0::BIGINT FROM maxrn
  UNION ALL
  SELECT b.shard, b.k + 1,
         greatest(coalesce((
             SELECT max(c2.rn) FROM c c2
             WHERE c2.shard = b.shard AND c2.rn > b.b_end
               AND c2.cum - coalesce((SELECT c3.cum FROM c c3
                                      WHERE c3.shard = b.shard
                                        AND c3.rn = b.b_end), 0) <= 256
           ), b.b_end + 1), b.b_end + 1)
  FROM b WHERE b.b_end < (SELECT mr FROM maxrn m WHERE m.shard = b.shard)
)
SELECT c.shard,
       (SELECT count(*) FROM b
         WHERE b.shard = c.shard AND b.k >= 1 AND b.b_end < c.rn)::BIGINT
         AS pack_id,
       c.doc_id, c.tc AS token_count
FROM c"""

    # chained twin of ops/export.curation_pipeline: quality -> keep-first
    # dedup (PARTITION BY text == the engine's (h1,h2,text) groups, since
    # identical texts always share hashes and bucket) -> mixture thresholds
    # over SURVIVOR counts -> the packed_sequences recursion over the mix.
    _cm_sql, _cm_f = _mix64_chain_sql("cm0x", "doc_id, source, tc", "cmx")
    _cp_sql, _cp_f = _mix64_chain_sql("cp0", "doc_id, tc", "cp")
    o["curated_packed"] = f"""
WITH RECURSIVE tokq AS (
  SELECT doc_id, source, text,
         strlen(text)::BIGINT AS n_bytes,
         (strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g')))::BIGINT AS alpha_count,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
              ELSE len(regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\\s+'))
         END::BIGINT AS tc
  FROM documents
),
qual AS (SELECT doc_id, source, text, tc FROM tokq
         WHERE tc >= 5 AND alpha_count * 1000 >= n_bytes * 400),
ded AS (SELECT doc_id, source, tc FROM (
          SELECT doc_id, source, tc,
                 min(doc_id) OVER (PARTITION BY text) AS g
          FROM qual)
        WHERE doc_id = g),
w(source, wt) AS (VALUES ('src0', 500), ('src1', 300), ('src2', 200)),
cnt AS (SELECT source, count(*)::HUGEINT AS n FROM ded GROUP BY 1),
tt AS (SELECT min((c.n * 1000) // w.wt) AS t_total
       FROM cnt c JOIN w ON c.source = w.source WHERE c.n > 0),
thr AS (
  SELECT c.source,
         CASE WHEN ((SELECT t_total FROM tt) * w.wt) // 1000 >= c.n
              THEN {_P2_64}::HUGEINT
              ELSE ((((SELECT t_total FROM tt) * w.wt) // 1000)
                    * {_P2_64}::HUGEINT) // c.n
         END AS lim
  FROM cnt c JOIN w ON c.source = w.source WHERE c.n > 0
),
cm0x AS (
  SELECT doc_id, source, tc,
         CAST(xor(CAST(doc_id AS UBIGINT), {int(MIXTURE_SALT)}::UBIGINT) AS HUGEINT) AS h
  FROM ded
),
{_cm_sql},
mixed AS (SELECT m.doc_id, m.tc
          FROM {_cm_f} m JOIN thr t ON m.source = t.source
          WHERE m.h < t.lim),
cp0 AS (
  SELECT doc_id, tc,
         CAST(xor(CAST(doc_id AS UBIGINT), {int(SHUFFLE_SALT)}::UBIGINT) AS HUGEINT) AS h
  FROM mixed
),
{_cp_sql},
x AS (SELECT doc_id, CAST(h % 4 AS BIGINT) AS shard, h, tc FROM {_cp_f}),
ord AS (SELECT shard, doc_id, tc,
               row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS rn
        FROM x),
c AS (SELECT shard, doc_id, tc, rn,
             sum(tc) OVER (PARTITION BY shard ORDER BY rn) AS cum
      FROM ord),
maxrn AS (SELECT shard, max(rn) AS mr FROM c GROUP BY 1),
b(shard, k, b_end) AS (
  SELECT shard, 0::BIGINT, 0::BIGINT FROM maxrn
  UNION ALL
  SELECT b.shard, b.k + 1,
         greatest(coalesce((
             SELECT max(c2.rn) FROM c c2
             WHERE c2.shard = b.shard AND c2.rn > b.b_end
               AND c2.cum - coalesce((SELECT c3.cum FROM c c3
                                      WHERE c3.shard = b.shard
                                        AND c3.rn = b.b_end), 0) <= 256
           ), b.b_end + 1), b.b_end + 1)
  FROM b WHERE b.b_end < (SELECT mr FROM maxrn m WHERE m.shard = b.shard)
)
SELECT c.shard,
       (SELECT count(*) FROM b
         WHERE b.shard = c.shard AND b.k >= 1 AND b.b_end < c.rn)::BIGINT
         AS pack_id,
       c.doc_id, c.tc AS token_count
FROM c"""

    o["doc_chunks"] = """
WITH c AS (
  SELECT doc_id, i AS chunk_idx,
         substr(text, i * 150 + 1, 200) AS chunk_text
  FROM (SELECT doc_id, text,
               unnest(range(0, (greatest(strlen(text), 1) - 1) // 150 + 1))
                 AS i
        FROM documents
        WHERE strlen(text) > 0))
SELECT doc_id, chunk_idx::BIGINT AS chunk_idx, chunk_text,
       strlen(chunk_text)::BIGINT AS n_bytes
FROM c"""

    _zterms = " + ".join(
        f"(((qx // {1 << i}) % 2) * {1 << (2 * i)}"
        f" + ((qy // {1 << i}) % 2) * {1 << (2 * i + 1)})"
        for i in range(16))
    o["event_zorder_keys"] = f"""
WITH b AS (
  SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS x,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
  FROM events),
mm AS (SELECT min(x) AS xmin, max(x) AS xmax,
              min(y) AS ymin, max(y) AS ymax FROM b),
q AS (
  SELECT event_id,
         CASE WHEN mm.xmax = mm.xmin THEN 0
              ELSE ((x - mm.xmin) * 65535) // (mm.xmax - mm.xmin)
         END AS qx,
         CASE WHEN mm.ymax = mm.ymin THEN 0
              ELSE ((y - mm.ymin) * 65535) // (mm.ymax - mm.ymin)
         END AS qy
  FROM b, mm)
SELECT event_id, ({_zterms})::BIGINT AS zkey FROM q"""
