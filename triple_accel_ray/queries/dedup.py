"""Exact/MinHash/SimHash/substring dedup family.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    # ---- dedup family ---------------------------------------------------
    def dedup_exact(sf_dir):
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return exact_dup_groups(docs, num_buckets=16)

    q["dedup_exact"] = dedup_exact

    def dedup_minhash_pairs(sf_dir):
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return minhash_dup_pairs(docs, threshold=0.5, num_buckets=16)

    q["dedup_minhash_pairs"] = dedup_minhash_pairs

    def dedup_simhash_pairs(sf_dir):
        # uncapped pair generation: the query/oracle contract is "all pairs
        # sharing a band within hamming 6" (the capped production path is
        # exercised by the ER pipeline and its skew tests)
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return simhash_dup_pairs(docs, max_hamming=6, num_buckets=16,
                                 hot_block_cap=1 << 30)

    q["dedup_simhash_pairs"] = dedup_simhash_pairs

    def embed_near_dups(sf_dir):
        """All pairs with integer-quantized inner product >= 300000
        (floor(x*1000) — exact integer arithmetic on both sides, so the
        oracle comparison has no float-boundary risk). Distributed as the
        block-pair fan-out: no driver-side corpus, no broadcast matrix,
        vectorized hit extraction. The low threshold (~cos 0.3) makes this
        inherently all-pairs — the sub-quadratic approximate path for real
        near-dup thresholds is ops.dedup.embedding_dup_pairs_ivf."""
        from ..ops.dedup import blockwise_pair_scores

        def _score(ids_a, va, ids_b, vb, same):
            qa = np.floor(va * 1000.0).astype(np.int64)
            qb = np.floor(vb * 1000.0).astype(np.int64)
            ip = qa @ qb.T
            r, c = np.nonzero(ip >= 300_000)
            a, b, v = ids_a[r], ids_b[c], ip[r, c]
            keep = a < b if same else a != b
            a, b, v = a[keep], b[keep], v[keep]
            swap = a > b
            return pa.table(
                {"a_id": pa.array(np.where(swap, b, a), pa.int64()),
                 "b_id": pa.array(np.where(swap, a, b), pa.int64()),
                 "qip": pa.array(v, pa.int64())}
            )

        emb = read_parquet_clean(_t(sf_dir, "embeddings"))
        return blockwise_pair_scores(emb, _score, target_chunk_rows=256)

    q["embed_near_dups"] = embed_near_dups

    def ssjoin_token_pairs_09(sf_dir):
        """Prefix-filtered set-similarity self-join (SSJoin/PPJoin
        family, ops/dedup.ssjoin_token_pairs): all doc pairs with
        distinct-whitespace-token Jaccard >= 0.9, exact integer
        (inter, uni, jaccard_permille). Prefix filtering is provably
        complete under any shared token order, so the candidate stage
        prunes with no recall loss and the SQL twin (direct token
        explode-join) is value-exact."""
        from ..ops.dedup import ssjoin_token_pairs

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return ssjoin_token_pairs(docs, threshold_permille=900)

    q["ssjoin_token_pairs_09"] = ssjoin_token_pairs_09

    def embed_near_dups_lsh(sf_dir):
        """SRP-LSH near-dup pairs over a corpus with PLANTED duplicates:
        every embedding also appears 2x-scaled under vec_id + 1_000_000.
        Cosine is scale-invariant and SRP signatures are bit-identical
        under positive scaling (ops.dedup.srp_signature_batch), so the LSH
        path's recall on the planted pairs is exactly 1 BY CONSTRUCTION —
        which is what makes a full SQL oracle sound for an approximate
        operator (cf. knn_ivf_fullprobe_top5). Natural pairs top out near
        cosine 0.51 on this corpus, far below the 0.95 threshold; only ids
        are compared (float32-sourced cosines are never value-compared)."""
        from ..ops.dedup import embedding_dup_pairs_lsh as _lsh
        from ..ops.veccol import stack_list_column

        def _aug(t: pa.Table) -> pa.Table:
            X = stack_list_column(t["embedding"])
            n, d = X.shape
            M = np.vstack([X, X * 2.0])
            off = pa.array(np.arange(0, (2 * n + 1) * d, d, dtype=np.int32))
            ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {"vec_id": pa.array(
                    np.concatenate([ids, ids + 1_000_000]), pa.int64()),
                 "embedding": pa.ListArray.from_arrays(
                     off, pa.array(M.ravel(), pa.float64()))}
            )

        emb = read_parquet_clean(_t(sf_dir, "embeddings")).map_batches(
            _aug, batch_format="pyarrow"
        )
        return _lsh(emb, threshold=0.95).select_columns(["a_id", "b_id"])

    q["embed_near_dups_lsh"] = embed_near_dups_lsh

    def dedup_minhash_survivors(sf_dir):
        """The dedup ACTION (ops/dedup.near_dup_survivors): minhash pairs
        -> distributed connected components -> keep the min-string-id
        representative per component; singletons survive. Output cast to
        int64 for the oracle."""
        import pyarrow.compute as pc

        from ..ops.dedup import near_dup_survivors

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        surv = near_dup_survivors(docs, threshold=0.5, num_buckets=16)
        return surv.map_batches(
            lambda t: pa.table(
                {"doc_id": pc.cast(t["doc_id"], pa.int64())}),
            batch_format="pyarrow",
        )

    q["dedup_minhash_survivors"] = dedup_minhash_survivors

    def dedup_best_survivors(sf_dir):
        """Rank-aware dedup ACTION (ops/dedup.near_dup_survivors_best):
        minhash pairs -> connected components -> keep the LONGEST
        member (n_chars; ties -> min string id) per near-dup component
        — the keep-the-best-member rule production curation uses,
        instead of min-id. -> (doc_id, cluster_size, score)."""
        import pyarrow.compute as pc

        from ..ops.dedup import near_dup_survivors_best

        docs = read_parquet_clean(
            _t(sf_dir, "documents"),
            columns=["doc_id", "text", "n_chars"])
        surv = near_dup_survivors_best(
            docs, threshold=0.5, num_buckets=16, score_col="n_chars")
        return surv.map_batches(
            lambda t: pa.table(
                {"doc_id": pc.cast(t["doc_id"], pa.int64()),
                 "cluster_size": t["cluster_size"],
                 "score": t["score"]}),
            batch_format="pyarrow",
        )

    q["dedup_best_survivors"] = dedup_best_survivors

    def dedup_simhash_survivors(sf_dir):
        """Simhash dedup ACTION (ops/dedup.simhash_survivors): band
        near-dup pairs -> distributed connected components -> keep the
        min-string-id representative per component. The band predicate is
        part of the contract and replayed in SQL, so the transitive
        closure is value-exact."""
        from ..ops.dedup import simhash_survivors

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        surv = simhash_survivors(docs, max_hamming=6, num_buckets=16)
        return surv.map_batches(
            lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64())}),
            batch_format="pyarrow",
        )

    q["dedup_simhash_survivors"] = dedup_simhash_survivors

    def dedup_normalized(sf_dir):
        """Normalization-aware exact dedup: lowercase/whitespace-collapse
        /trim (ops/text.normalize_text_batch, tri-engine contract), then
        byte-exact grouping on the normalized text via exact_dup_groups.
        Variants planted by doc_id arithmetic (doc_id % 7 == 0 re-added
        under id+2*10^6 as '  ' || upper(text) || ' ') MUST collapse
        into their source's group — replayed in SQL."""
        from ..ops.dedup import exact_dup_groups
        from ..ops.text import normalize_text_batch

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])

        def _augment(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            extra = df.filter(pl.col("doc_id") % 7 == 0).select(
                doc_id=pl.col("doc_id") + 2_000_000,
                text=pl.lit("  ") + pl.col("text").str.to_uppercase()
                + pl.lit(" "),
            )
            return pl.concat([df, extra]).to_arrow().cast(pa.schema([
                ("doc_id", pa.int64()), ("text", pa.string())]))

        aug = docs.map_batches(_augment, batch_format="pyarrow")
        normed = aug.map_batches(
            lambda t: normalize_text_batch(t).drop_columns(["text"]),
            batch_format="pyarrow")
        return exact_dup_groups(normed, text_col="ntext", num_buckets=16)

    q["dedup_normalized"] = dedup_normalized

    def dup_substring_spans(sf_dir):
        """Exact duplicated-substring span detection (ops/dedup.
        duplicate_spans — the Lee et al. 2021 exact-substring-dedup
        shape): per document, the merged spans of 24-byte windows whose
        byte string occurs >= 2 times anywhere in the corpus. Hash
        candidates, BYTE-verified groups, gaps-and-islands merge — the
        SQL twin groups on the actual substring, so the check proves the
        byte-exactness claim."""
        from ..ops.dedup import duplicate_spans

        docs = read_parquet_clean(_t(sf_dir, "documents"))
        return duplicate_spans(docs, w=24, stride=1)

    q["dup_substring_spans"] = dup_substring_spans

    def dup_coverage_scores(sf_dir):
        """Per-document duplicate-text coverage in integer per-mille —
        the fraction-of-corpus-duplicated number Lee et al. 2021 report
        (their Fig. 1), as a per-doc curation signal: coverage =
        1000 * dup_bytes // n_chars over the byte-verified merged spans
        of ops/dedup.duplicate_spans. Pure composition: the doc-sized
        spans table picks up n_chars via one id-width bucket join."""
        import pyarrow.compute as pc

        from ..ops.dedup import duplicate_spans
        from ..pipeline.shuffle import bucket_join

        docs = read_parquet_clean(_t(sf_dir, "documents"))
        spans = duplicate_spans(docs, w=24, stride=1).map_batches(
            lambda t: t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id",
                pc.cast(t["doc_id"], pa.string())),
            batch_format="pyarrow")
        lens = docs.map_batches(
            lambda t: pa.table(
                {"doc_id": pc.cast(t["doc_id"], pa.string()),
                 "n_chars": pc.cast(t["n_chars"], pa.int64())}),
            batch_format="pyarrow")
        j = bucket_join(
            spans, lens, "doc_id", "doc_id",
            pa.schema([("doc_id", pa.string()),
                       ("n_dup_spans", pa.int64()),
                       ("dup_bytes", pa.int64())]),
            pa.schema([("doc_id", pa.string()), ("n_chars", pa.int64())]),
            num_buckets=16)

        def _cov(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            out = df.select(
                doc_id=pl.col("doc_id").cast(pl.Int64),
                dup_bytes=pl.col("dup_bytes"),
                coverage_permille=pl.when(pl.col("n_chars") > 0)
                .then((1000 * pl.col("dup_bytes")) // pl.col("n_chars"))
                .otherwise(0).cast(pl.Int64))
            return out.to_arrow().cast(pa.schema(
                [("doc_id", pa.int64()), ("dup_bytes", pa.int64()),
                 ("coverage_permille", pa.int64())]))

        return j.map_batches(_cov, batch_format="pyarrow")

    q["dup_coverage_scores"] = dup_coverage_scores


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    o["dedup_exact"] = """
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY text) AS dup_group,
       (count(*) OVER (PARTITION BY text))::BIGINT AS group_size
FROM documents"""

    # MinHash-LSH verified pairs == ALL pairs with exact 5-shingle-set
    # Jaccard >= 0.5 — valid because LSH recall is empirically 100% on this
    # corpus (verified pair-for-pair at sf0.01 AND sf0.1: near-dups here
    # have Jaccard far above the 16-band/4-row S-curve threshold). The
    # verification stage makes precision exact by construction, so the
    # oracle reduces to the brute-force pair scan. ONE definition of the
    # pair CTEs, shared with the survivors oracle below (the gram size,
    # threshold and id ordering must never diverge between the two).
    o["dedup_minhash_pairs"] = f"""
WITH {_MINHASH_PAIR_CTES}
SELECT a_id, b_id, jaccard FROM prs"""

    o["dedup_simhash_pairs"] = _simhash_oracle(max_hamming=6)

    # set-similarity join twin: qualifying pairs computed directly by a
    # token explode-join — independent of the engine's prefix-filter
    # order, which affects only candidate pruning (provably complete)
    o["ssjoin_token_pairs_09"] = r"""
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[^ \t-\r]+')) AS t
    FROM documents)
),
cnt AS (SELECT doc_id, count(*)::BIGINT AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT ta.doc_id AS a_id, tb.doc_id AS b_id, count(*)::BIGINT AS i
  FROM tok ta JOIN tok tb ON tb.t = ta.t
   AND ta.doc_id::VARCHAR < tb.doc_id::VARCHAR
  GROUP BY 1, 2)
SELECT i.a_id::VARCHAR AS a_id, i.b_id::VARCHAR AS b_id,
       i.i AS inter, (ca.n + cb.n - i.i)::BIGINT AS uni,
       ((1000 * i.i) // (ca.n + cb.n - i.i))::BIGINT AS jaccard_permille
FROM inter i
JOIN cnt ca ON ca.doc_id = i.a_id
JOIN cnt cb ON cb.doc_id = i.b_id
WHERE 1000 * i.i >= 900 * (ca.n + cb.n - i.i)"""

    o["embed_near_dups"] = """
WITH q AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * 1000)) AS qe
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       CAST(list_inner_product(a.qe, b.qe) AS BIGINT) AS qip
FROM q a JOIN q b ON a.vec_id < b.vec_id
WHERE list_inner_product(a.qe, b.qe) >= 300000"""

    o["embed_near_dups_lsh"] = """
WITH aug AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000, list_transform(embedding::DOUBLE[], x -> x * 2)
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id
FROM aug a JOIN aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.e, b.e) >= 0.95"""

    # survivors = transitive closure over the SAME pair CTEs as
    # dedup_minhash_pairs (_MINHASH_PAIR_CTES — one definition), min
    # label as STRING min, mirroring the engine's connected_components
    # label rule
    o["dedup_minhash_survivors"] = f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES},
und AS (SELECT a_id AS x, b_id AS y FROM prs
        UNION ALL SELECT b_id, a_id FROM prs),
cc(id, label) AS (
  SELECT DISTINCT x, x FROM und
  UNION
  SELECT u.x, c.label FROM und u JOIN cc c ON c.id = u.y
),
dropped AS (
  SELECT id FROM (SELECT id, min(label) AS label FROM cc GROUP BY id)
  WHERE id <> label
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id::VARCHAR NOT IN (SELECT id FROM dropped)"""

    # rank-aware survivors: same closure, but the kept representative is
    # the component argmax by (n_chars DESC, id ASC) and the row carries
    # cluster_size + score; singletons are their own component
    o["dedup_best_survivors"] = f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES},
und AS (SELECT a_id AS x, b_id AS y FROM prs
        UNION ALL SELECT b_id, a_id FROM prs),
cc(id, label) AS (
  SELECT DISTINCT x, x FROM und
  UNION
  SELECT u.x, c.label FROM und u JOIN cc c ON c.id = u.y
),
comp AS (SELECT id, min(label) AS root FROM cc GROUP BY id),
alln AS (
  SELECT d.doc_id::VARCHAR AS id,
         coalesce(c.root, d.doc_id::VARCHAR) AS root,
         d.n_chars::BIGINT AS score
  FROM documents d LEFT JOIN comp c ON c.id = d.doc_id::VARCHAR),
ranked AS (
  SELECT id, root, score,
         count(*) OVER (PARTITION BY root) AS csize,
         row_number() OVER (PARTITION BY root
                            ORDER BY score DESC, id) AS rn
  FROM alln)
SELECT CAST(id AS BIGINT) AS doc_id, csize::BIGINT AS cluster_size,
       score
FROM ranked WHERE rn = 1"""

    # simhash survivors: the simhash pair oracle inlined as a subquery,
    # then the same recursive transitive closure + min-label rule as the
    # minhash survivors oracle.
    o["dedup_simhash_survivors"] = f"""
WITH RECURSIVE prs AS (
  SELECT a_id, b_id FROM ({_simhash_oracle(6)})
),
und AS (SELECT a_id AS x, b_id AS y FROM prs
        UNION ALL SELECT b_id, a_id FROM prs),
cc(id, label) AS (
  SELECT DISTINCT x, x FROM und
  UNION
  SELECT u.x, c.label FROM und u JOIN cc c ON c.id = u.y
),
dropped AS (
  SELECT id FROM (SELECT id, min(label) AS label FROM cc GROUP BY id)
  WHERE id <> label
)
SELECT d.doc_id FROM documents d
WHERE d.doc_id::VARCHAR NOT IN (SELECT id FROM dropped)"""

    # normalized dedup: same augmentation arithmetic, same normalization
    # (the '[ \t-\r]+' class is the identical byte-for-byte pattern in
    # rust regex and RE2), grouping on the normalized text.
    o["dedup_normalized"] = """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000, '  ' || upper(text) || ' '
  FROM documents WHERE doc_id % 7 = 0),
norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[ \t-\r]+', ' ', 'g')) AS ntext
  FROM aug)
SELECT doc_id,
       min(doc_id) OVER (PARTITION BY ntext) AS dup_group,
       (count(*) OVER (PARTITION BY ntext))::BIGINT AS group_size
FROM norm"""

    # Duplicated-substring spans: the SQL groups windows on the ACTUAL
    # substring (not a hash), so agreement proves the Ray side's
    # hash-candidate + byte-verify pipeline is byte-exact. Islands merge
    # with lag(): fixed width + ascending pos make the running span end
    # equal lag(pos) + w, so a window starts a new island iff
    # pos > lag(pos) + w (touching spans merge).
    _DSW = 24
    o["dup_substring_spans"] = f"""
WITH wnd AS (
  SELECT doc_id, p AS pos, substr(text, p + 1, {_DSW}) AS g
  FROM (SELECT doc_id, text,
               unnest(range(0, greatest(strlen(text) - {_DSW} + 1, 0))) AS p
        FROM documents)),
dupw AS (
  SELECT doc_id, pos FROM wnd
  WHERE g IN (SELECT g FROM wnd GROUP BY g HAVING count(*) >= 2)),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL
                   OR pos > lag(pos) OVER (PARTITION BY doc_id
                                           ORDER BY pos) + {_DSW}
              THEN 1 ELSE 0 END AS brk
  FROM dupw),
grp AS (SELECT doc_id, pos,
               sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
        FROM isl),
spans AS (SELECT doc_id, min(pos) AS s, max(pos) + {_DSW} AS e
          FROM grp GROUP BY doc_id, gid)
SELECT d.doc_id, count(s.s)::BIGINT AS n_dup_spans,
       coalesce(sum(s.e - s.s), 0)::BIGINT AS dup_bytes
FROM documents d LEFT JOIN spans s USING (doc_id)
GROUP BY d.doc_id"""

    # per-doc duplicate coverage: the spans aggregate above + n_chars
    o["dup_coverage_scores"] = o["dup_substring_spans"].replace(
        "SELECT d.doc_id, count(s.s)::BIGINT AS n_dup_spans,",
        "SELECT d.doc_id, d.n_chars,").replace(
        """FROM documents d LEFT JOIN spans s USING (doc_id)
GROUP BY d.doc_id""",
        """FROM documents d LEFT JOIN spans s USING (doc_id)
GROUP BY d.doc_id, d.n_chars""") + """
"""
    o["dup_coverage_scores"] = f"""
WITH base AS ({o["dup_coverage_scores"].strip()})
SELECT doc_id, dup_bytes,
       CASE WHEN n_chars > 0 THEN (1000 * dup_bytes) // n_chars
            ELSE 0 END::BIGINT AS coverage_permille
FROM base"""
