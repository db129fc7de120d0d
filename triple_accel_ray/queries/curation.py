"""Sampling, decontamination, skyline curation.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    def sample_stratified(sf_dir):
        """Seeded stratified sample (ops/curation.py): keep-decision is a
        salted splitmix64 rank of doc_id — order/partitioning-independent,
        zero shuffle; per-source permille {src0: 500, src1: 250, else 100}."""
        from ..ops.curation import stratified_sample

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "source"])
        return stratified_sample(
            docs, {"src0": 500, "src1": 250}, default_permille=100)

    q["sample_stratified"] = sample_stratified

    def top3_longest_per_source(sf_dir):
        """Per-group top-k (ops/curation.py): 3 longest docs per source
        by (n_chars DESC, doc_id ASC); per-batch partial top-k combiner
        before the grouped shuffle."""
        from ..ops.curation import top_k_per_group

        docs = read_parquet_clean(
            _t(sf_dir, "documents"),
            columns=["doc_id", "source", "n_chars"])
        return top_k_per_group(
            docs, k=3, group_col="source", score_col="n_chars")

    q["top3_longest_per_source"] = top3_longest_per_source

    def docs_not_in_ref(sf_dir):
        """Anti-join dedup against a reference corpus (ops/curation.py):
        drop non-src0 docs whose text appears verbatim in src0 (broadcast
        hash index + byte verify — exact text equality)."""
        from ..ops.curation import anti_join_texts

        docs = read_parquet_clean(
            _t(sf_dir, "documents"),
            columns=["doc_id", "source", "text"])
        return anti_join_texts(docs, ref_source="src0")

    q["docs_not_in_ref"] = docs_not_in_ref

    def decontam_hits(sf_dir):
        """Eval-set decontamination (ops/curation.decontaminate_ngrams):
        docs outside src0 sharing any 8-byte character n-gram with the
        src0 corpus, with the DISTINCT overlapping-gram count. Reference
        grams broadcast once; training side streams (per-row distinct
        windows + searchsorted membership, no shuffle)."""
        from ..ops.curation import decontaminate_ngrams

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "source", "text"])
        return decontaminate_ngrams(docs, ref_source="src0", gram=8)

    q["decontam_hits"] = decontam_hits

    def docs_skyline(sf_dir):
        """Skyline / Pareto front (ops/curation.skyline): documents not
        strictly dominated on (n_chars min, token_count max) — the
        preference-query shape, distributed via the skyline combiner
        law (skyline(A∪B) ⊆ skyline(A)∪skyline(B)): per-block local
        fronts, one front-sized exact merge, no shuffle."""
        from ..ops.curation import skyline
        from ..ops.text import token_count_batch

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "n_chars", "text"])
        prep = docs.map_batches(
            lambda t: token_count_batch(t).select(
                ["doc_id", "n_chars", "token_count"]),
            batch_format="pyarrow")
        return skyline(prep, "n_chars", "token_count")

    q["docs_skyline"] = docs_skyline

    def sample3_hash_per_source(sf_dir):
        """Deterministic k-per-group sample (cap-per-source curation):
        the 3 docs per source with the highest mix64(doc_id ^ salt) —
        a seeded hash IS the score, so this is top_k_per_group composed
        with the stratified-sample hash chain; reruns / permuted inputs
        / different partitionings keep identical rows. hscore drops the
        hash's low bit (>>1) to fit int64; doc_id ASC breaks the
        (negligible) collision ties deterministically."""
        from ..ops.curation import SAMPLE_SALT, top_k_per_group
        from ..pipeline.blocking import _mix64

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "source"])

        def _score(t: pa.Table) -> pa.Table:
            ids = t["doc_id"].to_numpy().astype(np.uint64)
            hs = (_mix64(ids ^ SAMPLE_SALT) >> np.uint64(1)).astype(np.int64)
            return pa.table({
                "doc_id": t["doc_id"], "source": t["source"], "hscore": hs})

        return top_k_per_group(
            docs.map_batches(_score, batch_format="pyarrow"),
            k=3, group_col="source", score_col="hscore")

    q["sample3_hash_per_source"] = sample3_hash_per_source


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    # --- curation operators (ops/curation.py) ---
    # exact HUGEINT twin of curation.SAMPLE_SALT / _sample_threshold
    _salt = 0xA0761D6478BD642F
    _thr = {s: (p << 64) // 1000
            for s, p in (("src0", 500), ("src1", 250))}
    _thr_default = (100 << 64) // 1000
    _sm_sql, _sm_f = _mix64_chain_sql("sm0", "doc_id, source", "sm")
    o["sample_stratified"] = f"""
WITH sm0 AS (
  SELECT doc_id, source,
         CAST(xor(CAST(doc_id AS UBIGINT), {_salt}::UBIGINT) AS HUGEINT) AS h
  FROM documents
),
{_sm_sql}
SELECT doc_id, source FROM {_sm_f}
WHERE h < (CASE source
             WHEN 'src0' THEN {_thr['src0']}::HUGEINT
             WHEN 'src1' THEN {_thr['src1']}::HUGEINT
             ELSE {_thr_default}::HUGEINT END)"""

    o["top3_longest_per_source"] = """
SELECT source, doc_id, n_chars FROM (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM documents) WHERE rn <= 3"""

    o["docs_not_in_ref"] = """
SELECT d.doc_id, d.source FROM documents d
WHERE d.source <> 'src0'
  AND NOT EXISTS (SELECT 1 FROM documents r
                  WHERE r.source = 'src0' AND r.text = d.text)"""

    # byte n-grams == char n-grams on the ASCII fixture (same caveat as
    # the fingerprints oracle); distinct-per-side before the join mirrors
    # the engine's per-row distinct + set membership exactly
    o["decontam_hits"] = """
WITH refg AS (
  SELECT DISTINCT substr(text, s + 1, 8) AS g
  FROM (SELECT text, unnest(range(0, greatest(strlen(text) - 7, 0))) AS s
        FROM documents WHERE source = 'src0')
),
dg AS (
  SELECT DISTINCT doc_id, substr(text, s + 1, 8) AS g
  FROM (SELECT doc_id, text,
               unnest(range(0, greatest(strlen(text) - 7, 0))) AS s
        FROM documents WHERE source <> 'src0')
)
SELECT d.doc_id, count(*)::BIGINT AS n_overlap
FROM dg d JOIN refg r ON d.g = r.g
GROUP BY 1"""

    o["docs_skyline"] = r"""
WITH d AS (
  SELECT doc_id::BIGINT AS doc_id, n_chars::BIGINT AS n_chars,
         (CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = ''
               THEN 0
               ELSE len(regexp_split_to_array(
                      trim(text, ' ' || chr(9) || chr(10) || chr(13)),
                      '\s+'))
          END)::BIGINT AS token_count
  FROM documents)
SELECT doc_id, n_chars, token_count FROM d a
WHERE NOT EXISTS (
  SELECT 1 FROM d b
  WHERE b.n_chars <= a.n_chars AND b.token_count >= a.token_count
    AND (b.n_chars < a.n_chars OR b.token_count > a.token_count))"""

    # k-per-group hash sample: replay the mix chain, h >> 1 as the score
    _s3_sql, _s3_f = _mix64_chain_sql("s30", "doc_id, source", "s3")
    o["sample3_hash_per_source"] = f"""
WITH s30 AS (
  SELECT doc_id, source,
         CAST(xor(CAST(doc_id AS UBIGINT), {_salt}::UBIGINT) AS HUGEINT) AS h
  FROM documents
),
{_s3_sql},
hsc AS (SELECT doc_id, source, CAST(h // 2 AS BIGINT) AS hscore FROM {_s3_f})
SELECT source, doc_id, hscore FROM (
  SELECT source, doc_id, hscore,
         row_number() OVER (PARTITION BY source
                            ORDER BY hscore DESC, doc_id) AS rn
  FROM hsc) WHERE rn <= 3"""
