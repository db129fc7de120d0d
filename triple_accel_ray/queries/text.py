"""Text analysis: tokens, quality, lang-ID, fingerprints, BPE.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    # ---- text analysis --------------------------------------------------
    def token_count(sf_dir):
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(
            lambda t: token_count_batch(t).select(["doc_id", "token_count"]),
            batch_format="pyarrow",
        )

    q["token_count"] = token_count

    def bpe_token_count(sf_dir):
        from ..ops.text import bpe_token_count_batch

        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(
            lambda t: bpe_token_count_batch(t).select(["doc_id", "bpe_token_count"]),
            batch_format="pyarrow",
        )

    q["bpe_token_count"] = bpe_token_count

    def heavy_hitter_tokens(sf_dir):
        """Frequent-token mining with per-block combiners (ops/text.py):
        the shuffle carries (token, partial_n) per distinct token per
        block, never per occurrence."""
        from ..ops.text import heavy_hitter_tokens as hh

        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])
        return hh(docs, min_count=200)

    q["heavy_hitter_tokens"] = heavy_hitter_tokens

    def quality_scores(sf_dir):
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(
            lambda t: quality_score_batch(t).select(
                ["doc_id", "n_bytes", "alpha_count", "digit_count",
                 "space_count", "punct_count", "token_count", "stop_count",
                 "alpha_ratio"]
            ),
            batch_format="pyarrow",
        )

    q["quality_scores"] = quality_scores

    def lang_id_pred(sf_dir):
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(LangId, batch_format="pyarrow", concurrency=2,
                                batch_size=512).select_columns(
            ["doc_id", "lang_pred"]
        )

    q["lang_id_pred"] = lang_id_pred

    def fingerprints(sf_dir):
        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(
            lambda t: fingerprint_batch(t).select(
                ["doc_id", "min_gram_hash", "content_hash"]
            ),
            batch_format="pyarrow",
        )

    q["fingerprints"] = fingerprints

    def gram_novelty_scores(sf_dir):
        """First-occurrence gram attribution (ops/text.gram_novelty):
        per document, the share of its distinct 8-byte windows whose
        smallest containing doc_id is itself — the novelty /
        contamination-over-time signal for incrementally grown corpora.
        Window identity is the fingerprint family's polynomial gram
        hash, replayed bit-for-bit by the SQL twin."""
        from ..ops.text import gram_novelty

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return gram_novelty(docs, gram=8)

    q["gram_novelty_scores"] = gram_novelty_scores

    def source_vocab_overlap(sf_dir):
        """Pairwise token-vocabulary Jaccard between sources
        (ops/text.source_vocab_overlap) — the corpus-mixing diagnostic:
        which slices duplicate each other's vocabulary. One token-bucket
        shuffle of distinct (source, token) pairs; per-token pair
        partials bounded by C(|sources|, 2); scalar-sized merge with
        zero-intersection pairs included."""
        from ..ops.text import source_vocab_overlap

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["source", "text"])
        return source_vocab_overlap(docs)

    q["source_vocab_overlap"] = source_vocab_overlap

    def bigram_lift_top20(sf_dir):
        """Collocation mining (ops/text.bigram_lift_top): top-20
        adjacent-token bigrams by integer lift = 1000·N·n_ab/(n_a·n_b)
        floored — the exact-integer ranking twin of PMI (log is
        monotone). Vocabulary-sized unigram broadcast; one bigram
        grouped sum; per-block top-k partials."""
        from ..ops.text import bigram_lift_top

        docs = read_parquet_clean(_t(sf_dir, "documents"),
                                  columns=["text"])
        return bigram_lift_top(docs, k=20, min_count=20)

    q["bigram_lift_top20"] = bigram_lift_top20

    def repetition_scores(sf_dir):
        """Within-doc repetition stats (ops/text.repetition_score_batch):
        duplicate-line counts/bytes + word-bigram repetition — the
        Gopher-style quality heuristics, integer-exact. Stateless
        map_batches, no shuffle."""
        from ..ops.text import repetition_score_batch

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(repetition_score_batch,
                                batch_format="pyarrow")

    q["repetition_scores"] = repetition_scores

    def pii_scrub(sf_dir):
        """PII detection + redaction (ops/text.pii_scrub_batch) over the
        documents table with deterministically PLANTED spans: every
        doc_id % 5 == 0 gains a contact tail derived from doc_id (email,
        dotted-quad IP, 10-digit account number) — the fixture text has
        no natural PII, and the SQL oracle replays the identical
        augmentation, so detection AND redaction are value-checked, not
        just plumbing. Stateless map_batches, zero shuffle."""
        from ..ops.text import pii_scrub_batch

        def _plant(t: pa.Table) -> pa.Table:
            import polars as pl

            df = pl.from_arrow(t)
            d = pl.col("doc_id")
            aug = pl.format(
                "{} contact user{}@example.com ip 10.{}.{}.{} tel {}",
                pl.col("text"), d, d % 256, (d // 7) % 256, d % 250,
                d + 5550000000)
            df = df.with_columns(
                text=pl.when(d % 5 == 0).then(aug).otherwise(pl.col("text")))
            return df.to_arrow()

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return docs.map_batches(_plant, batch_format="pyarrow").map_batches(
            pii_scrub_batch, batch_format="pyarrow")

    q["pii_scrub"] = pii_scrub

    def doc_source_lang_rollup(sf_dir):
        """ROLLUP / grouping-sets aggregate (ops/relational.rollup_counts):
        doc counts + char sums at (source, lang) / (source) / () levels in
        one pass — coarser partials derived locally per block, all levels
        riding ONE grouped-sum shuffle bounded by the vocabulary."""
        from ..ops.relational import rollup_counts

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["source", "lang", "n_chars"])
        return rollup_counts(docs, "source", "lang", "n_chars")

    q["doc_source_lang_rollup"] = doc_source_lang_rollup

    def _src_grams(sf_dir, src):
        """Distinct 8-byte character windows of one source's docs as
        injective little-endian packed int64 (ASCII < 2^56, so the uint64
        packing fits int64 and SQL replays it as an ascii()*256^k sum)."""
        from ..kernels.batch import to_byte_rows
        from ..kernels.vhash import packed_windows

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["text", "source"])

        def _grams(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t["source"], src))
            if t.num_rows == 0:
                return pa.table({"gram_key": pa.array([], pa.int64())})
            data, offsets = to_byte_rows(t["text"])
            v, _ = packed_windows(data, offsets, 8)
            return pa.table(
                {"gram_key": np.unique(v).astype(np.int64)})

        return docs.map_batches(_grams, batch_format="pyarrow")

    def grams_only_in_src0(sf_dir):
        """SQL EXCEPT as a distributed set op (ops/relational.
        dataset_set_op): 8-gram vocabulary present in src0 docs but not
        src1. Per-block distinct partials tagged by side, one grouped
        max-merge shuffle, stateless filter."""
        from ..ops.relational import dataset_set_op

        return dataset_set_op(
            _src_grams(sf_dir, "src0"), _src_grams(sf_dir, "src1"),
            "gram_key", "except")

    q["grams_only_in_src0"] = grams_only_in_src0

    def grams_in_both_srcs(sf_dir):
        """SQL INTERSECT twin of grams_only_in_src0 (same one-shuffle
        shape, presence-bit filter flipped)."""
        from ..ops.relational import dataset_set_op

        return dataset_set_op(
            _src_grams(sf_dir, "src0"), _src_grams(sf_dir, "src1"),
            "gram_key", "intersect")

    q["grams_in_both_srcs"] = grams_in_both_srcs

    def distinctive_terms(sf_dir):
        """Integer-exact TF-IDF shape (ops/text.distinctive_terms): top-3
        terms per doc by (tf DESC, df ASC, term ASC). Text never leaves
        the tokenize stage; df is a vocabulary-sized grouped sum joined
        back via one term-bucket shuffle; the per-doc ranking shuffles
        <= k rows per doc per block (partial top-k combiner)."""
        from ..ops.text import distinctive_terms as _dt

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return _dt(docs, k=3)

    q["distinctive_terms"] = distinctive_terms

    def docs_inverted_index(sf_dir):
        """Search-index build (ops/text.inverted_index): per term, doc
        count + ascending comma-joined postings, capped at 32 docs (hot
        terms keep exact counts, NULL postings — the skew guard is part
        of the contract and replayed in the SQL CASE). One hash(term)
        shuffle of id-width incidence rows."""
        from ..ops.text import inverted_index

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return inverted_index(docs, max_postings=32)

    q["docs_inverted_index"] = docs_inverted_index

    def doc_len_outliers(sf_dir):
        """Robust outlier detection (ops/sketch.mad_outliers): docs
        whose n_chars deviates from the exact median by more than
        2x the exact MAD — all-integer predicate (threshold in tenths),
        two domain-sized histogram shuffles + a stateless filter."""
        from ..ops.sketch import mad_outliers

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "n_chars"])
        return mad_outliers(docs, "doc_id", "n_chars", k_times_10=20)

    q["doc_len_outliers"] = doc_len_outliers

    def term_cooc_top20(sf_dir):
        """Association mining (ops/text.term_cooccurrence): document
        co-occurrence counts over the mined top-20 vocabulary
        (count DESC, term ASC — deterministic, replayed in SQL). Pass 2
        shuffles only C(20,2) partial rows per block (per-block
        presence-matrix matmul), never a data row."""
        from ..ops.text import term_cooccurrence

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])
        return term_cooccurrence(docs, vocab_k=20)

    q["term_cooc_top20"] = term_cooc_top20

    def bpe_train_merges_q(sf_dir):
        """Distributed BPE tokenizer training (ops/text.bpe_train_merges):
        word-frequency table once, then n rounds of pair-count →
        global argmax → merge-everywhere with the merge list as the only
        broadcast state. chr(31)-joined symbols make python, polars and
        DuckDB share replace semantics, so the merge table is value-exact
        against the unrolled SQL twin."""
        from ..ops.text import bpe_train_merges

        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])
        return bpe_train_merges(docs, n_merges=6)

    q["bpe_train_merges"] = bpe_train_merges_q

    def bpe_encoded_token_counts(sf_dir):
        """Tokenizer APPLICATION (ops/text.bpe_encode_token_counts):
        train the 6-round merge table, encode the corpus with it, and
        return the token frequency table (token, n_total) — the
        vocabulary histogram a capacity-planning pass reads after
        tokenizer training. Encoding reuses the trainer's materialized
        symbolization (one vocab-sized split-and-weigh pass; no corpus
        re-scan); the SQL twin replays training and splits the same
        final seq column."""
        from ..ops.text import bpe_encode_token_counts

        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["text"])
        return bpe_encode_token_counts(docs, n_merges=6)

    q["bpe_encoded_token_counts"] = bpe_encoded_token_counts

    def lm_fit_scores(sf_dir):
        """CCNet-style LM quality filter (ops/text.lm_bigram_fit_scores):
        add-one bigram LM trained on the src0 slice, every document
        scored by integer per-mille conditional fit — (doc_id,
        n_bigrams, fit_sum, avg_fit_permille). The model tables are
        vocabulary-sized, built off-driver and broadcast once; scoring
        is a stateless in-batch map (a doc's bigrams live in its own
        row), so no row ever shuffles."""
        from ..ops.text import lm_bigram_fit_scores

        docs = read_parquet_clean(
            _t(sf_dir, "documents"),
            columns=["doc_id", "source", "text"])
        return lm_bigram_fit_scores(docs, train_source="src0")

    q["lm_fit_scores"] = lm_fit_scores

    def source_token_fertility(sf_dir):
        """Tokenizer fertility per source — BPE pre-tokens per
        whitespace word in integer per-mille, the capacity/mixture
        planning diagnostic (a source with high fertility costs more
        tokens per word of text). Pure composition of the two token
        counters (each keeps its own oracle): per-block counts, one
        source-keyed grouped sum."""
        from ray.data.aggregate import Sum

        from ..ops.text import bpe_token_count_batch, token_count_batch

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["source", "text"])

        def _counts(t: pa.Table) -> pa.Table:
            t = token_count_batch(t)
            t = bpe_token_count_batch(t)
            return t.select(["source", "token_count", "bpe_token_count"])

        agg = (
            docs.map_batches(_counts, batch_format="pyarrow")
            .groupby("source")
            .aggregate(Sum("token_count", alias_name="n_words"),
                       Sum("bpe_token_count", alias_name="n_bpe_tokens"))
        )

        def _fert(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            out = df.with_columns(
                fertility_permille=pl.when(pl.col("n_words") > 0)
                .then((1000 * pl.col("n_bpe_tokens"))
                      // pl.col("n_words"))
                .otherwise(0).cast(pl.Int64))
            return out.to_arrow().cast(pa.schema(
                [("source", pa.string()), ("n_words", pa.int64()),
                 ("n_bpe_tokens", pa.int64()),
                 ("fertility_permille", pa.int64())]))

        return agg.map_batches(_fert, batch_format="pyarrow")

    q["source_token_fertility"] = source_token_fertility


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    o["token_count"] = r"""
SELECT doc_id,
       CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
            ELSE len(regexp_split_to_array(
                   trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+'))
       END::BIGINT AS token_count
FROM documents"""

    # the SAME lookahead-free pattern as ops.text.BPE_TOKEN_PATTERN (RE2 and
    # rust regex share leftmost-first alternation); SQL-escape the quote
    from ..ops.text import BPE_TOKEN_PATTERN as _bpe_pat

    o["bpe_token_count"] = (
        "SELECT doc_id, len(regexp_extract_all(text, '"
        + _bpe_pat.replace("'", "''")
        + "'))::BIGINT AS bpe_token_count FROM documents"
    )

    o["source_token_fertility"] = (
        r"""
WITH per_doc AS (
  SELECT source,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = ''
              THEN 0
              ELSE len(regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(10) || chr(13)),
                     '\s+'))
         END::BIGINT AS w,
         len(regexp_extract_all(text, '"""
        + _bpe_pat.replace("'", "''")
        + r"""'))::BIGINT AS b
  FROM documents),
agg AS (SELECT source, sum(w)::BIGINT AS n_words,
               sum(b)::BIGINT AS n_bpe_tokens
        FROM per_doc GROUP BY 1)
SELECT source, n_words, n_bpe_tokens,
       CASE WHEN n_words > 0 THEN (1000 * n_bpe_tokens) // n_words
            ELSE 0 END::BIGINT AS fertility_permille
FROM agg"""
    )

    o["heavy_hitter_tokens"] = r"""
SELECT token, count(*)::BIGINT AS n_total
FROM (SELECT unnest(regexp_extract_all(text, '\S+')) AS token
      FROM documents)
GROUP BY token HAVING count(*) >= 200"""

    stop_list = "'the','and','of','a','to','in','is','it','for','on'"
    o["quality_scores"] = rf"""
WITH base AS (
  SELECT doc_id, text,
         strlen(text)::BIGINT AS n_bytes,
         (strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g')))::BIGINT AS alpha_count,
         (strlen(text) - strlen(regexp_replace(text, '[0-9]', '', 'g')))::BIGINT AS digit_count,
         (strlen(text) - strlen(regexp_replace(text, '[ ' || chr(9) || chr(10) || chr(11) || chr(12) || chr(13) || ']', '', 'g')))::BIGINT AS space_count,
         (strlen(text) - strlen(regexp_replace(text, '[!-/:-@\[-`{{-~]', '', 'g')))::BIGINT AS punct_count,
         CASE WHEN trim(text, ' ' || chr(9) || chr(10) || chr(13)) = '' THEN 0
              ELSE len(regexp_split_to_array(
                     trim(text, ' ' || chr(9) || chr(10) || chr(13)), '\s+'))
         END::BIGINT AS token_count
  FROM documents
),
stops AS (
  SELECT doc_id, count(*)::BIGINT AS stop_count
  FROM (
    SELECT doc_id,
           trim(tok, '.,!?;:''"()') AS tok2
    FROM (
      SELECT doc_id,
             unnest(string_split(lower(trim(text, ' ' || chr(9) || chr(10) || chr(13))), ' ')) AS tok
      FROM documents
    )
    WHERE strlen(tok) > 0
  )
  WHERE tok2 IN ({stop_list})
  GROUP BY doc_id
)
SELECT b.doc_id, b.n_bytes, b.alpha_count, b.digit_count, b.space_count,
       b.punct_count, b.token_count,
       coalesce(s.stop_count, 0)::BIGINT AS stop_count,
       CAST(b.alpha_count AS DOUBLE) / GREATEST(1, b.n_bytes) AS alpha_ratio
FROM base b LEFT JOIN stops s ON b.doc_id = s.doc_id"""

    lang_rows = []
    from ..ops.text import STOPWORDS

    for lang, words in STOPWORDS.items():
        for w in words:
            lang_rows.append(f"('{w}','{lang}')")
    o["lang_id_pred"] = f"""
WITH lookup(tok, lang_cand) AS (VALUES {', '.join(lang_rows)}),
toks AS (
  SELECT doc_id, trim(tok, '.,!?;:''"()') AS tok2
  FROM (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
    FROM documents
  )
),
counts AS (
  SELECT t.doc_id, l.lang_cand, count(*)::BIGINT AS cnt
  FROM toks t JOIN lookup l ON t.tok2 = l.tok
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang_cand,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, lang_cand ASC) AS rn
  FROM counts
)
SELECT d.doc_id, coalesce(b.lang_cand, 'und') AS lang_pred
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  ON d.doc_id = b.doc_id"""

    o["fingerprints"] = _fingerprints_oracle()

    o["gram_novelty_scores"] = _gram_novelty_oracle(gram=8)

    o["source_vocab_overlap"] = """
WITH tok AS (
  SELECT DISTINCT source,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS w
  FROM documents),
sz AS (SELECT source, count(*)::BIGINT AS n FROM tok GROUP BY 1),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*)::BIGINT AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2)
SELECT s1.source AS src_a, s2.source AS src_b,
       coalesce(i.i, 0)::BIGINT AS inter,
       (s1.n + s2.n - coalesce(i.i, 0))::BIGINT AS uni,
       CASE WHEN s1.n + s2.n - coalesce(i.i, 0) > 0
            THEN (1000 * coalesce(i.i, 0))
                 // (s1.n + s2.n - coalesce(i.i, 0))
            ELSE 1000 END::BIGINT AS jaccard_permille
FROM sz s1
JOIN sz s2 ON s1.source < s2.source
LEFT JOIN inter i ON i.src_a = s1.source AND i.src_b = s2.source"""

    o["bigram_lift_top20"] = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS ws
  FROM documents),
uni AS (SELECT w, count(*)::BIGINT AS n
        FROM (SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
nn AS (SELECT sum(n)::BIGINT AS total FROM uni),
big AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2, count(*)::BIGINT AS n_ab
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM toks)
  GROUP BY 1, 2),
scored AS (
  SELECT b.w1, b.w2, b.n_ab,
         ((1000 * nn.total * b.n_ab) // (ua.n * ub.n))::BIGINT
           AS lift_permille
  FROM big b
  JOIN uni ua ON ua.w = b.w1
  JOIN uni ub ON ub.w = b.w2
  CROSS JOIN nn
  WHERE b.n_ab >= 20)
SELECT w1, w2, n_ab, lift_permille FROM scored
ORDER BY lift_permille DESC, w1 ASC, w2 ASC LIMIT 20"""

    o["repetition_scores"] = r"""
WITH lines AS (
  SELECT doc_id, l, count(*)::BIGINT AS n, strlen(l)::BIGINT AS len
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
  GROUP BY doc_id, l
),
lstats AS (
  SELECT doc_id, sum(n)::BIGINT AS n_lines,
         sum(n - 1)::BIGINT AS dup_line_count,
         sum(CASE WHEN n > 1 THEN n * len ELSE 0 END)::BIGINT
           AS dup_line_chars
  FROM lines GROUP BY doc_id
),
tk AS (SELECT doc_id, regexp_extract_all(text, '\S+') AS toks
       FROM documents),
bg AS (
  SELECT doc_id, toks[s] || ' ' || toks[s + 1] AS b
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS s FROM tk)
),
bcnt AS (SELECT doc_id, b, count(*)::BIGINT AS n FROM bg GROUP BY doc_id, b),
bstats AS (SELECT doc_id, sum(n)::BIGINT AS n_bigrams,
                  max(n)::BIGINT AS top_bigram_count
           FROM bcnt GROUP BY doc_id)
SELECT d.doc_id, l.n_lines, l.dup_line_count, l.dup_line_chars,
       coalesce(b.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(b.top_bigram_count, 0)::BIGINT AS top_bigram_count
FROM documents d JOIN lstats l USING (doc_id)
LEFT JOIN bstats b USING (doc_id)"""

    # PII scrub: replay the planted augmentation (pure doc_id arithmetic),
    # then the same three regexes. Patterns restricted to syntax where
    # RE2 (DuckDB), rust regex (polars) and Python `re` agree exactly —
    # leftmost-first, greedy, \b/\d supported (see ops/text.py).
    from ..ops.text import PII_DIGITRUN_RE, PII_EMAIL_RE, PII_IPV4_RE

    o["pii_scrub"] = """
WITH aug AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN
           text || ' contact user' || doc_id || '@example.com ip 10.' ||
           (doc_id % 256) || '.' || ((doc_id // 7) % 256) || '.' ||
           (doc_id % 250) || ' tel ' || (doc_id + 5550000000)
         ELSE text END AS text
  FROM documents
),
red AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '@E@'))::BIGINT AS n_email,
         len(regexp_extract_all(text, '@I@'))::BIGINT AS n_ipv4,
         len(regexp_extract_all(text, '@D@'))::BIGINT AS n_digitrun,
         regexp_replace(regexp_replace(regexp_replace(text,
           '@E@', '<EMAIL>', 'g'), '@I@', '<IP>', 'g'),
           '@D@', '<NUM>', 'g') AS text_redacted
  FROM aug
)
SELECT doc_id, n_email, n_ipv4, n_digitrun, text_redacted,
       strlen(text_redacted)::BIGINT AS n_chars_redacted
FROM red""".replace("@E@", PII_EMAIL_RE).replace(
        "@I@", PII_IPV4_RE).replace("@D@", PII_DIGITRUN_RE)

    # ROLLUP: level = number of rolled-up dimensions, coarser levels
    # labeled 'ALL' (the engine's sentinel).
    o["doc_source_lang_rollup"] = """
SELECT coalesce(source, 'ALL') AS source,
       coalesce(lang, 'ALL') AS lang,
       (GROUPING(source) + GROUPING(lang))::BIGINT AS level,
       count(*)::BIGINT AS n_rows,
       sum(n_chars)::BIGINT AS sum_val
FROM documents
GROUP BY ROLLUP (source, lang)"""

    # set ops over packed 8-byte windows: little-endian ascii sum is the
    # exact SQL replay of kernels.vhash.packed_windows on ASCII text.
    _gram_expr = " + ".join(
        f"ascii(substr(text, s + {k + 1}, 1)) * {256 ** k}" for k in range(8))

    def _gram_cte(name: str, src: str) -> str:
        return f"""{name} AS (
  SELECT DISTINCT ({_gram_expr})::BIGINT AS gram_key
  FROM (SELECT text, unnest(range(0, greatest(0, strlen(text) - 7))) AS s
        FROM documents WHERE source = '{src}')
)"""

    o["grams_only_in_src0"] = f"""
WITH {_gram_cte('w0', 'src0')}, {_gram_cte('w1', 'src1')}
SELECT gram_key FROM w0 EXCEPT SELECT gram_key FROM w1"""

    o["grams_in_both_srcs"] = f"""
WITH {_gram_cte('w0', 'src0')}, {_gram_cte('w1', 'src1')}
SELECT gram_key FROM w0 INTERSECT SELECT gram_key FROM w1"""

    # distinctive terms: all-integer tf/df ranking (no float idf), so
    # row_number under the total order (tf DESC, df ASC, term ASC) is
    # value-exact against the engine.
    o["distinctive_terms"] = """
WITH toks AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS term
  FROM documents),
tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf
       FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(DISTINCT doc_id)::BIGINT AS df
       FROM toks GROUP BY 1),
rk AS (SELECT doc_id, term, tf, df,
              row_number() OVER (
                PARTITION BY doc_id
                ORDER BY tf DESC, df ASC, term ASC)::BIGINT AS rnk
       FROM tf JOIN df USING (term))
SELECT doc_id, term, tf, df, rnk FROM rk WHERE rnk <= 3"""

    # inverted index: the postings cap is in the CASE, so hot terms
    # compare on (term, n_docs, NULL) exactly like the engine.
    o["docs_inverted_index"] = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS term
  FROM documents)
SELECT term, count(*)::BIGINT AS n_docs,
       CASE WHEN count(*) <= 32
            THEN string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id)
       END AS postings
FROM toks GROUP BY term"""

    # MAD outliers: the engine's integer rank rule (q*n+999)//1000 is
    # replayed as the r-th smallest value; predicate all-integer.
    o["doc_len_outliers"] = """
WITH v AS (SELECT doc_id, n_chars::BIGINT AS x FROM documents),
cnt AS (SELECT count(*)::BIGINT AS n FROM v),
medr AS (SELECT x, row_number() OVER (ORDER BY x) AS r FROM v),
med AS (SELECT x AS m FROM medr, cnt WHERE r = (500 * n + 999) // 1000),
dev AS (SELECT doc_id, x, abs(x - med.m)::BIGINT AS d FROM v, med),
madr AS (SELECT d, row_number() OVER (ORDER BY d) AS r FROM dev),
mad AS (SELECT d AS md FROM madr, cnt WHERE r = (500 * n + 999) // 1000)
SELECT doc_id, x AS val, d AS abs_dev
FROM dev, mad WHERE 10 * d > 20 * md"""

    # co-occurrence: vocabulary rule (count DESC, term ASC LIMIT 20)
    # replayed; inner self-join on a < b matches the engine's upper
    # triangle with zero pairs dropped.
    o["term_cooc_top20"] = """
WITH tok AS (
  SELECT doc_id,
         lower(unnest(regexp_extract_all(text, '[A-Za-z]+'))) AS w
  FROM documents),
cnt AS (SELECT w, count(*) AS n FROM tok GROUP BY 1),
vocab AS (SELECT w FROM cnt ORDER BY n DESC, w ASC LIMIT 20),
inc AS (SELECT DISTINCT doc_id, w FROM tok
        WHERE w IN (SELECT w FROM vocab))
SELECT a.w AS term_a, b.w AS term_b, count(*)::BIGINT AS n_docs
FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.w < b.w
GROUP BY 1, 2"""

    o["bpe_train_merges"] = _bpe_oracle(n_merges=6)

    o["bpe_encoded_token_counts"] = _bpe_encode_oracle(n_merges=6)

    o["lm_fit_scores"] = r"""
WITH docw AS (
  SELECT doc_id, source,
         regexp_extract_all(lower(text), '[a-z]+') AS l
  FROM documents),
bg AS (
  SELECT doc_id, source, l[i] AS w1, l[i + 1] AS w2
  FROM (SELECT doc_id, source, l, unnest(range(1, len(l))) AS i
        FROM docw)),
uni_t AS (
  SELECT u AS w1, count(*)::BIGINT AS cu
  FROM (SELECT unnest(l) AS u FROM docw WHERE source = 'src0')
  GROUP BY 1),
vsz AS (SELECT greatest(count(*), 1)::BIGINT AS v FROM uni_t),
big_t AS (
  SELECT w1, w2, count(*)::BIGINT AS cb
  FROM bg WHERE source = 'src0' GROUP BY 1, 2),
fit AS (
  SELECT b.doc_id,
         (1000 * (coalesce(t.cb, 0) + 1))
           // (coalesce(u.cu, 0) + (SELECT v FROM vsz)) AS fit
  FROM bg b
  LEFT JOIN big_t t ON t.w1 = b.w1 AND t.w2 = b.w2
  LEFT JOIN uni_t u ON u.w1 = b.w1),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS n_bigrams,
         sum(fit)::BIGINT AS fit_sum
  FROM fit GROUP BY 1)
SELECT d.doc_id,
       coalesce(a.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(a.fit_sum, 0)::BIGINT AS fit_sum,
       CASE WHEN coalesce(a.n_bigrams, 0) > 0
            THEN a.fit_sum // a.n_bigrams ELSE 0 END::BIGINT
         AS avg_fit_permille
FROM documents d LEFT JOIN agg a USING (doc_id)"""
