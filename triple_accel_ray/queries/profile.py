"""Source formats, transcript profiling, lint.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    def _docs_roundtrip(sf_dir, conv, rdr):
        import pyarrow.parquet as pq

        src = _t(sf_dir, "documents")
        schema = pq.read_schema(src).remove_metadata()
        return rdr(conv(src), schema=schema)

    def docs_from_jsonl(sf_dir):
        """Source-format parity: the documents table converted to NDJSON
        (deterministic, cached) and read back via ray.data.read_json with
        schema coercion (io.read_jsonl) — the oracle reads the parquet
        view, so every value including full text must survive the JSON
        encode/decode byte-exactly. At scale NDJSON shards parallelize
        per file exactly like parquet."""
        from ..io import parquet_to_jsonl, read_jsonl

        return _docs_roundtrip(sf_dir, parquet_to_jsonl, read_jsonl)

    q["docs_from_jsonl"] = docs_from_jsonl

    def docs_from_csv(sf_dir):
        """Source-format parity for CSV (io.read_csv: RFC-4180 quoting,
        empty strings preserved, schema-coerced); oracle = the parquet
        view."""
        from ..io import parquet_to_csv, read_csv

        return _docs_roundtrip(sf_dir, parquet_to_csv, read_csv)

    q["docs_from_csv"] = docs_from_csv

    def conv_turn_stats(sf_dir):
        """Transcript-native profiling (ops/transcripts.conv_stats): per-
        conversation role mix, tool-call density, text bytes, wall-clock
        span and max step gap (epoch-µs integers) — one conv_id-bucketed
        shuffle + vectorized per-bucket polars aggregation, the same
        partitioning key as every other pipeline stage."""
        from ..ops.transcripts import conv_stats
        from ..pipeline.transcripts import ensure_fixture

        tp, _ = ensure_fixture(sf_dir)
        return conv_stats(read_parquet_clean(tp), num_buckets=16)

    q["conv_turn_stats"] = conv_turn_stats

    def conv_lint_counts(sf_dir):
        """Transcript structural lint (ops/transcripts.conv_lint): per
        conversation, adjacent same-role turns, orphan tool turns (no
        assistant immediately before), and timestamp regressions — the
        data-quality gate before training on turns. Same conv-bucket
        shuffle as conv_turn_stats; LAG-window SQL twin."""
        from ..ops.transcripts import conv_lint
        from ..pipeline.transcripts import ensure_fixture

        tp, _ = ensure_fixture(sf_dir)
        return conv_lint(read_parquet_clean(
            tp, columns=["conv_id", "turn_idx", "role", "ts"]),
            num_buckets=16)

    q["conv_lint_counts"] = conv_lint_counts

    def sft_pairs_extract(sf_dir):
        """SFT training-pair extraction (ops/transcripts.sft_pairs):
        every adjacent user -> assistant turn pair (interleaved tool /
        same-role turns suppress), keyed by the assistant turn. One
        conv-bucket shuffle; byte-exact LAG twin."""
        from ..ops.transcripts import sft_pairs
        from ..pipeline.transcripts import ensure_fixture

        tp, _ = ensure_fixture(sf_dir)
        return sft_pairs(read_parquet_clean(
            tp, columns=["conv_id", "turn_idx", "role", "text"]),
            num_buckets=16)

    q["sft_pairs_extract"] = sft_pairs_extract

    def conv_id_dictionary(sf_dir):
        """Distributed zipWithIndex (ops/relational.dense_rank_ids):
        dictionary-encode the conversation keys into dense contiguous
        0-based ids in sorted order — the string-key -> machine-id pass
        (graph node ids, embedding row numbers) done with one distinct
        groupby + one sort + per-block offsets; the driver only ever
        sees one count per block."""
        from ..ops.relational import dense_rank_ids
        from ..pipeline.transcripts import ensure_fixture

        tp, _ = ensure_fixture(sf_dir)
        turns = read_parquet_clean(tp, columns=["conv_id"])
        return dense_rank_ids(turns, "conv_id", num_partitions=8)

    q["conv_id_dictionary"] = conv_id_dictionary

    def source_len_drift(sf_dir):
        """Per-source distribution drift (ops/profile.
        source_length_drift): L1 distance in integer per-mille between
        each source's log-bucket length histogram and the global one —
        the slice-skew monitor a mixing pipeline alarms on. Register-
        sized partials only; no data row ever shuffles."""
        from ..ops.profile import source_length_drift

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["source", "n_chars"])
        return source_length_drift(docs)

    q["source_len_drift"] = source_len_drift

    def docs_profile(sf_dir):
        """Single-pass table profiling (ops/profile.profile_columns):
        per-column rows/nulls/exact distinct/typed min-max over the full
        documents table. Counts + min/max ride per-block partials (no
        data shuffle); exact distinct is ONE shared hash(val) bucket
        shuffle of per-block-distinct melted values."""
        from ..ops.profile import profile_columns

        docs = read_parquet_clean(
            _t(sf_dir, "documents"),
            columns=["doc_id", "text", "lang", "source", "n_chars"])
        return profile_columns(
            docs, ["doc_id", "text", "lang", "source", "n_chars"])

    q["docs_profile"] = docs_profile


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    # source-format parity: the Ray side reads an NDJSON / CSV conversion
    # of the documents fixture; the oracle reads the parquet view — every
    # column (including full text) must match byte-exactly.
    o["docs_from_jsonl"] = (
        "SELECT doc_id, text, lang, source, n_chars FROM documents")
    o["docs_from_csv"] = (
        "SELECT doc_id, text, lang, source, n_chars FROM documents")

    o["source_len_drift"] = """
WITH b AS (SELECT source,
                  (CASE WHEN n_chars < 1 THEN -1
                        ELSE length(bin(n_chars::BIGINT)) - 1
                   END)::BIGINT AS bucket
           FROM documents),
reg AS (SELECT source, bucket, count(*)::BIGINT AS n FROM b GROUP BY 1, 2),
gdist AS (SELECT bucket, sum(n)::BIGINT AS gn FROM reg GROUP BY 1),
nn AS (SELECT sum(n)::BIGINT AS total FROM reg),
sizes AS (SELECT source, sum(n)::BIGINT AS ns FROM reg GROUP BY 1),
filled AS (
  SELECT s.source, s.ns, g.bucket, g.gn, coalesce(r.n, 0)::BIGINT AS n
  FROM sizes s CROSS JOIN gdist g
  LEFT JOIN reg r ON r.source = s.source AND r.bucket = g.bucket)
SELECT source, any_value(ns)::BIGINT AS n_docs,
       sum(abs((1000 * n) // ns
               - (1000 * gn) // (SELECT total FROM nn)))::BIGINT
         AS drift_permille
FROM filled GROUP BY source"""

    o["conv_id_dictionary"] = f"""
SELECT conv_id AS value,
       (row_number() OVER (ORDER BY conv_id) - 1)::BIGINT AS id
FROM (SELECT DISTINCT conv_id FROM read_parquet('{fx}'))"""

    o["sft_pairs_extract"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, text,
         lag(role) OVER w AS prev_role,
         lag(text) OVER w AS prev_text
  FROM read_parquet('{fx}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, turn_idx::BIGINT AS turn_idx,
       prev_text AS prompt, text AS response
FROM t WHERE role = 'assistant' AND prev_role = 'user'"""

    o["conv_lint_counts"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, ts,
         lag(role) OVER w AS prev_role,
         lag(ts) OVER w AS prev_ts
  FROM read_parquet('{fx}')
  WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)
)
SELECT conv_id, count(*)::BIGINT AS n_turns,
       count(*) FILTER (prev_role IS NOT NULL AND role = prev_role)
         ::BIGINT AS same_role_adjacent,
       count(*) FILTER (role = 'tool'
                        AND (prev_role IS NULL OR prev_role <> 'assistant'))
         ::BIGINT AS orphan_tool_turns,
       count(*) FILTER (prev_ts IS NOT NULL AND ts < prev_ts)
         ::BIGINT AS ts_regressions
FROM t GROUP BY conv_id"""

    o["conv_turn_stats"] = f"""
WITH t AS (
  SELECT conv_id, turn_idx, role, tool, text, epoch_us(ts) AS e
  FROM read_parquet('{fx}')
),
d AS (
  SELECT conv_id,
         e - lag(e) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS step
  FROM t
),
g AS (SELECT conv_id, coalesce(max(step), 0)::BIGINT AS max_step_us
      FROM d GROUP BY conv_id)
SELECT t.conv_id,
       count(*)::BIGINT AS n_turns,
       sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)::BIGINT AS n_user,
       sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)::BIGINT
         AS n_assistant,
       sum(CASE WHEN tool <> '' THEN 1 ELSE 0 END)::BIGINT AS n_tool_calls,
       count(DISTINCT CASE WHEN tool <> '' THEN tool END)::BIGINT
         AS n_distinct_tools,
       sum(strlen(text))::BIGINT AS text_bytes,
       (max(e) - min(e))::BIGINT AS span_us,
       any_value(g.max_step_us) AS max_step_us
FROM t JOIN g ON t.conv_id = g.conv_id
GROUP BY t.conv_id"""

    # profiling: typed min/max cast to VARCHAR after aggregation (the
    # engine computes min/max on the typed column, then stringifies —
    # DuckDB's int->VARCHAR cast == python str(int)).
    prof_col = """
SELECT '{c}' AS col_name, count(*)::BIGINT AS n_rows,
       (count(*) - count({c}))::BIGINT AS n_null,
       count(DISTINCT {c})::BIGINT AS n_distinct,
       CAST(min({c}) AS VARCHAR) AS min_str,
       CAST(max({c}) AS VARCHAR) AS max_str
FROM documents"""
    o["docs_profile"] = " UNION ALL ".join(
        prof_col.format(c=c)
        for c in ["doc_id", "text", "lang", "source", "n_chars"])
