"""Parquet read helper: metadata-stripped explicit schemas.

The driver-generated testdata parquet files carry pandas schema metadata
that makes ``pyarrow.Schema`` objects unhashable (``hash(schema)`` raises
``unhashable type: 'dict'``); Ray Data's schema unification then logs a
"Failed to hash the schemas (for deduplication)" warning per bundle and
falls back to the expensive unify path. Reading with an explicit
metadata-free schema (restricted to the selected columns) removes both
the warning and the repeated unify cost. The data pages are untouched —
only the schema handed to Ray differs.
"""

from __future__ import annotations

import os


def read_parquet_clean(path, columns=None, **kw):
    """``ray.data.read_parquet`` with a metadata-stripped explicit schema
    (falls back to a plain read if the schema can't be pre-read)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    f = path
    if isinstance(path, str) and os.path.isdir(path):
        parts = sorted(
            x for x in os.listdir(path) if x.endswith(".parquet")
        )
        f = os.path.join(path, parts[0]) if parts else None
    schema = None
    if isinstance(f, str) and f and os.path.exists(f):
        try:
            s = pq.read_schema(f).remove_metadata()
            schema = (
                pa.schema([s.field(c) for c in columns]) if columns else s
            )
        except Exception:
            schema = None
    if schema is not None:
        return rd.read_parquet(path, columns=columns, schema=schema, **kw)
    return rd.read_parquet(path, columns=columns, **kw)


# ------------------------------------------------------------------ sources
# A 100 TB corpus rarely arrives as parquet only: raw crawls and transcript
# dumps ship as NDJSON or CSV shards. Ray Data parallelizes read_json /
# read_csv per FILE exactly like parquet, so the pipeline shape is
# identical — these helpers add the format plumbing (schema coercion to
# the canonical Arrow schema) plus deterministic fixture converters so the
# driver queries can prove byte-exact parity with the parquet path.

def _conv_cache_path(src: str, ext: str) -> str:
    import hashlib

    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(src)}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:16]
    d = "/tmp/ta_ray_fixtures/conv"
    os.makedirs(d, exist_ok=True)
    return os.path.join(d, f"{key}.{ext}")


def parquet_to_jsonl(src: str) -> str:
    """Deterministically convert a (small, fixture-scale) parquet file to
    NDJSON, cached by (path, mtime, size). Vectorized via polars."""
    import polars as pl
    import pyarrow.parquet as pq

    out = _conv_cache_path(src, "jsonl")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        pl.from_arrow(pq.read_table(src)).write_ndjson(tmp)
        os.replace(tmp, out)
    return out


def parquet_to_csv(src: str) -> str:
    """Deterministically convert a (small, fixture-scale) parquet file to
    RFC-4180 CSV (pyarrow writer: quoting handles embedded newlines,
    quotes and commas), cached by (path, mtime, size)."""
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    out = _conv_cache_path(src, "csv")
    if not os.path.exists(out):
        tmp = out + ".tmp"
        pacsv.write_csv(pq.read_table(src), tmp)
        os.replace(tmp, out)
    return out


def _cast_to(schema):
    def _cast(t):
        import pyarrow as pa

        cols = [t[f.name].combine_chunks().cast(f.type) for f in schema]
        return pa.table(cols, schema=schema)

    return _cast


def read_jsonl(path, schema=None, **kw):
    """``ray.data.read_json`` (NDJSON) coerced to an explicit Arrow schema
    — the JSON reader infers types per block, so the cast pins int widths
    and string-ness deterministically across blocks."""
    import ray.data as rd

    ds = rd.read_json(path, **kw)
    if schema is None:
        return ds
    return ds.map_batches(_cast_to(schema), batch_format="pyarrow")


def read_csv(path, schema=None, **kw):
    """``ray.data.read_csv`` coerced to an explicit Arrow schema. Empty
    strings are preserved as empty strings (not null): the canonical
    transcript/document schemas are non-null."""
    import pyarrow.csv as pacsv
    import ray.data as rd

    kw.setdefault(
        "convert_options", pacsv.ConvertOptions(strings_can_be_null=False)
    )
    ds = rd.read_csv(path, **kw)
    if schema is None:
        return ds
    return ds.map_batches(_cast_to(schema), batch_format="pyarrow")
