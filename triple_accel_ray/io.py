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
