"""bucket_partition invariants: each fn call sees exactly one whole bucket,
results match the groupby form, and the num_buckets<2 degenerate case still
delivers the WHOLE bucket in one call (boundaries=[] would silently fall
back to mapper-count partitioning and split it)."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from triple_accel_ray.pipeline.shuffle import bucket_partition


def _fixture_ds(n_rows: int = 2000, n_buckets: int = 6, n_blocks: int = 8):
    rng = np.random.default_rng(7)
    t = pa.table({
        "bucket": pa.array(rng.integers(0, n_buckets, n_rows), pa.int32()),
        "val": pa.array(rng.integers(0, 1000, n_rows), pa.int64()),
    })
    return rd.from_arrow(t).repartition(n_blocks), t


def _make_per_bucket_summary():
    # returned as a CLOSURE so cloudpickle ships it by value — a module-level
    # test function would pickle by reference and Ray workers can't import
    # the tests package
    def per_bucket_summary(t: pa.Table) -> pa.Table:
        # asserts whole-bucket delivery: exactly one distinct bucket per call
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64()),
                             "vsum": pa.array([], pa.int64())})
        b = t["bucket"].to_numpy()
        assert np.unique(b).size == 1, "fn must receive exactly one bucket"
        return pa.table({
            "bucket": pa.array([int(b[0])], pa.int32()),
            "n": pa.array([t.num_rows], pa.int64()),
            "vsum": pa.array([int(t["val"].to_numpy().sum())], pa.int64()),
        })
    return per_bucket_summary


def test_bucket_partition_matches_groupby(ray_session):
    ds, t = _fixture_ds()
    out = bucket_partition(ds, _make_per_bucket_summary(), 6).take_all()
    got = {r["bucket"]: (r["n"], r["vsum"]) for r in out}
    b = t["bucket"].to_numpy()
    v = t["val"].to_numpy()
    want = {int(k): (int((b == k).sum()), int(v[b == k].sum()))
            for k in np.unique(b)}
    assert got == want


def test_bucket_partition_one_bucket_whole(ray_session):
    # all rows in bucket 0, many input blocks: the degenerate path must
    # still hand fn the complete bucket in ONE call
    t = pa.table({
        "bucket": pa.array(np.zeros(500, np.int32)),
        "val": pa.array(np.arange(500, dtype=np.int64)),
    })
    ds = rd.from_arrow(t).repartition(8)
    out = bucket_partition(ds, _make_per_bucket_summary(), 1).take_all()
    assert len(out) == 1
    row = out[0]
    assert row["n"] == 500 and row["vsum"] == int(np.arange(500).sum())


def test_bucket_partition_empty_buckets_ok(ray_session):
    # bucket values sparse in [0, num_buckets): empty partitions must not
    # break the per-bucket fn (it receives zero-row tables)
    t = pa.table({
        "bucket": pa.array([0, 0, 5, 5, 5], pa.int32()),
        "val": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = bucket_partition(
        rd.from_arrow(t), _make_per_bucket_summary(), 8
    ).take_all()
    got = {r["bucket"]: (r["n"], r["vsum"]) for r in out}
    assert got == {0: (2, 3), 5: (3, 12)}


def test_jsonl_csv_source_roundtrip(ray_session, tmp_path):
    """read_jsonl / read_csv must reproduce a parquet table byte-exactly,
    including adversarial strings: embedded newlines, quotes, commas,
    unicode, empty strings."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from triple_accel_ray.io import (
        parquet_to_csv, parquet_to_jsonl, read_csv, read_jsonl)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            'line one\nline "two", with comma',
            "unicode: naïve café — ☃",
            "",
            "trailing space ",
            "tab\tseparated",
        ],
        "lang": ["en", "fr", "en", "en", "de"],
        "n_chars": pa.array([10, 20, 0, 15, 13], pa.int64()),
    })
    src = str(tmp_path / "docs.parquet")
    pq.write_table(t, src)
    schema = pq.read_schema(src).remove_metadata()

    for conv, rdr in [(parquet_to_jsonl, read_jsonl),
                      (parquet_to_csv, read_csv)]:
        got = pa.Table.from_pandas(
            rdr(conv(src), schema=schema).to_pandas(), schema=schema)
        assert got.sort_by("doc_id").equals(
            t.cast(schema).sort_by("doc_id")), conv.__name__
