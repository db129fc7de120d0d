"""Checkpoint/manifest semantics: skip on matching fingerprint, rebuild on
mismatch, never trust a half-written (killed mid-stage) tmp dir."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from triple_accel_ray.pipeline.checkpoint import read_manifest, run_stage


def _writer(value):
    def w(tmp):
        pq.write_table(
            pa.table({"x": pa.array([value] * 3, pa.int64())}),
            os.path.join(tmp, "part0.parquet"),
        )
        return {"value": value}

    return w


def test_skip_and_rebuild(tmp_path):
    run_dir = str(tmp_path)
    d1 = run_stage(run_dir, "s1", "fp_a", _writer(1))
    assert read_manifest(d1)["metrics"]["value"] == 1

    # same fingerprint: writer must NOT run again
    def boom(tmp):
        raise AssertionError("stage should have been skipped")

    d2 = run_stage(run_dir, "s1", "fp_a", boom)
    assert d2 == d1

    # changed fingerprint: rebuild
    d3 = run_stage(run_dir, "s1", "fp_b", _writer(2))
    assert read_manifest(d3)["metrics"]["value"] == 2


def test_killed_mid_stage_tmp_is_ignored(tmp_path):
    """A crash leaves s1.tmp with partial data and no manifest; the rerun
    must discard it and produce a complete stage."""
    run_dir = str(tmp_path)
    half = os.path.join(run_dir, "s1.tmp")
    os.makedirs(half)
    pq.write_table(pa.table({"x": [99]}), os.path.join(half, "garbage.parquet"))

    d = run_stage(run_dir, "s1", "fp", _writer(7))
    t = pq.read_table(d)
    assert t["x"].to_pylist() == [7, 7, 7]
    assert not os.path.exists(half)


def test_resume_false_forces_rerun(tmp_path):
    run_dir = str(tmp_path)
    run_stage(run_dir, "s1", "fp", _writer(1))
    d = run_stage(run_dir, "s1", "fp", _writer(2), resume=False)
    assert read_manifest(d)["metrics"]["value"] == 2


def test_lineage_per_file(tmp_path):
    def w(tmp):
        for i in range(3):
            pq.write_table(
                pa.table({"x": list(range(i + 1))}),
                os.path.join(tmp, f"part{i}.parquet"),
            )

    d = run_stage(str(tmp_path), "s1", "fp", w)
    man = read_manifest(d)
    assert man["rows"] == 6
    assert len(man["files"]) == 3
    assert man["files"]["part2.parquet"] == 3
