"""Incremental append must reproduce the full-corpus run: base(80%) +
increment(20%) → identical cluster assignments to one run over 100%."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import polars as pl

from triple_accel_ray.pipeline import PipelineConfig, run_er_pipeline
from triple_accel_ray.pipeline.incremental import run_er_incremental
from triple_accel_ray.pipeline.transcripts import generate_transcripts


def test_incremental_equals_full(ray_session, tmp_path):
    transcripts, labels = generate_transcripts(150, seed=42)
    conv_ids = sorted(set(transcripts["conv_id"].to_pylist()))
    cut = conv_ids[int(len(conv_ids) * 0.8)]
    base_t = transcripts.filter(pa.compute.less(transcripts["conv_id"], cut))
    inc_t = transcripts.filter(
        pa.compute.greater_equal(transcripts["conv_id"], cut)
    )
    full_p = str(tmp_path / "full.parquet")
    base_p = str(tmp_path / "base.parquet")
    inc_p = str(tmp_path / "inc.parquet")
    pq.write_table(transcripts, full_p)
    pq.write_table(base_t, base_p)
    pq.write_table(inc_t, inc_p)
    lp = str(tmp_path / "labels.parquet")
    pq.write_table(labels, lp)

    cfg = PipelineConfig(doc_buckets=4, pair_buckets=4)

    s_full = run_er_pipeline(full_p, str(tmp_path / "run_full"), cfg,
                             labels_path=lp)
    run_er_pipeline(base_p, str(tmp_path / "run_inc"), cfg)
    s_inc = run_er_incremental(inc_p, str(tmp_path / "run_inc"), cfg,
                               labels_path=lp)

    assert s_inc["metrics"]["f1"] == s_full["metrics"]["f1"] == 1.0

    cl_full = pl.from_arrow(
        pq.read_table(os.path.join(str(tmp_path / "run_full"), "clusters"))
    ).sort("conv_id")
    cl_inc = pl.from_arrow(
        pq.read_table(s_inc["clusters_dir"])
    ).sort("conv_id")
    assert cl_full.equals(cl_inc)

    # a second, empty-ish increment must be a no-op on clusters
    empty_p = str(tmp_path / "empty.parquet")
    pq.write_table(transcripts.slice(0, 0), empty_p)
    s2 = run_er_incremental(empty_p, str(tmp_path / "run_inc"), cfg)
    assert s2["new_docs"] == 0 and s2["new_edges"] == 0
    cl2 = pl.from_arrow(pq.read_table(s2["clusters_dir"])).sort("conv_id")
    assert cl_full.equals(cl2)
