"""Curation-operator tests: stratified sampling determinism and
order-independence, per-group top-k vs a pandas oracle, anti-join exactness
incl. a planted hash-collision-free byte-verify path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_tbl():
    import pyarrow.parquet as pq

    return pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text", "n_chars"]
    )


def _local_sample_ids(tbl, fractions, default_p):
    from triple_accel_ray.ops.curation import SAMPLE_SALT, _sample_threshold
    from triple_accel_ray.pipeline.blocking import _mix64

    ids = tbl["doc_id"].to_numpy().astype(np.uint64)
    h = _mix64(ids ^ SAMPLE_SALT)
    src = tbl["source"].to_numpy(zero_copy_only=False)
    keep = []
    for i in range(len(tbl)):
        lim = _sample_threshold(fractions.get(src[i], default_p))
        if lim >= (1 << 64) or int(h[i]) < lim:
            keep.append(int(ids[i]))
    return sorted(keep)


def test_stratified_sample_matches_local_and_is_order_independent(
    ray_session, docs_tbl
):
    import ray.data as rd

    from triple_accel_ray.ops.curation import stratified_sample

    fr = {"src0": 500, "src1": 250}
    want = _local_sample_ids(docs_tbl, fr, 100)
    out = stratified_sample(rd.from_arrow(docs_tbl), fr, 100).to_pandas()
    assert sorted(out["doc_id"]) == want

    # permuted row order + different partitioning -> identical sample
    perm = docs_tbl.take(pa.array(np.random.RandomState(7).permutation(len(docs_tbl))))
    out2 = stratified_sample(
        rd.from_arrow(perm).repartition(5), fr, 100
    ).to_pandas()
    assert sorted(out2["doc_id"]) == want

    # stratification is real: src0 keeps ~5x the default strata
    n0 = (out["source"] == "src0").sum()
    n_rest = (~out["source"].isin(["src0", "src1"])).sum()
    n_strata_rest = docs_tbl.to_pandas()["source"].nunique() - 2
    assert n0 > 2 * (n_rest / max(1, n_strata_rest))


def test_stratified_sample_permille_edges(ray_session, docs_tbl):
    import ray.data as rd

    from triple_accel_ray.ops.curation import stratified_sample

    ds = rd.from_arrow(docs_tbl)
    assert stratified_sample(ds, {}, 1000).count() == len(docs_tbl)
    assert stratified_sample(ds, {}, 0).count() == 0


def test_top_k_per_group_matches_pandas(ray_session, docs_tbl):
    import ray.data as rd

    from triple_accel_ray.ops.curation import top_k_per_group

    out = (
        top_k_per_group(rd.from_arrow(docs_tbl).repartition(4), k=3)
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    df = docs_tbl.to_pandas()
    df = df.sort_values(
        ["source", "n_chars", "doc_id"], ascending=[True, False, True]
    )
    want = (
        df.groupby("source")
        .head(3)[["source", "doc_id", "n_chars"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, want, check_dtype=False)


def test_top_k_ties_break_on_id(ray_session):
    import ray.data as rd

    from triple_accel_ray.ops.curation import top_k_per_group

    t = pa.table(
        {
            "doc_id": [10, 11, 12, 13, 20],
            "source": ["a"] * 4 + ["b"],
            "n_chars": [5, 5, 5, 5, 1],
        }
    )
    out = top_k_per_group(rd.from_arrow(t).repartition(3), k=2).to_pandas()
    a = out[out["source"] == "a"]
    assert sorted(a["doc_id"]) == [10, 11]  # smallest ids win the tie
    assert sorted(out[out["source"] == "b"]["doc_id"]) == [20]


def test_anti_join_texts_exact(ray_session):
    import ray.data as rd

    from triple_accel_ray.ops.curation import anti_join_texts

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4, 5, 6],
            "source": ["src0", "src0", "srcX", "srcX", "srcY", "srcY"],
            "text": ["alpha", "beta", "alpha", "gamma", "beta", "delta"],
        }
    )
    out = anti_join_texts(rd.from_arrow(t).repartition(3)).to_pandas()
    # 3 ("alpha") and 5 ("beta") are in the src0 reference; 4 and 6 survive
    assert sorted(out["doc_id"]) == [4, 6]
    # ref rows themselves never appear
    assert not out["source"].eq("src0").any()


def test_skyline_vs_bruteforce(ray_session):
    """Distributed skyline equals an O(n^2) dominance replay: full
    (x, y) duplicates all survive, y-ties across different x are
    dominated, combiner law holds under repartitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from triple_accel_ray.ops.curation import skyline

    rng = np.random.default_rng(47)
    n = 300
    x = rng.integers(0, 40, n).astype(np.int64)
    y = rng.integers(0, 40, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    # plant an exact duplicate pair on the front
    x[0], y[0] = 0, int(y.max()) + 5
    x[1], y[1] = 0, int(y.max())

    keep = []
    for i in range(n):
        dominated = any(
            (x[j] <= x[i] and y[j] >= y[i]
             and (x[j] < x[i] or y[j] > y[i]))
            for j in range(n))
        if not dominated:
            keep.append((int(ids[i]), int(x[i]), int(y[i])))
    want = sorted(keep)
    assert (0, 0, int(y[0])) in want and (1, 0, int(y[1])) in want

    t = pa.table({"doc_id": pa.array(ids), "xc": pa.array(x),
                  "yc": pa.array(y)})
    for parts in (1, 7):
        out = skyline(rd.from_arrow(t).repartition(parts),
                      "xc", "yc").take_all()
        got = sorted((r["doc_id"], r["xc"], r["yc"]) for r in out)
        assert got == want
