"""Clustered ANN fixture (round-4): PQ recall on planted-centroid data,
the exact integer-L2 ground-truth kNN, and the driver-window ordering
contract that CORRECTNESS depends on."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_driver_window_is_queries_prefix():
    """The driver checks the FIRST 50 queries() keys in dict order —
    the round-5 window list must be exactly that prefix."""
    from triple_accel_ray.queries import DRIVER_WINDOW_R5, build_queries

    keys = list(build_queries().keys())
    assert keys[:50] == DRIVER_WINDOW_R5
    assert len(keys) == len(set(keys))


def test_clustered_vectors_structure():
    from triple_accel_ray.queries import CLUST_DIM, _clustered_vectors

    V = _clustered_vectors(np.arange(12), CLUST_DIM)
    assert V.shape == (12, CLUST_DIM) and V.dtype == np.int64
    # same cluster (ids 0..5) differ only by noise (|delta| <= 40);
    # different clusters differ by centroid spans
    intra = np.abs(V[0] - V[5]).max()
    inter = np.abs(V[0] - V[6]).max()
    assert intra <= 40
    assert inter > 100


def test_knn_bruteforce_l2int_matches_numpy(ray_session):
    import ray.data as rd

    from triple_accel_ray.ops.similarity import knn_bruteforce_l2int
    from triple_accel_ray.queries import _clustered_vectors

    dim, n, k = 16, 40, 3
    V = _clustered_vectors(np.arange(n), dim)
    off = pa.array(np.arange(0, (n + 1) * dim, dim, dtype=np.int32))
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.ListArray.from_arrays(
             off, pa.array(V.ravel().astype(np.float64), pa.float64()))})
    qt = tbl.slice(0, 4)
    got = (
        knn_bruteforce_l2int(rd.from_arrow(tbl), qt, k=k)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # numpy oracle
    rows = []
    for qi in range(4):
        d = ((V - V[qi]) ** 2).sum(axis=1)
        d[qi] = 1 << 62
        order = np.lexsort((np.arange(n), d))[:k]
        for r, j in enumerate(order, 1):
            rows.append((qi, j, int(d[j]), r))
    exp = np.array(rows)
    assert (got[["query_id", "neighbor_id", "l2_dist", "rank"]].to_numpy()
            == exp).all()


@pytest.mark.parametrize("sf_dir", [SF])
def test_knn_pq_recall_clustered_meets_bar(ray_session, sf_dir):
    """VERDICT r3 #2 done-bar: recall@5 >= 800 permille on the
    structured fixture (measured 1000 at sf0.001/sf0.01)."""
    from triple_accel_ray.queries import build_queries

    row = build_queries()["knn_pq_recall_clustered"](sf_dir).to_pandas()
    assert len(row) == 1
    assert int(row["recall_permille"].iloc[0]) >= 800


def test_knn_ivf_recall_clustered(ray_session):
    """VERDICT r3 #2 second half: IVF nprobe recall on the clustered
    fixture. Cluster mates share an IVF cell, so even nprobe=1 recovers
    the exact top-5 (measured 1000 permille at every nprobe; bar 800)."""
    import ray.data as rd

    from triple_accel_ray.ops.similarity import knn_bruteforce, knn_ivf
    from triple_accel_ray.queries import CLUST_DIM, _clustered_vectors

    n = 200
    V = _clustered_vectors(np.arange(n), CLUST_DIM)
    off = pa.array(np.arange(0, (n + 1) * CLUST_DIM, CLUST_DIM,
                             dtype=np.int32))
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.ListArray.from_arrays(
             off, pa.array(V.ravel().astype(np.float64), pa.float64()))})
    qt = tbl.slice(0, 10)
    ex = knn_bruteforce(rd.from_arrow(tbl), qt, k=5).to_pandas()
    exact = set(zip(ex.query_id, ex.neighbor_id))
    iv = knn_ivf(rd.from_arrow(tbl), qt, k=5, n_centroids=8,
                 nprobe=1).to_pandas()
    got = set(zip(iv.query_id, iv.neighbor_id))
    assert len(got & exact) * 1000 // len(exact) >= 800


def test_knn_ivf_int_exact_within_probed_cells(ray_session):
    """knn_ivf_int == a numpy replay of the same integer recipe
    (kmeans_int-style training, one cell per vector, nprobe nearest
    cells per query, exact int L2 within probed cells) on the clustered
    fixture — the oracle logic independent of SQL."""
    import ray.data as rd

    from triple_accel_ray.ops.similarity import knn_ivf_int
    from triple_accel_ray.pipeline.blocking import _mix64
    from triple_accel_ray.queries import CLUST_DIM, _clustered_vectors

    n, k, ncent, nprobe, n_iter, seed = 120, 5, 8, 2, 3, 29
    V = _clustered_vectors(np.arange(n), CLUST_DIM)
    off = pa.array(np.arange(0, (n + 1) * CLUST_DIM, CLUST_DIM,
                             dtype=np.int32))
    tbl = pa.table(
        {"vec_id": pa.array(np.arange(n, dtype=np.int64)),
         "embedding": pa.ListArray.from_arrays(
             off, pa.array(V.ravel().astype(np.float64), pa.float64()))})
    qt = tbl.slice(0, 6)
    got = (knn_ivf_int(rd.from_arrow(tbl).repartition(4), qt, k=k,
                       n_centroids=ncent, nprobe=nprobe, n_iter=n_iter,
                       quant_scale=1, seed=seed)
           .to_pandas().sort_values(["query_id", "rank"])
           .reset_index(drop=True))

    # numpy replay
    ids = np.arange(n, dtype=np.int64)
    salt = np.uint64((seed * 0x9E3779B97F4A7C15) % 2**64)
    h = _mix64(ids.astype(np.uint64) ^ salt)
    C = V[np.lexsort((ids, h))[:ncent]].copy()
    for _ in range(n_iter):
        score = (C * C).sum(1)[None, :] - 2 * (V @ C.T)
        lab = np.argmin(score, 1)
        for j in range(ncent):
            if (lab == j).any():
                C[j] = V[lab == j].sum(0) // (lab == j).sum()
    score = (C * C).sum(1)[None, :] - 2 * (V @ C.T)
    lab = np.argmin(score, 1)
    rows = []
    for qi in range(6):
        qs = (C * C).sum(1) - 2 * (V[qi] @ C.T)
        probes = np.argsort(qs, kind="stable")[:nprobe]
        cand = np.nonzero(np.isin(lab, probes) & (ids != qi))[0]
        d = ((V[cand] - V[qi]) ** 2).sum(1)
        order = np.lexsort((ids[cand], d))[:k]
        for r, j in enumerate(order):
            rows.append((qi, int(ids[cand][j]), int(d[j]), r + 1))
    import pandas as pd

    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                       "l2_dist", "rank"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("sf_dir", [SF])
def test_knn_ivf_recall_clustered_query_meets_bar(ray_session, sf_dir):
    """Driver-row twin (knn_ivf_recall_clustered): recall@5 on the
    clustered fixture via the oracle-checkable integer IVF — 1000
    permille measured at sf0.001/sf0.01; bar 800."""
    from triple_accel_ray.queries import build_queries

    row = build_queries()["knn_ivf_recall_clustered"](sf_dir).to_pandas()
    assert len(row) == 1
    assert int(row["recall_permille"].iloc[0]) >= 800
