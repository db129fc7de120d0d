"""SRP-LSH embedding near-dup: signature invariants + pipeline behavior.

The planted-duplicate construction (a 2x-scaled copy of every vector) is
the load-bearing property: cosine is scale-invariant and SRP signatures
are bit-identical under positive scaling, so LSH recall on planted pairs
is exactly 1 by construction — the same determinism the driver query
`embed_near_dups_lsh` and its SQL oracle rely on.
"""

import numpy as np
import pyarrow as pa

from triple_accel_ray.ops.dedup import (
    embedding_dup_pairs,
    embedding_dup_pairs_lsh,
    srp_planes,
    srp_signature_batch,
)


def _vec_table(n=120, d=16, seed=7, offset=1_000_000):
    """n random unit-ish vectors plus a 2x-scaled copy of each under
    id + offset. Expected dup pairs at high thresholds: exactly the
    (i, i + offset) planted pairs."""
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, d))
    M = np.vstack([X, X * 2.0])
    ids = np.concatenate([np.arange(n), np.arange(n) + offset])
    off = pa.array(np.arange(0, (2 * n + 1) * d, d, dtype=np.int32))
    t = pa.table(
        {"vec_id": pa.array(ids, pa.int64()),
         "embedding": pa.ListArray.from_arrays(
             off, pa.array(M.ravel(), pa.float64()))}
    )
    expected = {(int(i), int(i + offset)) for i in range(n)}
    return t, expected


def test_srp_signature_scale_invariance():
    rng = np.random.default_rng(3)
    X = rng.standard_normal((50, 24))
    planes = srp_planes(24, 64, seed=17)
    s1 = srp_signature_batch(X, planes)
    s2 = srp_signature_batch(X * 3.0, planes)
    s3 = srp_signature_batch(X * 0.125, planes)
    assert (s1 == s2).all() and (s1 == s3).all()
    # packed loop path (n_planes < 64) agrees with packbits fast path
    p48 = srp_planes(24, 48, seed=17)
    a = srp_signature_batch(X, p48)
    b = srp_signature_batch(X * 2.0, p48)
    assert (a == b).all()


def _pairs_set(ds):
    df = ds.to_pandas()
    return {(int(a), int(b)) for a, b in zip(df["a_id"], df["b_id"])}


def test_lsh_planted_duplicates(ray_session):
    import ray.data as rd

    t, expected = _vec_table()
    out = embedding_dup_pairs_lsh(rd.from_arrow(t), threshold=0.95)
    df = out.to_pandas()
    assert _pairs_set(out) == expected
    assert (df["cosine"] >= 0.95).all()
    assert (df["a_id"] < df["b_id"]).all()


def test_lsh_join_path_matches_broadcast(ray_session):
    import ray.data as rd

    t, expected = _vec_table(n=80)
    bcast = embedding_dup_pairs_lsh(rd.from_arrow(t), threshold=0.95)
    joined = embedding_dup_pairs_lsh(
        rd.from_arrow(t), threshold=0.95, broadcast_vec_max_bytes=0
    )
    assert _pairs_set(bcast) == _pairs_set(joined) == expected


def test_lsh_permutation_invariance(ray_session):
    import ray.data as rd

    t, expected = _vec_table(n=100, seed=11)
    perm = np.random.default_rng(5).permutation(t.num_rows)
    t_perm = t.take(pa.array(perm))
    out1 = embedding_dup_pairs_lsh(rd.from_arrow(t), threshold=0.95)
    out2 = embedding_dup_pairs_lsh(rd.from_arrow(t_perm), threshold=0.95)
    assert _pairs_set(out1) == _pairs_set(out2) == expected


def test_lsh_matches_exact_op_on_planted_corpus(ray_session):
    import ray.data as rd

    t, expected = _vec_table(n=60, seed=19)
    exact = embedding_dup_pairs(
        rd.from_arrow(t), threshold=0.95, target_chunk_rows=32
    )
    lsh = embedding_dup_pairs_lsh(rd.from_arrow(t), threshold=0.95)
    assert _pairs_set(exact) == _pairs_set(lsh) == expected
