"""Sketch-operator tests: HLL register merge associativity / permutation
invariance, estimator error bounds (incl. the linear-counting branch),
and exact quantiles vs a direct numpy oracle with the same rank rule."""

import numpy as np
import pyarrow as pa
import pytest

from triple_accel_ray.ops.sketch import (
    HLL_P,
    distinct_count,
    exact_quantiles,
    hll_estimate,
    hll_partial_registers,
    hll_registers,
)


def _merge_sparse(tables):
    """Reference merge: elementwise max over dense registers."""
    m = 1 << HLL_P
    reg = np.zeros(m, np.int64)
    for t in tables:
        b = t["bucket"].to_numpy()
        np.maximum.at(reg, b, t["rho_max"].to_numpy())
    nz = np.flatnonzero(reg)
    return list(zip(nz.tolist(), reg[nz].tolist()))


def test_hll_partials_merge_associative_and_permutation_invariant():
    rng = np.random.default_rng(7)
    vals = rng.integers(0, 1 << 40, size=20_000, dtype=np.int64)
    whole = _merge_sparse([hll_partial_registers(vals)])
    halves = _merge_sparse(
        [hll_partial_registers(vals[:9_000]), hll_partial_registers(vals[9_000:])]
    )
    shuffled = _merge_sparse([hll_partial_registers(rng.permutation(vals))])
    assert whole == halves == shuffled


def test_hll_estimate_within_theoretical_error():
    rng = np.random.default_rng(11)
    n = 50_000
    vals = rng.choice(1 << 60, size=n, replace=False).astype(np.int64)
    # duplicate every value 3x: distinct count must be unaffected
    vals3 = np.concatenate([vals, vals, vals])
    est = hll_estimate(hll_partial_registers(vals3))
    # sigma ~= 1.04/sqrt(4096) = 1.6%; allow 5 sigma
    assert abs(est - n) / n < 0.08


def test_hll_estimate_linear_counting_small_n():
    vals = np.arange(150, dtype=np.int64)
    est = hll_estimate(hll_partial_registers(vals))
    assert abs(est - 150) < 5  # linear counting is near-exact here


def test_hll_registers_distributed_matches_local(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 1 << 48, size=5_000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"user_id": vals})).repartition(7)
    got = hll_registers(ds, "user_id").to_pandas().sort_values("bucket")
    want = _merge_sparse([hll_partial_registers(vals)])
    assert list(zip(got["bucket"], got["rho_max"])) == want


def test_distinct_count_exact(ray_session):
    import ray.data as rd

    vals = np.array([1, 2, 2, 3, 3, 3, 9, 9, 9, 9], np.int64)
    ds = rd.from_arrow(pa.table({"user_id": vals})).repartition(3)
    out = distinct_count(ds, "user_id")
    assert int(out["n_distinct"].iloc[0]) == 4


def _quantile_oracle(vals, qp):
    v, n = np.unique(vals, return_counts=True)
    cum = np.cumsum(n)
    total = int(cum[-1])
    rank = (qp * total + 999) // 1000
    return int(v[np.searchsorted(cum, rank, side="left")])


@pytest.mark.parametrize("qps", [(500, 900, 990), (1, 1000)])
def test_exact_quantiles_vs_numpy(ray_session, qps):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vals = rng.integers(-50, 5_000, size=30_000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": vals})).repartition(9)
    got = exact_quantiles(ds, "x", qps).to_pandas().sort_values("q_permille")
    for qp, v in zip(got["q_permille"], got["x"]):
        assert v == _quantile_oracle(vals, int(qp))
    # qp=1000 must be the max (rank == n); qp=1 is the ceil(0.001*n)-th
    # smallest, already covered by the oracle loop above.
    if 1000 in qps:
        assert int(got.set_index("q_permille").loc[1000, "x"]) == vals.max()


def test_exact_quantiles_single_value(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"x": pa.array([42] * 100, pa.int64())}))
    got = exact_quantiles(ds, "x", (500,)).to_pandas()
    assert list(got["x"]) == [42]


def test_cms_partial_merge_and_overestimate():
    """Partials from split batches sum to the whole-batch sketch
    (mergeability); estimates are >= true counts even with a tiny width
    that forces collisions; and the sketch is permutation-invariant."""
    import numpy as np
    import pyarrow as pa

    from triple_accel_ray.ops.sketch import cms_estimate, cms_partial

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 200, size=5000, dtype=np.int64)

    def dense(tbl, w):
        reg = np.zeros((4, w), dtype=np.int64)
        reg[tbl["row"].to_numpy(), tbl["cell"].to_numpy()] += (
            tbl["cnt"].to_numpy())
        return reg

    for w in (16, 1024):  # w=16 forces heavy collisions
        whole = dense(cms_partial(vals, w=w), w)
        merged = dense(cms_partial(vals[:1700], w=w), w) + dense(
            cms_partial(vals[1700:], w=w), w)
        assert (whole == merged).all()
        perm = dense(cms_partial(rng.permutation(vals), w=w), w)
        assert (whole == perm).all()

        uniq, true = np.unique(vals, return_counts=True)
        nz = np.flatnonzero(whole)
        tbl = pa.table({
            "row": (nz // w).astype(np.int64),
            "cell": (nz % w).astype(np.int64),
            "cnt": whole.ravel()[nz],
        })
        est = cms_estimate(tbl, uniq, w=w)
        assert (est >= true).all()
        if w == 1024:
            assert (est == true).mean() > 0.95  # near-exact at low load


def test_cms_registers_distributed(ray_session):
    """The distributed build (grouped SUM merge) equals the single-batch
    sketch regardless of block count."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from triple_accel_ray.ops.sketch import cms_partial, cms_registers

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 500, size=8000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"u": vals})).repartition(7)
    got = cms_registers(ds, "u").to_pandas().sort_values(
        ["row", "cell"]).reset_index(drop=True)
    want = cms_partial(vals).to_pandas().sort_values(
        ["row", "cell"]).reset_index(drop=True)
    assert got.equals(want)


def test_bloom_no_false_negatives_and_merge():
    """Every inserted value hits; partials from split/permuted batches
    union to the same set-bit table; a tiny m forces false positives but
    never false negatives."""
    from triple_accel_ray.ops.sketch import bloom_contains, bloom_partial

    rng = np.random.default_rng(13)
    vals = rng.integers(0, 1 << 40, size=4000, dtype=np.int64)
    absent = vals + (1 << 41)

    for m in (256, 1 << 15):  # m=256 at n=4000 saturates -> collisions
        whole = set(bloom_partial(vals, m=m)["bit"].to_numpy().tolist())
        merged = (
            set(bloom_partial(vals[:1500], m=m)["bit"].to_numpy().tolist())
            | set(bloom_partial(vals[1500:], m=m)["bit"].to_numpy().tolist())
        )
        perm = set(bloom_partial(
            rng.permutation(vals), m=m)["bit"].to_numpy().tolist())
        assert whole == merged == perm
        reg = pa.table({"bit": sorted(whole)})
        assert bloom_contains(reg, vals, m=m).all()  # no false negatives
        fp = bloom_contains(reg, absent, m=m)
        if m == 1 << 15:
            # load factor ~ 16000/32768 set bits -> fp ~ (0.39)^4 ~ 2.3%
            assert fp.mean() < 0.05


def test_bloom_registers_distributed(ray_session):
    """Distributed build (grouped-distinct merge) equals the single-batch
    set-bit table regardless of block count."""
    import ray.data as rd

    from triple_accel_ray.ops.sketch import bloom_partial, bloom_registers

    rng = np.random.default_rng(17)
    vals = rng.integers(0, 1 << 30, size=6000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"u": vals})).repartition(7)
    got = sorted(bloom_registers(ds, "u").to_pandas()["bit"].tolist())
    want = bloom_partial(vals)["bit"].to_numpy().tolist()
    assert got == want


def test_grouped_quantiles_matches_numpy(ray_session):
    """Per-group exact quantiles equal a direct numpy computation of the
    shared integer rank rule, across uneven group sizes, ties and
    single-row groups."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from triple_accel_ray.ops.sketch import grouped_quantiles

    rng = np.random.default_rng(3)
    gs = ["a"] * 1000 + ["b"] * 37 + ["c"] * 1
    vs = np.concatenate([
        rng.integers(0, 50, 1000),  # heavy ties
        rng.integers(-100, 100, 37),
        np.array([42]),
    ]).astype(np.int64)
    ds = rd.from_arrow(pa.table({"g": gs, "v": vs})).repartition(5)
    got = {(r["g"], r["q_permille"]): r["v"]
           for r in grouped_quantiles(ds, "g", "v").take_all()}

    garr = np.array(gs)
    for g in ("a", "b", "c"):
        sub = np.sort(vs[garr == g])
        for qp in (500, 900, 990):
            rank = (qp * len(sub) + 999) // 1000
            assert got[(g, qp)] == sub[rank - 1], (g, qp)
    assert len(got) == 9


def test_grouped_ranks_matches_rank_minus_one(ray_session):
    """cnt_less equals pandas rank(method='min')-1 under heavy ties,
    across uneven groups; n_group is the group size; input rows pass
    through exactly once."""
    import pandas as pd
    import ray.data as rd

    from triple_accel_ray.ops.sketch import grouped_ranks

    rng = np.random.default_rng(4)
    df = pd.DataFrame({
        "rid": np.arange(4000, dtype=np.int64),
        "g": np.r_[np.repeat("a", 3000), np.repeat("b", 999), ["c"]],
        "v": np.r_[rng.integers(0, 40, 3000),       # heavy ties
                   rng.integers(-100, 100, 999),
                   [7]].astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    got = (grouped_ranks(ds.repartition(7), "g", "v")
           .to_pandas().sort_values("rid").reset_index(drop=True))
    want_rank = (df.groupby("g")["v"].rank(method="min") - 1).astype("int64")
    want_n = df.groupby("g")["v"].transform("size").astype("int64")
    assert len(got) == len(df)
    assert (got["cnt_less"].to_numpy() == want_rank.to_numpy()).all()
    assert (got["n_group"].to_numpy() == want_n.to_numpy()).all()


def test_hll_registers_by_groupwise_replay(ray_session):
    """Grouped HLL registers equal an independent per-group replay of the
    same mix64 register rule, under repartitioning (merge order free)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from triple_accel_ray.ops.sketch import (
        HLL_P, hll_partial_registers, hll_registers_by)

    rng = np.random.default_rng(9)
    n = 5000
    groups = np.array(["click", "view", "purchase"])[rng.integers(0, 3, n)]
    users = rng.integers(0, 800, n).astype(np.int64)
    t = pa.table({"event_type": pa.array(groups),
                  "user_id": pa.array(users, pa.int64())})

    got = {}
    out = hll_registers_by(
        rd.from_arrow(t).repartition(7), "event_type", "user_id").take_all()
    for r in out:
        got[(r["event_type"], r["bucket"])] = r["rho_max"]

    want = {}
    for g in np.unique(groups):
        reg = hll_partial_registers(users[groups == g])
        for b, rho in zip(reg["bucket"].to_pylist(),
                          reg["rho_max"].to_pylist()):
            want[(str(g), b)] = rho
    assert got == want


def test_bloom_prune_semi_differential(ray_session):
    """Bloom-pruned semi-join equals a numpy replay of the same salted
    bits, with a filter small enough (m=64) to force false positives —
    n_pass > n_true exercises the verify, and n_true always equals the
    exact semi-join count (no false negatives)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from triple_accel_ray.ops.sketch import BLOOM_SALTS, bloom_prune_semi
    from triple_accel_ray.pipeline.blocking import _mix64

    rng = np.random.default_rng(5)
    build_keys = rng.choice(10_000, size=40, replace=False).astype(np.int64)
    probe_keys = rng.choice(10_000, size=3_000, replace=True).astype(np.int64)
    m = 64

    def replay():
        dense = np.zeros(m, bool)
        for s in BLOOM_SALTS:
            dense[(_mix64(build_keys.view(np.uint64) ^ np.uint64(s))
                   % np.uint64(m)).astype(np.int64)] = True
        ok = np.ones(len(probe_keys), bool)
        for s in BLOOM_SALTS:
            ok &= dense[(_mix64(probe_keys.view(np.uint64) ^ np.uint64(s))
                         % np.uint64(m)).astype(np.int64)]
        true = np.isin(probe_keys, build_keys)
        assert not (true & ~ok).any()  # no false negatives
        return (len(probe_keys), int(ok.sum()), int(true.sum()),
                int(ok.sum()) - int(true.sum()))

    want = replay()
    assert want[3] > 0  # false positives actually forced

    b = rd.from_arrow(pa.table({"k": pa.array(build_keys)})).repartition(3)
    p = rd.from_arrow(pa.table({"k": pa.array(probe_keys)})).repartition(5)
    row = bloom_prune_semi(b, p, "k", "k", m=m, num_buckets=4).take_all()[0]
    got = (row["n_probe"], row["n_pass_bloom"], row["n_true_semi"],
           row["n_false_pos"])
    assert got == want


def test_log_histogram_quantiles_vs_bruteforce(ray_session):
    """Log-bucket quantile estimates equal a python replay: zeros get
    bucket -1, est_hi is the bucket ceiling and upper-bounds the true
    quantile within 2x, registers merge identically under
    repartitioning."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from triple_accel_ray.ops.sketch import log_histogram_quantiles

    rng = np.random.default_rng(31)
    x = np.r_[np.zeros(20, np.int64),
              rng.integers(1, 1_000_000, 500).astype(np.int64)]
    qs = (500, 900, 990)

    def replay():
        e = np.where(x >= 1,
                     np.frexp(np.maximum(x, 1).astype(np.float64))[1] - 1,
                     -1)
        ub, cnt = np.unique(e, return_counts=True)
        cum = np.cumsum(cnt)
        N = int(cum[-1])
        out = {}
        for q in qs:
            r = (q * (N - 1)) // 1000
            i = int(np.searchsorted(cum, r + 1))
            b = int(ub[i])
            out[q] = (b, (1 << (b + 1)) - 1 if b >= 0 else 0, r)
        return out

    want = replay()
    xs = np.sort(x)
    for q, (b, est, r) in want.items():
        true_q = int(xs[r])
        assert est >= true_q and (true_q == 0 or est < 2 * true_q + 2)

    for parts in (1, 7):
        ds = rd.from_arrow(pa.table({"v": pa.array(x)})).repartition(parts)
        out = log_histogram_quantiles(ds, "v", qs=qs).take_all()
        got = {r_["q_permille"]: (r_["bucket"], r_["est_hi"], r_["rank"])
               for r_ in out}
        assert got == want
