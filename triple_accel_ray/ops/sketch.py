"""Mergeable sketches + distributed exact quantiles.

The brief's custom-operator list names "a novel sketch" as a first-class
shape; this module provides the two sketch families a 100 TB curation
pipeline actually runs:

- **HyperLogLog distinct-count** (`hll_registers` / `hll_estimate`): each
  block contributes a PARTIAL register table (bucket -> max rho) and the
  merge is an elementwise max — the canonical mergeable-sketch shape, so
  the grouped shuffle carries at most ``2^p`` tiny integer rows per block
  regardless of input size. The register table itself is deterministic
  (salted splitmix64 over the value, the same `_mix64` the blocking layer
  uses), so the sketch — not just a rows-only estimate — is value-checked
  against a DuckDB oracle that replays the identical hash chain in
  HUGEINT arithmetic. The rho rule is the count-trailing-zeros variant:
  ``rho(w) = ctz(w) + 1 = bit_count(w XOR (w-1))`` for ``w > 0`` (same
  geometric distribution as leading-zeros, but expressible in pure
  integer SQL with no float log2).
- **Exact distinct count** (`distinct_count`): the exact twin — per-block
  unique combiner, then a key-grouped shuffle that carries one row per
  distinct value per block, then a metadata-only count. Pairs with the
  HLL query the way knn_ivf pairs with its full-probe twin.
- **Exact quantiles over an integer domain** (`exact_quantiles`): the
  shuffle-cheap exact form for bounded-domain columns (cents, lengths,
  token counts): per-block value-histogram combiner -> groupby sum
  (domain-bounded, NOT data-bounded: the histogram has one row per
  distinct value no matter how many rows stream through) -> one
  single-partition cumulative-selection pass. Rank rule is integer-exact:
  the q-quantile is the smallest v with cumcount(v) >= ceil(q * n),
  computed as ``(q_permille * n + 999) // 1000`` so the SQL oracle and
  the numpy path share bit-identical arithmetic.

Reference scope note: the reference engine (triple_accel) has no sketch
layer — these are engine-side additions mandated by the training-data-
pipeline brief, not ports.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import polars as pl
import pyarrow as pa

from ..pipeline.blocking import _mix64

# Fixed public salt so the sketch is reproducible across runs and the SQL
# oracle can replay it.
HLL_SALT = 0xA5A5F00D5EEDC0DE
HLL_P = 12  # 2^12 = 4096 registers -> ~1.6% standard error


def _rho_ctz(w: np.ndarray, width: int) -> np.ndarray:
    """rho(w) = ctz(w) + 1 for w > 0, else width + 1 (all `width` bits of
    w are zero). ctz via the isolated lowest set bit: ``w & (~w + 1)`` is
    an exact power of two <= 2^63, whose float64 log2 is exact."""
    rho = np.full(w.shape, width + 1, dtype=np.int64)
    nz = w != 0
    lb = w[nz] & (~w[nz] + np.uint64(1))
    rho[nz] = 1 + np.log2(lb.astype(np.float64)).astype(np.int64)
    return rho


def hll_partial_registers(
    values: np.ndarray, p: int = HLL_P, salt: int = HLL_SALT
) -> pa.Table:
    """Sparse (bucket, rho) register table for one batch of int64/uint64
    values. bucket = low p bits of mix64(v ^ salt); w = the remaining
    64-p bits."""
    m = 1 << p
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = v.astype(np.int64).view(np.uint64)
    h = _mix64(v ^ np.uint64(salt))
    bucket = (h & np.uint64(m - 1)).astype(np.int64)
    w = h >> np.uint64(p)
    rho = _rho_ctz(w, 64 - p)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, bucket, rho)
    nzb = np.flatnonzero(reg)
    return pa.table(
        {"bucket": pa.array(nzb, pa.int64()),
         "rho_max": pa.array(reg[nzb], pa.int64())}
    )


def hll_registers(ds, col: str, p: int = HLL_P, salt: int = HLL_SALT):
    """Distributed HLL register build: per-block sparse partials, merged
    by a bucket-grouped max (the shuffle carries <= 2^p rows per block)."""
    from ray.data.aggregate import Max

    def _partial(t: pa.Table) -> pa.Table:
        out = hll_partial_registers(t[col].to_numpy(), p=p, salt=salt)
        return out.rename_columns(["bucket", "rho"])

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho_max"))
    )


def hll_registers_by(ds, group_col: str, col: str, p: int = HLL_P,
                     salt: int = HLL_SALT):
    """Grouped HLL register build → (group, bucket, rho_max): one
    mergeable sketch per group value, the shape a planner keeps per
    partition/segment and merges on demand (register-wise max commutes,
    so any merge order and any partitioning give identical registers).
    Per-block partials collapse each block to <= groups × 2^p rows before
    the single (group, bucket) grouped-max shuffle — hot groups cost one
    partial row per (block, bucket), never a per-row shuffle."""
    from ray.data.aggregate import Max

    m = 1 << p

    def _partial(t: pa.Table) -> pa.Table:
        v = np.asarray(t[col].to_numpy(zero_copy_only=False))
        if v.dtype != np.uint64:
            v = v.astype(np.int64).view(np.uint64)
        h = _mix64(v ^ np.uint64(salt))
        bucket = (h & np.uint64(m - 1)).astype(np.int64)
        rho = _rho_ctz(h >> np.uint64(p), 64 - p)
        df = pl.DataFrame({
            "g": np.asarray(t[group_col].to_numpy(zero_copy_only=False)),
            "bucket": bucket, "rho": rho,
        })
        out = df.group_by(["g", "bucket"]).agg(rho=pl.col("rho").max())
        return out.to_arrow().cast(pa.schema(
            [("g", pa.string()), ("bucket", pa.int64()),
             ("rho", pa.int64())]))

    reg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["g", "bucket"])
        .aggregate(Max("rho", alias_name="rho_max"))
    )
    return reg.map_batches(
        lambda t: pa.table({group_col: t["g"], "bucket": t["bucket"],
                            "rho_max": t["rho_max"].cast(pa.int64())}),
        batch_format="pyarrow")


def hll_estimate(registers: pa.Table, p: int = HLL_P) -> float:
    """Standard HLL estimator over a (bucket, rho_max) register table.

    The harmonic sum is computed as the INTEGER ``S = sum 2^(64 - rho)``
    (absent buckets contribute rho = 0), so the float division happens
    once on identical integers — deterministic across runs/partitionings.
    Small-range correction: linear counting when est <= 2.5m and zero
    registers exist."""
    m = 1 << p
    rho = np.zeros(m, dtype=np.int64)
    b = registers["bucket"].to_numpy()
    rho[b] = registers["rho_max"].to_numpy()
    s_int = sum(1 << (64 - int(r)) for r in rho)  # <= m * 2^64, exact
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m * float(2**64) / float(s_int)
    zeros = int(np.count_nonzero(rho == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * float(np.log(m / zeros))
    return float(est)


def distinct_count(ds, col: str) -> pd.DataFrame:
    """Exact distributed COUNT(DISTINCT col): per-block unique combiner,
    grouped shuffle of distinct values only, metadata-only final count."""
    import pyarrow.compute as pc

    def _uniq(t: pa.Table) -> pa.Table:
        return pa.table({col: pc.unique(t[col])})

    grouped = (
        ds.map_batches(_uniq, batch_format="pyarrow").groupby(col).count()
    )
    return pd.DataFrame({"n_distinct": [int(grouped.count())]})


def exact_quantiles(ds, col: str, q_permille=(500, 900, 990)):
    """Distributed exact quantiles over an integer column via a
    domain-bounded value histogram. Returns one row per requested
    q_permille: (q_permille, <col>) with <col> = smallest value whose
    cumulative count reaches ceil(q * n) (integer rank arithmetic).

    Scale shape: the only shuffle is the histogram groupby, whose key
    cardinality is the value DOMAIN (e.g. distinct cent amounts), not the
    row count; the cumulative selection runs once on that small table in
    a single repartitioned block — never on the driver."""
    from ray.data.aggregate import Sum

    qs = sorted(int(x) for x in q_permille)

    def _hist(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([col]))
        out = df.group_by(col).agg(n=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(pa.schema([(col, pa.int64()), ("n", pa.int64())]))

    hist = (
        ds.map_batches(_hist, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Sum("n", alias_name="n"))
    )

    def _select(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy()
        n = t["n"].to_numpy()
        order = np.argsort(v, kind="stable")
        v, n = v[order], n[order]
        cum = np.cumsum(n)
        total = int(cum[-1])
        ranks = np.array([(qp * total + 999) // 1000 for qp in qs], np.int64)
        idx = np.searchsorted(cum, ranks, side="left")
        return pa.table(
            {"q_permille": pa.array(qs, pa.int64()),
             col: pa.array(v[idx], pa.int64())}
        )

    return hist.repartition(1).map_batches(
        _select, batch_format="pyarrow", batch_size=None
    )


# --------------------------------------------------------- Count-Min Sketch
# The frequency twin of the HLL: mergeable by elementwise SUM, point
# estimates are guaranteed overestimates (est >= true count). Same
# replayability discipline — fixed public salts + the shared splitmix64
# finalizer, so the DuckDB oracle reproduces the full register table in
# HUGEINT integer SQL.
CMS_D, CMS_W = 4, 1024
CMS_SALTS = (
    0x9E3779B97F4A7C15,
    0xC2B2AE3D27D4EB4F,
    0x165667B19E3779F9,
    0x27D4EB2F165667C5,
)


def cms_partial(values: np.ndarray, w: int = CMS_W,
                salts=CMS_SALTS) -> pa.Table:
    """Sparse (row, cell, cnt) partial CMS for one batch: for each sketch
    row r, cell = mix64(v ^ salt_r) % w, cnt = occurrences (NOT distinct —
    CMS counts frequency). One bincount per row, no Python per value."""
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = v.astype(np.int64).view(np.uint64)
    rows, cells, cnts = [], [], []
    for r, s in enumerate(salts):
        h = _mix64(v ^ np.uint64(s))
        cell = (h % np.uint64(w)).astype(np.int64)
        reg = np.bincount(cell, minlength=w)
        nz = np.flatnonzero(reg)
        rows.append(np.full(nz.size, r, dtype=np.int64))
        cells.append(nz.astype(np.int64))
        cnts.append(reg[nz].astype(np.int64))
    return pa.table({
        "row": np.concatenate(rows),
        "cell": np.concatenate(cells),
        "cnt": np.concatenate(cnts),
    })


def cms_registers(ds, col: str, w: int = CMS_W, salts=CMS_SALTS):
    """Distributed CMS build: per-block sparse partials merged by an
    elementwise SUM. The grouped shuffle carries <= d*w integer rows per
    block regardless of input size; the key is packed (row*w + cell) so
    the merge is a single-key groupby, unpacked after."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        p = cms_partial(t[col].to_numpy(), w=w, salts=salts)
        rc = p["row"].to_numpy() * w + p["cell"].to_numpy()
        return pa.table({"rc": rc, "cnt": p["cnt"]})

    def _unpack(t: pa.Table) -> pa.Table:
        rc = t["rc"].to_numpy()
        return pa.table({
            "row": (rc // w).astype(np.int64),
            "cell": (rc % w).astype(np.int64),
            "cnt": t["cnt_sum"].to_numpy().astype(np.int64),
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("rc")
        .aggregate(Sum("cnt", alias_name="cnt_sum"))
        .map_batches(_unpack, batch_format="pyarrow")
    )


def cms_estimate(registers: pa.Table, values: np.ndarray, w: int = CMS_W,
                 salts=CMS_SALTS) -> np.ndarray:
    """Point-frequency estimates: min over sketch rows of the value's
    cell count. Registers are tiny (<= d*w rows — broadcastable at any
    scale); the min over d rows is vectorized over the query values."""
    d = len(salts)
    reg = np.zeros((d, w), dtype=np.int64)
    reg[registers["row"].to_numpy(), registers["cell"].to_numpy()] = (
        registers["cnt"].to_numpy()
    )
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = v.astype(np.int64).view(np.uint64)
    est = np.full(v.shape, np.iinfo(np.int64).max, dtype=np.int64)
    for r, s in enumerate(salts):
        cell = (_mix64(v ^ np.uint64(s)) % np.uint64(w)).astype(np.int64)
        est = np.minimum(est, reg[r, cell])
    return est


def grouped_quantiles(ds, group_col: str, col: str,
                      q_permille=(500, 900, 990), num_buckets: int = 8):
    """Exact per-group quantiles over an integer column: one row per
    (group, q_permille) with the same integer rank rule as
    ``exact_quantiles`` ((q*n + 999) // 1000, smallest value whose
    cumulative count reaches the rank).

    Scale shape: per-block partial histograms keyed by (group, value) —
    domain-bounded per block, never row-bounded — then ONE bucketed
    shuffle on hash(group) so each reduce task owns whole groups and
    merges partials + runs the cumulative selection locally. The
    per-group loop inside a bucket is over the group VOCABULARY (e.g.
    event types), not the data."""
    from ..pipeline.shuffle import bucket_partition

    qs = sorted(int(x) for x in q_permille)

    def _hist(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([group_col, col]))
        out = (
            df.group_by([group_col, col])
            .agg(n=pl.len().cast(pl.Int64))
            .with_columns(
                (pl.col(group_col).hash(seed=0)
                 % np.uint64(num_buckets)).cast(pl.Int32).alias("bucket"))
        )
        return out.to_arrow().cast(pa.schema([
            (group_col, pa.string()), (col, pa.int64()),
            ("n", pa.int64()), ("bucket", pa.int32())]))

    def _select(t: pa.Table) -> pa.Table:
        df = (
            pl.from_arrow(t.select([group_col, col, "n"]))
            .group_by([group_col, col])
            .agg(n=pl.col("n").sum())
            .sort([group_col, col])
        )
        groups, values, counts = (
            df[group_col].to_numpy(), df[col].to_numpy(),
            df["n"].to_numpy())
        out_g, out_q, out_v = [], [], []
        # boundaries of each group's run in the (group, value) sort
        starts = np.flatnonzero(
            np.r_[True, groups[1:] != groups[:-1]]) if len(groups) else []
        for i, s in enumerate(starts):
            e = starts[i + 1] if i + 1 < len(starts) else len(groups)
            cum = np.cumsum(counts[s:e])
            total = int(cum[-1])
            ranks = np.array(
                [(qp * total + 999) // 1000 for qp in qs], np.int64)
            idx = np.searchsorted(cum, ranks, side="left")
            out_g.extend([groups[s]] * len(qs))
            out_q.extend(qs)
            out_v.extend(values[s:e][idx].tolist())
        return pa.table({
            group_col: pa.array(out_g, pa.string()),
            "q_permille": pa.array(out_q, pa.int64()),
            col: pa.array(out_v, pa.int64()),
        })

    return bucket_partition(
        ds.map_batches(_hist, batch_format="pyarrow"),
        _select, num_buckets,
    )


# -------------------------------------------------------------- Bloom filter
# The membership twin: k salted positions per value, registers merged by
# OR (a grouped MAX over set bits). A query value is "possibly present"
# iff all k of its bits are set — no false negatives ever; false-positive
# rate ~ (set_frac)^k. Same replayability discipline as HLL/CMS.
BLOOM_M, BLOOM_K = 1 << 15, 4  # 32768 bits, 4 probes
BLOOM_SALTS = CMS_SALTS  # reuse the public salt set (k = 4)


def bloom_partial(values: np.ndarray, m: int = BLOOM_M,
                  salts=BLOOM_SALTS) -> pa.Table:
    """Sparse set-bit table for one batch: bit = mix64(v ^ salt_r) % m
    for each of the k salts. Distinctness is free (set semantics)."""
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = v.astype(np.int64).view(np.uint64)
    bits = np.concatenate([
        (_mix64(v ^ np.uint64(s)) % np.uint64(m)).astype(np.int64)
        for s in salts
    ])
    return pa.table({"bit": np.unique(bits)})


def bloom_registers(ds, col: str, m: int = BLOOM_M, salts=BLOOM_SALTS):
    """Distributed Bloom build: per-block sparse set-bit partials merged
    by a grouped distinct (OR). The shuffle carries <= m one-column
    integer rows per block regardless of input size."""

    def _partial(t: pa.Table) -> pa.Table:
        return bloom_partial(t[col].to_numpy(), m=m, salts=salts)

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bit")
        .count()
        .select_columns(["bit"])
    )


def bloom_contains(registers: pa.Table, values: np.ndarray,
                   m: int = BLOOM_M, salts=BLOOM_SALTS) -> np.ndarray:
    """Membership test: True iff all k bits are set. Registers are tiny
    (<= m rows) — broadcastable at any scale."""
    dense = np.zeros(m, dtype=bool)
    dense[registers["bit"].to_numpy()] = True
    v = np.asarray(values)
    if v.dtype != np.uint64:
        v = v.astype(np.int64).view(np.uint64)
    ok = np.ones(v.shape, dtype=bool)
    for s in salts:
        ok &= dense[(_mix64(v ^ np.uint64(s)) % np.uint64(m)).astype(np.int64)]
    return ok


def bloom_prune_semi(build, probe, build_col: str, probe_col: str,
                     m: int = BLOOM_M, salts=BLOOM_SALTS,
                     num_buckets: int = 16):
    """Bloom-pruned semi-join — the broadcast-filter planner primitive:
    build a Bloom filter over the (small) build side's keys, broadcast
    the dense bits (m/8 bytes), stream the (large) probe side through a
    membership filter BEFORE anything shuffles, then verify the
    survivors exactly. → one row:

      n_probe      probe rows scanned
      n_pass_bloom probe rows surviving the broadcast Bloom filter
                   (deterministic given m + the public salts)
      n_true_semi  probe rows whose key truly exists in build (the exact
                   semi-join count; Bloom has no false negatives, so the
                   verify only ever REMOVES false positives)
      n_false_pos  n_pass_bloom − n_true_semi (the cost of the sketch)

    At 100 TB this is the shape that turns a fact-table shuffle join
    into a scan: the probe side never moves — only per-block DISTINCT
    (key, count) partials of the *surviving* keys ride one key-bucket
    shuffle for the exact verify, and the build side ships register
    rows (<= m) plus distinct-key markers. All counts integer; the SQL
    twin replays the same bits in the mix64 HUGEINT chain."""
    import ray
    import ray.data as rd

    regs = pa.concat_tables(
        ray.get(bloom_registers(build, build_col, m=m, salts=salts)
                .to_arrow_refs()))
    dense = np.zeros(m, dtype=bool)
    if regs.num_rows:
        dense[regs["bit"].to_numpy()] = True
    dense_ref = ray.put(dense)

    part_schema = pa.schema([
        ("key", pa.int64()), ("n", pa.int64()), ("side", pa.int8()),
        ("bucket", pa.int32()),
    ])

    class _ProbePartial:
        def __init__(self, ref):
            self._ref, self._dense = ref, None

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return part_schema.empty_table()
            if self._dense is None:
                self._dense = ray.get(self._ref)
            keys = np.asarray(t[probe_col].to_numpy(), np.int64)
            v = keys.view(np.uint64)
            ok = np.ones(len(keys), dtype=bool)
            for s in salts:
                ok &= self._dense[
                    (_mix64(v ^ np.uint64(s)) % np.uint64(m)).astype(np.int64)
                ]
            uk, n = np.unique(keys[ok], return_counts=True)
            bkt = (_mix64(uk.view(np.uint64)) % np.uint64(num_buckets)
                   ).astype(np.int32)
            return pa.table({
                "key": pa.array(np.r_[uk, 0], pa.int64()),
                "n": pa.array(np.r_[n.astype(np.int64), len(keys)]),
                "side": pa.array(
                    np.r_[np.zeros(len(uk), np.int8), np.int8(2)],
                    pa.int8()),
                "bucket": pa.array(np.r_[bkt, np.int32(0)], pa.int32()),
            }).cast(part_schema)

    def _build_marker(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return part_schema.empty_table()
        uk = np.unique(np.asarray(t[build_col].to_numpy(), np.int64))
        bkt = (_mix64(uk.view(np.uint64)) % np.uint64(num_buckets)
               ).astype(np.int32)
        return pa.table({
            "key": pa.array(uk, pa.int64()),
            "n": pa.array(np.zeros(len(uk), np.int64)),
            "side": pa.array(np.ones(len(uk), np.int8), pa.int8()),
            "bucket": pa.array(bkt, pa.int32()),
        }).cast(part_schema)

    out_schema = pa.schema([
        ("n_probe", pa.int64()), ("n_pass_bloom", pa.int64()),
        ("n_true_semi", pa.int64()), ("n_false_pos", pa.int64()),
    ])

    def _combine(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        n_probe = int(df.filter(pl.col("side") == 2)["n"].sum() or 0)
        passed = (df.filter(pl.col("side") == 0)
                  .group_by("key").agg(n=pl.col("n").sum()))
        n_pass = int(passed["n"].sum() or 0)
        present = df.filter(pl.col("side") == 1).select("key").unique()
        n_true = int(passed.join(present, on="key", how="semi")["n"].sum()
                     or 0)
        return pa.table({
            "n_probe": pa.array([n_probe], pa.int64()),
            "n_pass_bloom": pa.array([n_pass], pa.int64()),
            "n_true_semi": pa.array([n_true], pa.int64()),
            "n_false_pos": pa.array([n_pass - n_true], pa.int64()),
        })

    from ..pipeline.shuffle import bucket_partition

    parts = bucket_partition(
        probe.map_batches(_ProbePartial(dense_ref), batch_format="pyarrow")
        .union(build.map_batches(_build_marker, batch_format="pyarrow")),
        _combine, num_buckets,
    )

    def _final(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return pa.table({
            c: pa.array([int(df[c].sum() or 0)], pa.int64())
            for c in out_schema.names
        }).cast(out_schema)

    return parts.repartition(1).map_batches(
        _final, batch_format="pyarrow", batch_size=None)


# ------------------------------------------------------- histogram ranks
def grouped_ranks(ds, group_col: str, col: str):
    """→ one output row per input row: (row key columns passed through,
    ``cnt_less``, ``n_group``) where cnt_less = number of rows in the
    same group with a STRICTLY smaller value (== SQL ``rank() - 1``,
    deterministic under ties) and n_group = the group's row count —
    i.e. a global per-group rank WITHOUT shuffling a single data row.

    Scale shape: the only exchange is the domain-bounded value histogram
    (same combiner as ``grouped_quantiles`` — one row per (group, value)
    per block); the merged histogram (groups x value domain, e.g. event
    types x cent amounts) broadcasts into a stateless second read of the
    input, where rank assignment is one searchsorted per batch. The
    input streams twice instead of shuffling once — the right trade when
    rows are wide or the cluster's cross-node bandwidth is the scarce
    resource; document the value-domain bound when reusing."""
    from ray.data.aggregate import Sum

    def _hist(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([group_col, col]))
        out = df.group_by([group_col, col]).agg(n=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(pa.schema([
            (group_col, pa.string()), (col, pa.int64()), ("n", pa.int64())]))

    hist = (
        ds.map_batches(_hist, batch_format="pyarrow")
        .groupby([group_col, col])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # groups x value domain — bounded, broadcastable
    )
    hist = hist.sort_values([group_col, col]).reset_index(drop=True)
    groups = hist[group_col].to_numpy()
    values = hist[col].to_numpy().astype(np.int64)
    counts = hist["n"].to_numpy().astype(np.int64)
    # per-group cumulative "rows strictly below this value"
    starts_idx = np.flatnonzero(
        np.r_[True, groups[1:] != groups[:-1]]) if len(groups) else []
    cum_below = np.zeros(len(counts), dtype=np.int64)
    totals: dict = {}
    g_start: dict = {}
    for i, s in enumerate(starts_idx):
        e = starts_idx[i + 1] if i + 1 < len(starts_idx) else len(groups)
        cum_below[s:e] = np.cumsum(counts[s:e]) - counts[s:e]
        totals[groups[s]] = int(counts[s:e].sum())
        g_start[groups[s]] = (int(s), int(e))

    def _rank(t: pa.Table) -> pa.Table:
        g = t[group_col].to_numpy(zero_copy_only=False)
        v = t[col].to_numpy().astype(np.int64)
        cnt_less = np.zeros(len(v), dtype=np.int64)
        n_group = np.zeros(len(v), dtype=np.int64)
        # one searchsorted per group PRESENT in the batch (vocabulary-
        # sized loop, not row-sized)
        for gv in np.unique(g):
            s, e = g_start[gv]
            m = g == gv
            idx = np.searchsorted(values[s:e], v[m], side="left")
            cnt_less[m] = cum_below[s:e][idx]
            n_group[m] = totals[gv]
        cols = {name: t[name] for name in t.column_names}
        cols["cnt_less"] = pa.array(cnt_less, pa.int64())
        cols["n_group"] = pa.array(n_group, pa.int64())
        return pa.table(cols)

    return ds.map_batches(_rank, batch_format="pyarrow")


def mad_outliers(ds, id_col: str, col: str, k_times_10: int = 30):
    """Robust outlier detection → (id, val, abs_dev): rows where
    10*|x - median| > k_times_10 * MAD, with median and MAD (median
    absolute deviation) both EXACT via the domain-bounded histogram
    quantile (integer rank rule (q*n+999)//1000 shared bit-for-bit with
    the SQL twin). The threshold multiplier is in tenths so the whole
    predicate stays integer — no float sigma anywhere.

    Scale shape: two histogram passes (each a value-DOMAIN-sized
    shuffle, never row-sized) + two one-row collects (the broadcast
    threshold, the same small-aggregate consumption as the watermark
    op) + one stateless filter pass. The input streams three times;
    nothing row-sized ever shuffles."""
    import ray

    med = exact_quantiles(ds, col, (500,)).take_all()[0][col]

    def _dev(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy()
        return pa.table({col: pa.array(np.abs(x - med).astype(np.int64))})

    mad = exact_quantiles(
        ds.map_batches(_dev, batch_format="pyarrow"), col, (500,)
    ).take_all()[0][col]

    kt = int(k_times_10)

    def _filter(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy()
        d = np.abs(x - med).astype(np.int64)
        m = 10 * d > kt * mad
        return pa.table({
            id_col: t[id_col].filter(pa.array(m)),
            "val": pa.array(x[m].astype(np.int64)),
            "abs_dev": pa.array(d[m]),
        })

    return ds.map_batches(_filter, batch_format="pyarrow")


def cms_join_size(left, right, lcol: str, rcol: str,
                  w: int = CMS_W, salts=CMS_SALTS):
    """→ one row (n_exact, n_est): equi-join cardinality — the EXACT
    |left JOIN right| on the key, next to the Count-Min inner-product
    ESTIMATE (min over sketch rows of sum_cell cntA*cntB — the classic
    AMS/CMS join-size estimator a distributed planner consults before
    choosing broadcast vs shuffle). est >= exact by construction
    (collisions only add mass), and both numbers are deterministic, so
    the SQL twin replays BOTH — the sketch in the same HUGEINT mix64
    chain as cms_user_registers.

    Scale shape: the sketches are the usual register-sized merges (<=
    d*w rows per block); the estimate combines two register TABLES
    (tiny, partitioning-independent). The exact side reduces each input
    to per-block DISTINCT key counts (fk_orphans' combiner), one
    key-vocabulary grouped merge, then a scalar aggregate of per-key
    products. Nothing row-sized ever shuffles. int64 bound: per-cell
    counts must stay under ~2^31 for the product — at larger scales the
    register dtype widens, not the shape."""
    import pyarrow.compute as pcx
    import ray.data as rd
    from ray.data.aggregate import Sum

    def _tag_reg(side: int):
        def _f(t: pa.Table) -> pa.Table:
            rc = (t["row"].to_numpy() * w + t["cell"].to_numpy()).astype(
                np.int64)
            cnt = t["cnt"].to_numpy()
            z = np.zeros_like(cnt)
            return pa.table({
                "rc": pa.array(rc),
                "cnt_a": pa.array(cnt if side == 0 else z),
                "cnt_b": pa.array(z if side == 0 else cnt),
            })
        return _f

    merged = (
        cms_registers(left, lcol, w=w, salts=salts)
        .map_batches(_tag_reg(0), batch_format="pyarrow")
        .union(cms_registers(right, rcol, w=w, salts=salts)
               .map_batches(_tag_reg(1), batch_format="pyarrow"))
        .groupby("rc")
        .aggregate(Sum("cnt_a", alias_name="a"),
                   Sum("cnt_b", alias_name="b"))
    )

    def _row_dot(t: pa.Table) -> pa.Table:
        rc = t["rc"].to_numpy()
        prod = (t["a"].to_numpy().astype(np.int64)
                * t["b"].to_numpy().astype(np.int64))
        return pa.table({"row": pa.array((rc // w).astype(np.int64)),
                         "dot": pa.array(prod)})

    dots = (
        merged.map_batches(_row_dot, batch_format="pyarrow")
        .groupby("row")
        .aggregate(Sum("dot", alias_name="dot_sum"))
    )
    n_est = int(min(r["dot_sum"] for r in dots.take_all()))

    def _key_part(col: str, side: int):
        def _f(t: pa.Table) -> pa.Table:
            df = (pl.from_arrow(t.select([col]))
                  .group_by(col).agg(n=pl.len().cast(pl.Int64))
                  .rename({col: "key"}))
            z = pl.lit(0, dtype=pl.Int64)
            df = df.with_columns(
                n_a=pl.col("n") if side == 0 else z,
                n_b=z if side == 0 else pl.col("n")).drop("n")
            return df.to_arrow().cast(pa.schema([
                ("key", pa.int64()), ("n_a", pa.int64()),
                ("n_b", pa.int64())]))
        return _f

    keyed = (
        left.map_batches(_key_part(lcol, 0), batch_format="pyarrow")
        .union(right.map_batches(_key_part(rcol, 1),
                                 batch_format="pyarrow"))
        .groupby("key")
        .aggregate(Sum("n_a", alias_name="na"),
                   Sum("n_b", alias_name="nb"))
    )
    res = keyed.map_batches(
        lambda t: pa.table({"p": pcx.multiply(
            t["na"].cast(pa.int64()), t["nb"].cast(pa.int64()))}),
        batch_format="pyarrow").aggregate(Sum("p", alias_name="n_exact"))
    n_exact = int(res["n_exact"] or 0)

    return rd.from_arrow(pa.table({
        "n_exact": pa.array([n_exact], pa.int64()),
        "n_est": pa.array([n_est], pa.int64()),
    }))


def equi_depth_histogram(ds, col: str, n_bins: int = 10):
    """→ (bin, n_rows): equi-depth binning — boundaries are the EXACT
    (i/n_bins)-quantiles (the shared integer rank rule), bin(x) =
    number of boundaries strictly less than x (0-based; duplicate
    boundaries from heavy values collapse naturally, leaving their bins
    empty — the honest behavior for skewed data, pinned by a test).
    The rule is pure integer arithmetic over the boundary list, so the
    SQL twin (a 9-row CASE-sum join) is value-exact.

    Scale shape: one domain-sized histogram shuffle for the boundaries
    (exact_quantiles), a <= n_bins-1-row collect + broadcast, a
    stateless searchsorted binning pass, and a bin-vocabulary grouped
    sum."""
    from ray.data.aggregate import Sum

    nb = int(n_bins)
    qs = tuple(i * 1000 // nb for i in range(1, nb))
    brows = exact_quantiles(ds, col, qs).take_all()
    bounds = np.sort(np.array([r[col] for r in brows], dtype=np.int64))

    def _bin(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy()
        b = np.searchsorted(bounds, x, side="left").astype(np.int64)
        out = (pl.DataFrame({"bin": b})
               .group_by("bin").agg(n=pl.len().cast(pl.Int64)))
        return out.to_arrow().cast(pa.schema([
            ("bin", pa.int64()), ("n", pa.int64())]))

    return (
        ds.map_batches(_bin, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n_rows"))
        .map_batches(
            lambda t: pa.table({
                "bin": t["bin"],
                "n_rows": t["n_rows"].cast(pa.int64())}),
            batch_format="pyarrow")
    )


def log_histogram_quantiles(ds, col: str, qs=(500, 900, 990)):
    """Approximate quantiles from a LOG-BUCKET histogram — the mergeable
    quantile sketch for UNBOUNDED non-negative integer domains (the
    exact-quantile ops here need a value-bounded histogram; this one
    needs at most 64 registers no matter the domain). Bucket(x) =
    floor(log2(x)) for x >= 1 (−1 for zero); registers (bucket, n)
    merge by sum, so any partitioning gives identical registers. For a
    per-mille quantile q the estimate is the CEILING of the bucket that
    contains rank floor(q·(N−1)/1000): est_hi = 2^(bucket+1) − 1 — a
    deterministic, SQL-replayable upper bound with relative error < 2x.

    → (q_permille, bucket, est_hi, rank) one row per requested q.
    Exactness contract: values must stay below 2^53 (the float64-exact
    integer range used for the vectorized exponent)."""
    from ray.data.aggregate import Sum

    def _partial(t: pa.Table) -> pa.Table:
        x = np.asarray(t[col].to_numpy(), np.int64)
        if (x < 0).any():
            raise ValueError("log_histogram_quantiles needs x >= 0")
        if (x >= 1 << 53).any():
            raise ValueError("values >= 2^53 break exact exponents")
        e = np.full(len(x), -1, np.int64)
        pos = x >= 1
        if pos.any():
            # frexp is exact for ints < 2^53: x = m * 2^ex, m in [0.5, 1)
            e[pos] = np.frexp(x[pos].astype(np.float64))[1] - 1
        ub, cnt = np.unique(e, return_counts=True)
        return pa.table({"bucket": pa.array(ub, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    regs = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("bucket").aggregate(Sum("n", alias_name="n"))
    )

    out_schema = pa.schema([
        ("q_permille", pa.int64()), ("bucket", pa.int64()),
        ("est_hi", pa.int64()), ("rank", pa.int64()),
    ])

    def _quant(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        df = pl.from_arrow(t).sort("bucket")
        b = df["bucket"].to_numpy()
        n = df["n"].to_numpy()
        cum = np.cumsum(n)
        N = int(cum[-1])
        rows = []
        for q in qs:
            r = (int(q) * (N - 1)) // 1000
            i = int(np.searchsorted(cum, r + 1))
            bb = int(b[i])
            est = (1 << (bb + 1)) - 1 if bb >= 0 else 0
            rows.append((int(q), bb, est, r))
        cols = list(zip(*rows))
        return pa.table({
            "q_permille": pa.array(cols[0], pa.int64()),
            "bucket": pa.array(cols[1], pa.int64()),
            "est_hi": pa.array(cols[2], pa.int64()),
            "rank": pa.array(cols[3], pa.int64()),
        })

    # registers are <= 64 rows: one merge task
    return regs.repartition(1).map_batches(
        _quant, batch_format="pyarrow", batch_size=None)
