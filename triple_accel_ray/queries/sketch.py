"""HLL/CMS/Bloom/quantile sketch queries.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    # ---- sketches + exact quantiles (ops/sketch.py) ---------------------
    def hll_user_registers(sf_dir):
        """HyperLogLog register table over events.user_id (p=12): the
        sketch itself is value-checked — per-block sparse partials merged
        by a bucket-grouped max; the oracle replays the identical salted
        splitmix64 + ctz chain in integer SQL."""
        from ..ops.sketch import hll_registers

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        return hll_registers(ev, "user_id")

    q["hll_user_registers"] = hll_user_registers

    def hll_users_by_type_registers(sf_dir):
        """Grouped HLL (ops/sketch.hll_registers_by): one mergeable
        distinct-users sketch per event_type — (event_type, bucket,
        rho_max) registers, bit-exact vs the SQL replay of the same
        mix64 chain. Per-block (group, bucket) max partials bound the
        shuffle at groups x 2^p rows per block."""
        from ..ops.sketch import hll_registers_by

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["event_type", "user_id"])
        return hll_registers_by(ev, "event_type", "user_id")

    q["hll_users_by_type_registers"] = hll_users_by_type_registers

    def distinct_users_exact(sf_dir):
        """Exact COUNT(DISTINCT user_id): per-block unique combiner ->
        grouped shuffle of distinct values only -> metadata-only count.
        The exact twin of hll_user_registers."""
        from ..ops.sketch import distinct_count

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        return distinct_count(ev, "user_id")

    q["distinct_users_exact"] = distinct_users_exact

    def quantiles_value_cents(sf_dir):
        """Distributed exact p50/p90/p99 over events.value in cents via a
        domain-bounded value histogram (ops/sketch.py); integer rank rule
        ceil(q*n) shared bit-for-bit with the SQL oracle."""
        from ..ops.sketch import exact_quantiles

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["value"])

        def _cents(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy()
            cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
            return pa.table({"value_cents": pa.array(cents, pa.int64())})

        return exact_quantiles(
            ev.map_batches(_cents, batch_format="pyarrow"),
            "value_cents", (500, 900, 990))

    q["quantiles_value_cents"] = quantiles_value_cents

    def value_log_quantiles(sf_dir):
        """Log-bucket quantile sketch (ops/sketch.
        log_histogram_quantiles): approximate p50/p90/p99 of event value
        cents from a <= 64-register log2 histogram — the mergeable
        quantile sketch for UNBOUNDED domains (the exact-quantile ops
        need a value-bounded histogram). Registers and the bucket-ceiling
        estimates are deterministic integers, replayed in SQL via
        length(bin(x)))."""
        from ..ops.sketch import log_histogram_quantiles

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["value"])
        cents = ev.map_batches(
            lambda t: pa.table({"cents": pa.array(np.floor(
                t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64))}),
            batch_format="pyarrow")
        return log_histogram_quantiles(cents, "cents", qs=(500, 900, 990))

    q["value_log_quantiles"] = value_log_quantiles

    def cms_user_registers(sf_dir):
        """Count-Min Sketch register table over events.user_id (d=4,
        w=1024): per-block sparse partials merged by an elementwise SUM —
        the frequency twin of the HLL. The shuffle carries <= d*w integer
        rows per block; the oracle replays the full salted splitmix64
        chain in HUGEINT SQL, so the SKETCH is value-checked."""
        from ..ops.sketch import cms_registers

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        return cms_registers(ev, "user_id")

    q["cms_user_registers"] = cms_user_registers

    def cms_user_estimates(sf_dir):
        """Per-user CMS point estimates NEXT TO exact counts (est >= exact
        always; equality whenever the user's 4 cells are collision-free).
        Registers are <= d*w rows — broadcast into the estimate stage;
        exact counts come from the standard grouped count."""
        import numpy as np

        from ..ops.sketch import cms_estimate, cms_registers

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        reg = pa.Table.from_pandas(
            cms_registers(ev, "user_id").to_pandas())

        def _est(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy()
            return pa.table({
                "user_id": uid,
                "n_exact": t["count()"].to_numpy().astype(np.int64),
                "n_est": cms_estimate(reg, uid),
            })

        return ev.groupby("user_id").count().map_batches(
            _est, batch_format="pyarrow")

    q["cms_user_estimates"] = cms_user_estimates

    def quantiles_by_event_type(sf_dir):
        """Exact per-group quantiles (ops/sketch.grouped_quantiles):
        p50/p90/p99 of value-cents per event_type. Partial (group, value)
        histograms per block, one hash(group)-bucketed shuffle, per-group
        cumulative selection inside the bucket task."""
        from ..ops.sketch import grouped_quantiles

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["event_type", "value"])

        def _cents(t: pa.Table) -> pa.Table:
            v = t["value"].to_numpy()
            return pa.table({
                "event_type": t["event_type"],
                "value_cents": np.floor(v * 100.0 + 0.5).astype(np.int64),
            })

        return grouped_quantiles(
            ev.map_batches(_cents, batch_format="pyarrow"),
            "event_type", "value_cents", (500, 900, 990))

    q["quantiles_by_event_type"] = quantiles_by_event_type

    def bloom_user_bits(sf_dir):
        """Bloom-filter set-bit table over events.user_id (m=2^15, k=4):
        per-block sparse partials merged by a grouped distinct (OR) — the
        membership twin of the HLL/CMS sketches, same salted-splitmix64
        replayability."""
        from ..ops.sketch import bloom_registers

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        return bloom_registers(ev, "user_id")

    q["bloom_user_bits"] = bloom_user_bits

    def bloom_membership(sf_dir):
        """Membership probes against the user Bloom filter: every present
        user_id plus a planted absent set (user_id + 10^9). `hit` is what
        the sketch answers (deterministic — the oracle replays the same
        bits, so even false positives match exactly); `present` is ground
        truth. No false negatives by construction."""
        from ..ops.sketch import bloom_contains, bloom_registers

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        reg = pa.Table.from_pandas(bloom_registers(ev, "user_id").to_pandas())

        def _probe(t: pa.Table) -> pa.Table:
            uid = t["user_id"].to_numpy().astype(np.int64)
            probes = np.concatenate([uid, uid + 1_000_000_000])
            present = np.concatenate(
                [np.ones(len(uid), bool), np.zeros(len(uid), bool)])
            return pa.table({
                "probe_id": probes,
                "hit": bloom_contains(reg, probes),
                "present": present,
            })

        distinct = ev.groupby("user_id").count().select_columns(["user_id"])
        return distinct.map_batches(_probe, batch_format="pyarrow")

    q["bloom_membership"] = bloom_membership

    def bloom_pruned_orders(sf_dir):
        """Bloom-pruned semi-join (ops/sketch.bloom_prune_semi): the
        broadcast-filter planner primitive — the orders fact side streams
        through a Bloom filter built over events.user_id before anything
        shuffles; only surviving DISTINCT (key, count) partials ride one
        key-bucket shuffle for the exact verify. Returns the scan/prune/
        verify counts a planner acts on, all deterministic + SQL-replayed
        (including any false positives)."""
        from ..ops.sketch import bloom_prune_semi

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        orders = read_parquet_clean(
            _t(sf_dir, "orders"), columns=["o_custkey"])
        return bloom_prune_semi(ev, orders, "user_id", "o_custkey")

    q["bloom_pruned_orders"] = bloom_pruned_orders

    def join_size_orders_events(sf_dir):
        """Sketch-based join planning (ops/sketch.cms_join_size): exact
        |orders JOIN events| on custkey == user_id next to the CMS
        inner-product estimate (min over rows of sum cntA*cntB) —
        est >= exact by construction, both deterministic, both replayed
        in SQL. Register-sized merges + distinct-key-count partials;
        nothing row-sized shuffles."""
        from ..ops.sketch import cms_join_size

        orders = read_parquet_clean(
            _t(sf_dir, "orders"), columns=["o_custkey"])
        events = read_parquet_clean(
            _t(sf_dir, "events"), columns=["user_id"])
        return cms_join_size(orders, events, "o_custkey", "user_id")

    q["join_size_orders_events"] = join_size_orders_events

    def user_key_skew(sf_dir):
        """Skew diagnosis (ops/profile.key_skew_stats): the 10 heaviest
        user_ids in events with their integer per-mille share — the
        number the engine's own hot-block cap and key salting consult.
        Per-block (key, n) partials absorb hot keys; rank + total in one
        vocabulary-sized task."""
        from ..ops.profile import key_skew_stats

        ev = read_parquet_clean(_t(sf_dir, "events"), columns=["user_id"])
        return key_skew_stats(ev, "user_id", top_n=10)

    q["user_key_skew"] = user_key_skew

    def doc_len_deciles(sf_dir):
        """Equi-depth histogram (ops/sketch.equi_depth_histogram):
        documents binned into 10 equal-depth n_chars bins — boundaries
        are the exact i/10-quantiles (shared integer rank rule),
        bin(x) = boundaries strictly below x. One domain-sized shuffle
        for the boundaries, a broadcast, a stateless binning pass."""
        from ..ops.sketch import equi_depth_histogram

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["n_chars"])
        return equi_depth_histogram(docs, "n_chars", n_bins=10)

    q["doc_len_deciles"] = doc_len_deciles


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    # HLL registers: replay ops/sketch.py's salted splitmix64 + ctz rho in
    # integer SQL (rho = bit_count(w XOR (w-1)) == ctz(w)+1; w < 2^52 fits
    # BIGINT). Duplicate user_ids hash identically, so DISTINCT is safe.
    from ..ops.sketch import HLL_P, HLL_SALT

    _hm_sql, _hm_f = _mix64_chain_sql("hm0", "user_id", "hm")
    _hll_m = 1 << HLL_P
    o["hll_user_registers"] = f"""
WITH hm0 AS (
  SELECT DISTINCT user_id,
         CAST(xor(CAST(user_id AS UBIGINT), {HLL_SALT}::UBIGINT) AS HUGEINT) AS h
  FROM events
),
{_hm_sql},
bw AS (
  SELECT CAST(h % {_hll_m} AS BIGINT) AS bucket,
         CAST(h // {_hll_m} AS BIGINT) AS w
  FROM {_hm_f}
),
r AS (
  SELECT bucket,
         CASE WHEN w = 0 THEN {64 - HLL_P + 1}
              ELSE bit_count(xor(w, w - 1)) END AS rho
  FROM bw
)
SELECT bucket, max(rho)::BIGINT AS rho_max FROM r GROUP BY 1"""

    _ghm_sql, _ghm_f = _mix64_chain_sql("ghm0", "event_type", "ghm")
    o["hll_users_by_type_registers"] = f"""
WITH ghm0 AS (
  SELECT DISTINCT event_type, user_id,
         CAST(xor(CAST(user_id AS UBIGINT), {HLL_SALT}::UBIGINT) AS HUGEINT) AS h
  FROM events
),
{_ghm_sql},
gbw AS (
  SELECT event_type, CAST(h % {_hll_m} AS BIGINT) AS bucket,
         CAST(h // {_hll_m} AS BIGINT) AS w
  FROM {_ghm_f}
),
gr AS (
  SELECT event_type, bucket,
         CASE WHEN w = 0 THEN {64 - HLL_P + 1}
              ELSE bit_count(xor(w, w - 1)) END AS rho
  FROM gbw
)
SELECT event_type, bucket, max(rho)::BIGINT AS rho_max
FROM gr GROUP BY 1, 2"""

    o["distinct_users_exact"] = """
SELECT count(DISTINCT user_id)::BIGINT AS n_distinct FROM events"""

    # Same integer rank rule as ops/sketch.exact_quantiles:
    # value at quantile q = min v with cumcount(v) >= (q_permille*n+999)//1000.
    o["quantiles_value_cents"] = """
WITH c AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1
),
t AS (SELECT sum(n)::BIGINT AS total FROM c),
cum AS (SELECT v, sum(n) OVER (ORDER BY v)::BIGINT AS cn FROM c),
qs AS (SELECT * FROM (VALUES (500), (900), (990)) AS q(qp))
SELECT qp::BIGINT AS q_permille,
       (SELECT min(v) FROM cum, t
         WHERE cum.cn >= (qs.qp * t.total + 999) // 1000) AS value_cents
FROM qs"""

    # transcript profiling: all-integer aggregates (epoch µs); steps are
    # consecutive-turn ts deltas in turn_idx order (can be negative — the
    # fixture's ts are not monotone in turn_idx); 1-turn convs get 0.
    o["value_log_quantiles"] = """
WITH x AS (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
           FROM events),
reg AS (SELECT (CASE WHEN v = 0 THEN -1
                     ELSE length(bin(v)) - 1 END)::BIGINT AS bucket,
               count(*)::BIGINT AS n
        FROM x GROUP BY 1),
nn AS (SELECT sum(n)::BIGINT AS total FROM reg),
c AS (SELECT bucket, sum(n) OVER (ORDER BY bucket)::BIGINT AS cum
      FROM reg),
qs AS (SELECT unnest([500, 900, 990])::BIGINT AS q)
SELECT q AS q_permille, bucket,
       (CASE WHEN bucket >= 0 THEN (1::BIGINT << (bucket + 1)) - 1
             ELSE 0 END)::BIGINT AS est_hi,
       ((q * (nn.total - 1)) // 1000)::BIGINT AS rank
FROM qs, nn,
LATERAL (SELECT min(c.bucket) AS bucket FROM c
         WHERE c.cum >= (q * (nn.total - 1)) // 1000 + 1)"""

    # Count-Min Sketch: replay the salted splitmix64 chain per sketch row
    # (d=4 salts via a VALUES cross join), cell = h % w, counts summed —
    # the full register table is integer-SQL-exact, like the HLL's.
    from ..ops.sketch import CMS_SALTS, CMS_W

    _cms_vals = ", ".join(
        f"({r}, {s}::UBIGINT)" for r, s in enumerate(CMS_SALTS))
    _cms_sql, _cms_f = _mix64_chain_sql("cms0", "r", "cmsk")
    o["cms_user_registers"] = f"""
WITH cms0 AS (
  SELECT ss.r,
         CAST(xor(CAST(e.user_id AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM events e, (VALUES {_cms_vals}) AS ss(r, s)
),
{_cms_sql}
SELECT r::BIGINT AS row, CAST(h % {CMS_W} AS BIGINT) AS cell,
       count(*)::BIGINT AS cnt
FROM {_cms_f} GROUP BY 1, 2"""

    _cmu_sql, _cmu_f = _mix64_chain_sql("cmu0", "user_id, r", "cmuk")
    o["cms_user_estimates"] = f"""
WITH cms0 AS (
  SELECT ss.r,
         CAST(xor(CAST(e.user_id AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM events e, (VALUES {_cms_vals}) AS ss(r, s)
),
{_cms_sql},
regs AS (
  SELECT r, CAST(h % {CMS_W} AS BIGINT) AS cell, count(*)::BIGINT AS cnt
  FROM {_cms_f} GROUP BY 1, 2
),
u AS (SELECT DISTINCT user_id FROM events),
cmu0 AS (
  SELECT u.user_id, ss.r,
         CAST(xor(CAST(u.user_id AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM u, (VALUES {_cms_vals}) AS ss(r, s)
),
{_cmu_sql},
ucell AS (
  SELECT user_id, r, CAST(h % {CMS_W} AS BIGINT) AS cell FROM {_cmu_f}
),
est AS (
  SELECT user_id, min(cnt)::BIGINT AS n_est
  FROM ucell JOIN regs USING (r, cell) GROUP BY 1
),
ex AS (SELECT user_id, count(*)::BIGINT AS n_exact FROM events GROUP BY 1)
SELECT ex.user_id, ex.n_exact, est.n_est
FROM ex JOIN est USING (user_id)"""

    # per-group exact quantiles: same integer rank rule as
    # quantiles_value_cents, partitioned by event_type.
    o["quantiles_by_event_type"] = """
WITH c AS (
  SELECT event_type, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
         count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, sum(n)::BIGINT AS total FROM c GROUP BY 1),
cum AS (SELECT event_type, v,
               sum(n) OVER (PARTITION BY event_type ORDER BY v)::BIGINT
                 AS cn
        FROM c),
qs AS (SELECT * FROM (VALUES (500), (900), (990)) AS q(qp))
SELECT t.event_type, qp::BIGINT AS q_permille,
       (SELECT min(v) FROM cum
         WHERE cum.event_type = t.event_type
           AND cum.cn >= (qs.qp * t.total + 999) // 1000) AS value_cents
FROM t, qs"""

    # Bloom filter: same salted splitmix64 replay as the CMS (the salt set
    # is shared), bit = h % m, merged by DISTINCT — the full set-bit table
    # is integer-SQL-exact.
    from ..ops.sketch import BLOOM_M

    _blb_sql, _blb_f = _mix64_chain_sql("bl0", "r", "blb")
    _bloom_bits_ctes = f"""bl0 AS (
  SELECT ss.r,
         CAST(xor(CAST(e.user_id AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM events e, (VALUES {_cms_vals}) AS ss(r, s)
),
{_blb_sql},
bits AS (SELECT DISTINCT CAST(h % {BLOOM_M} AS BIGINT) AS bit FROM {_blb_f})"""

    o["bloom_user_bits"] = f"WITH {_bloom_bits_ctes}\nSELECT bit FROM bits"

    # Membership probes: every distinct user_id (present) plus a planted
    # absent twin (+10^9). hit = all 4 salted bits set; the oracle replays
    # the exact same bits, so even a false positive must match.
    _blp_sql, _blp_f = _mix64_chain_sql("pb0", "probe_id, present, r", "blp")
    o["bloom_membership"] = f"""
WITH {_bloom_bits_ctes},
u AS (SELECT DISTINCT user_id FROM events),
probes AS (
  SELECT user_id AS probe_id, TRUE AS present FROM u
  UNION ALL
  SELECT user_id + 1000000000, FALSE FROM u
),
pb0 AS (
  SELECT p.probe_id, p.present, ss.r,
         CAST(xor(CAST(p.probe_id AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM probes p, (VALUES {_cms_vals}) AS ss(r, s)
),
{_blp_sql},
pbits AS (
  SELECT probe_id, present, CAST(h % {BLOOM_M} AS BIGINT) AS bit FROM {_blp_f}
)
SELECT p.probe_id,
       bool_and(b.bit IS NOT NULL) AS hit,
       any_value(p.present) AS present
FROM pbits p LEFT JOIN bits b ON b.bit = p.bit
GROUP BY p.probe_id"""

    # Bloom-pruned semi-join: bits over events.user_id (the small build
    # side), probed by DISTINCT o_custkey; n_true uses ground truth (no
    # false negatives by construction), n_pass replays the exact bits so
    # false positives must match too.
    _bps_sql, _bps_f = _mix64_chain_sql("bp0", "key, n, r", "bps")
    o["bloom_pruned_orders"] = f"""
WITH {_bloom_bits_ctes},
pk AS (SELECT o_custkey::BIGINT AS key, count(*)::BIGINT AS n
       FROM orders GROUP BY 1),
bp0 AS (
  SELECT p.key, p.n, ss.r,
         CAST(xor(CAST(p.key AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM pk p, (VALUES {_cms_vals}) AS ss(r, s)
),
{_bps_sql},
hits AS (
  SELECT pb.key, any_value(pb.n) AS n,
         bool_and(b.bit IS NOT NULL) AS hit
  FROM (SELECT key, n, CAST(h % {BLOOM_M} AS BIGINT) AS bit FROM {_bps_f}) pb
  LEFT JOIN bits b ON b.bit = pb.bit
  GROUP BY pb.key
),
j AS (
  SELECT h.key, h.n, h.hit,
         h.key IN (SELECT DISTINCT user_id FROM events) AS present
  FROM hits h
)
SELECT (SELECT count(*) FROM orders)::BIGINT AS n_probe,
       coalesce(sum(n) FILTER (hit), 0)::BIGINT AS n_pass_bloom,
       coalesce(sum(n) FILTER (present), 0)::BIGINT AS n_true_semi,
       (coalesce(sum(n) FILTER (hit), 0)
        - coalesce(sum(n) FILTER (present), 0))::BIGINT AS n_false_pos
FROM j"""

    # join-size: exact join count next to the CMS inner-product estimate,
    # both sketches replayed in the same HUGEINT mix64 chain as
    # cms_user_registers (same salts, same w).
    _ja_sql, _ja_f = _mix64_chain_sql("ja0", "r", "jak")
    _jb_sql, _jb_f = _mix64_chain_sql("jb0", "r", "jbk")
    o["join_size_orders_events"] = f"""
WITH ja0 AS (
  SELECT ss.r,
         CAST(xor(CAST(o.o_custkey AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM orders o, (VALUES {_cms_vals}) AS ss(r, s)
),
{_ja_sql},
rega AS (
  SELECT r, CAST(h % {CMS_W} AS BIGINT) AS cell, count(*)::BIGINT AS cnt
  FROM {_ja_f} GROUP BY 1, 2
),
jb0 AS (
  SELECT ss.r,
         CAST(xor(CAST(e.user_id AS UBIGINT), ss.s) AS HUGEINT) AS h
  FROM events e, (VALUES {_cms_vals}) AS ss(r, s)
),
{_jb_sql},
regb AS (
  SELECT r, CAST(h % {CMS_W} AS BIGINT) AS cell, count(*)::BIGINT AS cnt
  FROM {_jb_f} GROUP BY 1, 2
),
dots AS (
  SELECT rega.r, sum(rega.cnt * regb.cnt)::BIGINT AS dot
  FROM rega JOIN regb USING (r, cell) GROUP BY 1
),
ex AS (
  SELECT count(*)::BIGINT AS n_exact
  FROM orders JOIN events ON o_custkey = user_id
)
SELECT ex.n_exact, (SELECT min(dot) FROM dots)::BIGINT AS n_est FROM ex"""

    # key skew: (n DESC, key ASC) row_number, integer per-mille share.
    o["user_key_skew"] = """
WITH c AS (SELECT user_id AS key, count(*)::BIGINT AS n_rows
           FROM events GROUP BY 1),
tot AS (SELECT sum(n_rows)::BIGINT AS total FROM c),
r AS (SELECT key, n_rows,
             row_number() OVER (ORDER BY n_rows DESC, key ASC)::BIGINT
               AS rank
      FROM c)
SELECT rank, key, n_rows, (n_rows * 1000 // tot.total)::BIGINT AS permille
FROM r, tot WHERE rank <= 10"""

    # equi-depth bins: boundaries via the shared integer rank rule, bin =
    # count of boundaries strictly below x (duplicate boundaries counted,
    # matching the engine's searchsorted over the duplicated array).
    o["doc_len_deciles"] = """
WITH v AS (SELECT n_chars::BIGINT AS x FROM documents),
cnt AS (SELECT count(*)::BIGINT AS n FROM v),
rr AS (SELECT x, row_number() OVER (ORDER BY x) AS r FROM v),
qs AS (SELECT unnest([100,200,300,400,500,600,700,800,900]) AS q),
bounds AS (SELECT rr.x AS b FROM rr, cnt, qs
           WHERE rr.r = (qs.q * cnt.n + 999) // 1000)
SELECT (SELECT count(*) FROM bounds WHERE b < v.x)::BIGINT AS bin,
       count(*)::BIGINT AS n_rows
FROM v GROUP BY 1"""
