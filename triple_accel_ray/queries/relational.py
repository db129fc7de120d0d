"""Relational joins, pivots, upserts, diffs.

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    def orders_shipments_7d(sf_dir):
        """RANGE JOIN with NO equi-key: per order, how many lineitems
        (any order) shipped within [o_orderdate, o_orderdate + 7 days).
        Bucket-replication interval join (ops/relational.py:
        interval_point_count) — intervals replicated <=2x, points
        bucketed once, per-bucket sorted searchsorted counts."""
        from ..ops.relational import interval_point_count

        orders = read_parquet_clean(_t(sf_dir, "orders"),
                                    columns=["o_orderkey", "o_orderdate"])
        li = read_parquet_clean(_t(sf_dir, "lineitem"),
                                columns=["l_shipdate"])
        return interval_point_count(
            orders, li,
            key_col="o_orderkey", start_col="o_orderdate",
            point_col="l_shipdate",
            width_us=7 * 86400 * 1_000_000, out_col="n_shipped_7d",
        )

    q["orders_shipments_7d"] = orders_shipments_7d

    def top20_alpha_docs(sf_dir):
        """Global sort + limit: top 20 docs by alpha_count (doc_id asc
        tie-break)."""
        from ..ops.text import quality_score_batch

        docs = read_parquet_clean(_t(sf_dir, "documents"), columns=["doc_id", "text"])
        scored = docs.map_batches(
            lambda t: quality_score_batch(t).select(["doc_id", "alpha_count"]),
            batch_format="pyarrow",
        )
        out = scored.sort(["alpha_count", "doc_id"], descending=[True, False]).limit(20)
        return out

    q["top20_alpha_docs"] = top20_alpha_docs

    def source_stats(sf_dir):
        from ray.data.aggregate import Count, Max, Min, Sum

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["source", "n_chars"]
        )
        return docs.groupby("source").aggregate(
            Count(alias_name="n_docs"),
            Sum("n_chars", alias_name="sum_chars"),
            Min("n_chars", alias_name="min_chars"),
            Max("n_chars", alias_name="max_chars"),
        )

    q["source_stats"] = source_stats

    # ---- relational breadth --------------------------------------------
    def events_asof_orders(sf_dir):
        from ..ops.relational import events_last_order

        ev = read_parquet_clean(_t(sf_dir, "events"),
                             columns=["event_id", "user_id", "ts"])
        od = read_parquet_clean(_t(sf_dir, "orders"),
                             columns=["o_custkey", "o_orderdate"])
        return events_last_order(ev, od, num_buckets=16)

    q["events_asof_orders"] = events_asof_orders

    def pricing_summary_q(sf_dir):
        from ..ops.relational import pricing_summary

        li = read_parquet_clean(
            _t(sf_dir, "lineitem"),
            columns=["l_returnflag", "l_linestatus", "l_quantity",
                     "l_extendedprice", "l_discount"],
        )
        return pricing_summary(li)

    q["pricing_summary"] = pricing_summary_q

    def events_upserted(sf_dir):
        """CDC MERGE/upsert (ops/relational.upsert_latest): a synthetic
        patch — every event_id divisible by 9 re-arrives 1 h later with
        doubled cents, plus brand-new rows under event_id + 10^9 —
        merges into the base by last-writer-wins (ties -> patch). One
        key-bucket shuffle of the tagged union; the SQL twin replays the
        same rule with a window row_number."""
        from ..ops.relational import upsert_latest

        def _cents(t: pa.Table) -> pa.Table:
            return pa.table({
                "event_id": t["event_id"],
                "user_id": t["user_id"],
                "ts": t["ts"],
                "cents": pa.array(np.floor(
                    t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)),
            })

        base = read_parquet_clean(
            _t(sf_dir, "events"),
            columns=["event_id", "user_id", "ts", "value"]
        ).map_batches(_cents, batch_format="pyarrow")

        def _patch(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            upd = (df.filter(pl.col("event_id") % 9 == 0)
                   .with_columns(
                       ts=pl.col("ts") + pl.duration(hours=1),
                       cents=pl.col("cents") * 2))
            new = df.filter(pl.col("event_id") % 17 == 0).with_columns(
                event_id=pl.col("event_id") + 1_000_000_000,
                cents=pl.col("cents") + 7)
            return pl.concat([upd, new]).to_arrow()

        patch = base.map_batches(_patch, batch_format="pyarrow")
        return upsert_latest(base, patch, "event_id", "ts")

    q["events_upserted"] = events_upserted

    def revenue_by_nation(sf_dir):
        """TPC-H Q5-shaped multi-join (ops/relational.revenue_by_nation):
        revenue per (region, nation) where the supplier's nation equals
        the customer's (local-supplier rule). Vocabulary sides
        (nation/region/supplier) broadcast; orders><customer and
        lineitem><orders are bucketed hash joins; revenue is the exact
        integer centi-cent product so the sum is order-independent."""
        from ..ops.relational import revenue_by_nation as _rbn

        return _rbn(
            read_parquet_clean(_t(sf_dir, "lineitem"),
                               columns=["l_orderkey", "l_suppkey",
                                        "l_extendedprice", "l_discount"]),
            read_parquet_clean(_t(sf_dir, "orders"),
                               columns=["o_orderkey", "o_custkey"]),
            read_parquet_clean(_t(sf_dir, "customer"),
                               columns=["c_custkey", "c_nationkey"]),
            read_parquet_clean(_t(sf_dir, "supplier"),
                               columns=["s_suppkey", "s_nationkey"]),
            read_parquet_clean(_t(sf_dir, "nation")),
            read_parquet_clean(_t(sf_dir, "region")),
        )

    q["revenue_by_nation"] = revenue_by_nation

    def docs_snapshot_diff(sf_dir):
        """CDC between two snapshots (ops/relational.snapshot_diff):
        byte-exact added/removed/changed classification after one
        hash(id) bucket shuffle colocates both versions of each row.
        The 'new' snapshot plants deterministic mutations from doc_id
        arithmetic (removed %17==3, edited %13==2, added %19==4 under
        id+10^6) so the SQL twin replays them exactly."""
        from ..ops.relational import snapshot_diff

        docs = read_parquet_clean(
            _t(sf_dir, "documents"), columns=["doc_id", "text"])

        def _mknew(t: pa.Table) -> pa.Table:
            df = pl.from_arrow(t)
            kept = (
                df.filter(pl.col("doc_id") % 17 != 3)
                .with_columns(
                    text=pl.when(pl.col("doc_id") % 13 == 2)
                    .then(pl.col("text") + pl.lit(" <EDIT>"))
                    .otherwise(pl.col("text")))
            )
            added = df.filter(pl.col("doc_id") % 19 == 4).select(
                doc_id=pl.col("doc_id") + 1_000_000,
                text=pl.lit("new doc ") + pl.col("doc_id").cast(pl.String),
            )
            return pl.concat([kept, added]).to_arrow().cast(pa.schema([
                ("doc_id", pa.int64()), ("text", pa.string())]))

        new = docs.map_batches(_mknew, batch_format="pyarrow")
        return snapshot_diff(docs, new)

    q["docs_snapshot_diff"] = docs_snapshot_diff

    def orders_fk_orphans(sf_dir):
        """Referential-integrity gate (ops/relational.fk_orphans):
        orders.o_custkey values with no customer row, after customers
        with c_custkey % 23 == 5 are deterministically dropped (the
        fixture's integrity holds, so orphans are planted by replayable
        arithmetic). Distinct-key partials + one grouped merge — the
        shuffle never carries fact rows."""
        from ..ops.relational import fk_orphans

        orders = read_parquet_clean(
            _t(sf_dir, "orders"), columns=["o_custkey"])
        def _drop_dim(t: pa.Table) -> pa.Table:
            keys = t["c_custkey"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(keys % 23 != 5))

        cust = read_parquet_clean(
            _t(sf_dir, "customer"), columns=["c_custkey"]).map_batches(
            _drop_dim, batch_format="pyarrow")
        return fk_orphans(orders, cust, "o_custkey", "c_custkey")

    q["orders_fk_orphans"] = orders_fk_orphans

    def daily_type_pivot(sf_dir):
        """PIVOT (ops/relational.pivot_counts): daily counts per event
        type as wide columns under a pinned category contract
        (click/view/purchase + other). Blocks pre-pivot to wide rows, so
        the one grouped-sum shuffle is day-vocabulary-sized and hot
        categories live in columns, never keys."""
        from ..ops.relational import pivot_counts

        ev = read_parquet_clean(
            _t(sf_dir, "events"), columns=["ts", "event_type"])

        def _day(t: pa.Table) -> pa.Table:
            us = t["ts"].cast(pa.int64()).to_numpy()
            day = (us // 86_400_000_000) * 86_400_000_000
            return pa.table({
                "day": pa.array(day).cast(pa.timestamp("us")),
                "event_type": t["event_type"],
            })

        return pivot_counts(
            ev.map_batches(_day, batch_format="pyarrow"),
            "day", "event_type", ["click", "view", "purchase"])

    q["daily_type_pivot"] = daily_type_pivot


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    o["orders_shipments_7d"] = """
SELECT o.o_orderkey,
       count(l.l_shipdate)::BIGINT AS n_shipped_7d
FROM orders o LEFT JOIN lineitem l
  ON l.l_shipdate >= o.o_orderdate
 AND l.l_shipdate < o.o_orderdate + INTERVAL 7 DAY
GROUP BY 1"""

    o["top20_alpha_docs"] = """
SELECT doc_id,
       (strlen(text) - strlen(regexp_replace(text, '[A-Za-z]', '', 'g')))::BIGINT AS alpha_count
FROM documents
ORDER BY alpha_count DESC, doc_id ASC LIMIT 20"""

    o["source_stats"] = """
SELECT source, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS sum_chars,
       min(n_chars)::BIGINT AS min_chars, max(n_chars)::BIGINT AS max_chars
FROM documents GROUP BY source"""

    o["events_asof_orders"] = """
SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate"""

    o["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       sum(CAST(floor(l_quantity + 0.5) AS BIGINT))::BIGINT AS sum_qty,
       sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))::BIGINT AS sum_base_cents,
       sum(CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT))::BIGINT AS sum_disc_cents,
       count(*)::BIGINT AS count_order
FROM lineitem GROUP BY 1, 2"""

    o["events_upserted"] = """
WITH base AS (
  SELECT event_id::BIGINT AS event_id, user_id::BIGINT AS user_id, ts,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
         0 AS side
  FROM events),
patch AS (
  SELECT event_id, user_id, ts + INTERVAL 1 HOUR AS ts,
         cents * 2 AS cents, 1 AS side
  FROM base WHERE event_id % 9 = 0
  UNION ALL
  SELECT event_id + 1000000000, user_id, ts, cents + 7, 1
  FROM base WHERE event_id % 17 = 0),
u AS (SELECT * FROM base UNION ALL SELECT * FROM patch),
r AS (SELECT event_id, user_id, ts, cents,
             row_number() OVER (PARTITION BY event_id
                                ORDER BY ts DESC, side DESC) AS rn
      FROM u)
SELECT event_id, user_id, ts, cents FROM r WHERE rn = 1"""

    # Q5 shape: local-supplier rule, exact integer centi-cent revenue.
    o["revenue_by_nation"] = """
SELECT r.r_name AS region, n.n_name AS nation,
       sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) *
           (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT))
       )::BIGINT AS revenue_cc
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
 AND s.s_nationkey = c.c_nationkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY 1, 2"""

    # snapshot diff: the new snapshot is replayed from the same doc_id
    # arithmetic the engine query plants; unchanged rows are excluded.
    o["docs_snapshot_diff"] = """
WITH oldt AS (SELECT doc_id, text FROM documents),
newt AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 2 THEN text || ' <EDIT>' ELSE text END
           AS text
  FROM documents WHERE doc_id % 17 != 3
  UNION ALL
  SELECT doc_id + 1000000, 'new doc ' || doc_id::VARCHAR
  FROM documents WHERE doc_id % 19 = 4
),
j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
             o.text AS oc, n.text AS nc
      FROM oldt o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id)
SELECT doc_id,
       CASE WHEN oc IS NULL THEN 'added'
            WHEN nc IS NULL THEN 'removed'
            ELSE 'changed' END AS change,
       strlen(oc)::BIGINT AS old_len,
       strlen(nc)::BIGINT AS new_len
FROM j WHERE oc IS NULL OR nc IS NULL OR oc != nc"""

    # fk orphans: the dim-side drop (% 23 == 5) is replayed, then a
    # plain anti-join counts stranded fact rows per key.
    o["orders_fk_orphans"] = """
WITH cust AS (SELECT c_custkey FROM customer WHERE c_custkey % 23 != 5)
SELECT o_custkey AS fk, count(*)::BIGINT AS n_rows
FROM orders LEFT JOIN cust ON o_custkey = c_custkey
WHERE c_custkey IS NULL
GROUP BY 1"""

    # pivot: the pinned category contract is the CASE list; everything
    # else lands in n_other.
    o["daily_type_pivot"] = """
SELECT date_trunc('day', ts)::TIMESTAMP AS day,
       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
         AS n_click,
       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
         AS n_view,
       sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
         AS n_purchase,
       sum(CASE WHEN event_type NOT IN ('click', 'view', 'purchase')
                THEN 1 ELSE 0 END)::BIGINT AS n_other
FROM events GROUP BY 1"""
