"""Distributed graph analytics over edge tables.

The ER pipeline already runs one graph algorithm (connected components,
pipeline/cluster.py); this module adds the other classic that a
dedup/linkage pipeline wants: per-vertex TRIANGLE counts over the match
graph — the standard local-clustering / community-density signal (a
near-dup cluster whose members all match each other is denser than a
chain of borderline matches).

Reference scope note: the reference engine (triple_accel) has no graph
layer — this is an engine-side addition mandated by the brief's
custom-operator list, not a port.

Algorithm (the canonical distributed one): orient every edge from its
lower-(degree, id) endpoint to the higher one. Every vertex's
OUT-neighborhood is then at most ~sqrt(2m) (any out-neighbor has degree
>= the vertex's own), so wedge generation is O(m^1.5) total no matter
how skewed the degree distribution — the hub-vertex mitigation that a
naive "pairs of neighbors" explodes on. Each triangle {x,y,z} has
exactly one vertex with out-edges to the other two under an acyclic
orientation, so joining wedges (lo, hi, apex) against the canonical
edge set counts each triangle exactly once.

Shuffle inventory (all id-width rows, never text):
1. degree aggregate (groupby node)
2+3. degree attach to both endpoints (bucket_join x2)
4. wedge generation (hash(src) bucket shuffle)
5. wedge<->edge pair join (hash(lo,hi) bucket shuffle)
6. per-vertex count (groupby of 3 rows per triangle)
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ..pipeline.pairs import _triu_cache
from ..pipeline.shuffle import bucket_join, bucket_partition


def triangle_counts(edges, num_buckets: int = 32):
    """edges (a_id, b_id) — canonical a_id < b_id, distinct — →
    (conv_id, n_triangles) for every vertex in at least one triangle."""
    from ray.data.aggregate import Sum

    def _deg_partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["a_id", "b_id"]))
        nodes = pl.concat([
            df.select(node=pl.col("a_id")),
            df.select(node=pl.col("b_id")),
        ])
        out = nodes.group_by("node").agg(d=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(
            pa.schema([("node", pa.string()), ("d", pa.int64())]))

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
    )

    ed_schema = pa.schema([("a_id", pa.string()), ("b_id", pa.string())])
    dega = deg.map_batches(
        lambda t: pa.table({"node": t["node"], "deg_a": t["deg"]}),
        batch_format="pyarrow")
    degb = deg.map_batches(
        lambda t: pa.table({"node": t["node"], "deg_b": t["deg"]}),
        batch_format="pyarrow")
    dega_schema = pa.schema([("node", pa.string()), ("deg_a", pa.int64())])
    degb_schema = pa.schema([("node", pa.string()), ("deg_b", pa.int64())])

    ed = edges.map_batches(
        lambda t: t.select(["a_id", "b_id"]), batch_format="pyarrow")
    e1 = bucket_join(ed, dega, "a_id", "node", ed_schema, dega_schema,
                     num_buckets=num_buckets)
    e1_schema = pa.schema(list(ed_schema) + [("deg_a", pa.int64())])
    e2 = bucket_join(e1, degb, "b_id", "node", e1_schema, degb_schema,
                     num_buckets=num_buckets)

    def _orient(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        a_first = (pl.col("deg_a") < pl.col("deg_b")) | (
            (pl.col("deg_a") == pl.col("deg_b"))
            & (pl.col("a_id") < pl.col("b_id"))
        )
        df = df.with_columns(
            src=pl.when(a_first).then(pl.col("a_id")).otherwise(pl.col("b_id")),
            dst=pl.when(a_first).then(pl.col("b_id")).otherwise(pl.col("a_id")),
        ).select(["src", "dst"]).with_columns(
            bucket=(pl.col("src").hash(seed=57) % np.uint64(num_buckets))
            .cast(pl.Int32)
        )
        return df.to_arrow().cast(pa.schema([
            ("src", pa.string()), ("dst", pa.string()),
            ("bucket", pa.int32())]))

    def _wedges(t: pa.Table) -> pa.Table:
        # all out-neighbor pairs per src; dst-sorted order makes lo < hi
        # automatic, matching the canonical edge form
        df = pl.from_arrow(t.select(["src", "dst"])).sort(["src", "dst"])
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        change = np.nonzero(src[1:] != src[:-1])[0] + 1
        starts = np.concatenate([[0], change]) if len(src) else np.array([], np.int64)
        ends = np.concatenate([change, [len(src)]]) if len(src) else np.array([], np.int64)
        sizes = ends - starts
        lo_i: list = []
        hi_i: list = []
        # size-class vectorized emit (pipeline/pairs.py discipline): one
        # broadcast per distinct out-degree, never a Python loop per vertex
        mask = sizes >= 2
        ssz, sst = sizes[mask], starts[mask]
        for n in np.unique(ssz):
            iu0, iu1 = _triu_cache(int(n))
            s_n = sst[ssz == n]
            lo_i.append((s_n[:, None] + iu0[None, :]).ravel())
            hi_i.append((s_n[:, None] + iu1[None, :]).ravel())
        if not lo_i:
            return pa.table({
                "lo": pa.array([], pa.string()),
                "hi": pa.array([], pa.string()),
                "apex": pa.array([], pa.string()),
            })
        li = np.concatenate(lo_i)
        hi = np.concatenate(hi_i)
        return pa.table({
            "lo": pa.array(dst[li], pa.string()),
            "hi": pa.array(dst[hi], pa.string()),
            "apex": pa.array(src[li], pa.string()),
        })

    wedges = bucket_partition(
        e2.map_batches(_orient, batch_format="pyarrow"),
        _wedges, num_buckets,
    )

    # wedge <-> edge equi-join on the (lo, hi) pair key: union-tag both
    # sides, one hash(lo, hi) bucket shuffle, per-bucket polars join.
    def _tag_edge(t: pa.Table) -> pa.Table:
        return pa.table({
            "lo": t["a_id"], "hi": t["b_id"],
            "apex": pa.nulls(t.num_rows, pa.string()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def _tag_wedge(t: pa.Table) -> pa.Table:
        return pa.table({
            "lo": t["lo"], "hi": t["hi"], "apex": t["apex"],
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        })

    def _pair_bucket(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        return df.with_columns(
            bucket=((pl.col("lo") + "\x00" + pl.col("hi")).hash(seed=58)
                    % np.uint64(num_buckets)).cast(pl.Int32)
        ).to_arrow()

    def _match(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t)
        es = df.filter(pl.col("side") == 0).select(["lo", "hi"])
        ws = df.filter(pl.col("side") == 1).select(["lo", "hi", "apex"])
        tri = ws.join(es, on=["lo", "hi"], how="inner")
        # one partial count row per vertex per bucket (3 vertex mentions
        # per triangle), merged by the final groupby sum
        verts = pl.concat([
            tri.select(node=pl.col("lo")),
            tri.select(node=pl.col("hi")),
            tri.select(node=pl.col("apex")),
        ])
        out = verts.group_by("node").agg(n=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(
            pa.schema([("node", pa.string()), ("n", pa.int64())]))

    tagged = ed.map_batches(_tag_edge, batch_format="pyarrow").union(
        wedges.map_batches(_tag_wedge, batch_format="pyarrow"))
    partial = bucket_partition(
        tagged.map_batches(_pair_bucket, batch_format="pyarrow"),
        _match, num_buckets,
    )
    counts = partial.groupby("node").aggregate(Sum("n", alias_name="n_sum"))
    return counts.map_batches(
        lambda t: pa.table({
            "conv_id": t["node"],
            "n_triangles": t["n_sum"].cast(pa.int64()),
        }),
        batch_format="pyarrow",
    )


def triangle_counts_fast(edges, num_buckets: int = 32):
    """Raw-exchange twin of :func:`triangle_counts` (bit-identical output,
    pinned by test): the same degree-oriented wedge algorithm expressed as
    four lean ``raw_exchange`` rounds instead of six Dataset all-to-alls.
    Profiling the Dataset form at 1.7M edges showed 41 s wall with <1.5 s
    of UDF work per stage — the cost was union/tag/sort scheduling, so the
    fix is fewer, leaner exchanges, not faster kernels:

    1. directed edges → src owner; owner-local degree, sdeg attach
       (a node's out-edges ALL hash to its bucket, so degree needs no
       separate aggregate round);
    2. rows → dst owner; ddeg attach from the owner's resident degree
       slice (the ``extra`` side input) + the (deg, id) orientation
       filter — only lower-endpoint out-edges survive;
    3. kept out-edges → src owner; size-class-vectorized wedge emission;
    4. wedges + canonical edges → hash(lo, hi) owner; pair join, one
       (node, n) partial per vertex mention;
    then one node-width Dataset groupby-sum for the final counts. All
    merges are integer sums, so any partitioning gives identical output."""
    import ray
    import ray.data as rd

    from ..pipeline.shuffle import raw_exchange

    B = max(2, int(num_buckets))

    def _hb(col):
        return (pl.col(col).hash(seed=61) % np.uint64(B)).cast(pl.Int32)

    def _split(df: pl.DataFrame, bexpr):
        df = df.with_columns(__b=bexpr)
        parts = df.partition_by("__b", as_dict=True, include_key=False)
        empty = df.clear().drop("__b")
        return tuple(
            parts.get((b,), empty).to_arrow() for b in range(B))

    def m1(t: pa.Table):
        df = pl.from_arrow(t.select(["a_id", "b_id"]))
        de = pl.concat([
            df.select(src=pl.col("a_id"), dst=pl.col("b_id")),
            df.select(src=pl.col("b_id"), dst=pl.col("a_id")),
        ])
        return _split(de, _hb("src"))

    def r1(b, parts, _):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return (pl.DataFrame(schema={"src": pl.String, "dst": pl.String,
                                         "sdeg": pl.Int64}).to_arrow())
        de = pl.from_arrow(pa.concat_tables(tabs))
        deg = de.group_by("src").agg(sdeg=pl.len().cast(pl.Int64))
        return de.join(deg, on="src", how="inner").to_arrow()

    edge_refs = edges.select_columns(["a_id", "b_id"]).to_arrow_refs()
    if not edge_refs:
        return rd.from_arrow(pa.table({
            "conv_id": pa.array([], pa.string()),
            "n_triangles": pa.array([], pa.int64())}))
    r1_out = raw_exchange(edge_refs, m1, r1, B)

    @ray.remote
    def _deg_slice(t: pa.Table) -> pa.Table:
        """(dnode, ddeg) for every node owned by this bucket."""
        df = pl.from_arrow(t)
        return (df.group_by("src").agg(ddeg=pl.col("sdeg").first())
                .rename({"src": "dnode"}).to_arrow())

    deg_refs = [_deg_slice.remote(r) for r in r1_out]

    def m2(part: pa.Table):
        return _split(pl.from_arrow(part), _hb("dst"))

    def r2(b, parts, deg_t):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return pl.DataFrame(
                schema={"src": pl.String, "dst": pl.String}).to_arrow()
        de = pl.from_arrow(pa.concat_tables(tabs))
        dd = pl.from_arrow(deg_t)
        de = de.join(dd, left_on="dst", right_on="dnode", how="inner")
        keep = (pl.col("sdeg") < pl.col("ddeg")) | (
            (pl.col("sdeg") == pl.col("ddeg")) & (pl.col("src") < pl.col("dst"))
        )
        return de.filter(keep).select(["src", "dst"]).to_arrow()

    r2_out = raw_exchange(r1_out, m2, r2, B, extra=deg_refs)

    def m3(part: pa.Table):
        return _split(pl.from_arrow(part), _hb("src"))

    def r3(b, parts, _):
        tabs = [p for p in parts if p.num_rows]
        empty = pl.DataFrame(schema={"lo": pl.String, "hi": pl.String,
                                     "apex": pl.String})
        if not tabs:
            return empty.to_arrow()
        df = pl.from_arrow(pa.concat_tables(tabs)).sort(["src", "dst"])
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        change = np.nonzero(src[1:] != src[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(src)]])
        sizes = ends - starts
        mask = sizes >= 2
        ssz, sst = sizes[mask], starts[mask]
        lo_i: list = []
        hi_i: list = []
        for n in np.unique(ssz):
            iu0, iu1 = _triu_cache(int(n))
            s_n = sst[ssz == n]
            lo_i.append((s_n[:, None] + iu0[None, :]).ravel())
            hi_i.append((s_n[:, None] + iu1[None, :]).ravel())
        if not lo_i:
            return empty.to_arrow()
        li = np.concatenate(lo_i)
        hi = np.concatenate(hi_i)
        return pl.DataFrame({
            "lo": dst[li], "hi": dst[hi], "apex": src[li],
        }).to_arrow()

    r3_out = raw_exchange(r2_out, m3, r3, B)

    def m4(part: pa.Table):
        if "apex" in part.column_names:
            df = pl.from_arrow(part)
        else:
            df = (pl.from_arrow(part.select(["a_id", "b_id"]))
                  .rename({"a_id": "lo", "b_id": "hi"})
                  .with_columns(apex=pl.lit(None, pl.String)))
        bexpr = ((pl.col("lo") + "\x00" + pl.col("hi")).hash(seed=58)
                 % np.uint64(B)).cast(pl.Int32)
        return _split(df, bexpr)

    def r4(b, parts, _):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return pa.table({"node": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        df = pl.from_arrow(pa.concat_tables(tabs))
        es = df.filter(pl.col("apex").is_null()).select(["lo", "hi"])
        ws = df.filter(pl.col("apex").is_not_null())
        tri = ws.join(es, on=["lo", "hi"], how="inner")
        verts = pl.concat([
            tri.select(node=pl.col("lo")),
            tri.select(node=pl.col("hi")),
            tri.select(node=pl.col("apex")),
        ])
        out = verts.group_by("node").agg(n=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(
            pa.schema([("node", pa.string()), ("n", pa.int64())]))

    r4_out = raw_exchange(list(r3_out) + list(edge_refs), m4, r4, B)

    # final vertex-count merge as a fifth raw exchange — a Dataset
    # groupby here re-pays the all-to-all scheduling the whole function
    # exists to avoid (measured: it tripled the op's wall time)
    def m5(part: pa.Table):
        return _split(pl.from_arrow(part), _hb("node"))

    def r5(b, parts, _):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return pa.table({"conv_id": pa.array([], pa.string()),
                             "n_triangles": pa.array([], pa.int64())})
        df = pl.from_arrow(pa.concat_tables(tabs))
        out = df.group_by("node").agg(
            n_triangles=pl.col("n").sum().cast(pl.Int64)
        ).rename({"node": "conv_id"})
        return out.to_arrow().cast(pa.schema(
            [("conv_id", pa.string()), ("n_triangles", pa.int64())]))

    return rd.from_arrow_refs(list(raw_exchange(list(r4_out), m5, r5, B)))


def pagerank_stationary(edges, n_iter: int = 3, scale: int = 10**12,
                        num_buckets: int = 32):
    """Value-identical twin of :func:`pagerank` built for iteration count:
    the directed edge table is hash(src)-partitioned ONCE into per-bucket
    Arrow tables that stay in the object store for the whole run; each
    iteration moves only NODE-WIDTH data (rank shares), never the edges.

    This is the one pipeline shape the Dataset API can't express — an
    iterative algorithm over a STATIONARY partitioned dataset (every
    Dataset join re-shuffles both sides per call, so n_iter iterations
    re-ship the edge table n_iter times). Raw Ray tasks hold the graph
    partitions in place, per the brief's custom-operator escape hatch.

    Topology per iteration (B = num_buckets):
      * B map tasks: bucket b joins its resident edges (src, dst, sdeg)
        against its resident (node, pr) slice — all srcs of bucket b hash
        there by construction — computes share = pr // sdeg, groups by
        dst WITHIN the task, and splits the partial by hash(dst) into B
        sub-outputs (``num_returns=B``): the only shuffled payload, at
        most |distinct dst in bucket| id-width rows.
      * B reduce tasks: concat the b-th sub-output of every map task,
        grouped integer sum, left-join onto the resident node list
        (no-inbound nodes keep s=0), pr' = base + (85*s)//100.

    Every step is an order-independent integer sum or floor divide, so
    outputs are bit-identical to :func:`pagerank` (asserted by test)
    and to the chained-CTE SQL twin."""
    import ray

    # num_returns=1 would hand back a bare ObjectRef instead of a list,
    # breaking the [m][b] indexing — 2 is the minimum fan-out.
    B = max(2, int(num_buckets))

    @ray.remote
    def _split_edges(t: pa.Table):
        """Directed-edge map: emit B per-bucket (src, dst) parts."""
        df = pl.from_arrow(t.select(["a_id", "b_id"]))
        de = pl.concat([
            df.select(src=pl.col("a_id"), dst=pl.col("b_id")),
            df.select(src=pl.col("b_id"), dst=pl.col("a_id")),
        ]).with_columns(b=(pl.col("src").hash(seed=61)
                           % np.uint64(B)).cast(pl.Int32))
        parts = de.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), de.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    @ray.remote
    def _build_bucket(*parts):
        """Bucket reduce: resident (src, dst, sdeg) edges + (node, deg)
        slice + initial pr0 slice for this bucket."""
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            empty_e = pa.table({"src": pa.array([], pa.string()),
                                "dst": pa.array([], pa.string()),
                                "sdeg": pa.array([], pa.int64())})
            empty_n = pa.table({"node": pa.array([], pa.string()),
                                "deg": pa.array([], pa.int64())})
            return empty_e, empty_n, 0
        de = pl.from_arrow(pa.concat_tables(tabs))
        deg = de.group_by("src").agg(deg=pl.len().cast(pl.Int64)).rename(
            {"src": "node"})
        ed = de.join(deg.rename({"node": "src", "deg": "sdeg"}),
                     on="src", how="inner")
        return (
            ed.select(["src", "dst", "sdeg"]).to_arrow(),
            deg.sort("node").to_arrow(),
            int(deg.height),
        )

    @ray.remote
    def _iter_map(edge_t: pa.Table, pr_t: pa.Table):
        """One bucket's share pass: local join + dst-grouped partial,
        split by hash(dst) for the reduce side."""
        if edge_t.num_rows == 0:
            z = pa.table({"dst": pa.array([], pa.string()),
                          "s": pa.array([], pa.int64())})
            return tuple(z for _ in range(B))
        ed = pl.from_arrow(edge_t)
        pr = pl.from_arrow(pr_t).rename({"node": "src"})
        out = (
            ed.join(pr, on="src", how="inner")
            .with_columns(share=pl.col("pr") // pl.col("sdeg"))
            .group_by("dst").agg(s=pl.col("share").sum().cast(pl.Int64))
            .with_columns(b=(pl.col("dst").hash(seed=61)
                             % np.uint64(B)).cast(pl.Int32))
        )
        parts = out.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), out.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    @ray.remote
    def _iter_reduce(node_t: pa.Table, base: int, *parts):
        """New (node, pr) slice for one bucket."""
        nodes = pl.from_arrow(node_t).select("node")
        tabs = [p for p in parts if p.num_rows]
        if tabs:
            s = (pl.from_arrow(pa.concat_tables(tabs))
                 .group_by("dst").agg(s=pl.col("s").sum().cast(pl.Int64))
                 .rename({"dst": "node"}))
            nodes = nodes.join(s, on="node", how="left").with_columns(
                s=pl.col("s").fill_null(0))
        else:
            nodes = nodes.with_columns(s=pl.lit(0, pl.Int64))
        out = nodes.select(
            node=pl.col("node"),
            pr=(pl.lit(base, pl.Int64) + (85 * pl.col("s")) // 100),
        )
        return out.to_arrow().cast(
            pa.schema([("node", pa.string()), ("pr", pa.int64())]))

    # --- one-time graph partitioning (the only edge-width shuffle) ---
    blocks = edges.select_columns(["a_id", "b_id"]).to_arrow_refs()
    split = [_split_edges.options(num_returns=B).remote(r) for r in blocks]
    if not split:
        import ray.data as rd
        return rd.from_arrow(pa.table({"conv_id": pa.array([], pa.string()),
                                       "pr": pa.array([], pa.int64())}))
    built = [
        _build_bucket.options(num_returns=3).remote(
            *[split[m][b] for m in range(len(split))])
        for b in range(B)
    ]
    edge_refs = [t[0] for t in built]
    node_refs = [t[1] for t in built]
    n_nodes = sum(ray.get([t[2] for t in built]))
    if n_nodes == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({"conv_id": pa.array([], pa.string()),
                                       "pr": pa.array([], pa.int64())}))
    pr0 = int(scale) // n_nodes
    base = (15 * pr0) // 100

    @ray.remote
    def _init_pr(node_t: pa.Table):
        return pa.table({
            "node": node_t["node"],
            "pr": pa.array(np.full(node_t.num_rows, pr0, np.int64)),
        })

    pr_refs = [_init_pr.remote(nr) for nr in node_refs]

    # --- iterations: only node-width partials move ---
    for _ in range(int(n_iter)):
        partials = [
            _iter_map.options(num_returns=B).remote(edge_refs[b], pr_refs[b])
            for b in range(B)
        ]
        pr_refs = [
            _iter_reduce.remote(
                node_refs[b], base,
                *[partials[m][b] for m in range(B)])
            for b in range(B)
        ]

    import ray.data as rd

    return rd.from_arrow_refs(pr_refs).map_batches(
        lambda t: pa.table({"conv_id": t["node"],
                            "pr": t["pr"].cast(pa.int64())}),
        batch_format="pyarrow")


def pagerank(edges, n_iter: int = 3, scale: int = 10**12,
             num_buckets: int = 32):
    """edges (a_id, b_id) — canonical a_id < b_id, distinct — →
    (conv_id, pr): INTEGER fixed-point PageRank (d = 0.85) after
    ``n_iter`` synchronous iterations over the undirected match graph
    (each edge walked both ways).

    Why integer: pr values are int64 multiples of 1/scale with FLOOR
    division everywhere — pr0 = scale // N; per-edge share =
    pr // deg(src); pr' = (15 * (scale // N)) // 100 + (85 * S) // 100.
    Every step is an order-independent integer sum or a floor divide,
    so the result is deterministic under any partitioning and a chained
    3-CTE DuckDB twin is value-exact — the usual float-PageRank
    nondeterminism (reduction order) never appears. No dangling-node
    term is needed: both directions of every edge exist, so every node
    has out-degree >= 1.

    Scale shape: the directed edge table (src, dst, src_deg) is built
    ONCE (degree aggregate + one hash(node) bucket join) and reused by
    every iteration; an iteration is one hash(src) bucket join (attach
    pr, id-width rows) + a per-block combiner (group dst within the
    bucket) + a node-sized grouped sum — hub vertices are absorbed into
    one partial per block. State between iterations is the node-width
    (node, pr) table only."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def _deg_partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["a_id", "b_id"]))
        nodes = pl.concat([
            df.select(node=pl.col("a_id")),
            df.select(node=pl.col("b_id")),
        ])
        out = nodes.group_by("node").agg(d=pl.len().cast(pl.Int64))
        return out.to_arrow().cast(
            pa.schema([("node", pa.string()), ("d", pa.int64())]))

    deg = (
        edges.map_batches(_deg_partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("d", alias_name="deg"))
        .map_batches(
            lambda t: pa.table({"node": t["node"],
                                "deg": t["deg"].cast(pa.int64())}),
            batch_format="pyarrow")
        .materialize()
    )
    n_nodes = deg.count()
    empty = pa.table({"conv_id": pa.array([], pa.string()),
                      "pr": pa.array([], pa.int64())})
    if n_nodes == 0:
        import ray.data as rd
        return rd.from_arrow(empty)
    pr0 = int(scale) // n_nodes
    base = (15 * pr0) // 100

    def _direct(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["a_id", "b_id"]))
        out = pl.concat([
            df.select(src=pl.col("a_id"), dst=pl.col("b_id")),
            df.select(src=pl.col("b_id"), dst=pl.col("a_id")),
        ])
        return out.to_arrow().cast(
            pa.schema([("src", pa.string()), ("dst", pa.string())]))

    # (src, dst, sdeg) — reused every iteration, built once.
    dedges = bucket_join(
        edges.map_batches(_direct, batch_format="pyarrow"),
        deg.map_batches(
            lambda t: pa.table({"node": t["node"], "sdeg": t["deg"]}),
            batch_format="pyarrow"),
        "src", "node",
        pa.schema([("src", pa.string()), ("dst", pa.string())]),
        pa.schema([("node", pa.string()), ("sdeg", pa.int64())]),
        num_buckets=num_buckets,
    ).materialize()

    pr = deg.map_batches(
        lambda t: pa.table({
            "node": t["node"],
            "pr": pa.array(np.full(t.num_rows, pr0, dtype=np.int64)),
        }),
        batch_format="pyarrow")

    def _share_partial(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select(["dst", "sdeg", "pr"]))
        out = (
            df.with_columns(share=pl.col("pr") // pl.col("sdeg"))
            .group_by("dst").agg(s=pl.col("share").sum().cast(pl.Int64))
        )
        return out.to_arrow().cast(
            pa.schema([("dst", pa.string()), ("s", pa.int64())]))

    for _ in range(int(n_iter)):
        joined = bucket_join(
            dedges, pr, "src", "node",
            pa.schema([("src", pa.string()), ("dst", pa.string()),
                       ("sdeg", pa.int64())]),
            pa.schema([("node", pa.string()), ("pr", pa.int64())]),
            num_buckets=num_buckets,
        )
        pr = (
            joined.map_batches(_share_partial, batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("s", alias_name="s_sum"))
            .map_batches(
                lambda t: pa.table({
                    "node": t["dst"],
                    "pr": pc.add(
                        pc.divide(
                            pc.multiply(t["s_sum"].cast(pa.int64()),
                                        pa.scalar(85, pa.int64())),
                            pa.scalar(100, pa.int64())),
                        pa.scalar(base, pa.int64())),
                }),
                batch_format="pyarrow")
        )

    return pr.map_batches(
        lambda t: pa.table({"conv_id": t["node"],
                            "pr": t["pr"].cast(pa.int64())}),
        batch_format="pyarrow")


def kcore_stationary(edges, k: int = 2, rounds: int = 3,
                     num_buckets: int = 32):
    """Distributed k-core peeling over an undirected edge table →
    (conv_id, core_deg): the nodes surviving ``rounds`` synchronous
    peels (each peel removes every node whose degree in the current
    subgraph is < k), with their degree in the final induced subgraph.
    Fixed-round semantics ON PURPOSE: the unrolled SQL twin replays the
    exact same rounds, so the result is value-checkable rather than
    convergence-dependent (k-core converges in a few rounds on
    short-diameter match graphs; callers needing the fixpoint raise
    ``rounds``).

    Scale shape — iterate-over-stationary-data like
    :func:`pagerank_stationary`: each undirected edge is materialized
    once in BOTH endpoint owners' buckets (hash(src), one edge-width
    exchange at build). Per round, bucket b computes its owned nodes'
    degrees LOCALLY (every incident edge is resident by construction),
    peels, and notifies the mirror copies: the only shuffled payload is
    (other, dead) drop pairs for edges incident to nodes that died this
    round — a volume that telescopes to at most 2|E| over ALL rounds
    combined. Every step is a count/filter, so outputs are
    order-independent and bit-exact under any partitioning."""
    import ray

    B = max(2, int(num_buckets))
    KK = int(k)

    @ray.remote
    def _split_edges(t: pa.Table):
        df = pl.from_arrow(t.select(["a_id", "b_id"]))
        de = pl.concat([
            df.select(src=pl.col("a_id"), dst=pl.col("b_id")),
            df.select(src=pl.col("b_id"), dst=pl.col("a_id")),
        ]).with_columns(b=(pl.col("src").hash(seed=61)
                           % np.uint64(B)).cast(pl.Int32))
        parts = de.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), de.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    _EMPTY_E = pa.table({"src": pa.array([], pa.string()),
                         "dst": pa.array([], pa.string())})

    @ray.remote
    def _build_bucket(*parts):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            return _EMPTY_E, pa.table({"node": pa.array([], pa.string())})
        de = pl.from_arrow(pa.concat_tables(tabs))
        nodes = de.select(node=pl.col("src")).unique()
        return de.to_arrow(), nodes.to_arrow()

    @ray.remote
    def _round_map(my_b: int, edge_t: pa.Table, node_t: pa.Table):
        """Peel once: emit B payloads (drop pairs routed to the mirror
        copy's owner; ONLY the self-routed payload carries the
        locally-updated state — shipping it in every slice would copy
        the edge table B times)."""
        ed = pl.from_arrow(edge_t)
        nd = pl.from_arrow(node_t)
        deg = ed.group_by("src").agg(d=pl.len().cast(pl.Int64))
        nd2 = nd.join(deg.rename({"src": "node"}), on="node", how="left"
                      ).with_columns(d=pl.col("d").fill_null(0))
        dead = nd2.filter(pl.col("d") < KK).select("node")
        alive_nodes = nd2.filter(pl.col("d") >= KK).select("node")
        dying_edges = ed.join(dead.rename({"node": "src"}), on="src",
                              how="semi")
        new_edges = ed.join(dead.rename({"node": "src"}), on="src",
                            how="anti")
        # notify owner(other): drop the mirror copy (other, dead)
        drops = dying_edges.select(
            src=pl.col("dst"), dst=pl.col("src")
        ).with_columns(b=(pl.col("src").hash(seed=61)
                          % np.uint64(B)).cast(pl.Int32))
        parts = drops.partition_by("b", as_dict=True, include_key=False)
        ne, an = new_edges.to_arrow(), alive_nodes.to_arrow()
        return tuple(
            (parts.get((b,), drops.clear().drop("b")).to_arrow(),
             ne if b == my_b else None, an if b == my_b else None)
            for b in range(B)
        )

    @ray.remote
    def _round_reduce(b: int, *payloads):
        """Apply every bucket's drop notifications to this bucket's
        locally-updated state."""
        _, new_edges, alive_nodes = payloads[b]
        drops = [p[0] for p in payloads if p[0].num_rows]
        ed = pl.from_arrow(new_edges)
        if drops:
            dd = pl.from_arrow(pa.concat_tables(drops))
            ed = ed.join(dd, on=["src", "dst"], how="anti")
        return ed.to_arrow(), alive_nodes

    @ray.remote
    def _final(edge_t: pa.Table, node_t: pa.Table) -> pa.Table:
        ed = pl.from_arrow(edge_t)
        nd = pl.from_arrow(node_t)
        deg = ed.group_by("src").agg(
            core_deg=pl.len().cast(pl.Int64)).rename({"src": "node"})
        out = nd.join(deg, on="node", how="left").with_columns(
            core_deg=pl.col("core_deg").fill_null(0))
        return out.rename({"node": "conv_id"}).to_arrow().cast(
            pa.schema([("conv_id", pa.string()),
                       ("core_deg", pa.int64())]))

    import ray.data as rd

    blocks = edges.select_columns(["a_id", "b_id"]).to_arrow_refs()
    if not blocks:
        return rd.from_arrow(pa.table({"conv_id": pa.array([], pa.string()),
                                       "core_deg": pa.array([], pa.int64())}))
    split = [_split_edges.options(num_returns=B).remote(r) for r in blocks]
    built = [
        _build_bucket.options(num_returns=2).remote(
            *[split[m][b] for m in range(len(split))])
        for b in range(B)
    ]
    edge_refs = [t[0] for t in built]
    node_refs = [t[1] for t in built]

    for _ in range(int(rounds)):
        partials = [
            _round_map.options(num_returns=B).remote(b, edge_refs[b],
                                                     node_refs[b])
            for b in range(B)
        ]
        states = [
            _round_reduce.options(num_returns=2).remote(
                b, *[partials[m][b] for m in range(B)])
            for b in range(B)
        ]
        edge_refs = [s[0] for s in states]
        node_refs = [s[1] for s in states]

    return rd.from_arrow_refs(
        [_final.remote(edge_refs[b], node_refs[b]) for b in range(B)]
    )
