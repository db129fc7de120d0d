"""Stage 5: match edges → transitive clusters (connected components).

Distributed path (default, round-4 stationary engine): per-block
pre-contraction to star edges, then min-label propagation over
hash-partitioned RESIDENT buckets — per iteration each bucket joins its
own edges against its own label slice locally and ships only
(destination, min label) id-width messages, followed by a
pointer-jumping exchange (label ← min(label, label[label])) that closes
deep components in O(log diameter) rounds. Convergence is exact: a
propagate round in which zero labels decreased is a fixpoint (labels
equal across every edge force one constant per component, necessarily
the min member id). Measured sf1.0 (381k edges): 2.4 s vs 27-31 s for
the per-iteration Dataset-join formulation, which is kept as
``connected_components_dataset`` for differential testing.

Local path: driver-side union-find for edge sets below a configured cap —
used by tests/oracles and as the small-graph shortcut, never for scale.

cluster_id = min conv_id of the component (deterministic, shuffle-proof).
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa

from ray.data.aggregate import Min, Sum


def _label_checksum_batch(batch: pa.Table) -> pa.Table:
    df = pl.from_arrow(batch)
    h = (
        (df["node"].hash(seed=11) ^ df["label"].hash(seed=12))
        .cast(pl.UInt64)
        .sum()
    )
    return pa.table({"checksum": pa.array([int(h or 0) & ((1 << 64) - 1)], pa.uint64())})


def _checksum(labels) -> int:
    part = labels.map_batches(_label_checksum_batch, batch_format="pyarrow")
    total = 0
    for row in part.iter_rows():
        total = (total + row["checksum"]) & ((1 << 64) - 1)
    return total


def _contract_block(t: pa.Table) -> pa.Table:
    """Local pre-contraction of one edge block: vectorized hash-to-min
    with pointer jumping (O(log n) numpy passes, no Python union-find
    loop) collapses the block's edges to min-label STAR edges
    (node <-> local component root, both directions). Replacing a
    block's edges with its local spanning stars preserves global
    connectivity exactly (a node appearing in two blocks bridges its
    two local roots) and flattens local chains to depth-1, so the
    global fixpoint converges in hops over BLOCKS, not over edges —
    measured sf1.0: 6+ iterations -> 2."""
    a = t["a_id"].to_numpy(zero_copy_only=False)
    b = t["b_id"].to_numpy(zero_copy_only=False)
    if len(a) == 0:
        e = pa.array([], pa.string())
        return pa.table({"node": e, "nbr": e})
    uniq, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ia, ib = inv[: len(a)], inv[len(a):]
    # np.unique sorts, so smaller index == lexicographically smaller
    # conv_id: min-index root == min-conv_id root (the cluster_id rule)
    lab = np.arange(len(uniq))
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, ia, lab[ib])
        np.minimum.at(nxt, ib, lab[ia])
        nxt = nxt[nxt]                         # pointer jump
        if (nxt == lab).all():
            break
        lab = nxt
    root = uniq[lab]
    keep = lab != np.arange(len(uniq))         # drop self-stars
    fwd = pa.table({"node": pa.array(uniq[keep]),
                    "nbr": pa.array(root[keep])})
    rev = pa.table({"node": pa.array(root[keep]),
                    "nbr": pa.array(uniq[keep])})
    return pa.concat_tables([fwd, rev])


def connected_components(
    edges,
    nodes,
    num_partitions: int = 32,
    max_iters: int = 25,
    on_nonconverge: str = "warn",
    stats: dict | None = None,
):
    """edges (a_id, b_id) + nodes (conv_id) → (conv_id, cluster_id).

    ``nodes`` must contain every conv_id (singletons keep their own id).

    Round-4 STATIONARY engine (the pagerank_stationary shape —
    ops/graph.py measured it 7.2x over per-iteration Dataset joins, and
    the Dataset twin of THIS function measured 11-13 s per iteration at
    sf1.0 against sub-second here): edge blocks are locally
    pre-contracted to star edges (:func:`_contract_block`), then
    hash(node)-partitioned ONCE into per-bucket Arrow tables that stay
    in the object store; per iteration each bucket joins its resident
    edges against its resident label slice locally and ships only
    (nbr, min label) id-width messages to the owning buckets.
    Convergence is exact — the per-bucket reduce reports how many
    labels decreased; zero changes across all buckets is the fixpoint
    (no checksum pass). Labels only ever decrease, and the min is
    lexicographic on conv_id, so cluster_id = min conv_id of the
    component, identical to the Dataset twin
    (:func:`connected_components_dataset`, kept for differential
    tests) and to :func:`connected_components_local`.

    Labels propagate one hop per iteration, so convergence needs up to
    the CONTRACTED component diameter iterations; if the fixpoint is
    NOT reached in ``max_iters`` the labels are stale (a component can
    keep >1 label). ``on_nonconverge``: "warn" (default — print and
    return the stale labels, the ER pipeline's historical behavior) or
    "raise" for callers whose contract is exact transitive collapse
    (e.g. dedup survivors)."""
    # stats (optional dict, filled in place): per-iteration telemetry —
    # "propagate_msg_rows" / "jump_msg_rows" (total message rows shipped
    # between buckets that round) and "changed" (labels that decreased).
    # The message volume telescopes: after pre-contraction each round
    # ships at most one (nbr, min) row per resident edge endpoint, and
    # once a region stabilizes its minima stop changing, so volumes
    # shrink toward the fixpoint — the bound the 100 TB design relies
    # on, now measurable (round-5 soak artifact).
    import ray
    import ray.data as rd

    B = max(2, int(num_partitions))
    SEED = 71

    def _empty_split(cols):
        z = pa.table({c: pa.array([], pa.string()) for c in cols})
        return tuple(z for _ in range(B))

    @ray.remote
    def _split_edges(t: pa.Table):
        # empty upstream blocks (e.g. an empty bucket_join output) can
        # carry an EMPTY schema — treat them as no edges
        if t.num_rows == 0 or "a_id" not in t.schema.names:
            return _empty_split(["node", "nbr"])
        sym = _contract_block(t)
        df = pl.from_arrow(sym).with_columns(
            b=(pl.col("node").hash(seed=SEED) % np.uint64(B)).cast(pl.Int32))
        parts = df.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), df.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    @ray.remote
    def _split_nodes(t: pa.Table):
        if t.num_rows == 0 or "conv_id" not in t.schema.names:
            return _empty_split(["node"])
        df = pl.from_arrow(t.select(["conv_id"])).rename(
            {"conv_id": "node"}).with_columns(
            b=(pl.col("node").hash(seed=SEED) % np.uint64(B)).cast(pl.Int32))
        parts = df.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), df.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    @ray.remote
    def _build_edges(*parts):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            e = pa.array([], pa.string())
            return pa.table({"node": e, "nbr": e})
        return pa.concat_tables(tabs)

    @ray.remote
    def _init_labels(*parts):
        tabs = [p for p in parts if p.num_rows]
        if not tabs:
            e = pa.array([], pa.string())
            return pa.table({"node": e, "label": e,
                             "dirty": pa.array([], pa.bool_())})
        df = pl.from_arrow(pa.concat_tables(tabs)).unique("node")
        return df.select("node", label=pl.col("node"),
                         dirty=pl.lit(True)).to_arrow()

    @ray.remote
    def _iter_map(edge_t: pa.Table, lab_t: pa.Table):
        """One bucket's propagate pass: local join (all edge ``node``s
        hash here by construction), min per destination, split by the
        destination's owning bucket — the only shuffled payload.

        DELTA propagation (round 5): only DIRTY sources — nodes whose
        label decreased since their last emission — send. Min-label
        propagation is monotone, so an unchanged source's messages are
        identical to ones the destination already folded in; skipping
        them cannot lose a minimum. This is what makes per-iteration
        shuffle volume track the shrinking changed set (telescope)
        instead of staying O(edges) every round — the round-5 big soak
        measured the non-delta engine shipping a constant 4.4M
        rows/iteration for 16 rounds on a 2.28M-edge graph."""
        if edge_t.num_rows == 0:
            z = pa.table({"nbr": pa.array([], pa.string()),
                          "ml": pa.array([], pa.string())})
            return tuple(z for _ in range(B))
        ed = pl.from_arrow(edge_t)
        lb = pl.from_arrow(lab_t).filter(pl.col("dirty"))
        out = (
            ed.join(lb.select("node", "label"), on="node", how="inner")
            .group_by("nbr").agg(ml=pl.col("label").min())
            .with_columns(b=(pl.col("nbr").hash(seed=SEED)
                             % np.uint64(B)).cast(pl.Int32))
        )
        parts = out.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), out.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    def _make_reduce(keep_dirty: bool):
        @ray.remote(num_returns=3)
        def _iter_reduce(lab_t: pa.Table, *msg_parts):
            """Merge inbound minima into the resident label slice;
            returns (new labels, #labels that decreased, #inbound
            message rows) — exact convergence signal plus
            shuffle-volume telemetry. ``dirty`` marks labels that
            decreased and still owe a propagate emission: the
            propagate reduce REPLACES it (an emission just consumed
            the old flag), the jump reduce ORs into it (jump changes
            happen between emissions and must not clear a pending
            one)."""
            n_msg = sum(p.num_rows for p in msg_parts)
            tabs = [p for p in msg_parts if p.num_rows]
            if not tabs or lab_t.num_rows == 0:
                if lab_t.num_rows and not keep_dirty:
                    lab_t = (
                        pl.from_arrow(lab_t)
                        .with_columns(dirty=pl.lit(False)).to_arrow())
                return lab_t, 0, n_msg
            msg = (
                pl.from_arrow(pa.concat_tables(tabs))
                .group_by("nbr").agg(ml=pl.col("ml").min())
                .rename({"nbr": "node"})
            )
            j = pl.from_arrow(lab_t).join(msg, on="node", how="left")
            dec = pl.col("ml").is_not_null() & (pl.col("ml")
                                                < pl.col("label"))
            new = j.select(
                "node",
                label=pl.min_horizontal("label", "ml"),  # null ml -> label
                dirty=(pl.col("dirty") | dec) if keep_dirty else dec,
            )
            changed = int((new["label"] != j["label"]).sum())
            return new.to_arrow(), changed, n_msg
        return _iter_reduce

    _reduce_propagate = _make_reduce(keep_dirty=False)
    _reduce_jump = _make_reduce(keep_dirty=True)

    # ---- pointer-jumping round (label <- label[label]) --------------
    # One edge hop per iteration makes min-label O(diameter); composing
    # each hop with a pointer jump makes it O(log diameter) — the
    # classic shortcutting step, done as its own (query, answer, apply)
    # exchange over the SAME stationary buckets. Deep components (long
    # chains) exist at 100 TB even when duplicate clusters are shallow.

    @ray.remote
    def _jump_query(lab_t: pa.Table):
        """(node, label) -> per-owner (lq = label, node) queries, keyed
        by hash(label): ask the bucket owning my label for ITS label.
        Self-labeled nodes (label == node) resolve locally — skip."""
        if lab_t.num_rows == 0:
            z = pa.table({"lq": pa.array([], pa.string()),
                          "node": pa.array([], pa.string())})
            return tuple(z for _ in range(B))
        df = (
            pl.from_arrow(lab_t)
            .filter(pl.col("dirty") & (pl.col("label") != pl.col("node")))
            .select(lq=pl.col("label"), node=pl.col("node"))
            .with_columns(b=(pl.col("lq").hash(seed=SEED)
                             % np.uint64(B)).cast(pl.Int32))
        )
        parts = df.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), df.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    @ray.remote
    def _jump_answer(lab_t: pa.Table, *q_parts):
        """Resolve label(lq) from the resident slice and route the
        answer back to the querying node's owner bucket."""
        tabs = [p for p in q_parts if p.num_rows]
        if not tabs or lab_t.num_rows == 0:
            z = pa.table({"nbr": pa.array([], pa.string()),
                          "ml": pa.array([], pa.string())})
            return tuple(z for _ in range(B))
        q = pl.from_arrow(pa.concat_tables(tabs))
        lb = pl.from_arrow(lab_t).rename({"node": "lq", "label": "ml"})
        out = (
            q.join(lb, on="lq", how="inner")
            .select(nbr=pl.col("node"), ml=pl.col("ml"))
            .with_columns(b=(pl.col("nbr").hash(seed=SEED)
                             % np.uint64(B)).cast(pl.Int32))
        )
        parts = out.partition_by("b", as_dict=True, include_key=False)
        return tuple(
            parts.get((b,), out.clear().drop("b")).to_arrow()
            for b in range(B)
        )

    e_splits = [_split_edges.options(num_returns=B).remote(r)
                for r in edges.to_arrow_refs()]
    n_splits = [_split_nodes.options(num_returns=B).remote(r)
                for r in nodes.to_arrow_refs()]
    if not n_splits:
        return rd.from_arrow(pa.table({"conv_id": pa.array([], pa.string()),
                                       "cluster_id": pa.array([], pa.string())}))
    if not e_splits:
        eb = [_build_edges.remote() for _ in range(B)]
    else:
        eb = [_build_edges.remote(*[s[b] for s in e_splits])
              for b in range(B)]
    lb = [_init_labels.remote(*[s[b] for s in n_splits]) for b in range(B)]

    if stats is not None:
        stats.setdefault("propagate_msg_rows", [])
        stats.setdefault("jump_msg_rows", [])
        stats.setdefault("changed", [])
    converged = False
    for _ in range(max_iters):
        # propagate: one edge hop
        msgs = [_iter_map.options(num_returns=B).remote(eb[b], lb[b])
                for b in range(B)]
        outs = [_reduce_propagate.remote(
                    lb[b], *[msgs[m][b] for m in range(B)])
                for b in range(B)]
        lb = [o[0] for o in outs]
        changed = sum(ray.get([o[1] for o in outs]))
        if stats is not None:
            stats["propagate_msg_rows"].append(
                sum(ray.get([o[2] for o in outs])))
            stats["changed"].append(changed)
        if changed == 0:
            # a propagate fixpoint alone proves full convergence: equal
            # labels across every edge (both directions are present)
            # force one constant per component, and that constant can
            # only be the min member id — skip the final jump exchange
            converged = True
            break
        # shortcut: label <- min(label, label[label]) — pointer jump
        qs = [_jump_query.options(num_returns=B).remote(lb[b])
              for b in range(B)]
        ans = [_jump_answer.options(num_returns=B).remote(
                   lb[b], *[qs[m][b] for m in range(B)])
               for b in range(B)]
        outs = [_reduce_jump.remote(lb[b], *[ans[m][b] for m in range(B)])
                for b in range(B)]
        lb = [o[0] for o in outs]
        if stats is not None:
            stats["jump_msg_rows"].append(
                sum(ray.get([o[2] for o in outs])))
        # jump changes don't gate exit: convergence is only declared by
        # a zero-change PROPAGATE round (see proof above)

    if not converged:
        msg = (f"connected_components: no fixpoint after {max_iters} "
               f"iterations — a component's diameter exceeds the bound "
               f"and its labels are stale (multiple labels may remain); "
               f"raise max_iters")
        if on_nonconverge == "raise":
            raise RuntimeError(msg)
        import sys

        print(f"[cluster] WARNING: {msg}", file=sys.stderr)

    return rd.from_arrow_refs(lb).map_batches(
        lambda t: pa.table({"conv_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def connected_components_dataset(
    edges,
    nodes,
    num_partitions: int = 32,
    max_iters: int = 25,
    on_nonconverge: str = "warn",
):
    """Dataset-API twin of :func:`connected_components` (per-iteration
    bucket_join + groupby-min, convergence by label checksum) — kept as
    the differential reference: every Dataset join re-shuffles both
    sides each iteration, which measured 11-13 s per iteration at sf1.0
    vs sub-second for the stationary engine.
    """
    import ray

    sym = edges.map_batches(_contract_block,
                            batch_format="pyarrow").materialize()

    labels = nodes.map_batches(
        lambda t: pa.table({"node": t["conv_id"], "label": t["conv_id"]}),
        batch_format="pyarrow",
    ).materialize()

    from .shuffle import bucket_join

    sym_schema = pa.schema([("node", pa.string()), ("nbr", pa.string())])
    lab_schema = pa.schema([("lnode", pa.string()), ("label", pa.string())])

    converged = False
    prev_sum = _checksum(labels)
    for it in range(max_iters):
        # neighbor labels: bucket_join sym.nbr == labels.node — the same
        # partitioned hash join as every other stage (the built-in
        # Dataset.join spawns per-partition aggregator actors, a poor fit
        # repeated once per fixpoint iteration; see shuffle.py)
        lab_renamed = labels.map_batches(
            lambda t: pa.table({"lnode": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        msgs = bucket_join(
            sym, lab_renamed,
            left_key="nbr", right_key="lnode",
            left_schema=sym_schema, right_schema=lab_schema,
            num_buckets=num_partitions,
        ).map_batches(
            lambda t: pa.table({"node": t["node"], "label": t["label"]}),
            batch_format="pyarrow",
        )
        new_labels = (
            msgs.union(labels)
            .groupby("node")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        new_sum = _checksum(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum

    if not converged:
        msg = (f"connected_components: no fixpoint after {max_iters} "
               f"iterations — a component's diameter exceeds the bound "
               f"and its labels are stale (multiple labels may remain); "
               f"raise max_iters")
        if on_nonconverge == "raise":
            raise RuntimeError(msg)
        import sys

        print(f"[cluster] WARNING: {msg}", file=sys.stderr)

    return labels.map_batches(
        lambda t: pa.table({"conv_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def connected_components_local(
    edges_table: pa.Table, all_nodes: pa.Table
) -> pa.Table:
    """Driver-side connected components (small graphs only: tests, oracles,
    and the documented small-edge-set shortcut). Vectorized min-label
    propagation with pointer jumping — ``np.unique`` sorts, so integer
    label minimum == lexicographically-smallest conv_id, matching the
    distributed fixpoint's min-id cluster semantics (the former dict
    union-find cost ~1.3 s of driver-serial time at sf0.4)."""
    import pyarrow.compute as pc

    n_nodes = all_nodes.num_rows
    n_edges = edges_table.num_rows
    # integer codes via arrow dictionary encoding (native string hashing —
    # to_numpy on strings yields python-object arrays whose sort/search is
    # the slow path)
    pool = pa.chunked_array(
        [
            all_nodes["conv_id"].combine_chunks(),
            edges_table["a_id"].combine_chunks(),
            edges_table["b_id"].combine_chunks(),
        ]
    ).combine_chunks()
    codes = pc.dictionary_encode(pool)
    idx = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    n_ids = len(codes.dictionary)
    ni = idx[:n_nodes]
    ai = idx[n_nodes : n_nodes + n_edges]
    bi = idx[n_nodes + n_edges :]
    lab = np.arange(n_ids, dtype=np.int64)
    while True:
        prev = lab
        lab = lab.copy()
        m = np.minimum(lab[ai], lab[bi])
        np.minimum.at(lab, ai, m)
        np.minimum.at(lab, bi, m)
        # pointer jumping: compress chains to their current minimum
        while True:
            nxt = lab[lab]
            if np.array_equal(nxt, lab):
                break
            lab = nxt
        if np.array_equal(lab, prev):
            break
    # cluster_id = lexicographically smallest member conv_id (the integer
    # roots are dictionary-order, i.e. arbitrary): per-root string min over
    # the id dictionary, vectorized in polars
    memb = pl.DataFrame(
        {
            "id_str": pl.from_arrow(codes.dictionary),
            "root": lab,
        }
    )
    root_min = memb.group_by("root").agg(pl.col("id_str").min())
    # map each root to its min-id string, then gather per node
    lookup = np.empty(n_ids, dtype=np.int64)
    lookup[root_min["root"].to_numpy()] = np.arange(len(root_min))
    cluster = root_min["id_str"].to_arrow().take(
        pa.array(lookup[lab[ni]], pa.int64())
    )
    return pa.table(
        {
            "conv_id": all_nodes["conv_id"].combine_chunks(),
            "cluster_id": cluster.cast(pa.string()),
        }
    )


def clusters_after_delete(edges, nodes, deleted, num_partitions: int = 32,
                          max_iters: int = 25,
                          local_edge_cap: int = 2_000_000):
    """Delete propagation WITHOUT a full recluster → (conv_id,
    cluster_id) over the surviving nodes: clusters containing no deleted
    member pass through untouched (removing nodes elsewhere cannot
    change a component or its min-label id); only the clusters that lost
    a member re-run connected components, on their own induced subgraph.

    At 100 TB this is the cluster-maintenance shape: the recompute cost
    scales with the AFFECTED clusters (deleted-adjacent data), not the
    corpus. All set logic is id-width bucket semi/anti joins; nothing
    texty moves.

    ``edges``/``nodes`` are the full pre-delete graph; ``deleted`` is a
    dataset of conv_id."""
    import pyarrow.compute as pc

    from .shuffle import bucket_join

    _id = pa.schema([("conv_id", pa.string())])
    _cl = pa.schema([("conv_id", pa.string()), ("cluster_id", pa.string())])
    _key = pa.schema([("cluster_id", pa.string())])
    _es = pa.schema([("a_id", pa.string()), ("b_id", pa.string())])

    old = connected_components(
        edges, nodes, num_partitions=num_partitions, max_iters=max_iters,
    ).materialize()

    # clusters that lost a member
    aff = bucket_join(
        old, deleted, "conv_id", "conv_id", _cl, _id,
        num_buckets=num_partitions, how="semi",
    ).map_batches(
        lambda t: pa.table({"cluster_id": pc.unique(t["cluster_id"])}),
        batch_format="pyarrow",
    )

    untouched = bucket_join(
        old, aff, "cluster_id", "cluster_id", _cl, _key,
        num_buckets=num_partitions, how="anti",
    )

    # surviving members of affected clusters = the recompute node set
    rec_nodes = bucket_join(
        bucket_join(old, aff, "cluster_id", "cluster_id", _cl, _key,
                    num_buckets=num_partitions, how="semi"),
        deleted, "conv_id", "conv_id", _cl, _id,
        num_buckets=num_partitions, how="anti",
    ).map_batches(
        lambda t: pa.table({"conv_id": t["conv_id"]}),
        batch_format="pyarrow",
    ).materialize()

    rec_edges = bucket_join(
        bucket_join(edges, rec_nodes, "a_id", "conv_id", _es, _id,
                    num_buckets=num_partitions, how="semi"),
        rec_nodes, "b_id", "conv_id", _es, _id,
        num_buckets=num_partitions, how="semi",
    ).materialize()

    # same discipline as run.py's cluster stage: the recompute subgraph
    # is affected-clusters-sized (id pairs only), so below the cap the
    # driver union-find shortcut is valid and skips the fixpoint's task
    # waves; above it the stationary engine carries it
    if rec_edges.count() <= local_edge_cap:
        import ray
        import ray.data as rd

        et = [t for t in ray.get(rec_edges.to_arrow_refs()) if t.num_rows]
        nt = [t for t in ray.get(rec_nodes.to_arrow_refs()) if t.num_rows]
        if not nt:
            renew = rd.from_arrow(_cl.empty_table())
        else:
            renew = rd.from_arrow(connected_components_local(
                pa.concat_tables(et) if et else _es.empty_table(),
                pa.concat_tables(nt)))
    else:
        renew = connected_components(
            rec_edges, rec_nodes, num_partitions=num_partitions,
            max_iters=max_iters,
        )
    return untouched.union(renew)
