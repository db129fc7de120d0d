"""Stage 5: match edges → transitive clusters (connected components).

Distributed path (default): iterative min-label propagation until fixpoint,
expressed entirely in Ray Data — per iteration one hash join (edges ⋈
labels, Ray's hash-shuffle ``Dataset.join``) and one ``groupby(node).min``
— no driver-held graph state. Convergence is detected by a 64-bit
order-independent checksum of the label assignment (labels only ever
decrease, so an unchanged checksum is a fixpoint). Iterations are bounded
by the component diameter; duplicate-cluster graphs are shallow
(star-like), so a handful of rounds suffice.

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


def connected_components(
    edges,
    nodes,
    num_partitions: int = 32,
    max_iters: int = 25,
    on_nonconverge: str = "warn",
):
    """edges (a_id, b_id) + nodes (conv_id) → (conv_id, cluster_id).

    ``nodes`` must contain every conv_id (singletons keep their own id).

    Labels propagate one hop per iteration, so convergence needs up to
    the component diameter iterations; if the fixpoint is NOT reached in
    ``max_iters`` the labels are stale (a component can keep >1 label).
    ``on_nonconverge``: "warn" (default — print and return the stale
    labels, the ER pipeline's historical behavior) or "raise" for callers
    whose contract is exact transitive collapse (e.g. dedup survivors).
    """
    import ray

    # symmetric neighbor list: (node, nbr)
    def _sym(t: pa.Table) -> pa.Table:
        fwd = pa.table({"node": t["a_id"], "nbr": t["b_id"]})
        rev = pa.table({"node": t["b_id"], "nbr": t["a_id"]})
        return pa.concat_tables([fwd, rev])

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

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
                          max_iters: int = 25):
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
    )

    renew = connected_components(
        rec_edges, rec_nodes, num_partitions=num_partitions,
        max_iters=max_iters,
    )
    return untouched.union(renew)
