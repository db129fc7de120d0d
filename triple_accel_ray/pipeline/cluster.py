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

from typing import Dict

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
):
    """edges (a_id, b_id) + nodes (conv_id) → (conv_id, cluster_id).

    ``nodes`` must contain every conv_id (singletons keep their own id).
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
            break
        prev_sum = new_sum

    return labels.map_batches(
        lambda t: pa.table({"conv_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


def connected_components_local(
    edges_table: pa.Table, all_nodes: pa.Table
) -> pa.Table:
    """Driver-side union-find (small graphs only: tests, oracles, and the
    documented small-edge-set shortcut)."""
    parent: Dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(x: str, y: str) -> None:
        rx, ry = find(x), find(y)
        if rx != ry:
            # keep the lexicographically smaller root → min-id cluster ids
            if ry < rx:
                rx, ry = ry, rx
            parent[ry] = rx

    a_col = edges_table["a_id"].to_pylist()
    b_col = edges_table["b_id"].to_pylist()
    for a, b in zip(a_col, b_col):
        union(a, b)

    ids = all_nodes["conv_id"].to_pylist()
    clusters = [find(i) for i in ids]
    return pa.table(
        {
            "conv_id": pa.array(ids, pa.string()),
            "cluster_id": pa.array(clusters, pa.string()),
        }
    )
