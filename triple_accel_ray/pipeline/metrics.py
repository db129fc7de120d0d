"""Pairwise precision/recall/F1 of predicted clusters vs labeled pairs.

TP = labeled positive pairs whose two conv_ids share a predicted cluster;
predicted-positive count = Σ_c C(n_c, 2) over predicted clusters. The label
table is ground truth for ALL positive pairs (FIXTURES.md §2), so
FP = predicted − TP and FN = positives − TP.

Cluster sizes and the label table are tiny relative to the corpus (clusters
output one row per conv), so this evaluation runs in polars on collected
cluster rows; at very large scale the same counts are expressible as two
Dataset joins + aggregates.
"""

from __future__ import annotations

from typing import Dict

import polars as pl
import pyarrow as pa


def pairwise_f1(clusters: pa.Table, labels: pa.Table) -> Dict[str, float]:
    cl = pl.from_arrow(clusters)
    lb = pl.from_arrow(labels.select(["a_id", "b_id"]))

    sizes = cl.group_by("cluster_id").len()
    pred_pairs = int((sizes["len"] * (sizes["len"] - 1) // 2).sum())

    cmap = cl.select(["conv_id", "cluster_id"])
    joined = (
        lb.join(cmap, left_on="a_id", right_on="conv_id", how="left")
        .rename({"cluster_id": "ca"})
        .join(cmap, left_on="b_id", right_on="conv_id", how="left")
        .rename({"cluster_id": "cb"})
    )
    tp = int((joined["ca"] == joined["cb"]).sum())
    pos = lb.height

    precision = tp / pred_pairs if pred_pairs else 1.0
    recall = tp / pos if pos else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "predicted_pairs": pred_pairs,
        "positive_pairs": pos,
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }
