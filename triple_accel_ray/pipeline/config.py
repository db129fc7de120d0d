"""Pipeline configuration. One dataclass, explicit knobs for every stage.

Scale notes are inline: every default is chosen to hold at 100 TB /
multi-node (block-size caps bound the quadratic pair stage; bucket counts
size the shuffles; batch sizes bound per-task memory).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..kernels.types import EditCosts, LEVENSHTEIN_COSTS


@dataclass
class PipelineConfig:
    # --- doc building -----------------------------------------------------
    # CAP on hash buckets for the conv_id shuffle. Since the bucketed
    # shuffles run as sort-with-explicit-boundaries
    # (shuffle.bucket_partition), the bucket count is ALSO the
    # reduce-partition count and therefore the task granularity of every
    # stage fused after the shuffle, so run.py scales the effective count
    # with the input (~8k turns per bucket, floor = cluster CPUs, this
    # cap). At 100 TB raise the cap so buckets stay ~10k rows.
    doc_buckets: int = 512

    # --- blocking ---------------------------------------------------------
    minhash_perms: int = 32
    minhash_bands: int = 16  # rows per band = perms // bands
    shingle_size: int = 5
    blocking_seed: int = 7
    len_band_width: int = 32  # signature-key length bucket width (bytes)
    # keyer execution: STATELESS tasks. Round 2 ran this as an autoscaling
    # (1, 64) actor pool for scratch reuse and regressed the stage ~3x at
    # sf0.1 (VERDICT r2); the round-3 in-pipeline A/B on the same docs
    # measured actor pool (1,64) = 3.98s vs stateless = 1.29s at 32 CPUs —
    # the pool ramps from 1 actor while stateless tasks fan out to every
    # core immediately, and the keyer is cheap to construct. None = tasks.
    block_concurrency: tuple | None = None
    # per-task keyer batch rows: None = one batch per input block (the
    # fast path — an explicit batch_size makes Ray re-bundle blocks, which
    # measured 5-8x slower on this stage at sf0.1). Set only when input
    # blocks are tiny (dedup over one small file) or huge (>~30k rows,
    # where the keyer's window working set goes superlinear)
    block_batch_rows: int | None = None

    # --- pair generation --------------------------------------------------
    # like doc_buckets, a CAP: the pair shuffles' reducer count is ALSO the
    # scoring stage's task granularity (the scorer fuses onto the pair-
    # dedup reduce partitions), and the scorer is the pipeline's compute
    # peak. Measured both failure modes of a FIXED count: 32 buckets at
    # sf0.4/16cpu ran the scorer as 15 tasks of 9-26 s (230 core-s total;
    # stage wall = the longest task), while 128 buckets at sf0.1/32cpu
    # added ~1.3 s of per-reducer overhead (300-row buckets). run.py
    # scales the effective count: ~1.5k docs per bucket, floor = cluster
    # CPUs, this cap.
    pair_buckets: int = 512
    # blocks larger than this switch from all-pairs to sorted-neighborhood
    # (explicit skew control; a hot block of n docs emits O(n*window) pairs
    # instead of O(n^2))
    hot_block_cap: int = 64
    hot_block_window: int = 8

    # --- text attachment --------------------------------------------------
    # when the docs table fits under this many bytes it is broadcast once
    # (ray.put) and the scorer resolves texts by lookup — no join shuffles;
    # larger corpora use the two bucketed hash joins (the 100TB path)
    broadcast_text_max_bytes: int = 2 << 30

    # --- scoring ----------------------------------------------------------
    rel_k: float = 0.15  # per-pair bound: k = clip(rel_k * max_len, ...)
    abs_min_k: int = 4
    abs_max_k: int = 128
    costs: EditCosts = field(default_factory=lambda: LEVENSHTEIN_COSTS)
    score_batch_size: int = 512
    # adaptive scoring batches: the scorer chunks each batch by W =
    # ceil(len/64) before the kernel, and small batches fragment into tiny
    # W-groups that are pure numpy-dispatch overhead (measured single-core
    # on the sf0.1 pair mix: 62.7 core-s at bs=512 vs 51.0 at bs=8192).
    # When the pair count is known (checkpointed path: pairs manifest) or
    # estimable (fused path: doc count; pairs/doc ≈ 0.9 on transcript
    # corpora), grow the batch toward score_batch_max while keeping >= 4
    # batches per CPU so no core starves. score_batch_size stays the floor
    # (and the exact size used when adaptivity is off or counts unknown).
    score_batch_adaptive: bool = True
    score_batch_max: int = 8192
    score_concurrency: int | tuple | None = None  # None → stateless tasks
    # match decision: dist within k AND normalized similarity above this
    min_similarity: float = 0.85

    # --- clustering -------------------------------------------------------
    cluster_partitions: int = 32
    cluster_max_iters: int = 25
    # below this many edges the driver-side union-find shortcut is valid
    local_cluster_edge_cap: int = 2_000_000
