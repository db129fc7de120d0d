"""End-to-end entity-resolution pipeline orchestrator.

read_parquet(transcripts)
  → build_docs          (shuffle 1: conv_id buckets)
  → build_blocks        (stateless vectorized map)
  → gen_pairs           (shuffle 2: block_key buckets, skew-capped)
  → score_pairs         (kernel hot loop, whole-batch banded DP)
  → dedup_edges         (shuffle 3: pair buckets)
  → connected_components(shuffles 4..4+r: label-propagation fixpoint)
  → clusters + metrics

Every stage checkpoints to Parquet with a manifest (checkpoint.py); a rerun
with unchanged inputs resumes after the last complete stage. Callers own the
Ray session — nothing here calls ray.init().
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Optional

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd

from .blocking import build_blocks
from .checkpoint import read_manifest, run_stage
from .cluster import connected_components, connected_components_local
from .config import PipelineConfig
from .docs import build_docs
from .metrics import pairwise_f1
from .pairs import gen_pairs
from .score import dedup_edges, score_pairs


def _fingerprint(*parts) -> str:
    h = hashlib.blake2b(digest_size=12)
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\0")
    return h.hexdigest()


def _read_dir(stage_dir: str):
    return rd.read_parquet(stage_dir)


def _read_blocks() -> int:
    """Read parallelism for the transcripts scan: ~1 block per cluster CPU.
    Measured (sf0.4, 1M rows): the docs groupby-shuffle is ~2.5x slower fed
    64 input blocks than ncpus blocks (5.9 s vs 2.2 s at 32 CPUs; the
    per-block sort-map scheduling and object churn dominate), and the cost
    is size-independent so it was the pipeline's largest FIXED serial term.
    On a real cluster this is still ~1 block per core fleet-wide."""
    import ray

    try:
        return max(8, int(ray.cluster_resources().get("CPU", 0))) or 32
    except Exception:  # pragma: no cover - no session (tests init lazily)
        return 32


def _effective_buckets(cap: int, n_rows: int, target_rows: int,
                       ncpus: int | None = None) -> int:
    """Bucket count for a shuffle feeding ~``n_rows`` rows. Because the
    bucketed shuffles run as sort-with-boundaries (shuffle.bucket_partition),
    the bucket count is ALSO the reduce-partition count and the task
    granularity of whatever stage fuses after the shuffle, so it must scale
    with the data: at least one bucket per cluster CPU (no idle cores), at
    most ``cap``, otherwise ~``target_rows`` rows per bucket. Measured both
    failure modes at sf0.4/16cpu vs sf0.1/32cpu: a fixed 32 makes the sf0.4
    scorer 15 tasks of 9-26 s (wall = longest task); a fixed 128 adds ~1.3 s
    of per-reducer overhead to the sf0.1 pairs stage (300-row buckets)."""
    if ncpus is None:
        import ray

        try:
            ncpus = int(ray.cluster_resources().get("CPU", 0)) or 32
        except Exception:  # pragma: no cover - no session
            ncpus = 32
    return int(min(cap, max(ncpus, n_rows // target_rows)))


# ~rows per bucket targets: sized so the sf0.1 headline keeps its measured
# optimum (32 buckets at 266k turns / 44k docs / 32 CPUs) and larger inputs
# grow toward cap. Pairs/doc ≈ 0.9 on transcript corpora, so doc count is
# the pair-stage row estimate.
_TURNS_PER_DOC_BUCKET = 8192
_DOCS_PER_PAIR_BUCKET = 1500


def _score_batch_size(cfg: PipelineConfig, n_pairs_est: int) -> int:
    """Scoring batch size for an (estimated) total pair count — grows
    toward cfg.score_batch_max while keeping >= 4 batches per cluster CPU
    (load balance); see PipelineConfig.score_batch_adaptive."""
    if not cfg.score_batch_adaptive:
        return cfg.score_batch_size
    import ray

    ncpus = int(ray.cluster_resources().get("CPU", 0)) or 32
    return int(
        min(
            cfg.score_batch_max,
            max(cfg.score_batch_size, n_pairs_est // (4 * ncpus)),
        )
    )


def run_er_pipeline_fused(
    transcripts_path: str,
    run_dir: str,
    cfg: Optional[PipelineConfig] = None,
    labels_path: Optional[str] = None,
) -> dict:
    """One fused streaming execution with no intermediate checkpoints:
    docs are pinned in the object store (they feed both blocking and the
    text joins); everything else streams end-to-end. This is the
    max-throughput mode — the checkpointed `run_er_pipeline` is the
    durable/resumable mode and shares every stage implementation."""
    import pyarrow.compute as _pc

    from .pairs import attach_pair_texts

    cfg = cfg or PipelineConfig()
    os.makedirs(run_dir, exist_ok=True)

    import time

    import ray

    phases: dict = {}
    t_ph = time.perf_counter()

    def _phase(name):
        nonlocal t_ph
        now = time.perf_counter()
        phases[name] = round(now - t_ph, 3)
        t_ph = now

    from .transcripts import count_rows

    # parquet metadata only — no data read
    n_turns = count_rows(transcripts_path)
    docs = build_docs(
        rd.read_parquet(
            transcripts_path, override_num_blocks=_read_blocks()
        ),
        _effective_buckets(cfg.doc_buckets, n_turns, _TURNS_PER_DOC_BUCKET),
    ).materialize()
    _phase("docs_materialize")
    blocks = build_blocks(
        docs,
        keyer_kwargs=dict(
            num_perm=cfg.minhash_perms,
            n_bands=cfg.minhash_bands,
            shingle=cfg.shingle_size,
            seed=cfg.blocking_seed,
            len_band_width=cfg.len_band_width,
        ),
        concurrency=cfg.block_concurrency,
        batch_rows=cfg.block_batch_rows,
    )
    n_docs = docs.count()  # metadata only: docs is materialized
    pairs = gen_pairs(
        blocks,
        num_buckets=_effective_buckets(
            cfg.pair_buckets, n_docs, _DOCS_PER_PAIR_BUCKET
        ),
        hot_block_cap=cfg.hot_block_cap,
        hot_block_window=cfg.hot_block_window,
    )
    scorer_kw = dict(
        rel_k=cfg.rel_k,
        abs_min_k=cfg.abs_min_k,
        abs_max_k=cfg.abs_max_k,
        costs=cfg.costs,
        min_similarity=cfg.min_similarity,
    )
    text_bytes = docs.size_bytes() or (1 << 62)
    # pairs/doc ≈ 0.9 on transcript corpora makes the doc count a fine
    # batch-size estimate
    score_bs = _score_batch_size(cfg, n_docs)
    if text_bytes <= cfg.broadcast_text_max_bytes:
        # small-side broadcast: no join shuffles (see config threshold).
        # Index built in a REMOTE task (ref of a pending result): the
        # driver never copies the text and the build overlaps the
        # read/block/pair stages (it was 3 serial memcpys of the corpus
        # on the critical path — see build_text_index_remote).
        from .score import BroadcastTextScorer, build_text_index_remote

        index_ref = build_text_index_remote(
            docs.select_columns(["conv_id", "doc_text"]).to_arrow_refs()
        )
        _phase("broadcast_index_driver")
        scored = pairs.map_batches(
            BroadcastTextScorer(index_ref, **scorer_kw),
            batch_format="pyarrow",
            batch_size=score_bs,
        )
    else:
        with_texts = attach_pair_texts(
            pairs, docs.select_columns(["conv_id", "doc_text"]),
            num_partitions=cfg.pair_buckets,
        )
        scored = score_pairs(
            with_texts,
            batch_size=score_bs,
            concurrency=cfg.score_concurrency,
            **scorer_kw,
        )
    edges = scored.map_batches(
        lambda t: t.filter(_pc.equal(t["is_match"], True)).select(
            ["a_id", "b_id", "dist", "sim"]
        ),
        batch_format="pyarrow",
    ).materialize()
    _phase("stream_to_edges")

    n_edges = edges.count()
    clusters_dir = os.path.join(run_dir, "clusters")
    os.makedirs(clusters_dir, exist_ok=True)
    if n_edges <= cfg.local_cluster_edge_cap:
        # collect as arrow directly (a pandas round-trip here measured
        # 2.7 s of driver-serial time at sf0.4); the node list reuses the
        # broadcast-path docs collection when it exists
        et = pa.concat_tables(
            [t for t in ray.get(edges.to_arrow_refs()) if t.num_rows > 0]
        ).select(["a_id", "b_id"])
        # node list: conv_id-only collect (~16 B/doc — the full-text
        # docs_table is no longer collected on the driver at all)
        nt = pa.concat_tables(
            [
                t for t in ray.get(
                    docs.select_columns(["conv_id"]).to_arrow_refs()
                )
                if t.num_rows > 0
            ]
        )
        out = connected_components_local(et, nt)
        pq.write_table(out, os.path.join(clusters_dir, "clusters_0.parquet"))
    else:
        connected_components(
            edges, docs.select_columns(["conv_id"]),
            num_partitions=cfg.cluster_partitions,
            max_iters=cfg.cluster_max_iters,
        ).write_parquet(clusters_dir)
    _phase("cluster_and_write")

    summary = {
        "clusters_dir": clusters_dir,
        "rows": {"edges": int(n_edges)},
        "mode": "fused",
        # coarse wall-clock phases (serial-fraction observability: the
        # driver-side phases are the parts that do NOT scale with CPUs)
        "phase_times": phases,
    }
    # per-operator execution stats of the main fused stream (observability
    # for the bench JSON): operator name -> wall time seconds
    try:
        summary["operator_stats"] = _operator_wall_times(edges.stats())
    except Exception:  # pragma: no cover - stats formats drift across Ray
        pass
    if labels_path:
        summary["metrics"] = pairwise_f1(
            pq.read_table(clusters_dir), pq.read_table(labels_path)
        )
    return summary


def _operator_wall_times(stats_text: str) -> dict:
    """Parse 'Operator N <name>: ... produced in X.XXs' lines from
    Dataset.stats() into {operator: seconds}.

    An all-to-all operator consumed by two plan branches appears TWICE
    in the stats with the same wall time, its suboperators tagged
    '[execution cached]' on the re-reference (round-3 verdict: Sort
    reported under two indices, inflating naive stage sums). Such
    entries are emitted as '<n>:<name>[cached]' with 0.0 so the sum of
    values equals real wall time while the plan shape stays visible."""
    import re

    entries = []                               # (idx, name, secs, cached)
    for line in stats_text.splitlines():
        m = re.match(
            r"Operator (\d+) (.+?): .*in ([0-9.]+)s\s*$", line.strip()
        )
        if m:
            entries.append([m.group(1), m.group(2)[:70],
                            float(m.group(3)), False])
        elif entries and "[execution cached]" in line:
            entries[-1][3] = True
    out = {}
    for idx, name, secs, cached in entries:
        if cached:
            # keep the reported figure visible in the key, but don't let
            # it count toward a stage sum twice
            out[f"{idx}:{name}[cached {secs}s]"] = 0.0
        else:
            out[f"{idx}:{name}"] = secs
    return out


def run_er_pipeline(
    transcripts_path: str,
    run_dir: str,
    cfg: Optional[PipelineConfig] = None,
    labels_path: Optional[str] = None,
    resume: bool = True,
) -> dict:
    """Run the full ER pipeline; returns summary dict (stage dirs, counts,
    and pairwise F1 when ``labels_path`` is given)."""
    cfg = cfg or PipelineConfig()
    os.makedirs(run_dir, exist_ok=True)
    base_fp = _fingerprint(transcripts_path, os.path.getmtime(transcripts_path))

    # stage: docs ---------------------------------------------------------
    fp_docs = _fingerprint(base_fp, cfg.doc_buckets, "docs_v1")

    def _w_docs(tmp):
        from .transcripts import count_rows

        ds = rd.read_parquet(
            transcripts_path, override_num_blocks=_read_blocks()
        )
        build_docs(
            ds,
            _effective_buckets(
                cfg.doc_buckets, count_rows(transcripts_path),
                _TURNS_PER_DOC_BUCKET,
            ),
        ).write_parquet(tmp)

    docs_dir = run_stage(run_dir, "docs", fp_docs, _w_docs, resume)

    # stage: blocks -------------------------------------------------------
    fp_blocks = _fingerprint(
        fp_docs, cfg.minhash_perms, cfg.minhash_bands, cfg.shingle_size,
        cfg.blocking_seed, cfg.len_band_width, "blocks_v1",
    )

    def _w_blocks(tmp):
        build_blocks(
            _read_dir(docs_dir),
            keyer_kwargs=dict(
                num_perm=cfg.minhash_perms,
                n_bands=cfg.minhash_bands,
                shingle=cfg.shingle_size,
                seed=cfg.blocking_seed,
                len_band_width=cfg.len_band_width,
            ),
            concurrency=cfg.block_concurrency,
            batch_rows=cfg.block_batch_rows,
        ).write_parquet(tmp)

    blocks_dir = run_stage(run_dir, "blocks", fp_blocks, _w_blocks, resume)

    # stage: pairs --------------------------------------------------------
    fp_pairs = _fingerprint(
        fp_blocks, cfg.pair_buckets, cfg.hot_block_cap, cfg.hot_block_window,
        "pairs_v1",
    )

    def _w_pairs(tmp):
        gen_pairs(
            _read_dir(blocks_dir),
            num_buckets=_effective_buckets(
                cfg.pair_buckets, read_manifest(docs_dir)["rows"],
                _DOCS_PER_PAIR_BUCKET,
            ),
            hot_block_cap=cfg.hot_block_cap,
            hot_block_window=cfg.hot_block_window,
        ).write_parquet(tmp)

    pairs_dir = run_stage(run_dir, "pairs", fp_pairs, _w_pairs, resume)

    # stage: scored edges -------------------------------------------------
    fp_edges = _fingerprint(
        fp_pairs, cfg.rel_k, cfg.abs_min_k, cfg.abs_max_k, cfg.min_similarity,
        str(cfg.costs), "edges_v1",
    )

    def _w_edges(tmp):
        from .pairs import attach_pair_texts

        scorer_kw = dict(
            rel_k=cfg.rel_k,
            abs_min_k=cfg.abs_min_k,
            abs_max_k=cfg.abs_max_k,
            costs=cfg.costs,
            min_similarity=cfg.min_similarity,
        )
        docs_bytes = sum(
            os.path.getsize(os.path.join(docs_dir, f))
            for f in os.listdir(docs_dir)
            if f.endswith(".parquet")
        )
        # exact pair count from the pairs-stage manifest
        score_bs = _score_batch_size(cfg, read_manifest(pairs_dir)["rows"])
        if docs_bytes <= cfg.broadcast_text_max_bytes:
            from .score import BroadcastTextScorer, build_text_index_remote

            # parquet read + index build in a worker task: the pairs
            # read below starts immediately instead of waiting behind a
            # driver-serial full-corpus read
            index_ref = build_text_index_remote(docs_dir=docs_dir)
            scored = _read_dir(pairs_dir).map_batches(
                BroadcastTextScorer(index_ref, **scorer_kw),
                batch_format="pyarrow",
                batch_size=score_bs,
            )
        else:
            with_texts = attach_pair_texts(
                _read_dir(pairs_dir),
                _read_dir(docs_dir).select_columns(["conv_id", "doc_text"]),
                num_partitions=cfg.pair_buckets,
            )
            scored = score_pairs(
                with_texts,
                batch_size=score_bs,
                concurrency=cfg.score_concurrency,
                **scorer_kw,
            )
        # pairs are globally unique after the pair-dedup shuffle, so edge
        # extraction is a stateless filter — no extra shuffle needed here
        # (dedup_edges exists for callers whose pair streams still carry
        # cross-block duplicates).
        import pyarrow.compute as _pc

        scored.map_batches(
            lambda t: t.filter(_pc.equal(t["is_match"], True)).select(
                ["a_id", "b_id", "dist", "sim"]
            ),
            batch_format="pyarrow",
        ).write_parquet(tmp)

    edges_dir = run_stage(run_dir, "edges", fp_edges, _w_edges, resume)

    # stage: clusters -----------------------------------------------------
    fp_clusters = _fingerprint(
        fp_edges, cfg.cluster_partitions, cfg.cluster_max_iters, "clusters_v1"
    )

    def _w_clusters(tmp):
        n_edges = read_manifest(edges_dir)["rows"]
        if n_edges <= cfg.local_cluster_edge_cap:
            # documented small-graph shortcut: collect edges, driver union-find
            et = pq.read_table(edges_dir, columns=["a_id", "b_id"])
            nt = pq.read_table(docs_dir, columns=["conv_id"])
            out = connected_components_local(et, nt)
            pq.write_table(out, os.path.join(tmp, "clusters_0.parquet"))
        else:
            connected_components(
                _read_dir(edges_dir),
                _read_dir(docs_dir).select_columns(["conv_id"]),
                num_partitions=cfg.cluster_partitions,
                max_iters=cfg.cluster_max_iters,
            ).write_parquet(tmp)
        return {"n_edges": int(n_edges)}

    clusters_dir = run_stage(run_dir, "clusters", fp_clusters, _w_clusters, resume)

    summary = {
        "docs_dir": docs_dir,
        "blocks_dir": blocks_dir,
        "pairs_dir": pairs_dir,
        "edges_dir": edges_dir,
        "clusters_dir": clusters_dir,
        "rows": {
            s: read_manifest(d)["rows"]
            for s, d in [
                ("docs", docs_dir), ("blocks", blocks_dir),
                ("pairs", pairs_dir), ("edges", edges_dir),
                ("clusters", clusters_dir),
            ]
        },
    }
    if labels_path:
        clusters = pq.read_table(clusters_dir)
        labels = pq.read_table(labels_path)
        summary["metrics"] = pairwise_f1(clusters, labels)
    with open(os.path.join(run_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1, default=str)
    return summary


def main(argv=None) -> int:
    """CLI entry point (works under ``ray job submit -- python -m
    triple_accel_ray.pipeline.run ...``). Owns the Ray session (guarded)."""
    import argparse

    import ray

    p = argparse.ArgumentParser(description="Run the ER pipeline")
    p.add_argument("--transcripts", required=True, help="input parquet path")
    p.add_argument("--out", required=True, help="run/checkpoint directory")
    p.add_argument("--labels", default=None, help="labeled pairs parquet")
    p.add_argument("--fused", action="store_true",
                   help="single streaming execution, no stage checkpoints")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None)
    args = p.parse_args(argv)

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    try:
        if args.fused:
            s = run_er_pipeline_fused(
                args.transcripts, args.out, labels_path=args.labels
            )
        else:
            s = run_er_pipeline(
                args.transcripts, args.out, labels_path=args.labels,
                resume=not args.no_resume,
            )
        print(json.dumps(s, default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
