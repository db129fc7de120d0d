"""Event-time windowing with WATERMARK semantics (bounded-disorder
streams), expressed Ray-Data-first.

Model (the standard event-time contract): events arrive in an ARRIVAL
order that may disagree with event time; the watermark is the running max
event time seen so far minus an allowed lateness; an event is DROPPED as
late when it arrives after its tumbling window has been finalized
(window_end + lateness <= watermark-so-far). Output is one row per
(user, window) with kept counts/sums AND the late-drop count — total and
deterministic for a fixed arrival order.

Distributed shape — a prefix-scan, not a sequential stream:
  1. arrival order is (frame, subkey...) where ``frame`` (a coarse time
     bucket of the ARRIVAL sequence) is the leading key, so all arrivals
     of frame f precede frame f+1;
  2. per-frame max event time is a tiny ``groupby(frame).max`` aggregate;
     the driver prefix-maxes it (one row per frame — at petabyte scale
     this is years x (seconds/frame) rows, still broadcastable);
  3. each frame's rows are scanned vectorized (sort + shifted cummax
     seeded with the broadcast prefix) to flag late events;
  4. one ordinary windowed aggregate over the flagged rows.

So the engine keeps streaming-with-backpressure execution and the only
sequential state (the watermark) is reduced to a broadcast prefix array.
``WatermarkWindowState`` is the same logic as an incremental
ingest/flush class (the actor-per-shard pattern for a true unbounded
feed); its results are asserted equal to the batch operator in tests.
"""

from __future__ import annotations

import numpy as np
import polars as pl
import pyarrow as pa


def watermark_tumbling_windows(
    events,
    window_sec: int = 3600,
    lateness_sec: int = 60,
    frame_sec: int = 300,
    arrival_cls_mod: int = 7,
    id_col: str = "event_id",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
):
    """→ (user_id, window_start, n_events, sum_cents, n_late).

    Arrival order = (frame = ts // frame_sec, event_id % arrival_cls_mod,
    event_id): a deterministic permutation that shuffles events WITHIN
    each frame (bounded disorder — the realistic stream shape), exactly
    reproducible in SQL for the oracle.
    """
    import ray

    W = window_sec * 1_000_000
    L = lateness_sec * 1_000_000
    F = frame_sec * 1_000_000

    def _tag(t: pa.Table) -> pa.Table:
        df = pl.from_arrow(t.select([id_col, user_col, ts_col, value_col]))
        df = df.with_columns(
            tsu=pl.col(ts_col).cast(pl.Int64),
            cents=(pl.col(value_col) * 100.0 + 0.5).floor().cast(pl.Int64),
        ).with_columns(
            frame=(pl.col("tsu") // F).cast(pl.Int64),
            cls=(pl.col(id_col) % arrival_cls_mod).cast(pl.Int64),
            window_start=((pl.col("tsu") // W) * W).cast(pl.Datetime("us")),
        ).drop(value_col)
        return df.to_arrow()

    tagged = events.map_batches(_tag, batch_format="pyarrow")

    # phase A: per-frame max event time -> driver prefix-max (tiny)
    from ray.data.aggregate import Max

    frame_rows = tagged.groupby("frame").aggregate(
        Max("tsu", alias_name="max_tsu")
    ).take_all()
    frames = np.array(sorted(r["frame"] for r in frame_rows), dtype=np.int64)
    fmax = np.array(
        [r["max_tsu"] for r in sorted(frame_rows, key=lambda r: r["frame"])],
        dtype=np.int64,
    )
    prefix = np.full(len(frames), np.iinfo(np.int64).min, dtype=np.int64)
    if len(frames) > 1:
        prefix[1:] = np.maximum.accumulate(fmax)[:-1]
    pref_ref = ray.put((frames, prefix))

    # phase B: per-frame vectorized watermark scan
    def _flag(t: pa.Table) -> pa.Table:
        schema = pa.schema(
            [("user_id", pa.int64()), ("window_start", pa.timestamp("us")),
             ("kept", pa.int64()), ("cents_kept", pa.int64()),
             ("late", pa.int64())]
        )
        if t.num_rows == 0:
            return schema.empty_table()
        df = pl.from_arrow(t).sort(["frame", "cls", id_col])
        fr = df["frame"].to_numpy()
        tsu = df["tsu"].to_numpy()
        frames_, prefix_ = ray.get(pref_ref)
        seed = prefix_[np.searchsorted(frames_, fr)]
        # running max of event time over STRICTLY EARLIER arrivals:
        # within-frame shifted cummax, seeded with the prior frames' max
        run = np.empty(len(tsu), dtype=np.int64)
        change = np.nonzero(fr[1:] != fr[:-1])[0] + 1
        starts = np.concatenate([[0], change])
        cm = np.maximum.accumulate(tsu)
        # reset cummax at frame starts: subtract per-frame offset trick —
        # simplest correct form: segment-wise shifted cummax
        run[0] = seed[0]
        prev = np.empty(len(tsu), dtype=np.int64)
        prev[1:] = cm[:-1]
        prev[0] = np.iinfo(np.int64).min
        # per-frame recompute of the shifted cummax (cm spans frames, but
        # frames are sorted ascending in both arrival AND event time
        # bounds only per frame) — do it exactly per segment:
        for s, e in zip(starts, np.concatenate([change, [len(tsu)]])):
            seg = tsu[s:e]
            segcm = np.maximum.accumulate(seg)
            run[s] = seed[s]
            if e - s > 1:
                run[s + 1 : e] = np.maximum(seed[s], segcm[:-1])
        win_end = (tsu // W) * W + W
        kept = win_end + L > run
        out = pl.DataFrame(
            {
                "user_id": df[user_col].to_numpy(),
                "window_start": df["window_start"].to_numpy(),
                "kept": kept.astype(np.int64),
                "cents_kept": np.where(kept, df["cents"].to_numpy(), 0),
                "late": (~kept).astype(np.int64),
            }
        )
        return out.to_arrow().cast(schema)

    # frames are scanned independently (seed carries all cross-frame
    # state), so they can be hash-bucketed into a bounded number of groups
    # — thousands of tiny per-frame groups would be all shuffle overhead
    def _fbucket(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("fbucket", pa.array([], pa.int32()))
        fb = (t["frame"].to_numpy() % 32).astype(np.int32)
        return t.append_column("fbucket", pa.array(fb, pa.int32()))

    from ..pipeline.shuffle import bucket_partition

    flagged = bucket_partition(
        tagged.map_batches(_fbucket, batch_format="pyarrow"),
        _flag, 32, bucket_col="fbucket",
    )

    from ray.data.aggregate import Sum

    return flagged.groupby(["user_id", "window_start"]).aggregate(
        Sum("kept", alias_name="n_events"),
        Sum("cents_kept", alias_name="sum_cents"),
        Sum("late", alias_name="n_late"),
    )


class WatermarkWindowState:
    """Incremental ingest/flush form of the same semantics — the per-shard
    state a true streaming deployment holds in an actor (one instance per
    key-hash shard, fed arrival-ordered batches). Kept windows accumulate
    until ``flush()``; late events only bump the drop counter.
    """

    def __init__(self, window_sec: int = 3600, lateness_sec: int = 60):
        self.W = window_sec * 1_000_000
        self.L = lateness_sec * 1_000_000
        self.run_max = np.iinfo(np.int64).min
        self.acc: dict = {}  # (user, window_start_us) -> [n, cents, late]

    def ingest(self, users, tsu, cents) -> None:
        users = np.asarray(users)
        tsu = np.asarray(tsu, dtype=np.int64)
        cents = np.asarray(cents, dtype=np.int64)
        for u, t, c in zip(users, tsu, cents):
            ws = (t // self.W) * self.W
            key = (int(u), int(ws))
            slot = self.acc.setdefault(key, [0, 0, 0])
            if ws + self.W + self.L > self.run_max:
                slot[0] += 1
                slot[1] += int(c)
            else:
                slot[2] += 1
            if t > self.run_max:
                self.run_max = int(t)

    def flush(self) -> pa.Table:
        rows = sorted(self.acc.items())
        return pa.table(
            {
                "user_id": pa.array([k[0] for k, _ in rows], pa.int64()),
                "window_start": pa.array(
                    [k[1] for k, _ in rows], pa.timestamp("us")
                ),
                "n_events": pa.array([v[0] for _, v in rows], pa.int64()),
                "sum_cents": pa.array([v[1] for _, v in rows], pa.int64()),
                "n_late": pa.array([v[2] for _, v in rows], pa.int64()),
            }
        )
