"""Watermark window semantics: hand-computed cases + equivalence between
the distributed prefix-scan operator and the incremental ingest/flush
state (the actor-per-shard form)."""

import numpy as np
import pyarrow as pa

from triple_accel_ray.ops.streaming import (
    WatermarkWindowState,
    watermark_tumbling_windows,
)

H = 3600 * 1_000_000  # 1h in us


def _events(rows):
    ids, users, tsu, vals = zip(*rows)
    return pa.table(
        {
            "event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(list(tsu), pa.timestamp("us")),
            "value": pa.array(vals, pa.float64()),
        }
    )


def test_watermark_hand_case(ray_session):
    import ray.data as rd

    # arrival order == event_id order (frame huge, cls_mod=1):
    #   e0 t=0h00      -> window 0 kept
    #   e1 t=2h30      -> window 2h kept, watermark jumps to 2h30
    #   e2 t=0h30      -> window [0,1h) ended 1h; 1h + 60s <= 2h30 -> LATE
    #   e3 t=2h10      -> window [2h,3h) still open -> kept
    rows = [
        (0, 1, 0, 1.0),
        (1, 1, int(2.5 * H), 1.0),
        (2, 1, int(0.5 * H), 1.0),
        (3, 1, int(2.17 * H), 1.0),
    ]
    out = watermark_tumbling_windows(
        rd.from_arrow(_events(rows)), window_sec=3600, lateness_sec=60,
        frame_sec=1 << 40, arrival_cls_mod=1,
    ).to_pandas().sort_values("window_start").reset_index(drop=True)
    w0 = out[out.window_start == np.datetime64(0, "us")].iloc[0]
    assert (w0.n_events, w0.n_late) == (1, 1)  # e0 kept, e2 late
    w2 = out[out.window_start == np.datetime64(2 * H, "us")].iloc[0]
    assert (w2.n_events, w2.n_late) == (2, 0)


def test_watermark_batch_equals_incremental(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    n = 400
    ids = np.arange(n)
    users = rng.integers(1, 5, size=n)
    tsu = np.sort(rng.integers(0, 20 * H, size=n))
    vals = rng.uniform(0, 10, size=n).round(2)
    rows = list(zip(ids.tolist(), users.tolist(), tsu.tolist(), vals.tolist()))
    t = _events(rows)

    frame_sec, cls_mod, lateness = 7200, 7, 60
    dist = watermark_tumbling_windows(
        rd.from_arrow(t), window_sec=3600, lateness_sec=lateness,
        frame_sec=frame_sec, arrival_cls_mod=cls_mod,
    ).to_pandas().sort_values(["user_id", "window_start"]).reset_index(drop=True)

    # incremental: feed events one by one in the SAME arrival order
    F = frame_sec * 1_000_000
    order = np.lexsort((ids, ids % cls_mod, tsu // F))
    st = WatermarkWindowState(window_sec=3600, lateness_sec=lateness)
    cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
    st.ingest(users[order], tsu[order], cents[order])
    inc = st.flush().to_pandas()
    inc["window_start"] = inc["window_start"].astype("datetime64[us]")
    inc = inc.sort_values(["user_id", "window_start"]).reset_index(drop=True)

    import pandas as pd

    pd.testing.assert_frame_equal(dist, inc, check_dtype=False)
