"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake decoder for the synthetic format, explicit
NotImplementedError for real formats) — but the Ray-side plumbing is real
and tested: binary columns with metadata, actor-pool ``map_batches`` stages
with decoder state in ``__init__``, small batch sizes for wide rows, and a
stable feature-row output layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAGIC = b"FAKEIMG1"


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus: payload = 8-byte magic + u16 width,
    u16 height + width*height synthetic pixel bytes."""
    rng = np.random.default_rng(seed)
    ids, payloads, fmts, widths, heights = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        pixels = rng.integers(0, 256, size=w * h, dtype=np.uint8)
        payload = (
            MAGIC
            + int(w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little")
            + pixels.tobytes()
        )
        ids.append(i)
        payloads.append(payload)
        fmts.append("fakeimg")
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(fmts, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


class MediaDecoder:
    """Actor-pool decode stage. Real codecs (jpeg/png/wav/...) are not
    available in this environment: requesting them raises NotImplementedError
    at construction — the Ray plumbing around the stub is the tested part.
    """

    def __init__(self, accept_formats=("fakeimg",)):
        for f in accept_formats:
            if f != "fakeimg":
                raise NotImplementedError(
                    f"codec for format {f!r} is not available in this "
                    "environment; only the deterministic 'fakeimg' stub "
                    "decoder is implemented"
                )
        self.accept = set(accept_formats)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized decode across the batch: headers parsed from the flat
        byte buffer, pixel statistics via segment reductions — no per-row
        Python. Integer aggregates (sum / sum-of-squares / sum of abs
        horizontal diffs) are exact; the float features derive from them
        with a fixed op order, so both are SQL-oracle-comparable."""
        from ..kernels.batch import to_byte_rows

        keep = pa.compute.is_in(
            batch["format"], value_set=pa.array(sorted(self.accept))
        )
        sub = batch.filter(keep)
        data, offsets = to_byte_rows(sub["payload"])
        n = sub.num_rows
        lens = np.diff(offsets)
        if n and (lens < 12).any():
            raise ValueError("truncated payload")
        starts = offsets[:-1]
        if n:
            magic = np.frombuffer(MAGIC, np.uint8)
            head = data[starts[:, None] + np.arange(8)[None, :]]
            if not (head == magic[None, :]).all():
                raise ValueError("bad magic")
        d64 = data.astype(np.int64)
        w = d64[starts + 8] + (d64[starts + 9] << 8) if n else np.zeros(0, np.int64)
        h = d64[starts + 10] + (d64[starts + 11] << 8) if n else np.zeros(0, np.int64)
        npix = w * h
        if n and (lens < 12 + npix).any():
            raise ValueError("truncated pixel data")

        sum_px = np.zeros(n, dtype=np.int64)
        sumsq_px = np.zeros(n, dtype=np.int64)
        sum_hdiff = np.zeros(n, dtype=np.int64)
        if n and npix.sum():
            px_starts = starts + 12
            px_ends = px_starts + npix
            # flat gather of every image's pixels back-to-back
            rows_of = np.repeat(np.arange(n), npix)
            cum = np.zeros(n, dtype=np.int64)
            np.cumsum(npix[:-1], out=cum[1:])
            pos = px_starts[rows_of] + (np.arange(int(npix.sum())) - cum[rows_of])
            px = d64[pos]
            nz = npix > 0
            sum_px[nz] = np.add.reduceat(px, cum[nz])
            sumsq_px[nz] = np.add.reduceat(px * px, cum[nz])
            # horizontal neighbor diffs: positions within a row of the image
            # (flat index j with (j mod w) != w-1 pairs with j+1)
            within = np.arange(int(npix.sum())) - cum[rows_of]
            wv = w[rows_of]
            has_next = (within % wv) != (wv - 1)
            dif = np.zeros(len(px), dtype=np.int64)
            idx = np.nonzero(has_next)[0]
            dif[idx] = np.abs(px[np.minimum(idx + 1, len(px) - 1)] - px[idx])
            # w <= 1 rows have no has_next positions, so dif is all-zero
            # over their segments and they reduce to sum_hdiff == 0
            # (edge_energy 0.0 for 1-pixel-wide images — pinned by test)
            sum_hdiff[nz] = np.add.reduceat(dif, cum[nz])

        npix_f = np.maximum(1, npix).astype(np.float64)
        mean_px = sum_px / npix_f
        var = (sumsq_px - (sum_px * sum_px) / npix_f) / npix_f
        std_px = np.sqrt(np.maximum(0.0, var))
        ndiff = np.maximum(1, h * (w - 1)).astype(np.float64)
        edge = sum_hdiff / ndiff
        return pa.table(
            {
                "media_id": sub["media_id"],
                "width": pa.array(w.astype(np.int32), pa.int32()),
                "height": pa.array(h.astype(np.int32), pa.int32()),
                "sum_pixel": pa.array(sum_px, pa.int64()),
                "sumsq_pixel": pa.array(sumsq_px, pa.int64()),
                "sum_hdiff": pa.array(sum_hdiff, pa.int64()),
                "mean_pixel": pa.array(mean_px, pa.float64()),
                "std_pixel": pa.array(std_px, pa.float64()),
                "edge_energy": pa.array(edge, pa.float64()),
            }
        )


def media_features(media, concurrency=2, batch_size: int = 64):
    """Binary payloads → feature rows via the actor-pool decode stage.
    Small batch_size on purpose: wide binary rows × concurrency must fit a
    worker heap."""
    return media.map_batches(
        MediaDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
