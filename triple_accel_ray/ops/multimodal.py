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

    def _decode_one(self, payload: bytes):
        if payload[:8] != MAGIC:
            raise ValueError("bad magic")
        w = int.from_bytes(payload[8:10], "little")
        h = int.from_bytes(payload[10:12], "little")
        px = np.frombuffer(payload[12 : 12 + w * h], dtype=np.uint8)
        return w, h, px

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {
            "media_id": [], "width": [], "height": [],
            "mean_pixel": [], "std_pixel": [], "edge_energy": [],
        }
        fmts = batch["format"].to_pylist()
        payloads = batch["payload"].to_pylist()
        ids = batch["media_id"].to_pylist()
        for i, payload in enumerate(payloads):
            if fmts[i] not in self.accept:
                continue
            w, h, px = self._decode_one(payload)
            img = px.reshape(h, w).astype(np.float64)
            out["media_id"].append(ids[i])
            out["width"].append(w)
            out["height"].append(h)
            out["mean_pixel"].append(float(img.mean()))
            out["std_pixel"].append(float(img.std()))
            out["edge_energy"].append(
                float(np.abs(np.diff(img, axis=1)).mean())
            )
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "width": pa.array(out["width"], pa.int32()),
                "height": pa.array(out["height"], pa.int32()),
                "mean_pixel": pa.array(out["mean_pixel"], pa.float64()),
                "std_pixel": pa.array(out["std_pixel"], pa.float64()),
                "edge_energy": pa.array(out["edge_energy"], pa.float64()),
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
