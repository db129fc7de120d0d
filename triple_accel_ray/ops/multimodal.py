"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decoders are REAL where the environment allows: PNG (stdlib zlib + numpy
unfiltering) and WAV (PCM RIFF walk) in ``ops.codecs``, plus the
deterministic ``fakeimg`` synthetic format whose raw payload a SQL oracle
can parse byte-for-byte. JPEG remains an explicit NotImplementedError
(no DCT/Huffman codec in the container). The Ray-side plumbing — binary
columns with metadata, actor-pool ``map_batches`` stages with decoder
state in ``__init__``, small batch sizes for wide rows, a stable
feature-row output layout — is shared by all formats and fully tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import png_decode, png_encode_filtered, png_luma, wav_decode, wav_encode

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


def synthesize_media_table_png(n: int, seed: int = 42) -> pa.Table:
    """PNG twin of :func:`synthesize_media_table`: the SAME rng draws (so
    pixel content is identical image-for-image) encoded as real grayscale
    PNGs. Per-row filter types cycle deterministically through 0-4 so a
    pipeline decode exercises every unfilter path. Because luma of a
    grayscale PNG is the pixel byte itself, the decoded feature rows must
    equal the fakeimg fixture's — which is exactly what the SQL oracle
    (parsing the raw fakeimg payloads) checks."""
    rng = np.random.default_rng(seed)
    ids, payloads, widths, heights = [], [], [], []
    for i in range(n):
        w = int(rng.integers(8, 64))
        h = int(rng.integers(8, 64))
        pixels = rng.integers(0, 256, size=w * h, dtype=np.uint8)
        ftypes = (np.arange(h) + i) % 5
        payloads.append(png_encode_filtered(pixels.reshape(h, w), ftypes))
        ids.append(i)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["png"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


def synthesize_audio_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic mono PCM16 WAV corpus (canonical 44-byte header, the
    layout the SQL oracle parses sample-by-sample from hex)."""
    rng = np.random.default_rng(seed)
    ids, payloads, rates, counts = [], [], [], []
    for i in range(n):
        ns = int(rng.integers(64, 2048))
        rate = int(rng.choice([8000, 16000, 44100]))
        samples = rng.integers(-32768, 32768, size=ns).astype(np.int32)
        payloads.append(wav_encode(samples, rate, bits=16))
        ids.append(i)
        rates.append(rate)
        counts.append(ns)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["wav"] * n, pa.string()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(counts, pa.int64()),
        }
    )


class MediaDecoder:
    """Actor-pool image decode stage. Real codecs where the environment
    allows: ``png`` (stdlib zlib + numpy unfiltering, ops/codecs.py) and
    the byte-parseable ``fakeimg`` synthetic format. ``jpeg`` (or any
    other format) raises NotImplementedError at construction — no
    DCT/Huffman codec exists in this container.
    """

    _REAL = {"fakeimg", "png"}

    def __init__(self, accept_formats=("fakeimg",)):
        for f in accept_formats:
            if f not in self._REAL:
                raise NotImplementedError(
                    f"codec for format {f!r} is not available in this "
                    "environment (real decoders: fakeimg, png)"
                )
        self.accept = set(accept_formats)

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Decode + aggregate. fakeimg batches stay on the fully vectorized
        flat-buffer path (headers parsed from one byte buffer, pixel stats
        via segment reductions — no per-row Python); png payloads decode
        per row (zlib inflate is inherently per-payload) with numpy
        unfiltering and per-image vectorized aggregates. Integer aggregates
        (sum / sum-of-squares / sum of abs horizontal diffs) are exact; the
        float features derive from them with a fixed op order, so both are
        SQL-oracle-comparable."""
        keep = pa.compute.is_in(
            batch["format"], value_set=pa.array(sorted(self.accept))
        )
        sub = batch.filter(keep)
        fmts = sub["format"].to_pylist()
        is_png = np.array([f == "png" for f in fmts], dtype=bool)
        if is_png.any():
            parts = [
                self._fakeimg_features(sub.filter(pa.array(~is_png))),
                self._png_features(sub.filter(pa.array(is_png))),
            ]
            out = pa.concat_tables([p for p in parts if p.num_rows])
            if out.num_rows:
                out = out.sort_by("media_id")
            return out
        return self._fakeimg_features(sub)

    def _png_features(self, sub: pa.Table) -> pa.Table:
        n = sub.num_rows
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        sum_px = np.zeros(n, np.int64)
        sumsq_px = np.zeros(n, np.int64)
        sum_hdiff = np.zeros(n, np.int64)
        for i, payload in enumerate(sub["payload"]):
            img = png_decode(payload.as_py())
            luma = png_luma(img).astype(np.int64)
            h[i], w[i] = luma.shape
            sum_px[i] = luma.sum()
            sumsq_px[i] = (luma * luma).sum()
            sum_hdiff[i] = np.abs(luma[:, 1:] - luma[:, :-1]).sum()
        return self._emit(sub, w, h, sum_px, sumsq_px, sum_hdiff)

    def _fakeimg_features(self, sub: pa.Table) -> pa.Table:
        from ..kernels.batch import to_byte_rows

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

        return self._emit(sub, w, h, sum_px, sumsq_px, sum_hdiff)

    @staticmethod
    def _emit(sub, w, h, sum_px, sumsq_px, sum_hdiff) -> pa.Table:
        npix = w * h
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


class AudioDecoder:
    """Actor-pool audio decode stage (real PCM WAV codec, ops/codecs.py).
    Integer-exact aggregates over channel-0 samples: sum of absolute
    values, sum of squares, sign zero-crossings (s[i] >= 0 differing from
    s[i+1] >= 0) — plus floats derived from them with a fixed op order,
    so everything is SQL-oracle-comparable."""

    def __init__(self, accept_formats=("wav",)):
        for f in accept_formats:
            if f != "wav":
                raise NotImplementedError(
                    f"audio codec for format {f!r} is not available in "
                    "this environment (real decoder: wav/PCM)"
                )
        self.accept = set(accept_formats)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.is_in(
            batch["format"], value_set=pa.array(sorted(self.accept))
        )
        sub = batch.filter(keep)
        n = sub.num_rows
        rate = np.zeros(n, np.int64)
        n_ch = np.zeros(n, np.int64)
        n_fr = np.zeros(n, np.int64)
        sum_abs = np.zeros(n, np.int64)
        sumsq = np.zeros(n, np.int64)
        zx = np.zeros(n, np.int64)
        for i, payload in enumerate(sub["payload"]):
            samples, r = wav_decode(payload.as_py())
            ch0 = samples[:, 0].astype(np.int64)
            rate[i] = r
            n_fr[i], n_ch[i] = samples.shape
            sum_abs[i] = np.abs(ch0).sum()
            sumsq[i] = (ch0 * ch0).sum()
            if len(ch0) > 1:
                nonneg = ch0 >= 0
                zx[i] = int(np.sum(nonneg[1:] != nonneg[:-1]))
        nf = np.maximum(1, n_fr).astype(np.float64)
        return pa.table(
            {
                "media_id": sub["media_id"],
                "sample_rate": pa.array(rate, pa.int64()),
                "channels": pa.array(n_ch, pa.int64()),
                "n_frames": pa.array(n_fr, pa.int64()),
                "sum_abs": pa.array(sum_abs, pa.int64()),
                "sumsq": pa.array(sumsq, pa.int64()),
                "zero_crossings": pa.array(zx, pa.int64()),
                "mean_abs": pa.array(sum_abs / nf, pa.float64()),
                "rms": pa.array(np.sqrt(sumsq / nf), pa.float64()),
            }
        )


def audio_features(media, concurrency=2, batch_size: int = 64):
    """WAV payloads → feature rows via the actor-pool audio decode stage."""
    return media.map_batches(
        AudioDecoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def media_features(
    media, concurrency=2, batch_size: int = 64, accept_formats=("fakeimg",)
):
    """Binary payloads → feature rows via the actor-pool decode stage.
    Small batch_size on purpose: wide binary rows × concurrency must fit a
    worker heap."""
    return media.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"accept_formats": tuple(accept_formats)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
