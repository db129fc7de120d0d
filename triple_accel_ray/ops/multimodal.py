"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decoders are REAL: PNG (stdlib zlib + numpy unfiltering) and WAV (PCM
RIFF walk) in ``ops.codecs``, baseline JPEG (numpy DCT + canonical
Huffman, ``ops.jpeg``), plus the deterministic ``fakeimg`` synthetic
format whose raw payload a SQL oracle can parse byte-for-byte. Only
formats genuinely beyond a from-scratch implementation here (progressive
JPEG, real video containers) raise NotImplementedError. The Ray-side
plumbing — binary
columns with metadata, actor-pool ``map_batches`` stages with decoder
state in ``__init__``, small batch sizes for wide rows, a stable
feature-row output layout — is shared by all formats and fully tested.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import png_decode, png_encode_filtered, png_luma, wav_decode, wav_encode

MAGIC = b"FAKEIMG1"
VID_MAGIC = b"FAKEVID1"


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


def _tile_pixels(rng) -> np.ndarray:
    """One draw of an 8x8-tile-constant image: dims are multiples of 8 and
    every aligned 8x8 block is a single value. Such images round-trip
    through baseline JPEG at quant=1 BIT-EXACTLY (DC-only blocks; proof in
    ops/jpeg.py docstring), which is what lets a real lossy-format decode
    be checked by a value-exact SQL oracle over the fakeimg twin."""
    tw = int(rng.integers(1, 8))
    th = int(rng.integers(1, 8))
    tiles = rng.integers(0, 256, size=(th, tw), dtype=np.uint8)
    return np.kron(tiles, np.ones((8, 8), np.uint8))


def synthesize_media_table_tiles(n: int, seed: int = 43) -> pa.Table:
    """fakeimg corpus of tile-constant images (the JPEG twin's oracle
    side: same rng draws, byte-parseable payloads)."""
    rng = np.random.default_rng(seed)
    ids, payloads, widths, heights = [], [], [], []
    for i in range(n):
        px = _tile_pixels(rng)
        h, w = px.shape
        payloads.append(
            MAGIC
            + int(w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little")
            + px.tobytes()
        )
        ids.append(i)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["fakeimg"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


def synthesize_media_table_jpeg(n: int, seed: int = 43) -> pa.Table:
    """JPEG twin of :func:`synthesize_media_table_tiles`: the SAME rng
    draws encoded as real baseline JPEGs (markers, quant, zigzag, DC
    differencing, Annex-K Huffman, byte stuffing — ops/jpeg.py). Decoded
    features must equal the tiles fixture's byte-parse exactly."""
    from .jpeg import jpeg_encode

    rng = np.random.default_rng(seed)
    ids, payloads, widths, heights = [], [], [], []
    for i in range(n):
        px = _tile_pixels(rng)
        h, w = px.shape
        payloads.append(jpeg_encode(px))
        ids.append(i)
        widths.append(w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["jpeg"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


def _tile_pixels_rgb(rng) -> np.ndarray:
    """One draw of a 16x16-tile-constant RGB image: dims are multiples of
    16 and every aligned 16x16 block is one color. Such images pass
    through baseline color JPEG at quant=1 as exactly
    ``_ycbcr_to_rgb(_rgb_to_ycbcr(px))`` for BOTH 4:4:4 and 4:2:0 (the
    2x2 chroma box average is exact on constants; proof in
    ops/jpeg.py docstring)."""
    tw = int(rng.integers(1, 5))
    th = int(rng.integers(1, 5))
    tiles = rng.integers(0, 256, size=(th, tw, 3), dtype=np.uint8)
    return np.kron(tiles, np.ones((16, 16, 1), np.uint8))


def synthesize_media_table_tiles_rgb(n: int, seed: int = 44) -> pa.Table:
    """fakeimg twin of the COLOR JPEG corpus: the same rng draws, stored
    as the deterministic color-transform round trip F(rgb) =
    ``_ycbcr_to_rgb(_rgb_to_ycbcr(rgb))`` — exactly what the JPEG decode
    returns at quant=1 — flattened to an (h, 3w) interleaved byte matrix
    so the existing fakeimg byte-parse oracle applies verbatim. The
    ``width`` column is the payload's pixel-column count (3 x image
    width)."""
    from .jpeg import _rgb_to_ycbcr, _ycbcr_to_rgb

    rng = np.random.default_rng(seed)
    ids, payloads, widths, heights = [], [], [], []
    for i in range(n):
        px = _tile_pixels_rgb(rng)
        rt = _ycbcr_to_rgb(_rgb_to_ycbcr(px))
        h, w = rt.shape[:2]
        flat = np.ascontiguousarray(rt.reshape(h, 3 * w))
        payloads.append(
            MAGIC
            + int(3 * w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little")
            + flat.tobytes()
        )
        ids.append(i)
        widths.append(3 * w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["fakeimg"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
        }
    )


def synthesize_media_table_jpeg_rgb(n: int, seed: int = 44,
                                    subsampling: str = "420") -> pa.Table:
    """COLOR JPEG corpus (round-4): the same rng draws as
    :func:`synthesize_media_table_tiles_rgb` encoded as real interleaved
    3-component baseline JPEGs (YCbCr, Annex-K luma+chroma Huffman
    tables, two quant tables, 4:2:0 by default). Decoded features must
    equal the RGB tiles twin's byte-parse exactly."""
    from .jpeg import jpeg_encode

    rng = np.random.default_rng(seed)
    ids, payloads, widths, heights = [], [], [], []
    for i in range(n):
        px = _tile_pixels_rgb(rng)
        h, w = px.shape[:2]
        payloads.append(jpeg_encode(px, subsampling=subsampling))
        ids.append(i)
        widths.append(3 * w)
        heights.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["jpeg"] * n, pa.string()),
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


def synthesize_video_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake video corpus: payload = 8-byte magic + u16 width,
    u16 height, u16 n_frames + n_frames grayscale frames back-to-back
    (width*height bytes each) — byte-transparent so a SQL oracle can parse
    the identical pixels the pipeline decodes."""
    rng = np.random.default_rng(seed)
    ids, payloads, widths, heights, frames = [], [], [], [], []
    for i in range(n):
        w = int(rng.integers(4, 24))
        h = int(rng.integers(4, 24))
        nf = int(rng.integers(2, 40))
        pixels = rng.integers(0, 256, size=w * h * nf, dtype=np.uint8)
        payloads.append(
            VID_MAGIC
            + int(w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little")
            + int(nf).to_bytes(2, "little")
            + pixels.tobytes()
        )
        ids.append(i)
        widths.append(w)
        heights.append(h)
        frames.append(nf)
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "format": pa.array(["fakevid"] * n, pa.string()),
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "n_frames": pa.array(frames, pa.int64()),
        }
    )


class MediaDecoder:
    """Actor-pool image decode stage. Real codecs where the environment
    allows: ``png`` (stdlib zlib + numpy unfiltering, ops/codecs.py),
    ``jpeg`` (baseline grayscale DCT/Huffman, ops/jpeg.py) and the
    byte-parseable ``fakeimg`` synthetic format. Any other format raises
    NotImplementedError at construction.
    """

    _REAL = {"fakeimg", "png", "jpeg"}

    def __init__(self, accept_formats=("fakeimg",)):
        for f in accept_formats:
            if f not in self._REAL:
                raise NotImplementedError(
                    f"codec for format {f!r} is not available in this "
                    "environment (real decoders: fakeimg, png, jpeg)"
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
        is_codec = np.array([f in ("png", "jpeg") for f in fmts], dtype=bool)
        if is_codec.any():
            parts = [
                self._fakeimg_features(sub.filter(pa.array(~is_codec))),
                self._codec_features(sub.filter(pa.array(is_codec))),
            ]
            out = pa.concat_tables([p for p in parts if p.num_rows])
            if out.num_rows:
                out = out.sort_by("media_id")
            return out
        return self._fakeimg_features(sub)

    def _codec_features(self, sub: pa.Table) -> pa.Table:
        """png / jpeg payloads decode per row (zlib inflate and Huffman
        entropy decode are inherently per-payload) with per-image
        vectorized aggregates."""
        from .jpeg import jpeg_decode

        n = sub.num_rows
        w = np.zeros(n, np.int64)
        h = np.zeros(n, np.int64)
        sum_px = np.zeros(n, np.int64)
        sumsq_px = np.zeros(n, np.int64)
        sum_hdiff = np.zeros(n, np.int64)
        fmts = sub["format"].to_pylist()
        for i, payload in enumerate(sub["payload"]):
            if fmts[i] == "jpeg":
                img = jpeg_decode(payload.as_py())
                if img.ndim == 3:
                    # color: stats over the (h, 3w) interleaved byte
                    # matrix — matches the RGB tiles twin's byte layout
                    img = img.reshape(img.shape[0], -1)
                luma = img.astype(np.int64)
            else:
                luma = png_luma(png_decode(payload.as_py())).astype(np.int64)
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


class ImageResizer:
    """Actor-pool box-average downscale (factor ``f``): each output pixel is
    ``floor(mean)`` of its f×f source box; trailing rows/cols that don't
    fill a box are cropped (the standard box-filter contract, and the one a
    SQL oracle can express exactly in integers). Emits the resized image as
    a new fakeimg payload plus integer-exact aggregates.

    fakeimg batches run fully vectorized (one flat byte gather + bincount
    segment sums across the whole batch); png decodes per row (zlib inflate
    is per-payload) and shares the same integer box math."""

    _REAL = {"fakeimg", "png", "jpeg"}

    def __init__(self, factor: int = 4, accept_formats=("fakeimg",)):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        for f in accept_formats:
            if f not in self._REAL:
                raise NotImplementedError(
                    f"codec for format {f!r} is not available in this "
                    "environment (real decoders: fakeimg, png, jpeg)"
                )
        self.f = int(factor)
        self.accept = set(accept_formats)

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pa.compute.is_in(
            batch["format"], value_set=pa.array(sorted(self.accept))
        )
        sub = batch.filter(keep)
        fmts = sub["format"].to_pylist()
        is_codec = np.array([f in ("png", "jpeg") for f in fmts], dtype=bool)
        if is_codec.any():
            parts = [
                self._resize_fakeimg(sub.filter(pa.array(~is_codec))),
                self._resize_codec(sub.filter(pa.array(is_codec))),
            ]
            out = pa.concat_tables([p for p in parts if p.num_rows])
            return out.sort_by("media_id") if out.num_rows else out
        return self._resize_fakeimg(sub)

    def _resize_codec(self, sub: pa.Table) -> pa.Table:
        from .jpeg import jpeg_decode

        f = self.f
        n = sub.num_rows
        fmts = sub["format"].to_pylist()
        rvs, w2s, h2s, sw, sh = [], [], [], [], []
        for i, payload in enumerate(sub["payload"]):
            if fmts[i] == "jpeg":
                luma = jpeg_decode(payload.as_py()).astype(np.int64)
            else:
                luma = png_luma(png_decode(payload.as_py())).astype(np.int64)
            h, w = luma.shape
            h2, w2 = h // f, w // f
            box = (
                luma[: h2 * f, : w2 * f]
                .reshape(h2, f, w2, f)
                .sum(axis=(1, 3))
                // (f * f)
            ) if h2 and w2 else np.zeros((h2, w2), np.int64)
            rvs.append(box.ravel())
            w2s.append(w2)
            h2s.append(h2)
            sw.append(w)
            sh.append(h)
        return self._emit(
            sub,
            np.array(sw, np.int64), np.array(sh, np.int64),
            np.array(w2s, np.int64), np.array(h2s, np.int64),
            np.concatenate(rvs) if n else np.zeros(0, np.int64),
        )

    def _resize_fakeimg(self, sub: pa.Table) -> pa.Table:
        from ..kernels.batch import to_byte_rows

        f = self.f
        data, offsets = to_byte_rows(sub["payload"])
        n = sub.num_rows
        starts = offsets[:-1]
        d64 = data.astype(np.int64)
        if n:
            w = d64[starts + 8] + (d64[starts + 9] << 8)
            h = d64[starts + 10] + (d64[starts + 11] << 8)
        else:
            w = h = np.zeros(0, np.int64)
        npix = w * h
        if n and (np.diff(offsets) < 12 + npix).any():
            raise ValueError("truncated pixel data")
        w2, h2 = w // f, h // f
        nout = w2 * h2
        cum_out = np.zeros(n, np.int64)
        if n:
            np.cumsum(nout[:-1], out=cum_out[1:])
        total_out = int(nout.sum()) if n else 0

        rv = np.zeros(total_out, np.int64)
        if total_out:
            rows_of = np.repeat(np.arange(n), npix)
            cum = np.zeros(n, np.int64)
            np.cumsum(npix[:-1], out=cum[1:])
            flat = np.arange(int(npix.sum()))
            within = flat - cum[rows_of]
            px = d64[starts[rows_of] + 12 + within]
            wv = w[rows_of]
            x = within % wv
            y = within // wv
            keep = (x < w2[rows_of] * f) & (y < h2[rows_of] * f)
            gid = cum_out[rows_of][keep] + (
                (y[keep] // f) * w2[rows_of][keep] + x[keep] // f
            )
            # float64 bincount sums are exact here (box sums < 255·f²≪2^53)
            box = np.bincount(gid, weights=px[keep], minlength=total_out)
            rv = (np.rint(box).astype(np.int64)) // (f * f)
        return self._emit(sub, w, h, w2, h2, rv)

    def _emit(self, sub, w, h, w2, h2, rv_flat) -> pa.Table:
        n = sub.num_rows
        nout = w2 * h2
        cum_out = np.zeros(n, np.int64)
        if n:
            np.cumsum(nout[:-1], out=cum_out[1:])
        sum_px = np.zeros(n, np.int64)
        sumsq = np.zeros(n, np.int64)
        nz = nout > 0
        if rv_flat.size:
            sum_px[nz] = np.add.reduceat(rv_flat, cum_out[nz])
            sumsq[nz] = np.add.reduceat(rv_flat * rv_flat, cum_out[nz])
        payloads = []
        rv_u8 = rv_flat.astype(np.uint8)
        for i in range(n):
            payloads.append(
                MAGIC
                + int(w2[i]).to_bytes(2, "little")
                + int(h2[i]).to_bytes(2, "little")
                + rv_u8[cum_out[i] : cum_out[i] + nout[i]].tobytes()
            )
        mean = sum_px / np.maximum(1, nout).astype(np.float64)
        return pa.table(
            {
                "media_id": sub["media_id"],
                "src_width": pa.array(w.astype(np.int32), pa.int32()),
                "src_height": pa.array(h.astype(np.int32), pa.int32()),
                "width": pa.array(w2.astype(np.int32), pa.int32()),
                "height": pa.array(h2.astype(np.int32), pa.int32()),
                "sum_pixel": pa.array(sum_px, pa.int64()),
                "sumsq_pixel": pa.array(sumsq, pa.int64()),
                "mean_pixel": pa.array(mean, pa.float64()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )


class VideoFrameSampler:
    """Actor-pool frame sampling over the byte-transparent ``fakevid``
    container (8-byte magic + u16 width/height/n_frames + grayscale frames
    back-to-back): keeps every ``stride``-th frame and emits ONE ROW PER
    SAMPLED FRAME with integer-exact pixel aggregates — the row-expanding
    map_batches shape a real video pipeline (decode → frame-sample →
    feature) uses, minus only the codec. Fully vectorized: one flat byte
    gather + bincount segment sums across the whole batch."""

    def __init__(self, stride: int = 3, accept_formats=("fakevid",)):
        if stride < 1:
            raise ValueError("stride must be >= 1")
        for f in accept_formats:
            if f != "fakevid":
                raise NotImplementedError(
                    f"video codec for format {f!r} is not available in "
                    "this environment (real parser: fakevid)"
                )
        self.stride = int(stride)
        self.accept = set(accept_formats)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.batch import to_byte_rows

        s = self.stride
        keep_fmt = pa.compute.is_in(
            batch["format"], value_set=pa.array(sorted(self.accept))
        )
        sub = batch.filter(keep_fmt)
        data, offsets = to_byte_rows(sub["payload"])
        n = sub.num_rows
        starts = offsets[:-1]
        d64 = data.astype(np.int64)
        if n:
            magic = np.frombuffer(VID_MAGIC, np.uint8)
            head = data[starts[:, None] + np.arange(8)[None, :]]
            if not (head == magic[None, :]).all():
                raise ValueError("bad magic")
            w = d64[starts + 8] + (d64[starts + 9] << 8)
            h = d64[starts + 10] + (d64[starts + 11] << 8)
            nf = d64[starts + 12] + (d64[starts + 13] << 8)
        else:
            w = h = nf = np.zeros(0, np.int64)
        fpp = w * h
        npix = fpp * nf
        if n and (np.diff(offsets) < 14 + npix).any():
            raise ValueError("truncated frame data")
        nsamp = (nf + s - 1) // s  # frames with frame_idx % stride == 0
        cum_sf = np.zeros(n, np.int64)
        if n:
            np.cumsum(nsamp[:-1], out=cum_sf[1:])
        total_sf = int(nsamp.sum()) if n else 0

        sum_px = np.zeros(total_sf, np.int64)
        sumsq = np.zeros(total_sf, np.int64)
        if total_sf and npix.sum():
            rows_of = np.repeat(np.arange(n), npix)
            cum = np.zeros(n, np.int64)
            np.cumsum(npix[:-1], out=cum[1:])
            flat = np.arange(int(npix.sum()))
            within = flat - cum[rows_of]
            frame = within // fpp[rows_of]
            keep = (frame % s) == 0
            px = d64[starts[rows_of][keep] + 14 + within[keep]]
            sid = cum_sf[rows_of][keep] + frame[keep] // s
            # exact in float64 (frame sums < 255·2^16·2^16 ≪ 2^53)
            sum_px = np.rint(
                np.bincount(sid, weights=px, minlength=total_sf)
            ).astype(np.int64)
            sumsq = np.rint(
                np.bincount(sid, weights=px * px, minlength=total_sf)
            ).astype(np.int64)

        media_rep = np.repeat(
            sub["media_id"].to_numpy(zero_copy_only=False), nsamp
        ) if n else np.zeros(0, np.int64)
        fi = (
            np.arange(total_sf) - np.repeat(cum_sf, nsamp)
        ) * s if n else np.zeros(0, np.int64)
        w_rep = np.repeat(w, nsamp) if n else w
        h_rep = np.repeat(h, nsamp) if n else h
        area = np.maximum(1, w_rep * h_rep).astype(np.float64)
        return pa.table(
            {
                "media_id": pa.array(media_rep, pa.int64()),
                "frame_idx": pa.array(fi, pa.int64()),
                "width": pa.array(w_rep.astype(np.int32), pa.int32()),
                "height": pa.array(h_rep.astype(np.int32), pa.int32()),
                "sum_pixel": pa.array(sum_px, pa.int64()),
                "sumsq_pixel": pa.array(sumsq, pa.int64()),
                "mean_pixel": pa.array(sum_px / area, pa.float64()),
            }
        )


def resize_images(media, factor: int = 4, concurrency=2, batch_size: int = 64,
                  accept_formats=("fakeimg",)):
    """Binary image payloads → box-averaged thumbnails + exact aggregates."""
    return media.map_batches(
        ImageResizer,
        fn_constructor_kwargs={
            "factor": factor, "accept_formats": tuple(accept_formats)
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_video_frames(media, stride: int = 3, concurrency=2,
                        batch_size: int = 32):
    """Video payloads → one feature row per sampled frame (every
    ``stride``-th). Small batch_size: frame-expanded rows × concurrency
    must fit a worker heap."""
    return media.map_batches(
        VideoFrameSampler,
        fn_constructor_kwargs={"stride": stride},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
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
