"""Real-codec tests: PNG round-trips across color types and every filter
type, malformed-input rejection, WAV PCM round-trips, and the decode
stages' parity with the byte-parseable fakeimg fixture."""

import numpy as np
import pyarrow as pa
import pytest

from triple_accel_ray.ops.codecs import (
    png_decode,
    png_encode,
    png_encode_filtered,
    png_luma,
    wav_decode,
    wav_encode,
)
from triple_accel_ray.ops.multimodal import (
    AudioDecoder,
    MediaDecoder,
    synthesize_audio_table,
    synthesize_media_table,
    synthesize_media_table_png,
)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_color_types(ch):
    rng = np.random.default_rng(7 + ch)
    img = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    got = png_decode(png_encode(img))
    np.testing.assert_array_equal(got, img)


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_roundtrip_each_filter(ft):
    rng = np.random.default_rng(40 + ft)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, size=(11, 17, ch), dtype=np.uint8)
        buf = png_encode_filtered(img, np.full(11, ft))
        np.testing.assert_array_equal(png_decode(buf), img)


def test_png_roundtrip_mixed_filters_and_shapes():
    rng = np.random.default_rng(99)
    for h, w, ch in [(1, 1, 1), (1, 64, 3), (64, 1, 1), (5, 300, 4), (300, 5, 1)]:
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        buf = png_encode_filtered(img, rng.integers(0, 5, size=h))
        np.testing.assert_array_equal(png_decode(buf), img)


def test_png_palette():
    # hand-build a palette image: encode indices as grayscale then patch
    # the color type to 3 and prepend a PLTE chunk
    import struct
    import zlib

    rng = np.random.default_rng(3)
    idx = rng.integers(0, 16, size=(6, 8), dtype=np.uint8)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    rows = np.zeros((6, 8 + 1), np.uint8)
    rows[:, 1:] = idx
    from triple_accel_ray.ops.codecs import PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 8, 6, 8, 3, 0, 0, 0)
    buf = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
        + _chunk(b"IEND", b"")
    )
    got = png_decode(buf)
    np.testing.assert_array_equal(got, plte[idx])


def test_png_rejects_malformed():
    img = np.zeros((4, 4, 1), np.uint8)
    good = png_encode(img)
    with pytest.raises(ValueError):
        png_decode(b"NOTAPNG" + good)
    with pytest.raises(ValueError):
        png_decode(good[:20])  # truncated chunk stream
    # interlaced: patch IHDR interlace byte (offset 8+8+4+4+4+1+1+1+1+1-1)
    import struct
    import zlib as _z

    from triple_accel_ray.ops.codecs import PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 1)
    bad = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _z.compress(b"\x00" * 20))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        png_decode(bad)


def test_png_luma_rgb_integer_weights():
    img = np.zeros((1, 2, 3), np.uint8)
    img[0, 0] = (255, 0, 0)
    img[0, 1] = (10, 20, 30)
    lum = png_luma(img)
    assert lum[0, 0] == (77 * 255) >> 8
    assert lum[0, 1] == (77 * 10 + 150 * 20 + 29 * 30) >> 8


@pytest.mark.parametrize("bits,nch", [(16, 1), (16, 2), (8, 1)])
def test_wav_roundtrip(bits, nch):
    rng = np.random.default_rng(5)
    lo, hi = (-128, 128) if bits == 8 else (-32768, 32768)
    s = rng.integers(lo, hi, size=(257, nch)).astype(np.int32)
    got, rate = wav_decode(wav_encode(s, 16000, bits=bits))
    assert rate == 16000
    np.testing.assert_array_equal(got, s)


def test_wav_rejects_malformed():
    with pytest.raises(ValueError):
        wav_decode(b"RIFX0000WAVE")
    with pytest.raises(ValueError):
        wav_decode(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data
    buf = bytearray(wav_encode(np.zeros(8, np.int32), 8000))
    buf[20] = 3  # audio format 3 (float) unsupported
    with pytest.raises(NotImplementedError):
        wav_decode(bytes(buf))


def test_media_decoder_png_matches_fakeimg_features():
    """The PNG fixture carries the SAME pixels as the fakeimg fixture, so
    both decode paths must emit identical feature rows — cross-codec
    value parity, the same check the SQL oracle performs."""
    fake = synthesize_media_table(40, seed=42)
    png = synthesize_media_table_png(40, seed=42)
    got_fake = MediaDecoder(("fakeimg",))(fake)
    got_png = MediaDecoder(("png",))(png)
    assert got_fake.equals(got_png)


def test_media_decoder_mixed_formats_one_batch():
    fake = synthesize_media_table(10, seed=1)
    png = synthesize_media_table_png(10, seed=1)
    mixed = pa.concat_tables(
        [fake.slice(0, 5), png.slice(5, 5)]
    )
    got = MediaDecoder(("fakeimg", "png"))(mixed)
    ref = MediaDecoder(("fakeimg",))(fake)
    assert got.sort_by("media_id").equals(ref.sort_by("media_id"))


def test_media_decoder_unknown_format_not_implemented():
    # jpeg graduated to a real decoder in round 3 (ops/jpeg.py); formats
    # genuinely beyond a from-scratch codec still refuse honestly
    with pytest.raises(NotImplementedError):
        MediaDecoder(("gif",))


def test_media_decoder_jpeg_matches_tiles_features():
    """The JPEG fixture carries the SAME pixels as the tile-constant
    fakeimg twin and tile-constant images round-trip baseline JPEG
    bit-exactly at quant=1 — so both decode paths must emit identical
    feature rows (the SQL oracle's check)."""
    from triple_accel_ray.ops.multimodal import (
        synthesize_media_table_jpeg,
        synthesize_media_table_tiles,
    )

    tiles = synthesize_media_table_tiles(30, seed=43)
    jpg = synthesize_media_table_jpeg(30, seed=43)
    got_tiles = MediaDecoder(("fakeimg",))(tiles)
    got_jpg = MediaDecoder(("jpeg",))(jpg)
    assert got_tiles.equals(got_jpg)


def test_audio_decoder_integer_exact():
    tbl = synthesize_audio_table(25, seed=42)
    out = AudioDecoder()(tbl)
    assert out.num_rows == 25
    # independent recompute of one row from the raw payload
    buf = tbl["payload"][3].as_py()
    samples = np.frombuffer(buf[44:], "<i2").astype(np.int64)
    r = {c: out[c][3].as_py() for c in out.column_names}
    assert r["n_frames"] == len(samples)
    assert r["sum_abs"] == int(np.abs(samples).sum())
    assert r["sumsq"] == int((samples * samples).sum())
    nonneg = samples >= 0
    assert r["zero_crossings"] == int(np.sum(nonneg[1:] != nonneg[:-1]))
    assert r["rms"] == float(np.sqrt(r["sumsq"] / len(samples)))
