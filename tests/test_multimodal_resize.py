"""Resize + video frame-sample ops vs naive per-image numpy references."""

import numpy as np
import pyarrow as pa

from triple_accel_ray.ops.codecs import png_encode_filtered
from triple_accel_ray.ops.multimodal import (
    MAGIC,
    ImageResizer,
    VideoFrameSampler,
    synthesize_media_table,
    synthesize_media_table_png,
    synthesize_video_table,
)


def _naive_box_resize(pixels: np.ndarray, f: int) -> np.ndarray:
    h, w = pixels.shape
    h2, w2 = h // f, w // f
    out = np.zeros((h2, w2), np.int64)
    for y in range(h2):
        for x in range(w2):
            out[y, x] = pixels[y * f:(y + 1) * f, x * f:(x + 1) * f].sum() // (f * f)
    return out


def _fakeimg_pixels(payload: bytes):
    w = int.from_bytes(payload[8:10], "little")
    h = int.from_bytes(payload[10:12], "little")
    return np.frombuffer(payload[12:12 + w * h], np.uint8).astype(
        np.int64
    ).reshape(h, w)


def test_resize_matches_naive_reference():
    tab = synthesize_media_table(40, seed=7)
    out = ImageResizer(factor=4)(tab)
    assert out.num_rows == 40
    for i in range(40):
        px = _fakeimg_pixels(tab["payload"][i].as_py())
        ref = _naive_box_resize(px, 4)
        assert out["width"][i].as_py() == ref.shape[1]
        assert out["height"][i].as_py() == ref.shape[0]
        assert out["sum_pixel"][i].as_py() == int(ref.sum())
        assert out["sumsq_pixel"][i].as_py() == int((ref * ref).sum())
        got = _fakeimg_pixels(out["payload"][i].as_py())
        np.testing.assert_array_equal(got, ref)


def test_resize_png_equals_fakeimg_path():
    fake = synthesize_media_table(25, seed=11)
    png = synthesize_media_table_png(25, seed=11)
    a = ImageResizer(factor=4)(fake)
    b = ImageResizer(factor=4, accept_formats=("png",))(png)
    for col in ("width", "height", "sum_pixel", "sumsq_pixel", "mean_pixel"):
        assert a[col].to_pylist() == b[col].to_pylist()
    assert a["payload"].to_pylist() == b["payload"].to_pylist()


def test_resize_factor1_is_identity():
    tab = synthesize_media_table(10, seed=3)
    out = ImageResizer(factor=1)(tab)
    for i in range(10):
        px = _fakeimg_pixels(tab["payload"][i].as_py())
        assert out["sum_pixel"][i].as_py() == int(px.sum())
        assert out["payload"][i].as_py() == tab["payload"][i].as_py()


def test_resize_smaller_than_factor_gives_empty_image():
    # a 3x5 image under factor 4 crops to 0x1 -> zero pixels, zero sums
    px = np.arange(15, dtype=np.uint8)
    payload = MAGIC + (3).to_bytes(2, "little") + (5).to_bytes(2, "little") + px.tobytes()
    tab = pa.table({
        "media_id": pa.array([0], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
        "format": pa.array(["fakeimg"]),
    })
    out = ImageResizer(factor=4)(tab)
    assert out["width"][0].as_py() == 0
    assert out["height"][0].as_py() == 1
    assert out["sum_pixel"][0].as_py() == 0
    assert out["payload"][0].as_py() == MAGIC + b"\x00\x00\x01\x00"


def test_video_sampler_matches_naive_reference():
    tab = synthesize_video_table(30, seed=9)
    out = VideoFrameSampler(stride=3)(tab)
    r = 0
    for i in range(30):
        payload = tab["payload"][i].as_py()
        w = int.from_bytes(payload[8:10], "little")
        h = int.from_bytes(payload[10:12], "little")
        nf = int.from_bytes(payload[12:14], "little")
        frames = np.frombuffer(payload[14:14 + w * h * nf], np.uint8).astype(
            np.int64
        ).reshape(nf, h * w)
        for fi in range(0, nf, 3):
            assert out["media_id"][r].as_py() == tab["media_id"][i].as_py()
            assert out["frame_idx"][r].as_py() == fi
            assert out["sum_pixel"][r].as_py() == int(frames[fi].sum())
            assert out["sumsq_pixel"][r].as_py() == int(
                (frames[fi] * frames[fi]).sum()
            )
            r += 1
    assert r == out.num_rows


def test_video_sampler_stride1_keeps_every_frame():
    tab = synthesize_video_table(5, seed=2)
    out = VideoFrameSampler(stride=1)(tab)
    assert out.num_rows == int(
        np.sum(tab["n_frames"].to_numpy(zero_copy_only=False))
    )


def test_resizer_rejects_unavailable_codec():
    import pytest

    # jpeg is a real decoder since round 3 (ops/jpeg.py)
    with pytest.raises(NotImplementedError):
        ImageResizer(accept_formats=("gif",))
    with pytest.raises(NotImplementedError):
        VideoFrameSampler(accept_formats=("mp4",))


def test_resizer_jpeg_matches_tiles():
    from triple_accel_ray.ops.multimodal import (
        synthesize_media_table_jpeg,
        synthesize_media_table_tiles,
    )

    tiles = synthesize_media_table_tiles(20, seed=43)
    jpg = synthesize_media_table_jpeg(20, seed=43)
    a = ImageResizer(4, ("fakeimg",))(tiles)
    b = ImageResizer(4, ("jpeg",))(jpg)
    # resized payload re-encodes as fakeimg on both paths -> fully equal
    assert a.equals(b)
