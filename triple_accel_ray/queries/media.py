"""Multimodal codec queries (PNG/WAV/JPEG/video).

Split from the monolithic queries.py (round-5); every block is the
original registration verbatim — register() adds the Ray-side
callables, register_sql() the DuckDB oracle twins."""
from ._common import *  # noqa: F401,F403
from ._sql_helpers import *  # noqa: F401,F403


def register(q):

    # ---- multimodal plumbing -------------------------------------------
    def _ensure_fixture_file(path, build):
        if not os.path.exists(path):
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path + ".tmp"
            pq.write_table(build(), tmp)
            os.replace(tmp, path)

    def media_feature_rows(sf_dir):
        """Deterministic fake-image corpus written once to a fixture path
        (so the DuckDB oracle can parse the same payload blobs), decoded by
        the vectorized actor-pool stage."""
        _ensure_fixture_file(
            MEDIA_FIXTURE, lambda: synthesize_media_table(200, seed=42))
        media = read_parquet_clean(MEDIA_FIXTURE)
        return media_features(media, concurrency=2, batch_size=64)

    q["media_feature_rows"] = media_feature_rows

    def media_feature_rows_png(sf_dir):
        """REAL PNG decode (stdlib zlib + numpy unfiltering, every filter
        type 0-4 exercised across rows). The PNG corpus carries the exact
        pixel content of the fakeimg fixture (same rng draws), so the SQL
        oracle parses the byte-transparent fakeimg payloads while the Ray
        pipeline must reproduce the identical features from the compressed
        PNGs — a value-exact end-to-end codec check."""
        _ensure_fixture_file(
            MEDIA_FIXTURE, lambda: synthesize_media_table(200, seed=42))
        _ensure_fixture_file(
            MEDIA_PNG_FIXTURE, lambda: synthesize_media_table_png(200, seed=42))
        media = read_parquet_clean(MEDIA_PNG_FIXTURE)
        return media_features(
            media, concurrency=2, batch_size=64, accept_formats=("png",))

    q["media_feature_rows_png"] = media_feature_rows_png

    def media_feature_rows_jpeg(sf_dir):
        """REAL baseline JPEG decode (numpy DCT + canonical Huffman +
        marker walk, ops/jpeg.py). The corpus is 8x8-tile-constant images
        — the one image class where lossy JPEG round-trips bit-exactly at
        quant=1 (DC-only blocks, proof in ops/jpeg.py) — so the SQL oracle
        can parse the byte-transparent tiles twin (same rng draws) while
        the Ray pipeline must recover identical integer aggregates from
        entropy-coded JPEG payloads."""
        _ensure_fixture_file(
            MEDIA_TILES_FIXTURE,
            lambda: synthesize_media_table_tiles(200, seed=43))
        _ensure_fixture_file(
            MEDIA_JPEG_FIXTURE,
            lambda: synthesize_media_table_jpeg(200, seed=43))
        media = read_parquet_clean(MEDIA_JPEG_FIXTURE)
        return media_features(
            media, concurrency=2, batch_size=64, accept_formats=("jpeg",))

    q["media_feature_rows_jpeg"] = media_feature_rows_jpeg

    def media_feature_rows_jpeg_rgb(sf_dir):
        """REAL COLOR baseline JPEG decode (round-4): interleaved
        3-component YCbCr scans with 4:2:0 chroma subsampling, Annex-K
        luma+chroma Huffman tables, two quant tables (ops/jpeg.py). The
        corpus is 16x16-tile-constant RGB — the class where the DCT path
        is bit-exact at quant=1 and the only loss is the deterministic
        YCbCr integer round trip F(rgb), which the byte-transparent RGB
        tiles twin stores (same rng draws) — so the SQL oracle parses
        the twin while the Ray side must recover identical integer
        aggregates from entropy-coded color JPEG payloads."""
        _ensure_fixture_file(
            MEDIA_TILES_RGB_FIXTURE,
            lambda: synthesize_media_table_tiles_rgb(200, seed=44))
        _ensure_fixture_file(
            MEDIA_JPEG_RGB_FIXTURE,
            lambda: synthesize_media_table_jpeg_rgb(200, seed=44))
        media = read_parquet_clean(MEDIA_JPEG_RGB_FIXTURE)
        return media_features(
            media, concurrency=2, batch_size=64, accept_formats=("jpeg",))

    q["media_feature_rows_jpeg_rgb"] = media_feature_rows_jpeg_rgb

    def audio_feature_rows(sf_dir):
        """REAL WAV/PCM16 decode; the oracle parses the s16le sample bytes
        straight out of the payload hex (canonical 44-byte header)."""
        _ensure_fixture_file(
            AUDIO_FIXTURE, lambda: synthesize_audio_table(200, seed=42))
        audio = read_parquet_clean(AUDIO_FIXTURE)
        return audio_features(audio, concurrency=2, batch_size=64)

    q["audio_feature_rows"] = audio_feature_rows

    def media_resize_4x(sf_dir):
        """Box-average 4x downscale (floor-of-mean per 4x4 box, trailing
        remainder cropped): the oracle recomputes every output pixel in SQL
        from the raw payload bytes, so the resize math — not just the
        aggregates — is value-checked."""
        _ensure_fixture_file(
            MEDIA_FIXTURE, lambda: synthesize_media_table(200, seed=42))
        media = read_parquet_clean(MEDIA_FIXTURE)
        return resize_images(
            media, factor=4, concurrency=2, batch_size=64
        ).drop_columns(["payload"])

    q["media_resize_4x"] = media_resize_4x

    def media_resize_4x_png(sf_dir):
        """Same resize over REAL PNGs carrying the identical pixels (same
        rng draws as the fakeimg fixture) — decode + resize must reproduce
        the fakeimg oracle's numbers from compressed, filtered payloads."""
        _ensure_fixture_file(
            MEDIA_FIXTURE, lambda: synthesize_media_table(200, seed=42))
        _ensure_fixture_file(
            MEDIA_PNG_FIXTURE, lambda: synthesize_media_table_png(200, seed=42))
        media = read_parquet_clean(MEDIA_PNG_FIXTURE)
        return resize_images(
            media, factor=4, concurrency=2, batch_size=64,
            accept_formats=("png",),
        ).drop_columns(["payload"])

    q["media_resize_4x_png"] = media_resize_4x_png

    def media_resize_4x_jpeg(sf_dir):
        """Same resize over REAL baseline JPEGs of the tile-constant corpus
        (bit-exact decode, ops/jpeg.py) — decode + box-average must
        reproduce the tiles twin's byte-parse oracle from entropy-coded
        payloads."""
        _ensure_fixture_file(
            MEDIA_TILES_FIXTURE,
            lambda: synthesize_media_table_tiles(200, seed=43))
        _ensure_fixture_file(
            MEDIA_JPEG_FIXTURE,
            lambda: synthesize_media_table_jpeg(200, seed=43))
        media = read_parquet_clean(MEDIA_JPEG_FIXTURE)
        return resize_images(
            media, factor=4, concurrency=2, batch_size=64,
            accept_formats=("jpeg",),
        ).drop_columns(["payload"])

    q["media_resize_4x_jpeg"] = media_resize_4x_jpeg

    def video_frame_samples(sf_dir):
        """Every-3rd-frame sampling over the byte-transparent fakevid
        container: one feature row per sampled frame (row-expanding
        map_batches), integer aggregates parsed per frame by the oracle."""
        _ensure_fixture_file(
            VIDEO_FIXTURE, lambda: synthesize_video_table(200, seed=42))
        media = read_parquet_clean(VIDEO_FIXTURE)
        return sample_video_frames(media, stride=3, concurrency=2,
                                   batch_size=32)

    q["video_frame_samples"] = video_frame_samples


def register_sql(o):
    fx, W, docs_cte, sig_pairs_cte, scored_cte = _er_oracle_prelude()  # noqa: F841

    # Fake-image payloads parsed directly from the blob in SQL (hex-pair →
    # byte values); integer aggregates are exact, float features derive
    # from them with the identical IEEE-754 op order as the decoder.
    hv1 = "(strpos('0123456789ABCDEF', substr(hx, 2*(12+j)+1, 1)) - 1) * 16"
    hv2 = "(strpos('0123456789ABCDEF', substr(hx, 2*(12+j)+2, 1)) - 1)"
    o["media_feature_rows"] = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx, width::BIGINT AS w, height::BIGINT AS h
  FROM read_parquet('{MEDIA_FIXTURE}')
),
px AS (
  SELECT media_id, w, h, j, {hv1} + {hv2} AS v
  FROM (SELECT media_id, hx, w, h, unnest(range(0, w*h)) AS j FROM m)
),
agg AS (
  SELECT media_id, w, h,
         sum(v)::BIGINT AS sum_pixel,
         sum(v*v)::BIGINT AS sumsq_pixel
  FROM px GROUP BY media_id, w, h
),
hd AS (
  SELECT a.media_id, sum(abs(b.v - a.v))::BIGINT AS sum_hdiff
  FROM px a JOIN px b ON b.media_id = a.media_id AND b.j = a.j + 1
  WHERE (a.j % a.w) != a.w - 1
  GROUP BY a.media_id
)
SELECT g.media_id, g.w::INT AS width, g.h::INT AS height,
       g.sum_pixel, g.sumsq_pixel,
       coalesce(hd.sum_hdiff, 0)::BIGINT AS sum_hdiff,
       g.sum_pixel::DOUBLE / (g.w * g.h) AS mean_pixel,
       sqrt(greatest(0.0, (g.sumsq_pixel -
            (g.sum_pixel * g.sum_pixel)::DOUBLE / (g.w * g.h))
            / (g.w * g.h))) AS std_pixel,
       coalesce(hd.sum_hdiff, 0)::DOUBLE / greatest(1, g.h * (g.w - 1)) AS edge_energy
FROM agg g LEFT JOIN hd ON hd.media_id = g.media_id"""

    # The PNG corpus carries the SAME pixels as the fakeimg fixture (same
    # rng draws; grayscale luma == the pixel byte), so the oracle for the
    # real-PNG decode is the fakeimg byte-parse verbatim: the Ray side must
    # recover identical features from zlib-compressed, scanline-filtered
    # payloads that SQL cannot parse.
    o["media_feature_rows_png"] = o["media_feature_rows"]

    # JPEG twin: the tiles fixture carries the SAME pixels as the JPEG
    # corpus (same rng draws; tile-constant images round-trip baseline
    # JPEG bit-exactly at quant=1 — ops/jpeg.py), so the oracle is the
    # fakeimg byte-parse over the tiles twin: the Ray side must recover
    # identical aggregates from entropy-coded DCT payloads.
    o["media_feature_rows_jpeg"] = o["media_feature_rows"].replace(
        MEDIA_FIXTURE, MEDIA_TILES_FIXTURE)

    # COLOR JPEG twin: the RGB tiles fixture stores the deterministic
    # YCbCr round trip of the same draws as an (h, 3w) interleaved byte
    # matrix, so the identical fakeimg byte-parse applies — the Ray side
    # must reproduce it from interleaved 4:2:0 color scans.
    o["media_feature_rows_jpeg_rgb"] = o["media_feature_rows"].replace(
        MEDIA_FIXTURE, MEDIA_TILES_RGB_FIXTURE)

    # s16le samples parsed from the payload hex at the canonical 44-byte
    # header offset: lo byte at 44+2j, hi byte at 45+2j, two's complement.
    lo = ("(strpos('0123456789ABCDEF', substr(hx, 2*(44+2*j)+1, 1)) - 1) * 16"
          " + (strpos('0123456789ABCDEF', substr(hx, 2*(44+2*j)+2, 1)) - 1)")
    hi = ("(strpos('0123456789ABCDEF', substr(hx, 2*(45+2*j)+1, 1)) - 1) * 16"
          " + (strpos('0123456789ABCDEF', substr(hx, 2*(45+2*j)+2, 1)) - 1)")
    o["audio_feature_rows"] = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx,
         sample_rate::BIGINT AS rate, n_samples::BIGINT AS ns
  FROM read_parquet('{AUDIO_FIXTURE}')
),
smp AS (
  SELECT media_id, rate, ns, j,
         CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END AS s
  FROM (
    SELECT media_id, rate, ns, j, ({lo}) + 256 * ({hi}) AS raw
    FROM (SELECT media_id, hx, rate, ns, unnest(range(0, ns)) AS j FROM m)
  )
),
agg AS (
  SELECT media_id, rate, ns,
         sum(abs(s))::BIGINT AS sum_abs,
         sum(s*s)::BIGINT AS sumsq
  FROM smp GROUP BY media_id, rate, ns
),
zx AS (
  SELECT a.media_id,
         sum(CASE WHEN (a.s >= 0) != (b.s >= 0) THEN 1 ELSE 0 END)::BIGINT
           AS zero_crossings
  FROM smp a JOIN smp b ON b.media_id = a.media_id AND b.j = a.j + 1
  GROUP BY a.media_id
)
SELECT g.media_id, g.rate AS sample_rate, 1::BIGINT AS channels,
       g.ns AS n_frames, g.sum_abs, g.sumsq,
       coalesce(z.zero_crossings, 0)::BIGINT AS zero_crossings,
       g.sum_abs::DOUBLE / g.ns AS mean_abs,
       sqrt(g.sumsq::DOUBLE / g.ns) AS rms
FROM agg g LEFT JOIN zx z ON z.media_id = g.media_id"""

    # Box-average 4x resize recomputed pixel-for-pixel in SQL: every output
    # pixel is floor(sum of its 4x4 source box / 16) over the cropped
    # region; aggregates then match the pipeline's integers exactly.
    o["media_resize_4x"] = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx, width::BIGINT AS w, height::BIGINT AS h
  FROM read_parquet('{MEDIA_FIXTURE}')
),
px AS (
  SELECT media_id, w, h, j, {hv1} + {hv2} AS v
  FROM (SELECT media_id, hx, w, h, unnest(range(0, w*h)) AS j FROM m)
),
boxes AS (
  SELECT media_id, w, h, (j // w) // 4 AS oy, (j % w) // 4 AS ox,
         (sum(v) // 16)::BIGINT AS rv
  FROM px
  WHERE (j % w) < (w - w % 4) AND (j // w) < (h - h % 4)
  GROUP BY media_id, w, h, oy, ox
),
agg AS (
  SELECT media_id, any_value(w) AS w, any_value(h) AS h,
         sum(rv)::BIGINT AS sum_pixel, sum(rv*rv)::BIGINT AS sumsq_pixel
  FROM boxes GROUP BY media_id
)
SELECT m.media_id, m.w::INT AS src_width, m.h::INT AS src_height,
       (m.w // 4)::INT AS width, (m.h // 4)::INT AS height,
       coalesce(a.sum_pixel, 0) AS sum_pixel,
       coalesce(a.sumsq_pixel, 0) AS sumsq_pixel,
       coalesce(a.sum_pixel, 0)::DOUBLE
         / greatest(1, (m.w // 4) * (m.h // 4)) AS mean_pixel
FROM m LEFT JOIN agg a ON a.media_id = m.media_id"""

    # PNG twin: same pixels (same rng draws), so the fakeimg byte-parse
    # oracle applies verbatim — the pipeline must reproduce it from real
    # compressed PNGs.
    o["media_resize_4x_png"] = o["media_resize_4x"]

    # JPEG twin: tile-constant pixels decode bit-exactly from baseline
    # JPEG (ops/jpeg.py), so the tiles fixture's byte-parse oracle applies.
    o["media_resize_4x_jpeg"] = o["media_resize_4x"].replace(
        MEDIA_FIXTURE, MEDIA_TILES_FIXTURE)

    # fakevid frames parsed straight from payload bytes (pixel data starts
    # at byte 14); every 3rd frame kept, aggregated per sampled frame.
    vv1 = "(strpos('0123456789ABCDEF', substr(hx, 2*(14+j)+1, 1)) - 1) * 16"
    vv2 = "(strpos('0123456789ABCDEF', substr(hx, 2*(14+j)+2, 1)) - 1)"
    o["video_frame_samples"] = f"""
WITH m AS (
  SELECT media_id, hex(payload) AS hx, width::BIGINT AS w,
         height::BIGINT AS h, n_frames::BIGINT AS nf
  FROM read_parquet('{VIDEO_FIXTURE}')
),
px AS (
  SELECT media_id, w, h, j // (w*h) AS f, {vv1} + {vv2} AS v
  FROM (SELECT media_id, hx, w, h, unnest(range(0, w*h*nf)) AS j FROM m)
  WHERE (j // (w*h)) % 3 = 0
)
SELECT media_id, f AS frame_idx,
       any_value(w)::INT AS width, any_value(h)::INT AS height,
       sum(v)::BIGINT AS sum_pixel, sum(v*v)::BIGINT AS sumsq_pixel,
       sum(v)::DOUBLE / greatest(1, any_value(w) * any_value(h)) AS mean_pixel
FROM px GROUP BY media_id, f"""
