"""Multimodal codecs + plumbing: REAL stdlib decoders (PNG gray/RGB
pixels, GIF LZW, BMP, WAV PCM, mu-law, header walks, thumbnails) over
genuine bytes, plus the mapInPandas contracts (schema, fan-out,
determinism) for the stubbed model stages (frames/features — no
PIL/torch in the container)."""

from __future__ import annotations

from downscaledclimatedata_spark.operators.multimodal import (
    DIM_H_MOD,
    DIM_W_MOD,
    FEATURE_DIM,
    FRAME_SIZE,
    FRAME_STRIDE,
    MAX_FRAMES,
    decode_image_headers,
    decode_payloads,
    extract_features,
    make_jpeg,
    make_png,
    parse_image_header,
    sample_frames,
    synthesize_image_payloads,
    with_binary_payload,
)
from downscaledclimatedata_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _docs(spark):
    return with_binary_payload(load_table(spark, SF_SMOKE, "documents"))


def test_frame_sampling_fanout(spark):
    docs = _docs(spark)
    n_docs = docs.count()
    frames = sample_frames(docs).collect()
    assert len(frames) > n_docs, "fan-out must exceed 1 row per doc on average"
    by_doc: dict = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    lengths = {len(r.frame) for r in frames}
    assert lengths == {FRAME_SIZE}
    for doc_id, rows in by_doc.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(len(rows)))
        assert len(rows) <= MAX_FRAMES
        for r in rows:
            assert r.byte_offset == r.frame_idx * FRAME_STRIDE


def test_frame_bytes_match_payload(spark):
    docs = _docs(spark).limit(5)
    payloads = {r.doc_id: bytes(r.payload) for r in docs.collect()}
    for r in sample_frames(docs).collect():
        blob = payloads[r.doc_id]
        assert bytes(r.frame) == blob[r.byte_offset:r.byte_offset + FRAME_SIZE]


def test_feature_extraction_contract(spark):
    docs = _docs(spark)
    feats = extract_features(docs).collect()
    assert len(feats) == docs.count()
    for r in feats:
        assert len(r.feature) == FEATURE_DIM
        sq = sum(x * x for x in r.feature)
        assert abs(sq - 1.0) < 1e-3, "features must be L2-normalized"


def test_feature_extraction_deterministic(spark):
    docs = _docs(spark).limit(10)
    a = {r.doc_id: r.feature for r in extract_features(docs).collect()}
    b = {r.doc_id: r.feature for r in extract_features(docs).collect()}
    assert a == b


def test_parse_png_header_real_bytes():
    blob = make_png(123, 45)
    assert blob[:8] == b"\x89PNG\r\n\x1a\n"
    assert parse_image_header(blob) == ("png", 123, 45)
    # a PNG must survive trailing garbage (parsers read IHDR, not length)
    assert parse_image_header(blob + b"\x00garbage") == ("png", 123, 45)


def test_parse_png_is_zlib_valid():
    """The synthesized PNG is a complete spec-valid file: the IDAT stream
    must decompress to height filter-prefixed rows of width bytes."""
    import struct
    import zlib
    blob = make_png(20, 7)
    # locate IDAT chunk: length(4) type(4) data crc(4) layout after IHDR
    idx = blob.index(b"IDAT")
    (length,) = struct.unpack(">I", blob[idx - 4:idx])
    raw = zlib.decompress(blob[idx + 4:idx + 4 + length])
    assert len(raw) == 7 * (20 + 1)


def test_parse_jpeg_header_walks_segments():
    blob = make_jpeg(640, 480)
    # make_jpeg inserts a COM segment before SOF0, so a naive fixed-offset
    # reader would fail — the parser must walk marker segments
    assert blob[2:4] == b"\xff\xe0" and b"\xff\xfe" in blob
    assert parse_image_header(blob) == ("jpeg", 640, 480)


def test_parse_rejects_corrupt_payloads():
    assert parse_image_header(b"") == ("unknown", None, None)
    assert parse_image_header(b"not an image at all") == ("unknown", None, None)
    assert parse_image_header(make_png(9, 9)[:15]) == ("unknown", None, None)
    # JPEG SOI but no SOF anywhere
    assert parse_image_header(b"\xff\xd8\xff\xd9") == ("unknown", None, None)


def test_image_decode_end_to_end(spark):
    """Synthesize real bytes in one mapInPandas, parse dims back out of
    the bytes in another; every row must match the doc_id formula."""
    docs = load_table(spark, SF_SMOKE, "documents").limit(40)
    decoded = decode_image_headers(synthesize_image_payloads(docs)).collect()
    assert len(decoded) == 40
    for r in decoded:
        d = abs(r.doc_id)
        assert r.format == ("png" if d % 2 == 0 else "jpeg")
        assert r.width == 16 + d % DIM_W_MOD
        assert r.height == 16 + d % DIM_H_MOD


def test_image_decode_tolerates_corrupt_rows(spark):
    """Row-level tolerance: a corrupt payload yields ('unknown', NULL,
    NULL) instead of failing the batch."""
    rows = [(1, bytearray(make_png(33, 44))), (2, bytearray(b"\x00\x01junk")),
            (3, bytearray(make_jpeg(55, 66)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in decode_image_headers(df).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("png", 33, 44)
    assert (out[2].format, out[2].width, out[2].height) == ("unknown", None, None)
    assert (out[3].format, out[3].width, out[3].height) == ("jpeg", 55, 66)


def test_decode_deterministic_dims(spark):
    docs = _docs(spark).limit(10)
    rows = {r.doc_id: r for r in decode_payloads(docs).collect()}
    payloads = {r.doc_id: bytes(r.payload) for r in docs.collect()}
    for doc_id, r in rows.items():
        n = len(payloads[doc_id])
        assert r.n_bytes == n
        assert r.width == 64 + (n % 193)
        assert r.height == 64 + (n % 97)


def test_wav_codec_roundtrip_genuine_bytes():
    """parse_wav_features must read fmt/data back out of real RIFF bytes
    (including walking past the LIST chunk) and compute PCM features."""
    from downscaledclimatedata_spark.operators.multimodal import (
        make_wav, parse_wav_features)
    samples = [100, -200, 300, -400, 500, -600]
    blob = make_wav(2, 44100, samples)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    ch, sr, bits, n_frames, peak, energy, bps = parse_wav_features(blob)
    assert (ch, sr, bits, n_frames) == (2, 44100, 16, 3)
    assert peak == 600
    assert energy == sum(x * x for x in samples)
    assert bps == 600  # 3 frames = one 16-frame block

    # per-block peaks: 20 mono frames -> blocks [0:16] and [16:20]
    mono = list(range(20))
    _, _, _, nf, pk, _, bps2 = parse_wav_features(make_wav(1, 8000, mono))
    assert (nf, pk) == (20, 19)
    assert bps2 == 15 + 19

    # odd-length data chunk exercises the RIFF even-pad in the walk
    odd = make_wav(1, 8000, [7])
    assert parse_wav_features(odd)[3] == 1


def test_wav_codec_rejects_corrupt_payloads():
    from downscaledclimatedata_spark.operators.multimodal import (
        make_wav, parse_wav_features)
    assert parse_wav_features(b"") is None
    assert parse_wav_features(b"NOTRIFF" * 4) is None
    blob = make_wav(1, 8000, [1, 2, 3])
    assert parse_wav_features(blob[:40]) is None  # truncated before data


def test_wav_spec_decodes_through_spark(spark):
    """The mapInPandas path: synthesized payloads decode to the doc_id
    formula values (spot-checked independently of the oracle)."""
    from downscaledclimatedata_spark.operators.multimodal import (
        WAV_FRAMES_BASE, WAV_FRAMES_MOD, WAV_RATE_BASE, WAV_RATE_MOD,
        WAV_RATE_STEP, WAV_SAMPLE_A, WAV_SAMPLE_B, WAV_SAMPLE_MOD,
        WAV_SAMPLE_OFF, decode_wav_features, synthesize_wav_payloads)
    docs = spark.range(0, 7).withColumnRenamed("id", "doc_id")
    got = {r.doc_id: r for r in
           decode_wav_features(synthesize_wav_payloads(docs)).collect()}
    assert len(got) == 7
    for d in range(7):
        r = got[d]
        ch = 1 + d % 2
        nf = WAV_FRAMES_BASE + d % WAV_FRAMES_MOD
        assert r.channels == ch
        assert r.sample_rate == WAV_RATE_BASE + WAV_RATE_STEP * (d % WAV_RATE_MOD)
        assert r.n_frames == nf
        smp = [((d * WAV_SAMPLE_A + i * WAV_SAMPLE_B) % WAV_SAMPLE_MOD)
               - WAV_SAMPLE_OFF for i in range(nf * ch)]
        assert r.peak_amp == max(abs(x) for x in smp)
        assert r.energy == sum(x * x for x in smp)


# --- real PNG pixel decode ----------------------------------------------------

def test_png_pixel_codec_roundtrip_all_filters():
    """Every standard filter (0-4) is exercised (height >= 8 guarantees
    two full filter cycles) and the decoder reconstructs the exact pixel
    stats from the bytes alone."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_pixel_stats,
        make_png_pixels,
    )

    rows = [bytes((3 * y + 5 * x + 17) % 256 for x in range(11))
            for y in range(10)]
    blob = make_png_pixels(rows)
    flat = [v for r in rows for v in r]
    assert decode_png_pixel_stats(blob) == (
        11, 10, 110, sum(flat), min(flat), max(flat))
    # multi-chunk IDAT decodes identically
    split = make_png_pixels(rows, split_idat=True)
    assert split != blob  # genuinely different chunking
    assert decode_png_pixel_stats(split) == decode_png_pixel_stats(blob)


def test_png_pixel_codec_rejects_corruption():
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_pixel_stats,
        make_png_pixels,
    )

    rows = [bytes(range(20)) for _ in range(9)]
    blob = make_png_pixels(rows)
    # bit-rot inside IDAT -> CRC mismatch -> None (not garbage stats)
    bad = bytearray(blob)
    bad[45] ^= 0x40
    assert decode_png_pixel_stats(bytes(bad)) is None
    # truncation -> None
    assert decode_png_pixel_stats(blob[: len(blob) // 2]) is None
    # non-PNG -> None
    assert decode_png_pixel_stats(b"\xff\xd8\xff\xe0 not a png") is None


def test_png_pixel_decode_through_spark(spark):
    """The registered spec path: synthesize genuine filtered PNGs through
    mapInPandas, decode pixels back, and verify stats against the pixel
    formula recomputed in plain Python — plus corrupt-row tolerance."""
    from downscaledclimatedata_spark.operators.multimodal import (
        PNG_PIX_A,
        PNG_PIX_B,
        PNG_PIX_C,
        PNG_PIX_H_BASE,
        PNG_PIX_H_MOD,
        PNG_PIX_W_BASE,
        PNG_PIX_W_MOD,
        decode_png_pixels,
        synthesize_png_pixel_payloads,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_png_pixels(synthesize_png_pixel_payloads(docs)).collect()}
    assert len(out) == 30
    for d in (0, 3, 17, 29):
        w = PNG_PIX_W_BASE + d % PNG_PIX_W_MOD
        h = PNG_PIX_H_BASE + d % PNG_PIX_H_MOD
        px = [(d * PNG_PIX_A + y * PNG_PIX_B + x * PNG_PIX_C) % 256
              for y in range(h) for x in range(w)]
        r = out[d]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert (r.pix_sum, r.pix_min, r.pix_max) == (sum(px), min(px), max(px))

    # corrupt payload among good ones -> NULL stats row, batch survives
    from downscaledclimatedata_spark.operators.multimodal import make_png_pixels
    good = make_png_pixels([bytes(range(12)) for _ in range(8)])
    bad = bytearray(good)
    bad[60] ^= 0xFF
    mixed = spark.createDataFrame(
        [(1, bytes(good)), (2, bytes(bad))], "doc_id long, payload binary")
    rows = {r.doc_id: r for r in decode_png_pixels(mixed).collect()}
    assert rows[1].pix_sum is not None
    assert rows[2].pix_sum is None and rows[2].width is None


def test_png_rgb_codec_roundtrip_and_truncated_scanline():
    """Color-type-2 decode: filters reverse at bpp=3 (the left
    neighbour is three bytes back), per-channel sums come out exact,
    and a payload whose raw stream is missing its last scanline —
    valid chunks, valid CRCs, wrong inflated length — returns None."""
    import zlib

    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_rgb_stats,
        make_png_pixels,
    )

    w, h = 7, 10  # height >= 8: two full filter cycles
    rows = [bytes((3 * y + 5 * x + 11 * c) % 256
                  for x in range(w) for c in range(3))
            for y in range(h)]
    blob = make_png_pixels(rows, color_type=2)
    flat = b"".join(rows)
    want = (w, h, w * h, sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3]),
            min(flat), max(flat))
    assert decode_png_rgb_stats(blob) == want
    # split IDAT decodes identically
    assert decode_png_rgb_stats(
        make_png_pixels(rows, color_type=2, split_idat=True)) == want
    # a grayscale payload is rejected by the RGB decoder (and vice versa)
    gray = make_png_pixels([bytes(range(7)) for _ in range(8)])
    assert decode_png_rgb_stats(gray) is None
    # truncated scanline: rebuild IDAT minus the last row's bytes
    import struct

    def _chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    full = bytearray()
    for row in rows:
        full.append(0)
        full += row
    trunc = (blob[:8] + blob[8:33]
             + _chunk(b"IDAT", zlib.compress(bytes(full[:-(3 * w + 1)]), 6))
             + _chunk(b"IEND", b""))
    assert decode_png_rgb_stats(trunc) is None


def test_png_rgb_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        PNG_RGB_A,
        PNG_RGB_B,
        PNG_RGB_C,
        PNG_RGB_CORRUPT_MOD,
        PNG_RGB_D,
        PNG_RGB_H_BASE,
        PNG_RGB_H_MOD,
        PNG_RGB_W_BASE,
        PNG_RGB_W_MOD,
        decode_png_rgb,
        synthesize_png_rgb_payloads,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_png_rgb(synthesize_png_rgb_payloads(docs)).collect()}
    assert len(out) == 20
    for d in (1, 4, 13):
        w = PNG_RGB_W_BASE + d % PNG_RGB_W_MOD
        h = PNG_RGB_H_BASE + d % PNG_RGB_H_MOD
        ch = [[(d * PNG_RGB_A + y * PNG_RGB_B + x * PNG_RGB_C
                + c * PNG_RGB_D) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
        r = out[d]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(sum(c) for c in ch)
        allv = [v for c in ch for v in c]
        assert (r.pix_min, r.pix_max) == (min(allv), max(allv))
    # planted truncated-scanline rows -> NULLs
    for d in (0, PNG_RGB_CORRUPT_MOD, 2 * PNG_RGB_CORRUPT_MOD):
        assert out[d].sum_r is None and out[d].width is None


def test_gif_lzw_codec_roundtrip_and_edges():
    """The hand-rolled GIF LZW pair is exact on width-boundary and
    KwKwK-pattern inputs — including the classic final-code edge where
    the table lands on 2^w - 1 exactly as the last data code is emitted
    (the decoder's post-read add widens, so the encoder must mirror it
    before writing END)."""
    from downscaledclimatedata_spark.operators.multimodal import (
        gif_lzw_decode,
        gif_lzw_encode,
    )

    # the doc-155 payload that exposed the final-code width desync
    d = 155
    data = bytes((d * 6151 + y * 93911 + x * 999983) % 256
                 for y in range(11) for x in range(25))
    assert gif_lzw_decode(gif_lzw_encode(data, 8), 8) == data
    # KwKwK stress (runs of one symbol exercise the code==len(table) case)
    run = bytes([3] * 500)
    assert gif_lzw_decode(gif_lzw_encode(run, 2), 2) == run
    # exact boundary sweep around the 9->10 bit transition
    for n in range(240, 280):
        seq = bytes((i * 31 + 7) % 256 for i in range(n))
        assert gif_lzw_decode(gif_lzw_encode(seq, 8), 8) == seq
    # table-overflow clear path (forces the 4096 reset)
    big = bytes((i * 197 + (i >> 3)) % 256 for i in range(60000))
    assert gif_lzw_decode(gif_lzw_encode(big, 8), 8) == big
    # empty stream
    assert gif_lzw_decode(gif_lzw_encode(b"", 8), 8) == b""


def test_gif_pixel_codec_roundtrip_and_corruption():
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_gif_pixel_stats,
        make_gif_pixels,
    )

    rows = [bytes((3 * y + 5 * x + 17) % 256 for x in range(11))
            for y in range(10)]
    blob = make_gif_pixels(rows)
    flat = [v for r in rows for v in r]
    assert decode_gif_pixel_stats(blob) == (
        11, 10, 110, sum(flat), min(flat), max(flat))
    # multi-sub-block body decodes identically
    small = make_gif_pixels(rows, block_size=16)
    assert small != blob
    assert decode_gif_pixel_stats(small) == decode_gif_pixel_stats(blob)
    # corrupt LZW stream (valid structure, garbage codes) -> None
    w, h = 11, 10
    corrupt = (b"GIF89a" + bytes([w, 0, h, 0]) + b"\xf7\x00\x00"
               + bytes(v for i in range(256) for v in (i, i, i))
               + b"\x2c" + bytes([0, 0, 0, 0, w, 0, h, 0, 0])
               + b"\x08\x14" + b"\xff" * 20 + b"\x00\x3b")
    assert decode_gif_pixel_stats(corrupt) is None
    # truncation mid-sub-block -> None
    assert decode_gif_pixel_stats(blob[: len(blob) - 10]) is None
    # non-GIF -> None
    assert decode_gif_pixel_stats(b"\x89PNG not a gif") is None


def test_gif_pixel_decode_through_spark(spark):
    """The registered spec path: synthesize genuine LZW GIFs through
    mapInPandas, decode pixels back, verify against the formula — and
    the planted corrupt-LZW rows (d % 11 == 0) come back as NULLs."""
    from downscaledclimatedata_spark.operators.multimodal import (
        GIF_PIX_A,
        GIF_PIX_B,
        GIF_PIX_C,
        GIF_PIX_CORRUPT_MOD,
        GIF_PIX_H_BASE,
        GIF_PIX_H_MOD,
        GIF_PIX_W_BASE,
        GIF_PIX_W_MOD,
        decode_gif_pixels,
        synthesize_gif_pixel_payloads,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_gif_pixels(synthesize_gif_pixel_payloads(docs)).collect()}
    assert len(out) == 30
    for d in (1, 3, 17, 29):
        w = GIF_PIX_W_BASE + d % GIF_PIX_W_MOD
        h = GIF_PIX_H_BASE + d % GIF_PIX_H_MOD
        px = [(d * GIF_PIX_A + y * GIF_PIX_B + x * GIF_PIX_C) % 256
              for y in range(h) for x in range(w)]
        r = out[d]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert (r.pix_sum, r.pix_min, r.pix_max) == (sum(px), min(px), max(px))
    for d in (0, GIF_PIX_CORRUPT_MOD, 2 * GIF_PIX_CORRUPT_MOD):
        assert out[d].pix_sum is None and out[d].width is None


def test_gif_header_decode_through_spark(spark):
    """GIF87a/89a logical-screen dims (little-endian, unlike PNG/JPEG)
    parsed from genuine bytes through the mapInPandas decode; corrupt
    GIF tolerated as unknown."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_image_headers, make_gif, parse_image_header)
    assert parse_image_header(make_gif(320, 200)) == ("gif", 320, 200)
    df = spark.createDataFrame(
        [(1, bytearray(make_gif(17, 9))),
         (2, bytearray(b"GIF89a\x01"))],       # truncated LSD
        "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image_headers(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"]) == ("gif", 17, 9)
    assert got[2]["format"] == "unknown" and got[2]["width"] is None


def test_bmp_codec_roundtrip_and_order_quirks():
    """BMP's layout quirks pinned directly: bottom-up row storage, BGR
    sample order, 4-byte row padding (odd width), short-pixel-array
    rejection."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_bmp_stats,
        make_bmp,
    )

    w, h = 3, 2  # stride 9 -> padded to 12
    rows = [[(10, 20, 30), (11, 21, 31), (12, 22, 32)],
            [(110, 120, 130), (111, 121, 131), (112, 122, 132)]]
    blob = make_bmp(rows)
    got = decode_bmp_stats(blob)
    flat = [px for row in rows for px in row]
    assert got == (w, h, 6,
                   sum(p[0] for p in flat), sum(p[1] for p in flat),
                   sum(p[2] for p in flat), 10, 132)
    # the raw pixel array really is bottom-up BGR: first stored byte is
    # the BLUE sample of the BOTTOM-LEFT pixel (130)
    assert blob[54] == 130
    # corruption: short array, bad magic
    assert decode_bmp_stats(blob[:-1]) is None
    assert decode_bmp_stats(b"XX" + blob[2:]) is None


def test_bmp_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        BMP_A,
        BMP_B,
        BMP_C,
        BMP_CORRUPT_MOD,
        BMP_D,
        BMP_H_BASE,
        BMP_H_MOD,
        BMP_W_BASE,
        BMP_W_MOD,
        decode_bmp,
        synthesize_bmp_payloads,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 26).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_bmp(synthesize_bmp_payloads(docs)).collect()}
    for d in (1, 7, 25):
        w = BMP_W_BASE + d % BMP_W_MOD
        h = BMP_H_BASE + d % BMP_H_MOD
        ch = [[(d * BMP_A + y * BMP_B + x * BMP_C + c * BMP_D) % 256
               for y in range(h) for x in range(w)] for c in range(3)]
        r = out[d]
        assert (r.width, r.height) == (w, h)
        assert (r.sum_r, r.sum_g, r.sum_b) == tuple(sum(c) for c in ch)
        assert r.first_px_r == (d * BMP_A) % 256
        assert r.last_px_b == (d * BMP_A + (h - 1) * BMP_B
                               + (w - 1) * BMP_C + 2 * BMP_D) % 256
    for d in (0, BMP_CORRUPT_MOD, 2 * BMP_CORRUPT_MOD):
        assert out[d].sum_r is None and out[d].width is None


def test_mulaw_decode_matches_itu_reference_points():
    """The expansion is the real G.711 curve at 16-bit scale (the
    classic mulaw.c table): 0xFF decodes to 0, the extremes reach
    ±32124 (0x7D7C), and sign symmetry holds across the full range."""
    from downscaledclimatedata_spark.operators.multimodal import (
        mulaw_decode_sample,
    )

    assert mulaw_decode_sample(0xFF) == 0
    assert mulaw_decode_sample(0x80) == 32124
    assert mulaw_decode_sample(0x00) == -32124
    assert mulaw_decode_sample(0x7F) == 0  # negative zero collapses to 0
    # monotone within the positive half: larger complement magnitude ->
    # larger linear magnitude
    vals = [mulaw_decode_sample(b) for b in range(0xFF, 0x7F, -1)]
    assert vals == sorted(vals)
    # sign symmetry
    for b in range(0, 128):
        assert mulaw_decode_sample(b) == -mulaw_decode_sample(b | 0x80)


def test_mulaw_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        MULAW_A,
        MULAW_B,
        MULAW_CORRUPT_MOD,
        MULAW_N_BASE,
        MULAW_N_MOD,
        decode_mulaw,
        mulaw_decode_sample,
        synthesize_mulaw_payloads,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 25).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_mulaw(synthesize_mulaw_payloads(docs)).collect()}
    for d in (1, 7, 23):
        n = MULAW_N_BASE + d % MULAW_N_MOD
        pcm = [mulaw_decode_sample((d * MULAW_A + i * MULAW_B) % 256)
               for i in range(n)]
        r = out[d]
        assert r.n_samples == n and r.sample_rate == 8000
        assert (r.peak_abs, r.sum_pcm, r.energy) == (
            max(abs(x) for x in pcm), sum(pcm), sum(x * x for x in pcm))
    for d in (0, MULAW_CORRUPT_MOD, 2 * MULAW_CORRUPT_MOD):
        assert out[d].energy is None and out[d].n_samples is None


def test_thumbnail_resize_real_pixels(spark):
    """Nearest-neighbor thumbnails come from genuinely decoded
    scanlines: spot-check every thumb pixel against the formula, and a
    corrupt payload yields a NULL row."""
    from downscaledclimatedata_spark.operators.multimodal import (
        PNG_PIX_A,
        PNG_PIX_B,
        PNG_PIX_C,
        PNG_PIX_H_BASE,
        PNG_PIX_H_MOD,
        PNG_PIX_W_BASE,
        PNG_PIX_W_MOD,
        THUMB,
        make_png_pixels,
        synthesize_png_pixel_payloads,
        thumbnail_png,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           thumbnail_png(synthesize_png_pixel_payloads(docs)).collect()}
    for d in (1, 5, 11):
        w = PNG_PIX_W_BASE + d % PNG_PIX_W_MOD
        h = PNG_PIX_H_BASE + d % PNG_PIX_H_MOD
        want = [(d * PNG_PIX_A + ((i * h) // THUMB) * PNG_PIX_B
                 + ((j * w) // THUMB) * PNG_PIX_C) % 256
                for i in range(THUMB) for j in range(THUMB)]
        assert list(out[d].thumb) == want
        assert (out[d].width, out[d].height) == (w, h)
    good = make_png_pixels([bytes(range(10)) for _ in range(8)])
    bad = bytearray(good)
    bad[50] ^= 0xFF  # CRC break
    corrupt = spark.createDataFrame(
        [(99, bytes(bad))], "doc_id long, payload binary")
    (r,) = thumbnail_png(corrupt).collect()
    assert r.thumb is None and r.width is None


def test_gif_animation_codec_and_frame_sampling(spark):
    """Multi-frame GIF roundtrip: every frame's stats decode exactly;
    strided sampling keeps frames 0, 2, 4...; a corrupt final frame
    voids the WHOLE payload (one NULL row), never half an animation."""
    from downscaledclimatedata_spark.operators.multimodal import (
        ANIM_A,
        ANIM_B,
        ANIM_C,
        ANIM_CORRUPT_MOD,
        ANIM_E,
        ANIM_FRAMES_BASE,
        ANIM_FRAMES_MOD,
        ANIM_H_BASE,
        ANIM_H_MOD,
        ANIM_STRIDE,
        ANIM_W_BASE,
        ANIM_W_MOD,
        sample_gif_frames,
        synthesize_gif_animations,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 20).select(F.col("id").alias("doc_id"))
    rows = sample_gif_frames(synthesize_gif_animations(docs)).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for d in (1, 3, 13):
        w = ANIM_W_BASE + d % ANIM_W_MOD
        h = ANIM_H_BASE + d % ANIM_H_MOD
        nf = ANIM_FRAMES_BASE + d % ANIM_FRAMES_MOD
        want_idx = list(range(0, nf, ANIM_STRIDE))
        got = sorted(by_doc[d], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        for r in got:
            z = r.frame_idx
            px = [(d * ANIM_A + z * ANIM_E + y * ANIM_B + x * ANIM_C) % 256
                  for y in range(h) for x in range(w)]
            assert (r.width, r.height) == (w, h)
            assert (r.pix_sum, r.pix_min, r.pix_max) == (
                sum(px), min(px), max(px))
    for d in (0, ANIM_CORRUPT_MOD):
        assert len(by_doc[d]) == 1 and by_doc[d][0].frame_idx is None
        assert by_doc[d][0].pix_sum is None


# --- baseline JPEG pixel codec --------------------------------------------------

def test_jpeg_codec_roundtrip_and_corruption():
    """Encoder -> decoder roundtrip reproduces the DC formula pixels
    exactly (dc step 16 makes a DC-only block exactly 2*dc + 128);
    corrupt entropy, truncation, progressive SOF, and garbage all
    return None instead of raising."""
    from downscaledclimatedata_spark.operators.multimodal import (
        JPEG_H_BASE, JPEG_H_MOD, JPEG_W_BASE, JPEG_W_MOD,
        decode_jpeg_pixel_stats, jpeg_dc_value, make_jpeg_dc)

    for d in (1, 5, 123, 4096, 999983):
        w, h = JPEG_W_BASE + d % JPEG_W_MOD, JPEG_H_BASE + d % JPEG_H_MOD
        nbx, nby = -(-w // 8), -(-h // 8)
        grid = [jpeg_dc_value(d, by, bx)
                for by in range(nby) for bx in range(nbx)]
        blob = make_jpeg_dc(grid, w, h)
        px = [min(255, max(0, 2 * jpeg_dc_value(d, y // 8, x // 8) + 128))
              for y in range(h) for x in range(w)]
        assert decode_jpeg_pixel_stats(blob) == (
            w, h, w * h, sum(px), min(px), max(px))
    good = make_jpeg_dc([10], 8, 8)
    assert decode_jpeg_pixel_stats(
        make_jpeg_dc([10], 8, 8, corrupt=True)) is None
    assert decode_jpeg_pixel_stats(good[:30]) is None
    assert decode_jpeg_pixel_stats(
        good.replace(b"\xff\xc0", b"\xff\xc2", 1)) is None  # progressive
    assert decode_jpeg_pixel_stats(b"not a jpeg") is None


def test_jpeg_decoder_ac_runlength_path():
    """The AC run-length loop is real, not EOB-only: a payload carrying
    an AC coefficient at zigzag position 1 decodes to a NON-constant
    block whose values match an independent direct-IDCT reference, and
    whose sum equals the DC-only sum (AC basis functions are zero-mean)."""
    import math
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_jpeg_pixel_stats, make_jpeg_dc)

    dc, acv, acq = 10, 1, 17  # quantized AC=1 at zigzag 1 -> coef 17
    got = decode_jpeg_pixel_stats(make_jpeg_dc([dc], 8, 8, ac_extra={0: acv}))
    base = decode_jpeg_pixel_stats(make_jpeg_dc([dc], 8, 8))
    assert got is not None and base is not None
    assert got[3] == base[3]          # zero-mean AC leaves the sum
    assert (got[4], got[5]) != (base[4], base[5])
    # independent reference: zigzag 1 = coefficient (u=1, v=0)
    ref = []
    for y in range(8):
        for x in range(8):
            v = (1 / math.sqrt(2)) * (1 / math.sqrt(2)) * dc * 16 \
                + (1 / math.sqrt(2)) * acv * acq \
                * math.cos((2 * x + 1) * math.pi / 16)
            ref.append(min(255, max(0, int(round(v / 4)) + 128)))
    assert got == (8, 8, 64, sum(ref), min(ref), max(ref))


def test_jpeg_decode_through_spark(spark):
    """End-to-end through mapInPandas at smoke scale: every good doc's
    stats match the formula; corrupt docs yield NULL rows."""
    from downscaledclimatedata_spark.operators.multimodal import (
        JPEG_CORRUPT_MOD, JPEG_H_BASE, JPEG_H_MOD, JPEG_W_BASE, JPEG_W_MOD,
        decode_jpeg_pixels, jpeg_dc_value, synthesize_jpeg_payloads)

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    rows = {r.doc_id: r for r in decode_jpeg_pixels(
        synthesize_jpeg_payloads(docs)).collect()}
    assert len(rows) == 40
    for d, r in rows.items():
        if d % JPEG_CORRUPT_MOD == 0:
            assert r.width is None and r.pix_sum is None
            continue
        w, h = JPEG_W_BASE + d % JPEG_W_MOD, JPEG_H_BASE + d % JPEG_H_MOD
        px = [min(255, max(0, 2 * jpeg_dc_value(d, y // 8, x // 8) + 128))
              for y in range(h) for x in range(w)]
        assert (r.width, r.height, r.n_px, r.pix_sum, r.pix_min,
                r.pix_max) == (w, h, w * h, sum(px), min(px), max(px))


def _rgb_ref(d, w, h):
    """Independent fixed-point RGB reference for the 4:2:0 synth."""
    from downscaledclimatedata_spark.operators.multimodal import (
        JPEG_CB_SEED, JPEG_CR_SEED, JPEG_FIX_BCB, JPEG_FIX_GCB,
        JPEG_FIX_GCR, JPEG_FIX_HALF, JPEG_FIX_K, JPEG_FIX_RCR,
        jpeg_dc_value)
    k16 = JPEG_FIX_K << 16
    sr = sg = sb = 0
    pmin, pmax = 255, 0
    for r in range(h):
        for c in range(w):
            yv = min(255, max(0, 2 * jpeg_dc_value(d, r // 8, c // 8) + 128))
            cb = min(255, max(0, 2 * jpeg_dc_value(
                d + JPEG_CB_SEED, r // 16, c // 16) + 128)) - 128
            cr = min(255, max(0, 2 * jpeg_dc_value(
                d + JPEG_CR_SEED, r // 16, c // 16) + 128)) - 128
            red = min(255, max(0, yv + ((JPEG_FIX_RCR * cr + JPEG_FIX_HALF
                                         + k16) // 65536 - JPEG_FIX_K)))
            grn = min(255, max(0, yv - ((JPEG_FIX_GCB * cb
                                         + JPEG_FIX_GCR * cr
                                         + JPEG_FIX_HALF + k16) // 65536
                                        - JPEG_FIX_K)))
            blu = min(255, max(0, yv + ((JPEG_FIX_BCB * cb + JPEG_FIX_HALF
                                         + k16) // 65536 - JPEG_FIX_K)))
            sr += red
            sg += grn
            sb += blu
            pmin = min(pmin, red, grn, blu)
            pmax = max(pmax, red, grn, blu)
    return (w, h, w * h, sr, sg, sb, pmin, pmax)


def test_jpeg_420_codec_roundtrip_and_corruption():
    """4:2:0 encoder -> decoder roundtrip: six blocks per MCU across
    multi-MCU grids and odd (chroma-boundary) sizes reproduce the
    analytic fixed-point RGB model exactly; corrupt entropy, truncation
    and grayscale frames return None."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_jpeg_420_stats, jpeg_dc_value, make_jpeg_420)

    for d, w, h in [(1, 8, 8), (5, 17, 9), (123, 28, 20), (77, 16, 16),
                    (999983, 23, 13)]:
        mw, mh = -(-w // 16), -(-h // 16)
        yg = [jpeg_dc_value(d, by, bx)
              for by in range(mh * 2) for bx in range(mw * 2)]
        cbg = [jpeg_dc_value(d + 1, my, mx)
               for my in range(mh) for mx in range(mw)]
        crg = [jpeg_dc_value(d + 2, my, mx)
               for my in range(mh) for mx in range(mw)]
        blob = make_jpeg_420(yg, cbg, crg, w, h)
        assert decode_jpeg_420_stats(blob) == _rgb_ref(d, w, h)
    good = make_jpeg_420([0] * 4, [0], [0], 8, 8)
    assert decode_jpeg_420_stats(
        make_jpeg_420([0] * 4, [0], [0], 8, 8, corrupt=True)) is None
    assert decode_jpeg_420_stats(good[:40]) is None
    # a GRAYSCALE frame must be rejected by the color decoder (and the
    # color frame by the grayscale decoder): each path validates SOF
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_jpeg_pixel_stats, make_jpeg_dc)
    assert decode_jpeg_420_stats(make_jpeg_dc([10], 8, 8)) is None
    assert decode_jpeg_pixel_stats(good) is None


def test_jpeg_color_decode_through_spark(spark):
    """4:2:0 end-to-end through mapInPandas: channel stats match the
    fixed-point reference; corrupt docs yield NULL rows."""
    from downscaledclimatedata_spark.operators.multimodal import (
        JPEG_CORRUPT_MOD, JPEG_H_BASE, JPEG_H_MOD, JPEG_W_BASE,
        JPEG_W_MOD, decode_jpeg_color, synthesize_jpeg_color_payloads)

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    rows = {r.doc_id: r for r in decode_jpeg_color(
        synthesize_jpeg_color_payloads(docs)).collect()}
    assert len(rows) == 40
    for d, r in rows.items():
        if d % JPEG_CORRUPT_MOD == 0:
            assert r.width is None and r.sum_r is None
            continue
        w, h = JPEG_W_BASE + d % JPEG_W_MOD, JPEG_H_BASE + d % JPEG_H_MOD
        assert (r.width, r.height, r.n_px, r.sum_r, r.sum_g, r.sum_b,
                r.pix_min, r.pix_max) == _rgb_ref(d, w, h)


def test_alaw_decode_matches_itu_reference_points():
    """The expansion is the real G.711 A-law curve at 16-bit scale
    (sun g711.c alaw2linear): extremes reach ±32256, the smallest
    magnitudes are ±8 (A-law has no zero output), sign bit SET means
    positive, and magnitude is monotone within each sign half."""
    from downscaledclimatedata_spark.operators.multimodal import (
        alaw_decode_sample,
    )

    assert alaw_decode_sample(0xAA) == 32256   # u=0xFF: seg 7, m 15, +
    assert alaw_decode_sample(0x2A) == -32256  # u=0x7F: seg 7, m 15, -
    assert alaw_decode_sample(0xD5) == 8       # u=0x80: seg 0, m 0, +
    assert alaw_decode_sample(0x55) == -8      # u=0x00: seg 0, m 0, -
    # sign symmetry: toggling the sign bit negates
    for b in range(0, 256):
        assert alaw_decode_sample(b) == -alaw_decode_sample(b ^ 0x80)
    # monotone in the toggled code u within the positive half
    mags = [alaw_decode_sample(u ^ 0x55) for u in range(0x80, 0x100)]
    assert mags == sorted(mags) and all(m > 0 for m in mags)


def test_alaw_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        ALAW_A,
        ALAW_B,
        ALAW_CORRUPT_MOD,
        ALAW_N_BASE,
        ALAW_N_MOD,
        alaw_decode_sample,
        decode_alaw,
        synthesize_alaw_payloads,
    )

    ids = spark.createDataFrame(
        [(i,) for i in range(1, 31)], "doc_id long")
    out = {r.doc_id: r
           for r in decode_alaw(synthesize_alaw_payloads(ids)).collect()}
    assert len(out) == 30
    for d in range(1, 31):
        r = out[d]
        if d % ALAW_CORRUPT_MOD == 0:
            # wrong-codec container (tag 1) must be REJECTED, not decoded
            assert r.sample_rate is None and r.sum_pcm is None
            continue
        n = ALAW_N_BASE + d % ALAW_N_MOD
        pcm = [alaw_decode_sample((d * ALAW_A + i * ALAW_B) % 256)
               for i in range(n)]
        assert r.n_samples == n
        assert r.sum_pcm == sum(pcm)
        assert r.peak_abs == max(abs(x) for x in pcm)
        assert r.energy == sum(x * x for x in pcm)


def test_png_palette_codec_roundtrip_and_bounds():
    """Handmade indexed image roundtrips through genuine bytes; an
    index beyond the palette is rejected (bounds check), as is a
    truncated (non-multiple-of-3) PLTE."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_palette_stats, make_png_palette)

    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255)]
    rows = [bytes([0, 1, 2, 1]), bytes([2, 2, 0, 0]),
            bytes([1, 0, 1, 2])]  # 4x3, indices < 3
    blob = make_png_palette(rows, pal, split_idat=True)
    st = decode_png_palette_stats(blob)
    assert st is not None
    w, h, n_px, sr, sg, sb, mn, mx = st
    assert (w, h, n_px) == (4, 3, 12)
    flat = [pal[i] for row in rows for i in row]
    assert sr == sum(p[0] for p in flat)
    assert sg == sum(p[1] for p in flat)
    assert sb == sum(p[2] for p in flat)
    assert mn == 0 and mx == 255

    # index 3 with a 3-entry palette -> out of range -> reject
    bad = make_png_palette([bytes([0, 3])], pal)
    assert decode_png_palette_stats(bad) is None
    # empty palette -> every index out of range
    assert decode_png_palette_stats(make_png_palette(rows, [])) is None
    # CRC damage still rejected
    broken = bytearray(blob)
    broken[40] ^= 0xFF
    assert decode_png_palette_stats(bytes(broken)) is None


def test_png_palette_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        PNG_PAL_A, PNG_PAL_B, PNG_PAL_C, PNG_PAL_CORRUPT_MOD,
        PNG_PAL_H_BASE, PNG_PAL_H_MOD, PNG_PAL_P1, PNG_PAL_P2, PNG_PAL_P3,
        PNG_PAL_W_BASE, PNG_PAL_W_MOD, decode_png_palette,
        synthesize_png_palette_payloads)

    ids = spark.createDataFrame([(i,) for i in range(1, 28)], "doc_id long")
    out = {r.doc_id: r for r in decode_png_palette(
        synthesize_png_palette_payloads(ids)).collect()}
    for d in range(1, 28):
        r = out[d]
        if d % PNG_PAL_CORRUPT_MOD == 0:
            assert r.width is None and r.sum_r is None
            continue
        w = PNG_PAL_W_BASE + d % PNG_PAL_W_MOD
        h = PNG_PAL_H_BASE + d % PNG_PAL_H_MOD
        assert (r.width, r.height) == (w, h)
        exp_sr = sum((d * PNG_PAL_P1
                      + ((d * PNG_PAL_A + y * PNG_PAL_B + x * PNG_PAL_C)
                         % 256) * PNG_PAL_P2 + 0 * PNG_PAL_P3) % 256
                     for y in range(h) for x in range(w))
        assert r.sum_r == exp_sr


def test_qoi_codec_roundtrip_exercises_every_op():
    """The synthetic image must drive the encoder through ALL five QOI
    op families (RUN / INDEX / DIFF / LUMA / RGB) — verified by a
    byte-walk census — and the decoder must reconstruct exact pixel
    stats; truncation and an RGBA op byte are rejected."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_qoi_stats, make_qoi, qoi_pixel)

    d, w, h = 21, 20, 12
    rows = [[(qoi_pixel(d, y, x, 0), qoi_pixel(d, y, x, 1),
              qoi_pixel(d, y, x, 2)) for x in range(w)]
            for y in range(h)]
    blob = make_qoi(rows)

    # op census: walk the chunk stream
    ops = {"run": 0, "index": 0, "diff": 0, "luma": 0, "rgb": 0}
    i = 14
    while i < len(blob) - 8:
        b0 = blob[i]
        if b0 == 0xFE:
            ops["rgb"] += 1
            i += 4
        elif b0 >> 6 == 0:
            ops["index"] += 1
            i += 1
        elif b0 >> 6 == 1:
            ops["diff"] += 1
            i += 1
        elif b0 >> 6 == 2:
            ops["luma"] += 1
            i += 2
        else:
            ops["run"] += 1
            i += 1
    assert all(v > 0 for v in ops.values()), ops

    st = decode_qoi_stats(blob)
    assert st is not None
    flat = [c for row in rows for px in row for c in px]
    assert st == (w, h, w * h,
                  sum(px[0] for row in rows for px in row),
                  sum(px[1] for row in rows for px in row),
                  sum(px[2] for row in rows for px in row),
                  min(flat), max(flat))

    assert decode_qoi_stats(blob[:-11]) is None      # truncated
    assert decode_qoi_stats(b"nope" + blob[4:]) is None  # bad magic
    rgba = bytearray(blob)
    rgba[14] = 0xFF  # RGBA op at channels=3 -> reject
    assert decode_qoi_stats(bytes(rgba)) is None


def test_qoi_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        QOI_CORRUPT_MOD, QOI_H_BASE, QOI_H_MOD, QOI_W_BASE, QOI_W_MOD,
        decode_qoi, qoi_pixel, synthesize_qoi_payloads)

    ids = spark.createDataFrame([(i,) for i in range(1, 32)],
                                "doc_id long")
    out = {r.doc_id: r for r in
           decode_qoi(synthesize_qoi_payloads(ids)).collect()}
    for d in range(1, 32):
        r = out[d]
        if d % QOI_CORRUPT_MOD == 0:
            assert r.width is None and r.sum_r is None
            continue
        w = QOI_W_BASE + d % QOI_W_MOD
        h = QOI_H_BASE + d % QOI_H_MOD
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert r.sum_g == sum(qoi_pixel(d, y, x, 1)
                              for y in range(h) for x in range(w))


def test_adpcm_nibble_state_machine_reference_points():
    """The IMA recurrence must clamp at both int16 rails, saturate the
    step index at [0, 88], and follow the shift-add diff expansion."""
    from downscaledclimatedata_spark.operators.multimodal import (
        ADPCM_STEP_TABLE,
        adpcm_decode_nibble,
    )

    # idx 0 (step 7): nib 7 -> diff = 7>>3 + 7>>2 + 7>>1 + 7 = 0+1+3+7
    pred, idx = adpcm_decode_nibble(0, 0, 7)
    assert (pred, idx) == (11, 8)
    # sign bit subtracts the same magnitude
    pred, idx = adpcm_decode_nibble(0, 0, 15)
    assert (pred, idx) == (-11, 8)
    # positive rail clamps at 32767, index rail at 88
    pred, idx = adpcm_decode_nibble(32760, 88, 7)
    assert pred == 32767 and idx == 88
    # negative rail clamps at -32768; nib 8 (sign + low diff) floors the
    # index at 0 (its index delta is -1)
    pred, idx = adpcm_decode_nibble(-32768, 0, 8)
    assert pred == -32768 and idx == 0
    assert len(ADPCM_STEP_TABLE) == 89


def test_adpcm_decode_through_spark_and_corruption(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        ADPCM_A,
        ADPCM_B,
        ADPCM_CORRUPT_MOD,
        ADPCM_N_BYTES_BASE,
        ADPCM_N_BYTES_MOD,
        adpcm_decode_nibble,
        decode_adpcm,
        synthesize_adpcm_payloads,
    )
    from pyspark.sql import functions as F

    docs = spark.range(0, 25).select(F.col("id").alias("doc_id"))
    out = {r.doc_id: r for r in
           decode_adpcm(synthesize_adpcm_payloads(docs)).collect()}
    assert len(out) == 25
    for d in range(25):
        r = out[d]
        if d % ADPCM_CORRUPT_MOD == 0:
            assert r.n_samples is None and r.energy is None, d
            continue
        # independent python walk of the same recurrence
        pred, idx = ((d * 7) % 1024) - 512, d % 89
        s = e = peak = 0
        n_bytes = ADPCM_N_BYTES_BASE + d % ADPCM_N_BYTES_MOD
        for j in range(n_bytes):
            byte = (d * ADPCM_A + j * ADPCM_B) % 256
            for shift in (0, 4):
                pred, idx = adpcm_decode_nibble(pred, idx,
                                                (byte >> shift) & 15)
                s += pred
                e += pred * pred
                peak = max(peak, abs(pred))
        assert (r.n_samples, r.peak_abs, r.sum_pcm, r.energy) == \
            (2 * n_bytes, peak, s, e), d

    # garbage bytes and a valid-RIFF/wrong-tag payload both -> NULL row
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_adpcm_stats, make_mulaw_wav)
    assert decode_adpcm_stats(b"not a riff file") is None
    assert decode_adpcm_stats(make_mulaw_wav(bytes(16))) is None


def test_tga_codec_roundtrip_and_packet_structure():
    """Hand-checkable RLE: [A,A,B,C,C] packs as repeat(2) raw(1)
    repeat(2); a 200-px uniform row must SPLIT at the 128-pixel packet
    cap; decode reverses bottom-up BGR storage exactly."""
    from downscaledclimatedata_spark.operators.multimodal import (
        _tga_encode_row, decode_tga_stats, make_tga)

    A, B, C = b"\x01\x02\x03", b"\x04\x05\x06", b"\x07\x08\x09"
    enc, n = _tga_encode_row([A, A, B, C, C])
    assert n == 3
    assert enc == bytes((0x81,)) + A + bytes((0x00,)) + B + bytes((0x81,)) + C

    # 128-cap split: 200 identical pixels -> repeat(128) + repeat(72)
    enc2, n2 = _tga_encode_row([A] * 200)
    assert n2 == 2
    assert enc2[0] == 0x80 | 127 and enc2[4] == 0x80 | 71

    # full roundtrip with formula pixels (runs + singletons per row)
    rows = [[((y * 7 + (x // (1 + y % 3)) * 19) % 256,) * 3
             for x in range(9)] for y in range(5)]
    st = decode_tga_stats(make_tga(rows))
    assert st is not None
    w, h, n_px, n_packets, sr, sg, sb, first_r, last_b = st
    assert (w, h, n_px) == (9, 5, 45)
    flat = [c for row in rows for (r, g, b) in row for c in (r,)]
    assert sr == sum(flat) and sg == sr and sb == sr
    assert first_r == rows[0][0][0] and last_b == rows[4][8][2]
    assert n_packets < n_px  # compression genuinely ran


def test_tga_decode_rejects_defects():
    """Stream underrun, trailing bytes, wrong image type, and a packet
    overrunning the pixel count all -> None (T7 tolerance)."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_tga_stats, make_tga)
    rows = [[(x % 256, 0, 0) for x in range(6)] for _ in range(4)]
    blob = make_tga(rows)
    assert decode_tga_stats(blob) is not None
    assert decode_tga_stats(blob[:-2]) is None          # underrun
    assert decode_tga_stats(blob + b"\x00") is None     # trailing bytes
    bad_type = blob[:2] + b"\x02" + blob[3:]            # uncompressed tag
    assert decode_tga_stats(bad_type) is None
    # packet overrun: replace first ctrl byte with a 128-run
    overrun = blob[:18] + bytes((0xFF,)) + blob[19:]
    assert decode_tga_stats(overrun) is None


def test_tga_decode_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        TGA_CORRUPT_MOD, decode_tga, synthesize_tga_payloads)
    docs = spark.createDataFrame(
        [(i,) for i in range(30)], "doc_id long")
    got = {r.doc_id: r for r in
           decode_tga(synthesize_tga_payloads(docs)).collect()}
    assert len(got) == 30
    for d, r in got.items():
        if d % TGA_CORRUPT_MOD == 0:
            assert r.width is None and r.sum_r is None
        else:
            assert r.n_px == r.width * r.height
            assert 0 < r.n_packets < r.n_px


def test_wav_zcr_deinterleave_and_signs():
    """Stereo stream where channel 0 alternates sign every frame but the
    INTERLEAVED stream would not: de-interleaving is load-bearing.
    int16 has no -0, so the x >= 0 convention is exact."""
    from downscaledclimatedata_spark.operators.multimodal import (
        make_wav, parse_wav_zcr)
    # frames (ch0, ch1): (5, 1) (-5, 2) (5, 3) (-5, 4)
    samples = [5, 1, -5, 2, 5, 3, -5, 4]
    st = parse_wav_zcr(make_wav(2, 8000, samples))
    ch, n_frames, zcr, peak0, sum0 = st
    assert (ch, n_frames) == (2, 4)
    assert zcr == 3            # every ch0 step flips sign
    assert peak0 == 5 and sum0 == 0
    # interleaved counting would see 1,-5,2,5,... = 7 sign pairs, not 3
    mono = parse_wav_zcr(make_wav(1, 8000, samples))
    assert mono[2] != zcr

    # zero counts as non-negative: [0, -1, 0] has 2 crossings
    st0 = parse_wav_zcr(make_wav(1, 8000, [0, -1, 0]))
    assert st0[2] == 2
    assert parse_wav_zcr(b"RIFF\x00\x00\x00\x00") is None


def test_wav_zcr_through_spark(spark):
    from downscaledclimatedata_spark.operators.multimodal import (
        WAV_ZCR_CORRUPT_MOD, decode_wav_zcr, synthesize_wav_payloads)
    docs = spark.createDataFrame([(i,) for i in range(34)], "doc_id long")
    got = {r.doc_id: r for r in decode_wav_zcr(
        synthesize_wav_payloads(
            docs, corrupt_mod=WAV_ZCR_CORRUPT_MOD)).collect()}
    assert len(got) == 34
    for d, r in got.items():
        if d % WAV_ZCR_CORRUPT_MOD == 0:
            assert r.zcr is None and r.channels is None
        else:
            assert r.channels == 1 + d % 2
            assert 0 <= r.zcr < r.n_frames


def test_phash_dedup_groups_resized_copies(spark):
    """Docs 1 and 17 share scene 1 % 16 but ship at different pixel
    sizes (kw/kh differ): same dHash, same group — the resized-copy
    case byte dedup cannot catch. Doc 15 is corrupt -> NULL hash, no
    group."""
    from downscaledclimatedata_spark.operators.multimodal import (
        dhash_images, synthesize_scene_png_payloads)
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1,), (17,), (2,), (15,)], "doc_id long")
    hashed = dhash_images(synthesize_scene_png_payloads(docs))
    got = {r.doc_id: r for r in hashed.collect()}
    r1, r17 = got[1], got[17]
    assert (r1.width, r1.height) != (r17.width, r17.height)
    assert r1.dhash == r17.dhash            # perceptual match survives resize
    assert got[2].dhash != r1.dhash         # different scene, different hash
    assert got[15].dhash is None            # corrupt (15 % 15 == 0)
    assert r1.dhash is not None and r1.dhash >= 0   # 56-bit: sign-safe


def test_shot_detect_finds_exact_boundaries(spark):
    """SHOT_LEN=2: a 6-frame doc cuts exactly at pairs 1 and 3 (frame
    1->2 and 3->4); within-shot drift stays far under the threshold;
    a corrupt payload is all-NULL, never half a video."""
    from downscaledclimatedata_spark.operators.multimodal import (
        SHOT_CORRUPT_MOD, SHOT_FRAMES_BASE, SHOT_FRAMES_MOD,
        detect_shots, synthesize_shot_gifs)
    # d=2 -> n_frames = 4 + 2 % 4 = 6; d=13 -> corrupt
    docs = spark.createDataFrame([(2,), (13,)], "doc_id long")
    got = {r.doc_id: r for r in
           detect_shots(synthesize_shot_gifs(docs)).collect()}
    r = got[2]
    assert (r.n_frames, r.n_pairs) == (6, 5)
    assert r.n_cuts == 2 and r.first_cut_pair == 1
    assert got[13].n_frames is None and got[13].n_cuts is None


def test_ppm_codec_quirks_and_corruption():
    """Byte-level netpbm behavior: comments and arbitrary whitespace
    between header tokens parse; the spec's exactly-one-whitespace rule
    after maxval is enforced; body length is validated to the byte;
    maxval 0 / 256 rejected."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_ppm_stats, make_ppm)

    rows = [[(1, 2, 3), (4, 5, 6)], [(7, 8, 9), (250, 251, 252)]]
    blob = make_ppm(rows, 255, comment=True)
    st = decode_ppm_stats(blob)
    assert st == (2, 2, 4, 255, 1 + 4 + 7 + 250, 2 + 5 + 8 + 251,
                  3 + 6 + 9 + 252, 1, 252)
    # hand-built header: comments anywhere between tokens, mixed ws
    hand = (b"P6 # c1\n  2\t# c2\n2 # why not\n255\n"
            + bytes(v for row in rows for px in row for v in px))
    assert decode_ppm_stats(hand) == st
    # one byte short / one byte long -> rejected
    assert decode_ppm_stats(blob[:-1]) is None
    assert decode_ppm_stats(blob + b"\x00") is None
    # maxval out of range
    assert decode_ppm_stats(b"P6\n2 2\n0\n" + b"\x00" * 12) is None
    assert decode_ppm_stats(b"P6\n2 2\n256\n" + b"\x00" * 12) is None
    # non-digit token
    assert decode_ppm_stats(b"P6\n2 x\n255\n" + b"\x00" * 12) is None


def test_aiff_codec_ext80_chunk_order_and_validation():
    """80-bit extended-float rates round-trip EXACTLY for integers and
    refuse inexact mantissas; chunk order is free; odd SSND sizes carry
    the IFF pad byte; byte-count and duplicate-chunk defects reject."""
    import struct

    from downscaledclimatedata_spark.operators.multimodal import (
        _ext80_decode, _ext80_encode, decode_aiff_stats, make_aiff)

    for rate in (1, 8000, 44100, 48000, 96001, 2**30):
        assert _ext80_decode(_ext80_encode(rate)) == rate
    # non-integer mantissa (44100.5) must refuse
    enc = bytearray(_ext80_encode(44100))
    exp, mant = struct.unpack(">HQ", bytes(enc))
    assert _ext80_decode(struct.pack(">HQ", exp, mant | 1)) is None

    samples = [0, 5, -7, 10000, -10000, 3, 42]
    for order in (False, True):
        blob = make_aiff(samples, 44100, ssnd_first=order)
        st = decode_aiff_stats(blob)
        assert st == (7, 44100, sum(abs(s) for s in samples),
                      10000, 0, 42)
    # single-sample payload: odd SSND chunk size (8 + 2 = 10 is even,
    # but 1 sample -> csz 10; the writer's pad-byte branch fires for
    # odd csz and the decoder's pad skip must mirror it)
    one = make_aiff([123], 8000, ssnd_first=True)
    assert decode_aiff_stats(one) == (1, 8000, 123, 123, 123, 123)
    # truncation (the planted class) and frame-count mismatch reject
    assert decode_aiff_stats(make_aiff(samples, 8000, False)[:-2]) is None
    bad = bytearray(make_aiff(samples, 8000, False))
    # bump numSampleFrames by one: SSND byte count no longer matches
    i = bad.index(b"COMM") + 8 + 2
    bad[i:i + 4] = struct.pack(">i", len(samples) + 1)
    assert decode_aiff_stats(bytes(bad)) is None


def test_ico_codec_sniffing_quirks_and_lies():
    """Mixed PNG/DIB entries decode with per-entry sniffing; a 256-wide
    entry round-trips through the 0-means-256 directory byte; a
    directory that lies about a payload's dimensions rejects; odd
    doubled DIB heights reject; truncated payloads reject."""
    import struct

    from downscaledclimatedata_spark.operators.multimodal import (
        decode_ico_stats, make_ico)

    blob = make_ico([(8, 6), (5, 4)], ["png", "dib"])
    assert decode_ico_stats(blob) == (2, 1, 1, 13, 10, 8)
    # 256-wide PNG entry: directory byte stores 0, decoder reads 256
    wide = make_ico([(256, 4)], ["png"])
    assert struct.unpack("<B", wide[6:7])[0] == 0
    assert decode_ico_stats(wide) == (1, 1, 0, 256, 4, 256)
    # lying directory (the planted class)
    lie = bytearray(blob)
    lie[6] = (lie[6] + 1) % 256
    assert decode_ico_stats(bytes(lie)) is None
    # truncated final payload
    assert decode_ico_stats(blob[:-3]) is None
    # odd doubled height in a DIB is structurally invalid
    bad = bytearray(make_ico([(5, 4)], ["dib"]))
    off = struct.unpack("<I", bad[18:22])[0]
    bad[off + 4:off + 12] = struct.pack("<ii", 5, 9)  # biHeight odd
    assert decode_ico_stats(bytes(bad)) is None


def test_tiff_codec_directory_strips_packbits_and_lies():
    """Byte-level baseline-TIFF behavior: II and MM parse identically;
    SHORT inline values honor byte order; multi-strip gathering
    reassembles exactly width*height bytes; the general PackBits
    decoder handles literals, runs, and the 0x80 noop; a lying strip
    offset (beyond EOF), a wrong magic, and a short body all reject."""
    import struct

    from downscaledclimatedata_spark.operators.multimodal import (
        TIFF_A, TIFF_B, decode_tiff_stats, make_tiff)

    d, w, h, rps = 77, 130, 6, 4  # w > 128: PackBits runs must split
    for be in (False, True):
        blob = make_tiff(d, w, h, rps, packbits=False, big_endian=be,
                         software=True, corrupt=False)
        st = decode_tiff_stats(blob)
        assert st is not None
        assert st[0] == ("MM" if be else "II")
        assert st[1:6] == (w, h, 2, 1, w * h)
        # packed twin: same pixels minus the x term, closed-form size
        pk = decode_tiff_stats(make_tiff(d, w, h, rps, packbits=True,
                                         big_endian=be, software=False,
                                         corrupt=False))
        assert pk[3:6] == (2, 32773, h * 2 * 2)  # ceil(130/128) == 2
        assert pk[6] == sum(w * ((d * TIFF_A + y * TIFF_B) % 256)
                            for y in range(h))

    # lying directory: last strip offset beyond EOF
    assert decode_tiff_stats(make_tiff(d, w, h, rps, False, False,
                                       False, corrupt=True)) is None
    # wrong magic / truncated body
    blob = make_tiff(d, w, h, rps, False, False, False, False)
    bad = bytearray(blob)
    bad[2:4] = struct.pack("<H", 43)
    assert decode_tiff_stats(bytes(bad)) is None
    assert decode_tiff_stats(blob[:40]) is None

    # PackBits decoder generality: literal + noop + run, hand-built
    # single-strip 1x6 image: literal(3) 1 2 3, noop, run(3 x 9)
    strip = bytes((2, 1, 2, 3, 0x80, 257 - 3 & 0xFF, 9))
    head = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8 + len(strip))
    tags = [(256, 3, 1, 6), (257, 4, 1, 1), (258, 3, 1, 8),
            (259, 3, 1, 32773), (262, 3, 1, 1), (273, 4, 1, 8),
            (277, 3, 1, 1), (278, 3, 1, 1), (279, 4, 1, len(strip))]
    ifd = struct.pack("<H", len(tags))
    for tag, typ, cnt, val in tags:
        ifd += struct.pack("<HHI", tag, typ, cnt)
        ifd += (struct.pack("<H", val) + b"\x00\x00" if typ == 3
                else struct.pack("<I", val))
    ifd += struct.pack("<I", 0)
    st = decode_tiff_stats(head + strip + ifd)
    assert st is not None
    assert st[1:7] == (6, 1, 1, 32773, len(strip), 1 + 2 + 3 + 27)
    assert (st[7], st[8]) == (1, 9)


def test_tiff_lzw_codec_roundtrip_widths_kwkwk_and_truncation():
    """Byte-level TIFF-LZW behavior: MSB-first variable-width codes
    roundtrip across the 9->10->11 width boundaries (the early-change
    fencepost: decoder widens at (1<<w)-2, one entry below the
    encoder); constant runs exercise KwKwK; the predictor-2 container
    undifferences back to the exact pixel formula; truncated code
    streams (EOI never arrives) reject."""
    import random

    from downscaledclimatedata_spark.operators.multimodal import (
        TIFFLZ_A, TIFFLZ_B, TIFFLZ_C, decode_tiff_lzw_stats,
        make_tiff_lzw, tiff_lzw_decode, tiff_lzw_encode)

    rnd = random.Random(42)
    for data in (b"", b"\x07" * 700,            # KwKwK run
                 bytes(range(256)) * 4,          # crosses 9->10
                 bytes(rnd.randrange(256) for _ in range(3000)),  # ->11
                 b"abab" * 200):
        assert tiff_lzw_decode(tiff_lzw_encode(data)) == data
    enc = tiff_lzw_encode(b"hello world" * 40)
    assert tiff_lzw_decode(enc[:-3]) is None     # EOI never arrives
    assert tiff_lzw_decode(b"") is None

    d, w, h, rps = 77, 60, 9, 4
    for be in (False, True):
        for pred in (1, 2):
            st = decode_tiff_lzw_stats(make_tiff_lzw(
                d, w, h, rps, pred, be, corrupt=False))
            assert st is not None
            assert st[0] == ("MM" if be else "II")
            assert st[1:5] == (w, h, 3, pred)
            want = sum((d * TIFFLZ_A + y * TIFFLZ_B
                        + x * TIFFLZ_C) % 256
                       for y in range(h) for x in range(w))
            assert st[5] == want
            if pred == 2:   # stored bytes are the differenced rows
                assert st[6] == sum(
                    (d * TIFFLZ_A + y * TIFFLZ_B) % 256
                    for y in range(h)) + h * (w - 1) * (TIFFLZ_C % 256)
            else:
                assert st[6] == want
            assert st[7] == (d * TIFFLZ_A) % 256
            assert st[8] == (d * TIFFLZ_A + (h - 1) * TIFFLZ_B
                             + (w - 1) * TIFFLZ_C) % 256
    assert decode_tiff_lzw_stats(make_tiff_lzw(
        d, w, h, rps, 2, False, corrupt=True)) is None


def test_bmprle_codec_escapes_flip_and_bounds():
    """Byte-level RLE8 behavior: bottom-up rows are flipped (first_px
    is the IMAGE top-left, i.e. the LAST row in file order); delta
    gaps read back as zeros; absolute blocks pad to even; a run
    overflowing its row, a truncated stream (no EOF), and a wrong
    magic all reject."""
    from downscaledclimatedata_spark.operators.multimodal import (
        BMPRLE_A, BMPRLE_B, BMPRLE_C, BMPRLE_DELTA_SKIP,
        decode_bmprle_stats, make_bmprle)

    d, w, h = 41, 260, 7  # w > 255: runs and absolute blocks split
    st = decode_bmprle_stats(make_bmprle(d, w, h, corrupt=False))
    assert st is not None
    assert st[:2] == (w, h)
    # first_px: image row 0 is absolute mode -> formula at (0, 0)
    assert st[3] == (d * BMPRLE_A) % 256
    # last_px: image row 6 is absolute (6 % 3 == 0) -> x = w-1 term
    assert st[4] == (d * BMPRLE_A + 6 * BMPRLE_B
                     + (w - 1) * BMPRLE_C) % 256
    # rows 0,3,6 absolute; rows 5 (not mult of 3, mult of 5) delta
    assert (st[5], st[6]) == (3, 1)
    # the delta row's sum contribution excludes the zero gap
    v5 = (d * BMPRLE_A + 5 * BMPRLE_B) % 256
    full = decode_bmprle_stats(make_bmprle(d, w, h, corrupt=False))[2]
    assert full == sum(
        (sum((d * BMPRLE_A + y * BMPRLE_B + x * BMPRLE_C) % 256
             for x in range(w)) if y % 3 == 0 else
         (w - BMPRLE_DELTA_SKIP if y % 5 == 0 else w)
         * ((d * BMPRLE_A + y * BMPRLE_B) % 256))
        for y in range(h))
    assert v5 >= 0  # (documents the delta-row value used above)

    # corrupt: planted 255-run overflowing the bottom row
    assert decode_bmprle_stats(make_bmprle(d, w, h, corrupt=True)) is None
    blob = make_bmprle(d, w, h, corrupt=False)
    # truncated stream: EOF marker never reached
    assert decode_bmprle_stats(blob[:-2]) is None
    # wrong magic
    assert decode_bmprle_stats(b"BA" + blob[2:]) is None


def test_avi_codec_index_seek_flip_and_lies():
    """Byte-level AVI behavior: stats come from SAMPLED frames only
    (idx1 seek, stride 2); first_px is the IMAGE top-left of frame 0
    (the LAST row in file order — the bottom-up flip); last_px is the
    bottom-right of the last sampled frame; a lying idx1 offset, a
    truncated file, a wrong fourcc, and a dims mismatch all reject."""
    from downscaledclimatedata_spark.operators.multimodal import (
        AVI_A, AVI_B, AVI_C, AVI_D, AVI_E, decode_avi_stats, make_avi)

    d, w, h, nf, upf = 7, 9, 5, 5, 40007
    st = decode_avi_stats(make_avi(d, w, h, nf, upf, corrupt=False))
    assert st is not None
    assert st[:5] == (w, h, nf, upf, 3)  # frames 0, 2, 4 sampled
    stride = (w * 3 + 3) & ~3
    assert st[5] == 3 * stride * h
    # exact pixel sums over the sampled frames, image coordinates
    want = sum((d * AVI_A + f * AVI_B + y * AVI_C + x * AVI_D
                + c * AVI_E) % 256
               for f in (0, 2, 4) for y in range(h)
               for x in range(w) for c in range(3))
    assert st[6] == want
    assert st[7] == (d * AVI_A) % 256  # frame 0, (0,0,0): top-left
    assert st[8] == (d * AVI_A + 4 * AVI_B + (h - 1) * AVI_C
                     + (w - 1) * AVI_D + 2 * AVI_E) % 256
    # unsampled-frame content must NOT leak into the stats: frame 1's
    # first byte differs from frame 0's, but the sum above matches
    # exactly, so stride sampling is pinned by the equality.

    # lying idx1 entry 0 (offset + 2): seek-target fourcc mismatch
    assert decode_avi_stats(make_avi(d, w, h, nf, upf,
                                     corrupt=True)) is None
    blob = make_avi(d, w, h, nf, upf, corrupt=False)
    # truncation: RIFF size now points past EOF
    assert decode_avi_stats(blob[:-10]) is None
    # wrong container fourcc
    assert decode_avi_stats(blob[:8] + b"WAVE" + blob[12:]) is None
    # header cross-validation: avih dims vs strf dims disagree
    i = blob.index(b"avih")
    bad = bytearray(blob)
    bad[i + 8 + 32:i + 8 + 36] = (w + 1).to_bytes(4, "little")
    assert decode_avi_stats(bytes(bad)) is None


def test_zip_codec_shift_crc_and_concatenation():
    """Byte-level ZIP behavior: the prepended junk prefix is absorbed
    by the concatenation shift (and so is an ENTIRE other zip glued in
    front — the reader must decode the LAST archive); CRC catches a
    flipped payload byte; truncating the EOCD rejects; stored member
    stats are exact."""
    from downscaledclimatedata_spark.operators.multimodal import (
        ZIP_A, ZIP_B, ZIP_C, ZIP_L_BASE, ZIP_L_MOD, ZIP_M_BASE,
        ZIP_M_MOD, ZIP_PREFIX, decode_zip_stats, make_zip)

    d = 5
    st = decode_zip_stats(make_zip(d, corrupt=False))
    nm = ZIP_M_BASE + d % ZIP_M_MOD
    lens = [ZIP_L_BASE + (d + i) % ZIP_L_MOD for i in range(nm)]
    want_sum = sum((d * ZIP_A + i * ZIP_B + j * ZIP_C) % 256
                   for i in range(nm) for j in range(lens[i]))
    assert st == (nm, sum((d + i) % 2 for i in range(nm)),
                  sum(lens), want_sum, (d * ZIP_A) % 256,
                  (d * ZIP_A + (nm - 1) * ZIP_B
                   + (lens[-1] - 1) * ZIP_C) % 256)

    # stripping the junk prefix only changes the shift (0 instead of 7)
    assert decode_zip_stats(make_zip(d, False)[ZIP_PREFIX:]) == st
    # an entire other archive glued in FRONT is just a bigger prefix:
    # the backward EOCD scan finds the LAST archive and the shift
    # absorbs everything before it
    assert decode_zip_stats(make_zip(9, False) + make_zip(d, False)[ZIP_PREFIX:]) == st

    # CRC integrity: flipped payload byte (stored or deflated) rejects
    assert decode_zip_stats(make_zip(d, corrupt=True)) is None
    assert decode_zip_stats(make_zip(17, corrupt=True)) is None
    # truncated EOCD rejects
    assert decode_zip_stats(make_zip(d, False)[:-4]) is None


def test_tar_codec_blocks_checksum_and_dispatch():
    """Byte-level ustar behavior: exact member stats, the planted
    directory entry is SKIPPED not summed, an off-by-one header
    checksum rejects, a missing end-of-archive marker rejects, and the
    output of Python's own tarfile agrees with our hand-rolled reader
    on member names and sizes (the format is real, not private)."""
    import io
    import tarfile

    from downscaledclimatedata_spark.operators.multimodal import (
        TAR_A, TAR_B, TAR_C, TAR_L_BASE, TAR_L_MOD, TAR_M_BASE,
        TAR_M_MOD, decode_tar_stats, make_tar)

    d = 7
    blob = make_tar(d, corrupt=False)
    st = decode_tar_stats(blob)
    nm = TAR_M_BASE + d % TAR_M_MOD
    lens = [TAR_L_BASE + (d + i) % TAR_L_MOD for i in range(nm)]
    want_sum = sum((d * TAR_A + i * TAR_B + j * TAR_C) % 256
                   for i in range(nm) for j in range(lens[i]))
    assert st == (nm, 1, sum(lens), want_sum, (d * TAR_A) % 256,
                  (d * TAR_A + (nm - 1) * TAR_B
                   + (lens[-1] - 1) * TAR_C) % 256)

    # cross-validation with the stdlib reader: real ustar, byte for byte
    with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
        names = [(m.name, m.size, m.isdir()) for m in tf.getmembers()]
    assert names == [("data", 0, True)] + [
        (f"data/m{i}.bin", lens[i], False) for i in range(nm)]

    assert decode_tar_stats(make_tar(d, corrupt=True)) is None
    # truncated: end-of-archive marker gone
    assert decode_tar_stats(blob[:-1024]) is None
    # non-ustar magic rejects
    bad = bytearray(blob)
    bad[257:263] = b"notme\x00"
    assert decode_tar_stats(bytes(bad)) is None


# --- MIDI / SMF-0 codec -----------------------------------------------------------

def test_midi_vlq_roundtrip_boundaries():
    from downscaledclimatedata_spark.operators.multimodal import (
        midi_vlq_encode, midi_vlq_read)
    for n in (0, 1, 127, 128, 129, 16383, 16384, 2097151, 2097152,
              0x0FFFFFFF):
        enc = midi_vlq_encode(n)
        got, p = midi_vlq_read(enc, 0, len(enc))
        assert (got, p) == (n, len(enc)), n


def test_midi_overlong_and_truncated_vlq_rejected():
    import pytest as _pytest
    from downscaledclimatedata_spark.operators.multimodal import (
        midi_vlq_read)
    with _pytest.raises(ValueError):
        midi_vlq_read(b"\x81\x81\x81\x81\x01", 0, 5)  # 5 bytes: overlong
    with _pytest.raises(ValueError):
        midi_vlq_read(b"\x81\x81", 0, 2)              # never terminates


def test_midi_decode_matches_formula():
    from downscaledclimatedata_spark.operators.multimodal import (
        MIDI_N_BASE, MIDI_N_MOD, decode_midi_stats, make_midi)
    for d in (5, 77, 123):  # d=77: deltas cross the 127 VLQ boundary
        nn = MIDI_N_BASE + d % MIDI_N_MOD
        want = (
            nn,
            sum((d * 17 + k * 37) % 1000 + 60 + (d + k * 29) % 200
                for k in range(nn)),
            sum(36 + (d * 7 + k * 5) % 48 for k in range(nn)),
            sum(32 + (d * 11 + k * 13) % 64 for k in range(nn)),
            max(max((d * 17 + k * 37) % 1000 for k in range(nn)),
                max(60 + (d + k * 29) % 200 for k in range(nn))),
            400_000 + (d % 100) * 1_000)
        assert decode_midi_stats(make_midi(d, False)) == want, d


def test_midi_running_status_is_real():
    from downscaledclimatedata_spark.operators.multimodal import make_midi
    blob = make_midi(9, False)
    # exactly ONE 0x90 status byte in the whole track: every later
    # note-on/off rides running status (0x90 never reappears as a
    # status; it can't appear as data since pitch<84 and vel<96)
    track = blob[22:]
    assert track.count(0x90) == 1


def test_midi_lying_track_length_rejected():
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_midi_stats, make_midi)
    assert decode_midi_stats(make_midi(41, True)) is None
    assert decode_midi_stats(make_midi(41, False)) is not None
    # hard truncation mid-event also rejected
    good = make_midi(7, False)
    assert decode_midi_stats(good[:len(good) - 3]) is None


# --- PNG Adam7 interlace codec ------------------------------------------------------

def _adam7_img(d):
    from downscaledclimatedata_spark.operators.multimodal import (
        ADAM7_A, ADAM7_B, ADAM7_C, ADAM7_H_BASE, ADAM7_H_MOD,
        ADAM7_W_BASE, ADAM7_W_MOD)
    w, h = ADAM7_W_BASE + d % ADAM7_W_MOD, ADAM7_H_BASE + d % ADAM7_H_MOD
    return [bytes((d * ADAM7_A + y * ADAM7_B + x * ADAM7_C) % 256
                  for x in range(w)) for y in range(h)], w, h


def test_adam7_roundtrip_matches_formula():
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_adam7_stats, make_png_adam7)
    for d in (5, 77, 123):
        img, w, h = _adam7_img(d)
        flat = [v for row in img for v in row]
        p1 = sum(img[y][x] for y in range(0, h, 8)
                 for x in range(0, w, 8))
        assert decode_png_adam7_stats(make_png_adam7(img)) == (
            w, h, w * h, sum(flat), min(flat), max(flat), p1)


def test_adam7_sequential_decoder_rejects_interlaced():
    """A decoder that ignores the IHDR interlace flag sees the wrong
    raw length and must reject — deinterlacing cannot be faked."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_adam7_stats, decode_png_pixel_stats, make_png_adam7,
        make_png_pixels)
    img, _, _ = _adam7_img(9)
    assert decode_png_pixel_stats(make_png_adam7(img)) is None
    # and vice versa: the interlaced decoder rejects sequential streams
    assert decode_png_adam7_stats(make_png_pixels(img)) is None


def test_adam7_truncated_deflate_rejected_crc_clean():
    """The planted corruption is invisible to every chunk CRC — only
    the inflater can see it."""
    import struct
    import zlib

    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_adam7_stats, make_png_adam7)
    img, _, _ = _adam7_img(43)
    blob = make_png_adam7(img, corrupt=True)
    assert decode_png_adam7_stats(blob) is None
    i = 8
    while i + 12 <= len(blob):  # every CRC still verifies
        (ln,) = struct.unpack(">I", blob[i:i + 4])
        typ, data = blob[i + 4:i + 8], blob[i + 8:i + 8 + ln]
        (crc,) = struct.unpack(">I", blob[i + 8 + ln:i + 12 + ln])
        assert zlib.crc32(typ + data) & 0xFFFFFFFF == crc
        i += 12 + ln


def test_adam7_single_pixel_image():
    """1x1 forces six EMPTY passes (zero bytes, not empty scanlines)."""
    from downscaledclimatedata_spark.operators.multimodal import (
        decode_png_adam7_stats, make_png_adam7)
    assert decode_png_adam7_stats(make_png_adam7([b"\x7f"])) == (
        1, 1, 1, 127, 127, 127, 127)


# --- audio FIR --------------------------------------------------------------------

def test_fir_matches_naive_convolution():
    from downscaledclimatedata_spark.operators.multimodal import (
        FIR_TAPS, make_wav, parse_wav_fir)
    samples = [100, -200, 300, 15900, 15900, -16000, 7, 0, -1]
    blob = make_wav(1, 8000, samples)
    ch, n_out, peak, tot, hot = parse_wav_fir(blob)
    ys = [sum(samples[f:f + FIR_TAPS])
          for f in range(len(samples) - FIR_TAPS + 1)]
    assert (ch, n_out) == (1, len(ys))
    assert peak == max(abs(y) for y in ys)
    assert tot == sum(ys)
    assert hot == sum(1 for y in ys if abs(y) > 15000)


def test_fir_deinterleaves_channel0():
    """Stereo: channel 1 carries huge values; a decoder convolving the
    interleaved stream would report a wrong peak."""
    from downscaledclimatedata_spark.operators.multimodal import (
        make_wav, parse_wav_fir)
    inter = []
    ch0 = [10, 20, 30, 40, 50]
    for v in ch0:
        inter += [v, 30000]
    blob = make_wav(2, 8000, inter)
    ch, n_out, peak, tot, hot = parse_wav_fir(blob)
    assert (ch, n_out, peak, hot) == (2, 2, 140, 0)
    assert tot == (10 + 20 + 30 + 40) + (20 + 30 + 40 + 50)


def test_fir_short_stream_and_corrupt():
    from downscaledclimatedata_spark.operators.multimodal import (
        make_wav, parse_wav_fir)
    assert parse_wav_fir(make_wav(1, 8000, [1, 2])) == (1, 0, 0, 0, 0)
    assert parse_wav_fir(make_wav(1, 8000, [1, 2, 3])[:8]) is None
