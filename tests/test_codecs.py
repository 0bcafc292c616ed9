"""Pure-Python codec tests (PNG / GIF / FLAC) plus the Spark operator
paths that dispatch to them.

These codecs close the compressed-format decode stubs flagged in
round 2: PNG needs only stdlib zlib, GIF only pure-Python LZW, FLAC
only bit-level Rice/fixed-predictor math — so all three are REAL
decoders with no codec libraries in the image. Round-trip tests pin
losslessness; corruption tests pin the None-not-crash contract the
mapInPandas operators rely on (a poisoned blob must yield a null row,
never kill the task)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from kinesis_producer_spark.operators.flac import (
    decode_flac,
    encode_flac,
    parse_streaminfo,
)
from kinesis_producer_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from kinesis_producer_spark.operators.png import decode_png, encode_png

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_roundtrip_all_filters(filter_type, interlace):
    rng = np.random.RandomState(7 + filter_type)
    for shape in [(16, 24), (16, 24, 3), (9, 13, 4), (5, 7, 2), (1, 1), (3, 1, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        out = decode_png(encode_png(img, filter_type=filter_type, interlace=interlace))
        assert out is not None
        assert np.array_equal(out.reshape(img.shape), img), (shape, filter_type)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def test_png_palette_and_trns():
    pal = bytes(range(48))  # 16 RGB entries
    idx = np.array([[0, 1], [2, 15]], np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out = decode_png(blob)
    exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[idx]
    assert np.array_equal(out, exp)
    # with tRNS the result grows an alpha channel
    blob_a = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal)
        + _png_chunk(b"tRNS", bytes([10, 255]))
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    out_a = decode_png(blob_a)
    assert out_a.shape == (2, 2, 4)
    assert out_a[0, 0, 3] == 10 and out_a[0, 1, 3] == 255 and out_a[1, 0, 3] == 255


def test_png_rejects_corruption_and_unsupported():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    blob = bytearray(encode_png(img))
    blob[-5] ^= 0xFF  # IEND CRC
    assert decode_png(bytes(blob)) is None
    assert decode_png(b"not a png") is None
    assert decode_png(None) is None
    assert decode_png(encode_png(img)[:20]) is None
    # depth 16 is now a REAL path (big-endian samples)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02"))
        + _png_chunk(b"IEND", b"")
    )
    assert decode_png(deep).tolist() == [[0x0102]]
    # spec-illegal depth/color combo (depth 3) → None, not crash
    bad_depth = struct.pack(">IIBBBBB", 1, 1, 3, 0, 0, 0, 0)
    assert decode_png(
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", bad_depth)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01"))
        + _png_chunk(b"IEND", b"")
    ) is None
    assert decode_png(encode_png(img), max_bytes=10) is None


# ---------------------------------------------------------------------------
# GIF
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_pal", [2, 4, 16, 256])
@pytest.mark.parametrize("interlace", [False, True])
def test_gif_roundtrip(n_pal, interlace):
    rng = np.random.RandomState(n_pal)
    pal = rng.randint(0, 256, (n_pal, 3)).astype(np.uint8)
    for shape in [(16, 24), (7, 5), (1, 1), (33, 31)]:
        idx = rng.randint(0, n_pal, shape).astype(np.uint8)
        out = decode_gif(encode_gif(idx, pal, interlace=interlace))
        assert out is not None
        assert np.array_equal(out, pal[idx]), (n_pal, shape, interlace)


def test_gif_multiframe_and_dict_reset():
    rng = np.random.RandomState(11)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    frames = [rng.randint(0, 8, (10, 12)).astype(np.uint8) for _ in range(5)]
    res = decode_gif_frames(encode_gif(frames, pal))
    assert len(res) == 5
    for r, f in zip(res, frames):
        assert np.array_equal(r["pixels"], pal[f])
    # noise image large enough to overflow the 12-bit code space →
    # exercises the CLEAR/reset path in both encoder and decoder
    pal256 = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    big = rng.randint(0, 256, (80, 80)).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(big, pal256)), pal256[big])


def test_gif_rejects_corruption():
    assert decode_gif(b"hello") is None
    assert decode_gif(None) is None
    assert decode_gif_frames(b"GIF89a\x00") is None
    pal = np.zeros((4, 3), np.uint8)
    idx = np.zeros((3, 3), np.uint8)
    blob = bytearray(encode_gif(idx, pal))
    blob[6] = 0xFF  # implausible width → pixel count mismatch
    blob[7] = 0xFF
    # corrupt logical screen alone is tolerated (frame has its own
    # descriptor); corrupt the frame descriptor width instead
    blob = bytearray(encode_gif(idx, pal))
    pos = blob.index(0x2C)
    blob[pos + 5] = 0xFF
    blob[pos + 6] = 0x7F
    assert decode_gif(bytes(blob)) is None


# ---------------------------------------------------------------------------
# FLAC
# ---------------------------------------------------------------------------


def _signals():
    rng = np.random.RandomState(3)
    n = 3000
    t = np.arange(n)
    return [
        ("flat", np.full(n, -123, np.int16)),
        ("ramp", (t % 4000 - 2000).astype(np.int16)),
        ("sine", (3000 * np.sin(t / 50)).astype(np.int16)),
        ("noise", rng.randint(-32768, 32768, n).astype(np.int16)),
    ]


@pytest.mark.parametrize("rate", [44100, 12345])
@pytest.mark.parametrize("n_chan", [1, 2])
def test_flac_roundtrip(rate, n_chan):
    for name, sig in _signals():
        x = sig if n_chan == 1 else np.stack([sig, (-sig).astype(np.int16)], axis=1)
        res = decode_flac(encode_flac(x, sample_rate=rate, block_size=1024))
        assert res is not None, (name, rate, n_chan)
        dec, r = res
        x2 = x if x.ndim == 2 else x[:, None]
        assert r == rate
        assert np.array_equal(dec, x2), (name, rate, n_chan)


def test_flac_streaminfo_and_compression():
    sig = _signals()[2][1]
    blob = encode_flac(sig, sample_rate=22050)
    info = parse_streaminfo(blob)
    assert info["sample_rate"] == 22050
    assert info["n_channels"] == 1
    assert info["bits_per_sample"] == 16
    assert info["total_samples"] == len(sig)
    # fixed predictors + Rice actually compress a smooth signal
    assert len(blob) < 2 * len(sig)


def test_flac_rejects_corruption():
    assert decode_flac(b"fLaC" + b"\x00" * 40) is None
    assert decode_flac(None) is None
    assert decode_flac(b"RIFF....WAVE") is None
    blob = bytearray(encode_flac(np.arange(500, dtype=np.int16)))
    blob[-3] ^= 0x55  # damage Rice residual bytes → CRC-16 mismatch
    assert decode_flac(bytes(blob)) is None
    assert decode_flac(encode_flac(np.arange(500, dtype=np.int16)), max_bytes=8) is None


# ---------------------------------------------------------------------------
# Spark operator dispatch
# ---------------------------------------------------------------------------


def test_decode_media_png_gif_paths(spark):
    from kinesis_producer_spark.operators.multimodal import decode_media

    img = np.full((10, 20, 3), 100, np.uint8)
    png = encode_png(img, filter_type=4)
    pal = np.array([[0, 0, 0], [200, 100, 50]], np.uint8)
    gif = encode_gif(np.ones((6, 8), np.uint8), pal)
    df = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(gif))], "media_id long, content binary"
    )
    rows = {r["media_id"]: r.asDict() for r in decode_media(df).collect()}
    assert (rows[1]["width"], rows[1]["height"], rows[1]["n_channels"]) == (20, 10, 3)
    assert (rows[2]["width"], rows[2]["height"], rows[2]["n_channels"]) == (8, 6, 3)
    # flat image → luma mean 100/255 (float32 column), std 0
    assert abs(rows[1]["feature"][0] - 100 / 255) < 1e-6
    assert abs(rows[1]["feature"][1]) < 1e-9


def test_decode_kernel_swap_seam(spark):
    """The 100 TB kernel-swap contract (SCALE.md): a production codec
    (libjpeg-turbo, PIL) replaces the pure-Python kernel through the
    registry WITHOUT changing the operator's plan, schema, or — for a
    semantics-preserving kernel — its rows."""
    from kinesis_producer_spark.operators.multimodal import (
        decode_media,
        register_decode_kernel,
        resize_media,
        unregister_decode_kernel,
    )

    img = np.full((10, 20, 3), 100, np.uint8)
    png = encode_png(img)
    df = spark.createDataFrame(
        [(1, bytearray(png))], "media_id long, content binary"
    )

    calls = {"n": 0}

    def fast_png(b: bytes):
        # stand-in for a C-accelerated kernel: same contract
        # (bytes -> ndarray | None), different implementation
        calls["n"] += 1
        return decode_png(b)

    base = decode_media(df)
    swapped = decode_media(df, kernels={"png": fast_png})
    # identical schema and plan shape (same single mapInPandas stage)
    assert base.schema == swapped.schema
    assert ("MapInPandas" in swapped._jdf.queryExecution().executedPlan().toString())
    assert base.collect() == swapped.collect()

    # a kernel that REPLACES semantics flows through to the rows —
    # proof the swapped callable actually runs on executors
    tiny = decode_media(df, kernels={"png": lambda b: np.zeros((2, 2), np.uint8)})
    r = tiny.collect()[0]
    assert (r.width, r.height, r.n_channels) == (2, 2, 1)

    # process-global registration: affects plans built after the call,
    # and unregister restores the built-in
    register_decode_kernel("png", lambda b: np.zeros((3, 4), np.uint8))
    try:
        r = decode_media(df).collect()[0]
        assert (r.width, r.height) == (4, 3)
    finally:
        unregister_decode_kernel("png")
    r = decode_media(df).collect()[0]
    assert (r.width, r.height) == (20, 10)

    # resize goes through the same seam (decode + encode kernels)
    rz = resize_media(
        df,
        width=4,
        height=4,
        kernels={"png": decode_png},
        encode_kernels={"png": encode_png},
    ).collect()[0]
    assert decode_png(bytes(rz.resized)).shape == (4, 4, 3)


def test_resize_media_png_thumbnail_is_decodable(spark):
    from kinesis_producer_spark.operators.multimodal import resize_media

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(7, bytearray(encode_png(img)))], "media_id long, content binary"
    )
    row = resize_media(df, width=8, height=8).collect()[0]
    thumb = decode_png(bytes(row["resized"]))
    assert thumb.shape == (8, 8, 3)
    # nearest-neighbor: every thumb pixel is an exact source pixel
    ys = (np.arange(8) * 32) // 8
    xs = (np.arange(8) * 48) // 8
    assert np.array_equal(thumb, img[ys][:, xs])


def test_decode_audio_pcm_flac_matches_wav(spark):
    """Lossless equivalence: the same signal through the WAV path and
    the FLAC path must produce identical stats."""
    import io
    import wave

    from kinesis_producer_spark.operators.multimodal import decode_audio_pcm

    t = np.arange(2000)
    sig = (5000 * np.sin(t / 30)).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(sig.tobytes())
    df = spark.createDataFrame(
        [
            (1, bytearray(buf.getvalue())),
            (2, bytearray(encode_flac(sig, sample_rate=16000))),
        ],
        "media_id long, content binary",
    )
    rows = {r["media_id"]: r.asDict() for r in decode_audio_pcm(df).collect()}
    for k in ("n_samples", "sample_rate", "duration_ms", "peak", "mean_milli", "rms"):
        assert rows[1][k] == rows[2][k], k
    assert rows[1]["sample_rate"] == 16000


def test_decode_avi_frames_luma_null_on_non_jpeg_frame(spark):
    from kinesis_producer_spark.operators.multimodal import decode_avi_frames_luma

    movi = bytearray(b"movi")
    fb = b"not a jpeg frame"
    movi += b"00dc" + len(fb).to_bytes(4, "little") + fb
    payload = b"LIST" + len(movi).to_bytes(4, "little") + bytes(movi)
    blob = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"AVI " + payload
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, content binary")
    rows = decode_avi_frames_luma(df).collect()
    assert len(rows) == 1
    assert rows[0]["frame_idx"] == 0
    assert rows[0]["width"] is None and rows[0]["mean_luma_milli"] is None


def test_spread_fans_out_single_partition_inputs(spark):
    """Guard the round-3 fix: codec queries must not feed mapInPandas
    from a 1-partition scan (serializes Python kernels onto 1 core)."""
    from kinesis_producer_spark.operators.llm_queries import _spread

    one = spark.range(0, 1000).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    assert (
        _spread(one).rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )


@pytest.mark.parametrize(
    "stereo_mode", ["independent", "left-side", "right-side", "mid-side"]
)
def test_flac_stereo_decorrelation_roundtrip(stereo_mode):
    rng = np.random.RandomState(9)
    n = 4000
    t = np.arange(n)
    left = (2500 * np.sin(t / 40)).astype(np.int16)
    right = (left * 0.7 + rng.randint(-80, 80, n)).astype(np.int16)
    x = np.stack([left, right], axis=1)
    res = decode_flac(encode_flac(x, block_size=512, stereo_mode=stereo_mode))
    assert res is not None, stereo_mode
    dec, _ = res
    assert np.array_equal(dec, x), stereo_mode


@pytest.mark.parametrize(
    "lpc",
    [
        ([2, -1], 0, 5),        # fixed-order-2 equivalent, no shift
        ([3, -1], 1, 6),        # truncating shift path
        ([5, -3, 1], 2, 8),     # order 3
        ([-2, 4, -1, 2], 3, 12),  # order 4, wide precision
    ],
)
def test_flac_lpc_roundtrip(lpc):
    rng = np.random.RandomState(5)
    n = 3000
    t = np.arange(n)
    for sig in [
        (3000 * np.sin(t / 50)).astype(np.int16),
        rng.randint(-2000, 2000, n).astype(np.int16),
    ]:
        res = decode_flac(encode_flac(sig, block_size=256, lpc=lpc))
        assert res is not None, lpc
        dec, _ = res
        assert np.array_equal(dec[:, 0], sig), lpc


def test_flac_lpc_stereo_combined():
    t = np.arange(2000)
    left = (1500 * np.sin(t / 25)).astype(np.int16)
    right = (-left // 2).astype(np.int16)
    x = np.stack([left, right], axis=1)
    blob = encode_flac(x, block_size=512, lpc=([2, -1], 0, 5), stereo_mode="mid-side")
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec, x)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("interlace", [False, True])
def test_png_16bit_roundtrip(filter_type, interlace):
    rng = np.random.RandomState(40 + filter_type)
    for shape in [(9, 13), (6, 10, 3), (4, 5, 4), (1, 1)]:
        img = rng.randint(0, 65536, shape).astype(np.uint16)
        out = decode_png(encode_png(img, filter_type=filter_type, interlace=interlace))
        assert out is not None and out.dtype == np.uint16
        assert np.array_equal(out.reshape(img.shape), img), (shape, filter_type)


def _png_blob(depth, color, w, h, rows, extra=b""):
    raw = b"".join(b"\x00" + r for r in rows)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0))
        + extra
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def test_png_sub_byte_depths():
    # depth-4 gray 3x2: samples 1,10,15 / 0,7,2 packed MSB-first
    out = decode_png(_png_blob(4, 0, 3, 2, [bytes([0x1A, 0xF0]), bytes([0x07, 0x20])]))
    assert out.tolist() == [[1, 10, 15], [0, 7, 2]]
    # depth-1 gray 10x1: bits 1010101010 + row padding
    out = decode_png(_png_blob(1, 0, 10, 1, [bytes([0xAA, 0x80])]))
    assert out.tolist() == [[1, 0, 1, 0, 1, 0, 1, 0, 1, 0]]
    # depth-2 palette 5x1: indices 0,1,2,3,1
    pal = bytes(range(12))
    out = decode_png(
        _png_blob(2, 3, 5, 1, [bytes([0b00011011, 0b01000000])],
                  extra=_png_chunk(b"PLTE", pal))
    )
    exp = np.frombuffer(pal, np.uint8).reshape(-1, 3)[[0, 1, 2, 3, 1]]
    assert np.array_equal(out[0], exp)
    # illegal combo (RGB at depth 4) → None, not crash
    assert decode_png(_png_blob(4, 2, 2, 1, [bytes([0x12, 0x34, 0x56])])) is None


def test_webp_header_parse():
    from kinesis_producer_spark.operators.multimodal import _parse_webp_header

    # VP8L (lossless): 300x200, no alpha
    w, h = 300, 200
    packed = (w - 1) | ((h - 1) << 14)
    payload = b"VP8L" + (5).to_bytes(4, "little") + bytes([0x2F]) + packed.to_bytes(4, "little")
    blob = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload + b"\x00"
    got = _parse_webp_header(blob)
    assert (got["width"], got["height"], got["n_channels"]) == (300, 200, 3)
    # VP8 (lossy): 640x480
    tag = b"\x00\x00\x00"
    body = tag + b"\x9d\x01\x2a" + (640).to_bytes(2, "little") + (480).to_bytes(2, "little")
    payload = b"VP8 " + len(body).to_bytes(4, "little") + body
    blob = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload
    got = _parse_webp_header(blob)
    assert (got["width"], got["height"]) == (640, 480)
    # VP8X (extended): canvas 1024x768 with alpha
    flags = bytes([0x10, 0, 0, 0])
    body = flags + (1023).to_bytes(3, "little") + (767).to_bytes(3, "little")
    payload = b"VP8X" + len(body).to_bytes(4, "little") + body
    blob = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload
    got = _parse_webp_header(blob)
    assert (got["width"], got["height"], got["n_channels"]) == (1024, 768, 4)
    assert _parse_webp_header(b"RIFF\x00\x00\x00\x00WAVE") is None


def test_media_ops_compose_with_streaming(spark, tmp_path):
    """decode_headers / decode_media are mapInPandas stages, so they
    must run unchanged inside Structured Streaming — the live-ingest
    side of a media pipeline."""
    src = tmp_path / "media_stream_src"
    src.mkdir()
    img = np.full((6, 9, 3), 77, np.uint8)
    rows = [(1, bytearray(encode_png(img))), (2, bytearray(b"garbage"))]
    spark.createDataFrame(rows, "media_id long, content binary").write.mode(
        "overwrite"
    ).parquet(str(src))

    from kinesis_producer_spark.operators.multimodal import decode_headers

    stream = spark.readStream.schema("media_id long, content binary").parquet(str(src))
    q = (
        decode_headers(stream)
        .writeStream.format("memory")
        .queryName("media_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.media_id: r.asDict()
        for r in spark.sql("SELECT * FROM media_stream_t").collect()
    }
    assert got[1]["media_type"] == "image/png"
    assert (got[1]["width"], got[1]["height"]) == (9, 6)
    assert got[2]["media_type"] == "application/octet-stream"


def test_flac_wasted_bits_roundtrip():
    t = np.arange(3000)
    sig = ((1000 * np.sin(t / 40)).astype(np.int64) << 3).astype(np.int16)
    dec, _ = decode_flac(encode_flac(sig, block_size=512, wasted_bits=3))
    assert np.array_equal(dec[:, 0], sig)
    # combined with LPC + stereo decorrelation
    x = np.stack([sig, (-sig).astype(np.int16)], axis=1)
    blob = encode_flac(
        x, block_size=256, wasted_bits=2, lpc=([2, -1], 0, 5),
        stereo_mode="left-side",
    )
    res = decode_flac(blob)
    assert res is not None and np.array_equal(res[0], x)
    # encoder refuses samples without the claimed trailing zeros
    with pytest.raises(ValueError):
        encode_flac(np.arange(100, dtype=np.int16) | 1, wasted_bits=2)


def test_jpeg_420_subsampled_roundtrip():
    """4:2:0 encode exercises the decoder's MCU interleave (4 luma +
    2 chroma blocks per MCU) and replication upsample. Flat 16x16
    gray-valued tiles with even luma are exact by construction even
    through the chroma averaging."""
    from kinesis_producer_spark.operators.jpeg import (
        FLAT16_QUANT,
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    rng = np.random.RandomState(4)
    tiles = rng.randint(0, 63, (2, 3)) * 4 + 2
    img = np.repeat(np.repeat(tiles, 16, 0), 16, 1).astype(np.uint8)
    rgb = np.repeat(img[:, :, None], 3, 2)
    blob = encode_baseline_jpeg(
        rgb, luma_quant=FLAT16_QUANT, chroma_quant=FLAT16_QUANT, subsample="420"
    )
    assert np.array_equal(decode_baseline_jpeg(blob), rgb)
    # odd (non-multiple-of-16) dims: edge replication keeps exactness
    odd = np.full((17, 22, 3), 106, np.uint8)
    blob = encode_baseline_jpeg(
        odd, luma_quant=FLAT16_QUANT, chroma_quant=FLAT16_QUANT, subsample="420"
    )
    assert np.array_equal(decode_baseline_jpeg(blob), odd)
    # natural content decodes at the right shape (lossy)
    nat = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(nat, subsample="420"))
    assert out.shape == nat.shape
    with pytest.raises(ValueError):
        encode_baseline_jpeg(nat, subsample="422")


@pytest.mark.parametrize("bits,amp", [(8, 100), (12, 1800), (20, 400000), (24, 4_000_000)])
def test_flac_all_bit_depths(bits, amp):
    t = np.arange(4000)
    sig = (amp * np.sin(t / 30)).astype(np.int64)
    blob = encode_flac(sig, block_size=512, bits=bits)
    assert parse_streaminfo(blob)["bits_per_sample"] == bits
    dec, _ = decode_flac(blob)
    assert np.array_equal(dec[:, 0], sig)
    with pytest.raises(ValueError):
        encode_flac(np.array([1 << bits], np.int64), bits=bits)


# ---------------------------------------------------------------------------
# Property-based round trips (pure Python, no Spark — generous examples)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as hst  # noqa: E402

_CODEC_SETTINGS = settings(max_examples=40, deadline=None)


@settings(max_examples=40, deadline=None)
@given(
    h=hst.integers(1, 20),
    w=hst.integers(1, 20),
    c=hst.sampled_from([1, 2, 3, 4]),
    ft=hst.integers(0, 4),
    il=hst.booleans(),
    seed=hst.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, ft, il, seed):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w, c) if c > 1 else (h, w)).astype(np.uint8)
    out = decode_png(encode_png(img, filter_type=ft, interlace=il))
    assert out is not None and np.array_equal(out.reshape(img.shape), img)


@settings(max_examples=40, deadline=None)
@given(
    h=hst.integers(1, 25),
    w=hst.integers(1, 25),
    npal_pow=hst.integers(1, 8),
    il=hst.booleans(),
    seed=hst.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(h, w, npal_pow, il, seed):
    rng = np.random.RandomState(seed)
    n_pal = 1 << npal_pow
    pal = rng.randint(0, 256, (n_pal, 3)).astype(np.uint8)
    idx = rng.randint(0, n_pal, (h, w)).astype(np.uint8)
    out = decode_gif(encode_gif(idx, pal, interlace=il))
    assert out is not None and np.array_equal(out, pal[idx])


@settings(max_examples=30, deadline=None)
@given(
    n=hst.integers(1, 800),
    n_chan=hst.sampled_from([1, 2]),
    block=hst.sampled_from([64, 192, 333]),
    kind=hst.sampled_from(["noise", "smooth", "flat"]),
    seed=hst.integers(0, 2**31 - 1),
)
def test_flac_roundtrip_property(n, n_chan, block, kind, seed):
    rng = np.random.RandomState(seed)
    if kind == "noise":
        sig = rng.randint(-32768, 32768, n).astype(np.int16)
    elif kind == "smooth":
        sig = (3000 * np.sin(np.arange(n) / 17)).astype(np.int16)
    else:
        sig = np.full(n, rng.randint(-32768, 32768), np.int16)
    x = sig if n_chan == 1 else np.stack([sig, rng.permutation(sig)], axis=1)
    res = decode_flac(encode_flac(x, block_size=block))
    assert res is not None
    dec, _ = res
    assert np.array_equal(dec, x if x.ndim == 2 else x[:, None])


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2)
# ---------------------------------------------------------------------------


def test_progressive_jpeg_matches_baseline_exactly():
    """Identical quantization tables ⇒ identical quantized coefficients
    ⇒ the progressive and baseline decoders must emit byte-identical
    pixels. Matrix over gray/RGB, odd sizes, EOBn batching on/off,
    spectral split points, and successive-approximation depth."""
    from kinesis_producer_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(7)
    for shape in [(8, 8), (17, 23), (24, 16, 3), (33, 47, 3), (1, 1)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        want = decode_baseline_jpeg(encode_baseline_jpeg(img))
        for eob in (True, False):
            for split, al in [(5, 1), (20, 2), (62, 0), (1, 3)]:
                pb = encode_progressive_jpeg(
                    img, eob_batching=eob, spectral_split=split, al=al
                )
                got = decode_progressive_jpeg(pb)
                assert got is not None and np.array_equal(got, want), (
                    shape, eob, split, al,
                )


def test_progressive_jpeg_flat_quant_lossless():
    """Block-constant images with the flat-16 tables round-trip
    LOSSLESSLY through the progressive pipeline (same construction the
    baseline exactness test uses: only the DC coefficient is nonzero
    and it is a multiple of the quantizer)."""
    from kinesis_producer_spark.operators.jpeg import FLAT16_QUANT
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(9)
    vals = (rng.randint(0, 64, (3, 4)) * 4 + 2).astype(np.uint8)
    img = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1)
    for al in (0, 1, 2):
        out = decode_progressive_jpeg(
            encode_progressive_jpeg(img, luma_quant=FLAT16_QUANT, al=al)
        )
        assert np.array_equal(out, img), f"al={al}"


def test_progressive_jpeg_rejects_truncation_and_garbage():
    """Progressive streams degrade gracefully in viewers, but the
    pipeline's poisoned-blob contract is truncation → None (same rule
    as the gunzip d.eof gate): a blob chopped BETWEEN scans must not
    silently yield a coarse image."""
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (32, 32)).astype(np.uint8)
    good = encode_progressive_jpeg(img)
    assert decode_progressive_jpeg(good) is not None
    for cut in (len(good) // 4, len(good) // 2, len(good) - 3):
        assert decode_progressive_jpeg(good[:cut]) is None, f"cut at {cut}"
    assert decode_progressive_jpeg(b"\xff\xd8\xff" + b"\x00" * 64) is None
    assert decode_progressive_jpeg(b"not a jpeg") is None
    # oversized guard
    assert decode_progressive_jpeg(good, max_bytes=10) is None


def test_decode_jpeg_dispatches_both_frame_types():
    from kinesis_producer_spark.operators.jpeg import encode_baseline_jpeg
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (16, 24, 3)).astype(np.uint8)
    base = decode_jpeg(encode_baseline_jpeg(img))
    prog = decode_jpeg(encode_progressive_jpeg(img))
    assert base is not None and np.array_equal(base, prog)
    assert decode_jpeg(b"\xff\xd8\xff\xd9") is None  # SOI+EOI, no frame


def test_decode_media_progressive_jpeg_operator_path(spark):
    """A progressive blob flows through the decode_media operator with
    NO stub involved — the kernel seam's default 'jpeg' kernel
    dispatches SOF2."""
    from kinesis_producer_spark.operators.jpeg_progressive import (
        encode_progressive_jpeg,
    )
    from kinesis_producer_spark.operators.multimodal import decode_media

    img = np.full((10, 20, 3), 100, np.uint8)
    blob = encode_progressive_jpeg(img)
    df = spark.createDataFrame(
        [(1, bytearray(blob))], "media_id long, content binary"
    )
    r = decode_media(df, decode_stub="fail").collect()[0]
    assert (r.width, r.height, r.n_channels) == (20, 10, 3)
    # flat image → luma ≈ 100/255 after JPEG quantization of a constant
    assert abs(r.feature[0] - 100 / 255) < 0.02 and r.feature[1] < 0.02


# ---------------------------------------------------------------------------
# WebP lossless (VP8L)
# ---------------------------------------------------------------------------


def _webp_expect(img):
    """Decoder emits (H, W, 4) RGBA; expand gray/RGB inputs to that."""
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    if img.shape[2] == 3:
        img = np.dstack([img, np.full(img.shape[:2], 255, np.uint8)])
    return img


def test_webp_lossless_roundtrip_basic():
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(5)
    for shape in [(1, 1, 3), (7, 9, 3), (5, 6), (6, 8, 4), (16, 3, 3)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        out = decode_webp_lossless(encode_webp_lossless(img))
        assert out is not None and np.array_equal(out, _webp_expect(img)), shape


def test_webp_lossless_lz77_and_cache():
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(6)
    # long runs → LZ77 length prefix codes with extra bits
    img = np.repeat(rng.randint(0, 256, (4, 3, 3)).astype(np.uint8), 40, axis=1)
    out = decode_webp_lossless(encode_webp_lossless(img))
    assert np.array_equal(out, _webp_expect(img))
    # color cache across several bit widths
    few = (rng.randint(0, 5, (12, 13, 3)) * 50).astype(np.uint8)
    for bits in (1, 4, 8, 11):
        out = decode_webp_lossless(encode_webp_lossless(few, use_cache=bits))
        assert np.array_equal(out, _webp_expect(few)), f"cache_bits={bits}"


@pytest.mark.parametrize("mode", list(range(14)))
def test_webp_lossless_all_predictor_modes(mode):
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(100 + mode)
    img = rng.randint(0, 256, (11, 13, 3)).astype(np.uint8)
    blob = encode_webp_lossless(img, predictor_mode=mode, predictor_size_bits=2)
    out = decode_webp_lossless(blob)
    assert out is not None and np.array_equal(out, _webp_expect(img)), mode


def test_webp_lossless_transforms_and_combos():
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(8)
    img = rng.randint(0, 256, (9, 10, 3)).astype(np.uint8)
    for kw in (
        {"subtract_green": True},
        {"color_transform": (33, 200, 17)},
        {"color_transform": (255, 1, 128)},
        {"use_cache": 3, "subtract_green": True, "predictor_mode": 12},
    ):
        out = decode_webp_lossless(encode_webp_lossless(img, **kw))
        assert np.array_equal(out, _webp_expect(img)), kw
    # palette / color-indexing incl. sub-byte packing (2, 3, 10, 200 colors)
    for n_colors, width in ((2, 13), (3, 9), (10, 17), (200, 16)):
        vals = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
        idx = rng.randint(0, n_colors, (7, width))
        pimg = vals[idx]
        out = decode_webp_lossless(encode_webp_lossless(pimg, palette=True))
        assert np.array_equal(out, _webp_expect(pimg)), n_colors


def test_webp_lossless_rejects_corruption():
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (8, 8, 3)).astype(np.uint8)
    good = encode_webp_lossless(img)
    assert decode_webp_lossless(good) is not None
    assert decode_webp_lossless(good[: len(good) // 2]) is None
    assert decode_webp_lossless(b"RIFF\x00\x00\x00\x00WEBPVP8 ") is None  # lossy
    assert decode_webp_lossless(b"nonsense") is None
    assert decode_webp_lossless(None) is None
    assert decode_webp_lossless(good, max_bytes=10) is None
    # distance-map table sanity: 120 unique in-window offsets
    from kinesis_producer_spark.operators.webp import _DIST_MAP

    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120
    assert all(y >= 0 and (y > 0 or x > 0) for x, y in _DIST_MAP)


def test_webp_kernel_in_decode_media_and_resize(spark):
    """VP8L blobs decode for real through the operator seam, and
    resize re-encodes a decodable VP8L thumbnail."""
    from kinesis_producer_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    img = np.full((10, 20, 3), 100, np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_webp_lossless(img)))], "media_id long, content binary"
    )
    r = decode_media(df, decode_stub="fail").collect()[0]
    assert (r.width, r.height, r.n_channels) == (20, 10, 4)
    rz = resize_media(df, width=5, height=5, decode_stub="fail").collect()[0]
    thumb = decode_webp_lossless(bytes(rz.resized))
    assert thumb.shape == (5, 5, 4)
    assert (thumb[..., :3] == 100).all() and (thumb[..., 3] == 255).all()


@settings(max_examples=30, deadline=None)
@given(
    h=hst.integers(1, 18),
    w=hst.integers(1, 18),
    gray=hst.booleans(),
    eob=hst.booleans(),
    split=hst.integers(1, 62),
    al=hst.integers(0, 3),
    seed=hst.integers(0, 2**31 - 1),
)
def test_progressive_jpeg_equals_baseline_property(h, w, gray, eob, split, al, seed):
    """For ANY image and scan script, progressive decode must equal the
    baseline decode of the same coefficients — the coefficient-identity
    oracle as a property."""
    from kinesis_producer_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w) if gray else (h, w, 3)).astype(np.uint8)
    want = decode_baseline_jpeg(encode_baseline_jpeg(img))
    got = decode_progressive_jpeg(
        encode_progressive_jpeg(img, eob_batching=eob, spectral_split=split, al=al)
    )
    assert got is not None and np.array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(
    h=hst.integers(1, 16),
    w=hst.integers(1, 16),
    c=hst.sampled_from([1, 3, 4]),
    cache=hst.sampled_from([0, 2, 6, 10]),
    sg=hst.booleans(),
    pred=hst.sampled_from([None] + list(range(14))),
    seed=hst.integers(0, 2**31 - 1),
)
def test_webp_lossless_roundtrip_property(h, w, c, cache, sg, pred, seed):
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (h, w) if c == 1 else (h, w, c)).astype(np.uint8)
    blob = encode_webp_lossless(
        img, use_cache=cache, subtract_green=sg, predictor_mode=pred
    )
    out = decode_webp_lossless(blob)
    assert out is not None and np.array_equal(out, _webp_expect(img))


def test_progressive_jpeg_restart_intervals():
    """DRI + RSTn markers inside progressive scans: DC predictors and
    EOB runs reset at every restart, in every scan kind."""
    from kinesis_producer_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.RandomState(13)
    for shape in [(32, 32), (24, 40, 3), (17, 23)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        want = decode_baseline_jpeg(encode_baseline_jpeg(img))
        for ri in (1, 3, 7):
            for al in (0, 2):
                got = decode_progressive_jpeg(
                    encode_progressive_jpeg(img, restart_interval=ri, al=al)
                )
                assert got is not None and np.array_equal(got, want), (shape, ri, al)


def test_webp_2d_distance_and_meta_huffman():
    """The two decoder paths a plain-literal encoder never reaches:
    LZ77 distances through the 120-entry 2D neighborhood map, and
    per-tile meta-Huffman entropy-group selection."""
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(14)
    runs = np.repeat(rng.randint(0, 256, (6, 2, 3)).astype(np.uint8), 30, axis=1)
    out = decode_webp_lossless(encode_webp_lossless(runs, use_2d_distance=True))
    assert np.array_equal(out, _webp_expect(runs))
    for shape, hb, cache in [((20, 30, 3), 2, 0), ((40, 40, 4), 2, 5), ((4, 4), 4, 0)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        out = decode_webp_lossless(
            encode_webp_lossless(img, use_cache=cache, meta_huffman_bits=hb)
        )
        assert out is not None and np.array_equal(out, _webp_expect(img)), (shape, hb)


@settings(max_examples=60, deadline=None)
@given(
    fmt=hst.sampled_from(["png", "gif", "jpeg", "prog", "webp", "flac"]),
    n_flips=hst.integers(1, 6),
    seed=hst.integers(0, 2**31 - 1),
)
def test_codec_fuzz_bitflips_never_crash(fmt, n_flips, seed):
    """Poisoned-blob contract under random corruption: flipping bytes
    anywhere in a valid stream must yield either None or a decoded
    array — NEVER an exception (a crash would kill the Spark task)."""
    from kinesis_producer_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )
    from kinesis_producer_spark.operators.jpeg_progressive import (
        decode_progressive_jpeg,
        encode_progressive_jpeg,
    )
    from kinesis_producer_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (9, 11, 3)).astype(np.uint8)
    if fmt == "png":
        blob, dec = encode_png(img), decode_png
    elif fmt == "gif":
        pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
        blob, dec = encode_gif(rng.randint(0, 16, (9, 11)).astype(np.uint8), pal), decode_gif
    elif fmt == "jpeg":
        blob, dec = encode_baseline_jpeg(img), decode_baseline_jpeg
    elif fmt == "prog":
        blob, dec = encode_progressive_jpeg(img), decode_progressive_jpeg
    elif fmt == "webp":
        blob, dec = encode_webp_lossless(img), decode_webp_lossless
    else:
        sig = rng.randint(-32768, 32768, 400).astype(np.int16)
        blob, dec = encode_flac(sig), decode_flac
    mutated = bytearray(blob)
    for pos in rng.randint(0, len(mutated), n_flips):
        mutated[pos] ^= 1 << rng.randint(0, 8)
    dec(bytes(mutated))  # must not raise — None or data both acceptable


def _tiff_blob(width, height, bits, spp, byte_order="little", inline=True):
    """Minimal well-formed TIFF IFD0 for header-parse tests."""
    bo = byte_order
    def u16(v): return v.to_bytes(2, bo)
    def u32(v): return v.to_bytes(4, bo)
    magic = b"II*\x00" if bo == "little" else b"MM\x00*"
    entries = []
    def entry(tag, ftype, count, raw4):
        entries.append(u16(tag) + u16(ftype) + u32(count) + raw4)
    entry(256, 4, 1, u32(width))
    entry(257, 4, 1, u32(height))
    extra = b""
    if inline or spp * 2 <= 4:
        entry(258, 3, 1, u16(bits) + b"\x00\x00")
    else:
        # BitsPerSample as an offset-resident SHORT array (spp entries)
        data_off = 8 + 2 + 12 * 4 + 4
        entry(258, 3, spp, u32(data_off))
        extra = b"".join(u16(bits) for _ in range(spp))
    entry(277, 3, 1, u16(spp) + b"\x00\x00")
    body = u16(len(entries)) + b"".join(entries) + u32(0)
    return magic + u32(8) + body + extra


def test_tiff_header_parse_both_byte_orders(spark):
    from kinesis_producer_spark.operators.multimodal import (
        _parse_tiff_header,
        decode_headers,
    )

    for bo in ("little", "big"):
        got = _parse_tiff_header(_tiff_blob(640, 480, 8, 3, byte_order=bo))
        assert got == {
            "media_type": "image/tiff",
            "width": 640,
            "height": 480,
            "bit_depth": 8,
            "n_channels": 3,
        }, bo
    # offset-resident BitsPerSample array → first sample's depth
    got = _parse_tiff_header(_tiff_blob(12, 34, 16, 3, inline=False))
    assert got["bit_depth"] == 16 and got["n_channels"] == 3
    # corruption: truncated, bad magic, zero entries
    assert _parse_tiff_header(_tiff_blob(1, 1, 8, 1)[:10]) is None
    assert _parse_tiff_header(b"II+\x00" + b"\x00" * 20) is None
    assert _parse_tiff_header(b"II*\x00" + (8).to_bytes(4, "little") + b"\x00\x00") is None

    # and through the Spark operator
    df = spark.createDataFrame(
        [(1, bytearray(_tiff_blob(100, 50, 8, 1, byte_order="big")))],
        "media_id long, content binary",
    )
    r = decode_headers(df).collect()[0]
    assert (r.media_type, r.width, r.height, r.bit_depth, r.n_channels) == (
        "image/tiff", 100, 50, 8, 1,
    )


def test_webp_vp8l_handrolled_known_answer():
    """Encoder-independent decode check: a VP8L stream packed bit by
    bit BY HAND (not by our encoder) must decode to the known pixel —
    guards against a symmetric encoder/decoder bug surviving
    round-trip tests. 1x1 image, all five codes simple single-symbol
    (zero bits per pixel), literal ARGB = (a=255, r=17, g=34, b=51)."""
    from kinesis_producer_spark.operators.webp import decode_webp_lossless

    bits = []

    def put(v, n):
        for i in range(n):
            bits.append((v >> i) & 1)

    put(0, 14)  # width - 1
    put(0, 14)  # height - 1
    put(0, 1)   # alpha hint
    put(0, 3)   # version
    put(0, 1)   # no transforms
    put(0, 1)   # no color cache
    put(0, 1)   # no meta-Huffman
    for sym in (34, 17, 51, 255, 0):  # green, red, blue, alpha, distance
        put(1, 1)  # simple code
        put(0, 1)  # one symbol
        put(1, 1)  # 8-bit first symbol
        put(sym, 8)
    # zero data bits: every code is single-symbol
    payload = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        payload.append(byte)
    chunk = b"\x2f" + bytes(payload)
    if len(chunk) & 1:
        padded = chunk + b"\x00"
    else:
        padded = chunk
    riff = b"WEBP" + b"VP8L" + len(chunk).to_bytes(4, "little") + padded
    blob = b"RIFF" + len(riff).to_bytes(4, "little") + riff

    out = decode_webp_lossless(blob)
    assert out is not None and out.shape == (1, 1, 4)
    assert out[0, 0].tolist() == [17, 34, 51, 255]  # RGBA order


def test_baseline_jpeg_sequential_multiscan():
    """T.81 sequential multi-scan (non-interleaved) baseline: one SOS
    per component must decode identically to the interleaved layout of
    the same coefficients; a stream truncated before its last scan has
    uncovered components and must yield None, not a half-gray image."""
    from kinesis_producer_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )
    from kinesis_producer_spark.operators.jpeg_progressive import decode_jpeg

    rng = np.random.RandomState(21)
    for shape in [(16, 24), (17, 23), (24, 16, 3), (33, 47, 3), (1, 1)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        want = decode_baseline_jpeg(encode_baseline_jpeg(img))
        ni = encode_baseline_jpeg(img, interleave=False)
        got = decode_baseline_jpeg(ni)
        assert got is not None and np.array_equal(got, want), shape
        # and through the frame-type dispatcher
        assert np.array_equal(decode_jpeg(ni), want)

    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    blob = encode_baseline_jpeg(img, interleave=False)
    import re as _re

    sos_positions = [m.start() for m in _re.finditer(b"\xff\xda", blob)]
    assert len(sos_positions) >= 3
    assert decode_baseline_jpeg(blob[: sos_positions[2] - 1]) is None
    with pytest.raises(ValueError):
        encode_baseline_jpeg(img, interleave=False, subsample="420")


def test_resize_media_bmp_through_generic_seam(spark):
    """BMP now resizes through the generic decode/encode kernel seam
    (previously only via the dedicated resize_bmp operator): the thumb
    is itself a decodable 24-bit BMP with exact nearest-neighbor
    pixels."""
    from kinesis_producer_spark.operators.multimodal import (
        _encode_bmp,
        _parse_bmp,
        resize_media,
    )

    rng = np.random.RandomState(17)
    img = rng.randint(0, 256, (32, 48, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(3, bytearray(_encode_bmp(img)))], "media_id long, content binary"
    )
    row = resize_media(df, width=8, height=8, decode_stub="fail").collect()[0]
    parsed = _parse_bmp(bytes(row.resized))
    assert parsed is not None
    ys = (np.arange(8) * 32) // 8
    xs = (np.arange(8) * 48) // 8
    assert np.array_equal(parsed[2], img[ys][:, xs])


def test_quantize_rgb_contracts():
    """Deterministic palette quantization: lossless at ≤256 distinct
    colors, power-of-two palette sizes, bounded error and determinism
    beyond."""
    from kinesis_producer_spark.operators.gif import quantize_rgb

    rng = np.random.RandomState(19)
    vals = rng.randint(0, 256, (40, 3)).astype(np.uint8)
    img = vals[rng.randint(0, 40, (30, 50))]
    idx, pal = quantize_rgb(img)
    assert len(pal) & (len(pal) - 1) == 0
    assert np.array_equal(pal[idx], img)  # lossless

    big = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)
    i1, p1 = quantize_rgb(big)
    i2, p2 = quantize_rgb(big)
    assert np.array_equal(p1, p2) and np.array_equal(i1, i2)
    assert len(p1) == 256
    assert np.abs(p1[i1].astype(int) - big.astype(int)).max() <= 64


def test_resize_media_gif_lossless_through_seam(spark):
    """GIF resize through the generic seam: the decoded source has
    ≤256 colors and a nearest-neighbor thumb samples source pixels, so
    the quantized re-encode is EXACTLY lossless."""
    from kinesis_producer_spark.operators.multimodal import resize_media

    rng = np.random.RandomState(23)
    pal = rng.randint(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.randint(0, 16, (32, 48)).astype(np.uint8)
    blob = encode_gif(idx, pal)
    df = spark.createDataFrame(
        [(5, bytearray(blob))], "media_id long, content binary"
    )
    row = resize_media(df, width=8, height=8, decode_stub="fail").collect()[0]
    thumb = decode_gif(bytes(row.resized))
    ys = (np.arange(8) * 32) // 8
    xs = (np.arange(8) * 48) // 8
    assert np.array_equal(thumb, pal[idx][ys][:, xs])


def test_media_null_and_corrupt_blobs_yield_null_rows_even_in_fail_mode(spark):
    """Contract split (found by edge probing): the fail-mode raise is
    ONLY for genuinely unsupported formats (missing codec). A null
    cell, an empty blob, or a CORRUPT blob of a supported format is
    poisoned input → null row, never a task kill."""
    from kinesis_producer_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )
    from pyspark.errors.exceptions.captured import PythonException

    corrupt_png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 30
    rows = [
        (1, None),
        (2, bytearray(b"")),
        (3, bytearray(corrupt_png)),
        (4, bytearray(encode_png(np.full((4, 4), 9, np.uint8)))),  # healthy
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in decode_media(df, decode_stub="fail").collect()}
    assert got[1].width is None and got[2].width is None and got[3].width is None
    assert (got[4].width, got[4].height) == (4, 4)
    rz = {r.media_id: r for r in resize_media(df, width=2, height=2, decode_stub="fail").collect()}
    assert rz[1].resized is None and rz[3].resized is None
    assert rz[4].resized is not None
    # a format with NO kernel still raises in fail mode
    wav = spark.createDataFrame(
        [(9, bytearray(b"RIFF\x24\x00\x00\x00WAVEfmt "))],
        "media_id long, content binary",
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(wav, decode_stub="fail").collect()


def _lossy_webp_blob(payload: bytes = b"\x9d\x01\x2a" + b"\x00" * 29) -> bytes:
    """Minimal RIFF container carrying a lossy 'VP8 ' chunk."""
    chunk = b"VP8 " + len(payload).to_bytes(4, "little") + payload
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def test_webp_sniff_resolves_riff_subtype():
    """Only VP8L-bearing containers map to the 'webp' kernel key; lossy
    VP8 payloads sniff to 'webp_vp8' (ADVICE r4: a missing lossy codec
    must never be misreported as a poisoned blob)."""
    from kinesis_producer_spark.operators.multimodal import sniff_image_format
    from kinesis_producer_spark.operators.webp import encode_webp_lossless

    lossless = encode_webp_lossless(np.full((2, 2, 3), 7, np.uint8))
    assert sniff_image_format(lossless) == "webp"
    assert sniff_image_format(_lossy_webp_blob()) == "webp_vp8"
    # VP8X extended container resolves by the payload chunk it wraps
    vp8l_chunk = lossless[12:]
    vp8x = b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
    for inner, want in [
        (vp8l_chunk, "webp"),
        (b"VP8 " + (4).to_bytes(4, "little") + b"\x00" * 4, "webp_vp8"),
    ]:
        body = b"WEBP" + vp8x + inner
        blob = b"RIFF" + len(body).to_bytes(4, "little") + body
        assert sniff_image_format(blob) == want
    # container with NO image chunk: corrupt → 'webp' (poisoned path)
    body = b"WEBPJUNK" + (2).to_bytes(4, "little") + b"ab"
    assert sniff_image_format(b"RIFF" + len(body).to_bytes(4, "little") + body) == "webp"


def test_lossy_webp_is_missing_codec_not_poisoned(spark):
    """A VALID lossy WebP must hit the missing-dependency path: raise in
    decode_stub='fail', pseudo-decode in 'fake' — never a silent null
    row (ADVICE r4 medium, multimodal.py decode_media + resize_media)."""
    from pyspark.errors.exceptions.captured import PythonException

    from kinesis_producer_spark.operators.multimodal import (
        decode_media,
        resize_media,
    )

    df = spark.createDataFrame(
        [(1, bytearray(_lossy_webp_blob()))], "media_id long, content binary"
    )
    with pytest.raises(PythonException, match="NotImplementedError"):
        decode_media(df, decode_stub="fail").collect()
    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_media(df, width=4, height=4, decode_stub="fail").collect()
    r = decode_media(df, decode_stub="fake").collect()[0]
    assert r.width is not None and r.feature is not None
    rz = resize_media(df, width=4, height=4, decode_stub="fake").collect()[0]
    assert rz.resized is not None
    # a registered lossy kernel turns the same blob into a real path
    from kinesis_producer_spark.operators.multimodal import (
        register_decode_kernel,
        unregister_decode_kernel,
    )

    try:
        register_decode_kernel("webp_vp8", lambda b: np.full((3, 5, 3), 50, np.uint8))
        r = decode_media(df, decode_stub="fail").collect()[0]
        assert (r.width, r.height, r.n_channels) == (5, 3, 3)
    finally:
        unregister_decode_kernel("webp_vp8")


def test_corrupt_webp_container_is_poisoned_not_missing_codec(spark):
    """A WebP container with a garbage VP8L payload (or no image chunk)
    is a poisoned blob: null row in fail mode, no raise."""
    from kinesis_producer_spark.operators.multimodal import decode_media

    bad_payload = b"VP8L" + (8).to_bytes(4, "little") + b"\xff" * 8
    body = b"WEBP" + bad_payload
    corrupt = b"RIFF" + len(body).to_bytes(4, "little") + body
    df = spark.createDataFrame(
        [(1, bytearray(corrupt))], "media_id long, content binary"
    )
    r = decode_media(df, decode_stub="fail").collect()[0]
    assert r.width is None and r.feature is None


def test_quantize_rgb_chunked_matches_exact_and_bounded():
    """Chunked nearest-palette assignment (ADVICE r4 low: the naive
    broadcast tensor is ~6 GB for photo-sized inputs) must agree with
    the naive formula bit-for-bit, including argmin tie-breaks."""
    from kinesis_producer_spark.operators.gif import quantize_rgb

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)  # ~4k distinct
    idx, pal = quantize_rgb(img, max_colors=16)
    assert pal.shape[0] == 16 and idx.shape == (64, 64)
    # naive recomputation over the same palette
    flat = img.reshape(-1, 3).astype(np.int64)
    diffs = flat[:, None, :] - pal[None, :, :].astype(np.int64)
    naive = (diffs * diffs).sum(axis=2).argmin(axis=1).astype(np.uint8)
    assert np.array_equal(idx.reshape(-1), naive)
    # lossless case still exact
    few = np.zeros((8, 8, 3), np.uint8)
    few[::2] = 200
    idx2, pal2 = quantize_rgb(few)
    assert np.array_equal(pal2[idx2], few)


@settings(max_examples=200, deadline=None)
@given(blob=hst.binary(max_size=64))
def test_sniff_image_format_never_crashes(blob):
    """The format sniff runs on every blob before any kernel — it must
    total-function over arbitrary bytes (including adversarial RIFF
    chunk lengths), returning a kernel key or None, never raising."""
    from kinesis_producer_spark.operators.multimodal import sniff_image_format

    out = sniff_image_format(blob)
    assert out is None or isinstance(out, str)


@settings(max_examples=100, deadline=None)
@given(
    clens=hst.lists(hst.integers(0, 2**32 - 1), max_size=4),
    fourccs=hst.lists(hst.sampled_from([b"VP8L", b"VP8 ", b"VP8X", b"JUNK"]), max_size=4),
)
def test_webp_variant_sniff_terminates_on_adversarial_chunks(clens, fourccs):
    """RIFF walks with lying chunk lengths (huge, zero, truncating) must
    terminate and resolve deterministically."""
    from kinesis_producer_spark.operators.multimodal import sniff_image_format

    body = b"WEBP"
    for cc, ln in zip(fourccs, clens):
        body += cc + ln.to_bytes(4, "little") + b"\x00" * min(ln, 8)
    blob = b"RIFF" + len(body).to_bytes(4, "little") + body
    out = sniff_image_format(blob)
    assert out in ("webp", "webp_vp8")


# ---------------------------------------------------------------------------
# q285/q286 — perceptual image dedup
# ---------------------------------------------------------------------------


def _phash_model(P):
    """Plain-Python integer pHash model — nested loops, no numpy: the
    independent implementation the vectorized kernel is pinned
    against. Same embedded micro-int DCT basis."""
    from kinesis_producer_spark.operators.llm_queries import _PHASH_C

    # D = C·P·Cᵀ — u pairs with the image ROW, v with the column (the
    # kernel's and the oracle's shared orientation)
    rowd = [
        [
            sum(int(P[y][x]) * _PHASH_C[u][y] for y in range(32))
            for x in range(32)
        ]
        for u in range(8)
    ]
    D = [
        [
            sum(rowd[u][x] * _PHASH_C[v][x] for x in range(32))
            for v in range(8)
        ]
        for u in range(8)
    ]
    s = sum(D[u][v] for u in range(8) for v in range(8)) - D[0][0]
    bits = 0
    i = 0
    for u in range(8):
        for v in range(8):
            if (u, v) == (0, 0):
                continue
            if 63 * D[u][v] > s:
                bits |= 1 << i
            i += 1
    return bits


def _phash_kernel(P):
    """The numpy kernel exactly as _perceptual_hashes computes it."""
    from kinesis_producer_spark.operators.llm_queries import _PHASH_C

    cmat = np.array(_PHASH_C, dtype=np.int64)
    D = cmat @ P.astype(np.int64) @ cmat.T
    s = int(D.sum()) - int(D[0, 0])
    flat = D.reshape(-1)[1:]
    bits = (63 * flat > s).astype(np.uint64)
    return int((bits << np.arange(63, dtype=np.uint64)).sum())


@given(hst.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_phash_kernel_matches_python_model(seed):
    """The vectorized integer-DCT pHash kernel is bit-identical to a
    plain-Python nested-loop model on arbitrary images — the GEMM,
    the bit packing, and the mean-threshold rule have no numpy-only
    behavior (overflow, dtype promotion) hiding in them."""
    rng = np.random.default_rng(seed)
    P = rng.integers(0, 256, size=(32, 32), dtype=np.int64)
    assert _phash_kernel(P) == _phash_model([list(r) for r in P])


def test_phash_fixture_roundtrip_and_banding_completeness(spark):
    """q285's structural claims pinned at sf0.001 (500 docs): (1) the
    PNG encode→decode round trip is lossless — hashes computed from
    decoded pixels equal hashes from the fixture directly; (2) BANDED
    candidate generation is COMPLETE vs brute force at Hamming ≤ 3
    (the pigeonhole guarantee: ≤3 flips dirty ≤3 of 4 bands); (3)
    every reported pair is a planted (even, odd) pair and recall over
    planted pairs is ≥ 95%; (4) q286's duplicate groups are planted
    pairs only (56 uniform bits cannot collide across bases at this
    scale)."""
    from kinesis_producer_spark.operators.llm_queries import (
        _perceptual_hashes,
        _phash_pixels,
        q285_phash_near_dup_pairs,
        q286_dhash_exact_dedup,
    )

    sf = "/root/testdata/sf0.001"
    rows = _perceptual_hashes(spark, sf).collect()
    hs = {r.doc_id: r.phash for r in rows}
    # (1) lossless round trip: recompute from the fixture directly
    for did in (0, 1, 7, 42, 499):
        assert hs[did] == _phash_kernel(_phash_pixels(did))

    # (2) banding completeness vs brute force
    ids = sorted(hs)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(hs[a] ^ hs[b]).count("1") <= 3
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in q285_phash_near_dup_pairs(spark, sf).collect()
    }
    assert found == brute

    # (3) planted-only + recall
    planted = {(2 * k, 2 * k + 1) for k in range(len(ids) // 2)}
    assert found <= planted
    assert len(found) >= 0.95 * len(planted)

    # (4) dhash groups are planted pairs only
    groups = q286_dhash_exact_dedup(spark, sf).collect()
    for g in groups:
        assert g.n_docs == 2 and g.max_doc == g.min_doc + 1
        assert g.min_doc % 2 == 0


# ---------------------------------------------------------------------------
# q291/q292 — perceptual audio dedup (audio_fingerprint)
# ---------------------------------------------------------------------------


def _audio_fp_model(samples, frame=16, n_bits=63):
    """Plain-Python audio-fingerprint model — nested loops, no numpy:
    the independent implementation the vectorized operator kernel is
    pinned against. Frame energies as integer sums of squares, bit f
    set iff E[f+1] > E[f]."""
    need = (n_bits + 1) * frame
    if len(samples) < need:
        return None
    e = [
        sum(int(samples[f * frame + j]) ** 2 for j in range(frame))
        for f in range(n_bits + 1)
    ]
    bits = 0
    for f in range(n_bits):
        if e[f + 1] > e[f]:
            bits |= 1 << f
    return bits


@given(hst.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=30, deadline=None)
def test_audio_fp_kernel_matches_python_model(seed):
    """The audio_fingerprint energy/bit kernel is bit-identical to a
    plain-Python nested-loop model on arbitrary int16 signals, THROUGH
    a genuine FLAC encode→decode (lossless, so any divergence is a
    codec or kernel bug, not fixture noise)."""
    import numpy as np

    from kinesis_producer_spark.operators.flac import decode_flac, encode_flac

    rng = np.random.default_rng(seed)
    n = int(rng.integers(1024, 1400))
    s = rng.integers(-2048, 2048, size=n).astype(np.int16)
    blob = encode_flac(s, sample_rate=16000, block_size=64)
    dec, rate = decode_flac(blob)
    flat = dec.reshape(-1)
    assert np.array_equal(flat, s)
    # the operator's vectorized form, exactly as audio_fingerprint
    # computes it
    e = (flat[:1024].astype(np.int64).reshape(64, 16) ** 2).sum(axis=1)
    bits = (e[1:] > e[:-1]).astype(np.uint64)
    kern = int((bits << np.arange(63, dtype=np.uint64)).sum())
    assert kern == _audio_fp_model([int(v) for v in s])


def test_audio_fp_fixture_roundtrip_and_banding_completeness(spark):
    """q291/q292's structural claims pinned at sf0.001 (500 docs):
    (1) FLAC round trip is lossless — distributed fingerprints equal
    the plain-Python model on the fixture signal; (2) BANDED candidate
    generation is COMPLETE vs brute force at Hamming ≤ 3; (3) recall
    over planted pairs is structurally 100% (the one-frame edit flips
    at most 2 adjacent delta bits) and every reported pair is a
    planted (even, odd) pair; (4) q292's duplicate groups are planted
    pairs only, and q291 ⊇ q292's groups (the exact gate is a subset
    of the near-dup gate); (5) short/undecodable blobs yield NULL afp
    rather than a garbage hash."""
    import hashlib

    import numpy as np

    from kinesis_producer_spark.operators.flac import encode_flac
    from kinesis_producer_spark.operators.llm_queries import (
        q291_audio_fp_near_dup_pairs,
        q292_audio_fp_exact_dedup,
        _audio_fixture_blobs,
    )
    from kinesis_producer_spark.operators.multimodal import audio_fingerprint

    sf = "/root/testdata/sf0.001"
    fps = {
        r.media_id: r.afp
        for r in audio_fingerprint(_audio_fixture_blobs(spark, sf)).collect()
    }
    assert len(fps) == 500 and all(v is not None for v in fps.values())

    # (1) model agreement on a sample of docs, from the raw fixture
    def fixture_signal(did):
        base = did - did % 2
        s = [
            int(hashlib.md5(f"{base}:{i}".encode()).hexdigest()[:2], 16) - 128
            for i in range(1024)
        ]
        if did % 2 == 1:
            k = 1 + (base // 2) % 62
            for j in range(16 * k, 16 * k + 16):
                s[j] += 24
        return s

    for did in (0, 1, 8, 123, 499):
        assert fps[did] == _audio_fp_model(fixture_signal(did))

    # (2) banding completeness vs brute force at Hamming <= 3
    ids = sorted(fps)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    found = {
        (r.doc_a, r.doc_b)
        for r in q291_audio_fp_near_dup_pairs(spark, sf).collect()
    }
    assert found == brute

    # (3) structural 100% recall + planted-only
    planted = {(2 * k, 2 * k + 1) for k in range(len(ids) // 2)}
    assert found == planted

    # (4) exact groups are planted pairs and a subset of q291's
    groups = q292_audio_fp_exact_dedup(spark, sf).collect()
    for g in groups:
        assert g.n_docs == 2 and g.max_doc == g.min_doc + 1
        assert g.min_doc % 2 == 0
        assert (g.min_doc, g.max_doc) in found

    # (5) null contract: too-short and garbage blobs
    import pandas as pd

    short = encode_flac(
        np.arange(64, dtype=np.int16), sample_rate=16000, block_size=64
    )
    bad = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1, 2], "content": [short, b"not audio at all"]}
        )
    )
    out = {r.media_id: r.afp for r in audio_fingerprint(bad).collect()}
    assert out == {1: None, 2: None}
