"""F5 real-decode tier: spec-conformant payload encoders and stdlib
header decoders (operators/multimodal.py). The fake tier is covered by
the catalog oracle tests; this file proves the real tier decodes REAL
container bytes -- WAV round-tripped through the stdlib ``wave`` module,
PNG/GIF/BMP/JPEG through their header layouts -- and that the honest
NotImplementedError boundary still guards non-stdlib formats.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest
from pyspark.sql import functions as F

from prometheus_pulsar_remote_write_spark.operators.multimodal import (
    _decode_real,
    attach_media,
    decode_media,
    png_bytes,
    wav_bytes,
    wav_col,
)


def test_wav_bytes_is_stdlib_readable():
    samples = bytes(range(200))
    data = wav_bytes(samples, framerate=8000)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 1
        assert w.getframerate() == 8000
        assert w.getnframes() == 200
        assert w.readframes(200) == samples


def test_png_bytes_is_spec_conformant():
    pixels = b"ab" * 40  # 80 px at width 32 -> 3 rows, last padded
    data = png_bytes(pixels, width=32)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[12:16] == b"IHDR"
    width, height = struct.unpack(">II", data[16:24])
    assert (width, height) == (32, 3)
    # IHDR CRC is correct
    assert struct.unpack(">I", data[29:33])[0] == zlib.crc32(data[12:29]) & 0xFFFFFFFF
    # IDAT inflates back to filtered scanlines (1 filter byte + row)
    idat_len = struct.unpack(">I", data[33:37])[0]
    assert data[37:41] == b"IDAT"
    raw = zlib.decompress(data[41 : 41 + idat_len])
    assert len(raw) == 3 * 33
    assert raw[1:33] == pixels[:32]


def test_decode_real_formats():
    assert _decode_real(wav_bytes(b"\x00" * 4000, framerate=8000)) == (
        None,
        None,
        500,
        "ok:wav",
    )
    assert _decode_real(png_bytes(b"x" * 64, width=32)) == (32, 2, None, "ok:png")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 3
    assert _decode_real(gif) == (320, 200, None, "ok:gif")
    bmp = (
        b"BM"
        + struct.pack("<IHHI", 0, 0, 0, 54)
        + struct.pack("<I", 40)
        + struct.pack("<ii", 640, -480)  # top-down: negative height
        + b"\x00" * 28
    )
    assert _decode_real(bmp) == (640, 480, None, "ok:bmp")
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03"
        + b"\xff\xd9"
    )
    assert _decode_real(jpeg) == (640, 480, None, "ok:jpeg")


def test_decode_real_raises_for_non_stdlib_formats():
    with pytest.raises(NotImplementedError):
        _decode_real(b"\x00\x00\x00\x20ftypisom")  # MP4: needs ffmpeg


def test_decode_media_real_tier_end_to_end(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(80))), (2, b"\xffnot-a-container")],
        "id int, samples binary",
    )
    media = attach_media(
        df.select("id", wav_col(F.col("samples"), framerate=8000).alias("payload")),
        F.col("payload"),
        media_type="audio/wav",
    ).drop("payload")
    rows = {
        r["id"]: r
        for r in decode_media(media, fake=False).collect()
    }
    assert rows[1]["decode_status"] == "ok:wav"
    assert rows[1]["duration_ms"] == 80 * 1000 // 8000
    assert rows[2]["decode_status"] == "ok:wav"  # wav_col wraps any bytes
    # malformed-but-recognized payload degrades to an error row, not a
    # stage failure: truncate a real WAV header
    bad = spark.createDataFrame(
        [(3, wav_bytes(b"abc")[:20])], "id int, media binary"
    )
    out = decode_media(bad, fake=False).collect()[0]
    assert out["decode_status"].startswith("error:")
    assert out["width"] is None and out["duration_ms"] is None


def test_png_full_decode_handles_all_filters():
    """decode_png_pixels must reconstruct rows under every PNG filter
    type (0..4), not just the filter-0 stream our encoder emits -- the
    claim that arbitrary conforming grayscale PNGs decode correctly."""
    import struct
    import zlib

    from prometheus_pulsar_remote_write_spark.operators.multimodal import (
        decode_png_pixels,
        dhash64,
        png_bytes,
    )

    width, height = 8, 5
    pixels = bytes((x * 37 + y * 91) % 256 for y in range(height) for x in range(width))

    def chunk(tag, data):
        body = tag + data
        return struct.pack(">I", len(data)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    # encode each row with a DIFFERENT filter: none, sub, up, average, paeth
    rows = [pixels[y * width : (y + 1) * width] for y in range(height)]
    enc = bytearray()
    prev = bytes(width)
    for y, row in enumerate(rows):
        flt = y % 5
        enc.append(flt)
        for x in range(width):
            a = row[x - 1] if x else 0
            b, c = prev[x], (prev[x - 1] if x else 0)
            if flt == 0:
                enc.append(row[x])
            elif flt == 1:
                enc.append((row[x] - a) & 0xFF)
            elif flt == 2:
                enc.append((row[x] - b) & 0xFF)
            elif flt == 3:
                enc.append((row[x] - (a + b) // 2) & 0xFF)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                enc.append((row[x] - pred) & 0xFF)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(enc)))
        + chunk(b"IEND", b"")
    )

    w, h, px = decode_png_pixels(png)
    assert (w, h, px) == (width, height, pixels)
    # the filtered re-encode hashes identically to the filter-0 encode
    w0, h0, px0 = decode_png_pixels(png_bytes(pixels, width))
    assert dhash64(w, h, px) == dhash64(w0, h0, px0)


def test_dhash_neardup_banding_is_complete_for_d3(spark):
    """The 4x16-bit Hamming-LSH banding must find EVERY pair within
    Hamming distance 3 (pigeonhole: <= 3 flipped bits cannot touch all
    four bands), verified against the brute-force all-pairs popcount on
    the smoke corpus."""
    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
        multimodal_dhash_neardup,
    )
    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
        _docs_spread,
    )
    from prometheus_pulsar_remote_write_spark.operators import multimodal
    from tests.conftest import SF_SMOKE

    docs = _docs_spread(spark, SF_SMOKE)
    with_png = docs.select(
        "doc_id",
        multimodal.png_col(F.encode(F.col("text"), "UTF-8")).alias("payload"),
    )
    hashes = {
        r["doc_id"]: (r["dhash_hi"], r["dhash_lo"])
        for r in multimodal.image_dhash(with_png)
        .select("doc_id", "dhash_hi", "dhash_lo")
        .collect()
    }
    ids = sorted(hashes)
    brute = {
        (a, b): bin((hashes[a][0] ^ hashes[b][0])).count("1")
        + bin((hashes[a][1] ^ hashes[b][1])).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
    }
    expected = {(a, b, d) for (a, b), d in brute.items() if d <= 3}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in multimodal_dhash_neardup(spark, SF_SMOKE).collect()
    }
    assert got == expected
    assert expected, "smoke corpus should contain at least one d<=3 pair"
