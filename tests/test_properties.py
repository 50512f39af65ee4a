"""Property-based tests (hypothesis) for the pure-Python hot surfaces:
media codecs round-trip arbitrary payloads, and the listener's tenant
sanitizer never lets ANY string escape the spool.
"""

from __future__ import annotations

import io
import os
import struct
import wave
import zlib

from hypothesis import given, settings
from hypothesis import strategies as st

from prometheus_pulsar_remote_write_spark.operators.multimodal import (
    _decode_real,
    png_bytes,
    wav_bytes,
)
from prometheus_pulsar_remote_write_spark.sources.http_listener import (
    tenant_is_safe,
)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=4096), st.sampled_from([8000, 16000, 44100]))
def test_wav_roundtrip_any_payload(samples, rate):
    data = wav_bytes(samples, framerate=rate)
    with wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == rate
        assert w.getnframes() == len(samples)
        assert w.readframes(len(samples)) == samples
    width, height, duration_ms, status = _decode_real(data)
    assert status == "ok:wav" and (width, height) == (None, None)
    assert duration_ms == len(samples) * 1000 // rate


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048), st.integers(min_value=1, max_value=64))
def test_png_roundtrip_any_payload(pixels, width):
    data = png_bytes(pixels, width=width)
    w, h, duration_ms, status = _decode_real(data)
    assert status == "ok:png" and duration_ms is None
    assert w == width
    assert h == max(1, -(-len(pixels) // width))
    # IDAT inflates to exactly h filtered scanlines carrying the pixels
    idat_len = struct.unpack(">I", data[33:37])[0]
    raw = zlib.decompress(data[41 : 41 + idat_len])
    assert len(raw) == h * (width + 1)
    recovered = b"".join(
        raw[y * (width + 1) + 1 : (y + 1) * (width + 1)] for y in range(h)
    )
    assert recovered[: len(pixels)] == pixels
    assert set(recovered[len(pixels) :]) <= {0}


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=64))
def test_tenant_sanitizer_never_escapes_spool(tenant):
    spool = "/srv/spool"
    if tenant_is_safe(tenant):
        target = os.path.normpath(os.path.join(spool, tenant))
        assert target.startswith(spool + os.sep) and os.sep not in tenant
        assert "\x00" not in tenant and "\n" not in tenant
    # everything rejected is simply rejected -- nothing to assert beyond
    # the accepted side staying inside the spool
