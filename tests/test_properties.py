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


# --- vectorized stream folds == the per-row loop spec (round 9) -------------
# The shift-shaped fold twins (transition, scrape-gap, trigram) were
# vectorized; these properties pin them to the r8 loop semantics -- same
# emitted rows, same carried state, same last-ts -- across every edge the
# replay tests can't sweep: single-row batches, empty priors, carried
# types absent from the batch's own vocabulary, duplicate timestamps.

_TYPES = ["view", "click", "purchase", "search", "scroll", "rare&type"]


def _loop_transition_spec(key, pdf, prior):
    (user_id,) = key
    (last_type,) = prior
    out, last_ts = [], 0
    for ts_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
        if last_type is not None:
            out.append((user_id, last_type, etype, int(ts_us)))
        last_type = etype
        last_ts = int(ts_us)
    return out, (last_type,), last_ts // 1000


def _loop_scrape_gap_spec(key, pdf, prior):
    tenant_id, name = key
    (last_ts,) = prior
    out = []
    for ts_ms in pdf["ts_ms"]:
        if last_ts is not None:
            out.append((tenant_id, name, int(ts_ms) - int(last_ts), int(ts_ms)))
        last_ts = int(ts_ms)
    return out, (last_ts,), last_ts


def _loop_trigram_spec(key, pdf, prior):
    (user_id,) = key
    p1, p2 = prior
    out, last_ts = [], 0
    for ts_us, etype in zip(pdf["ts_us"], pdf["event_type"]):
        if p2 is not None:
            out.append((user_id, f"{p2}>{p1}>{etype}", int(ts_us)))
        p2, p1 = p1, etype
        last_ts = int(ts_us)
    return out, (p1, p2), last_ts // 1000


def _batch_frame(events):
    import pandas as pd

    ts = [1_700_000_000_000_000 + d for d, _ in events]
    return pd.DataFrame({"ts_us": ts, "event_type": [t for _, t in events]})


@given(
    events=st.lists(
        st.tuples(st.integers(0, 10**9), st.sampled_from(_TYPES)),
        min_size=1,
        max_size=40,
    ),
    prior=st.one_of(st.none(), st.sampled_from(_TYPES + ["absent-type"])),
)
@settings(max_examples=200, deadline=None)
def test_transition_fold_equals_loop_spec(events, prior):
    from prometheus_pulsar_remote_write_spark.streaming.windows import (
        _transition_fold_kwargs,
    )

    pdf = _batch_frame(sorted(events)).sort_values("ts_us", kind="stable")
    fold = _transition_fold_kwargs()["fold"]
    out, state, last = fold((7,), pdf, (prior,))
    ref_out, ref_state, ref_last = _loop_transition_spec((7,), pdf, (prior,))
    assert [tuple(r) for r in out.itertuples(index=False)] == ref_out
    assert tuple(state) == ref_state and last == ref_last


@given(
    ts_list=st.lists(st.integers(0, 10**12), min_size=1, max_size=40),
    prior=st.one_of(st.none(), st.integers(0, 10**12)),
)
@settings(max_examples=200, deadline=None)
def test_scrape_gap_fold_equals_loop_spec(ts_list, prior):
    import pandas as pd

    from prometheus_pulsar_remote_write_spark.streaming.windows import (
        _scrape_gap_fold_kwargs,
    )

    pdf = pd.DataFrame({"ts_ms": sorted(ts_list)})
    fold = _scrape_gap_fold_kwargs()["fold"]
    key = ("3", "up")
    out, state, last = fold(key, pdf, (prior,))
    ref_out, ref_state, ref_last = _loop_scrape_gap_spec(key, pdf, (prior,))
    assert [tuple(r) for r in out.itertuples(index=False)] == ref_out
    assert tuple(state) == ref_state and last == ref_last


@given(
    events=st.lists(
        st.tuples(st.integers(0, 10**9), st.sampled_from(_TYPES)),
        min_size=1,
        max_size=40,
    ),
    prior=st.one_of(
        st.just((None, None)),
        st.tuples(st.sampled_from(_TYPES + ["absent-type"]), st.none()),
        st.tuples(
            st.sampled_from(_TYPES + ["absent-type"]),
            st.sampled_from(_TYPES + ["other-absent"]),
        ),
    ),
)
@settings(max_examples=200, deadline=None)
def test_trigram_fold_equals_loop_spec(events, prior):
    from prometheus_pulsar_remote_write_spark.streaming.windows import (
        _path_trigram_fold_kwargs,
    )

    pdf = _batch_frame(sorted(events)).sort_values("ts_us", kind="stable")
    fold = _path_trigram_fold_kwargs()["fold"]
    out, state, last = fold((7,), pdf, prior)
    ref_out, ref_state, ref_last = _loop_trigram_spec((7,), pdf, prior)
    assert [tuple(r) for r in out.itertuples(index=False)] == ref_out
    assert tuple(state) == ref_state and last == ref_last
