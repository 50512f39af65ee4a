"""Go-compatible text formatting for the wire serializers.

The reference serializes floats with ``strconv.FormatFloat(v, 'f', -1, 64)``
(shortest round-trip decimal, NO exponent; ``+Inf``/``-Inf``/``NaN`` spelled
exactly so -- reference pkg/pulsar/serializers.go:69-80 via
model.SampleValue.String) and timestamps with ``time.RFC3339Nano`` in UTC
(trailing fractional zeros trimmed, fraction omitted when zero -- reference
pkg/pulsar/serializers.go:71).

Python's ``repr`` is also shortest-round-trip but switches to exponent
notation outside [1e-4, 1e16); we expand through Decimal to match Go's 'f'
format. These pure functions are the single source of truth; the pandas UDFs
in functions/serializers.py vectorize over them (Arrow-batched), and
plans/catalog.py uses SQL-expressible approximations where both the Spark
and DuckDB side of an oracle pair apply the identical expression.
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta, timezone
from decimal import Decimal

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def go_float_str(v: float) -> str:
    """strconv.FormatFloat(v, 'f', -1, 64) plus Prometheus Inf/NaN spelling."""
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "+Inf" if v > 0 else "-Inf"
    s = repr(float(v))
    if "e" in s or "E" in s:
        s = format(Decimal(s), "f")
    elif s.endswith(".0"):
        s = s[:-2]
    return s


def go_time_sec_str(ms: int) -> str:
    """model.Time.String(): milliseconds rendered as shortest 'f' seconds.

    Reference model.Time.String is FormatFloat(ms/1000, 'f', -1, 64); for
    exactness we format from the integer parts instead of dividing doubles.
    """
    sign = "-" if ms < 0 else ""
    ms = abs(ms)
    sec, frac = divmod(ms, 1000)
    if frac == 0:
        return f"{sign}{sec}"
    return f"{sign}{sec}." + f"{frac:03d}".rstrip("0")


def rfc3339nano_from_ms(ms: int) -> str:
    """Go time.Time.Format(time.RFC3339Nano) in UTC for an epoch-ms value."""
    sec, frac_ms = divmod(int(ms), 1000)
    dt = _EPOCH + timedelta(seconds=sec)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if frac_ms:
        base += ("." + f"{frac_ms:03d}").rstrip("0")
    return base + "Z"


def ms_from_rfc3339(text: str) -> int:
    """Parse an RFC3339(Nano) timestamp back to epoch milliseconds.

    Mirrors the compat deserializer (reference pkg/pulsar/serializers.go:35-61):
    Go parses to time.Time then model.TimeFromUnixNano truncates to ms.
    """
    t = text.strip()
    if t.endswith("Z"):
        t = t[:-1] + "+00:00"
    dt = datetime.fromisoformat(t)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    delta = dt - _EPOCH
    return delta // timedelta(milliseconds=1)


def parse_go_float(text: str) -> float:
    """Inverse of go_float_str: accepts +Inf/-Inf/Inf/NaN spellings."""
    t = text.strip()
    if t in ("+Inf", "Inf"):
        return math.inf
    if t == "-Inf":
        return -math.inf
    if t == "NaN":
        return math.nan
    return float(t)
