import math

from hypothesis import given, strategies as st

from prometheus_pulsar_remote_write_spark.functions.gofmt import (
    go_float_str,
    go_time_sec_str,
    ms_from_rfc3339,
    parse_go_float,
    rfc3339nano_from_ms,
)


def test_go_float_str_golden():
    # vectors from reference pkg/pulsar/serializers_test.go golden bytes
    assert go_float_str(456.0) == "456"
    assert go_float_str(math.inf) == "+Inf"
    assert go_float_str(-math.inf) == "-Inf"
    assert go_float_str(float("nan")) == "NaN"
    assert go_float_str(185.22) == "185.22"
    assert go_float_str(0.0) == "0"
    assert go_float_str(-0.0) == "-0"
    assert go_float_str(1e21) == "1000000000000000000000"
    assert go_float_str(1e-7) == "0.0000001"


def test_go_time_sec_str_golden():
    assert go_time_sec_str(0) == "0"
    assert go_time_sec_str(10001) == "10.001"  # serializers_test.go inf-sample
    assert go_time_sec_str(10100) == "10.1"
    assert go_time_sec_str(1000) == "1"
    assert go_time_sec_str(-1500) == "-1.5"


def test_rfc3339nano_golden():
    assert rfc3339nano_from_ms(0) == "1970-01-01T00:00:00Z"
    assert rfc3339nano_from_ms(10001) == "1970-01-01T00:00:10.001Z"
    assert rfc3339nano_from_ms(10100) == "1970-01-01T00:00:10.1Z"
    assert rfc3339nano_from_ms(1588462000_000) == "2020-05-02T23:26:40Z"


def test_rfc3339_roundtrip():
    for ms in [0, 1, 999, 10001, 1588462000123, 1704067798778]:
        assert ms_from_rfc3339(rfc3339nano_from_ms(ms)) == ms


@given(st.integers(min_value=0, max_value=4102444800_000))
def test_rfc3339_roundtrip_prop(ms):
    assert ms_from_rfc3339(rfc3339nano_from_ms(ms)) == ms


@given(st.floats(allow_nan=False, allow_infinity=False))
def test_go_float_str_roundtrip(v):
    s = go_float_str(v)
    assert "e" not in s and "E" not in s
    assert parse_go_float(s) == v
