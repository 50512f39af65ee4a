"""Partition-key parity + property tests.

Property scenarios verbatim from reference pkg/pulsar/serializers_test.go:246-291;
FNV-1 64 constants cross-checked against Go hash/fnv (New64: multiply-then-xor).
"""

from hypothesis import given, strategies as st

from prometheus_pulsar_remote_write_spark.functions.fnv import (
    fnv1_64,
    sample_partition_key,
)

BASE = {"__name__": "foo", "labelfoo": "label-bar"}


def test_fnv1_64_known_vectors():
    # FNV-1 64 canonical vectors (public FNV spec / Go hash/fnv)
    assert fnv1_64(b"") == 0xCBF29CE484222325
    assert fnv1_64(b"a") == 0xAF63BD4C8601B7BE
    assert fnv1_64(b"foobar") == 0x340D8765A4DDA9C2


def test_partition_key_properties():
    replica = ["replica"]
    s1 = dict(BASE, count="1")
    s2a = dict(BASE, count="2", replica="a")
    s2b = dict(BASE, count="2", replica="b")

    # same sample -> same key
    assert sample_partition_key(s1, "", replica) == sample_partition_key(s1, "", replica)
    # different labels -> different key
    assert sample_partition_key(s1, "", replica) != sample_partition_key(s2a, "", replica)
    # replica label ignored
    assert sample_partition_key(s2a, "", replica) == sample_partition_key(s2b, "", replica)
    # tenant participates
    assert sample_partition_key(s1, "", replica) != sample_partition_key(s1, "tenant1", replica)


def test_partition_key_format():
    key = sample_partition_key(BASE, "")
    assert key.startswith("hex ") and len(key) == 20
    int(key[4:], 16)  # parses as hex


def test_partition_key_matches_manual_fnv():
    # sorted k,v concatenation + tenant, FNV-1
    data = b"__name__" + b"foo" + b"labelfoo" + b"label-bar" + b"ten"
    assert sample_partition_key(BASE, "ten") == f"hex {fnv1_64(data):016x}"


@given(
    st.dictionaries(
        st.text(min_size=1, max_size=8), st.text(max_size=8), max_size=5
    ),
    st.text(max_size=5),
)
def test_partition_key_deterministic(labels, tenant):
    assert sample_partition_key(labels, tenant) == sample_partition_key(labels, tenant)


def test_spark_key_cols(spark):
    from pyspark.sql import functions as F

    from prometheus_pulsar_remote_write_spark.functions.fnv import (
        colocation_key_col,
        partition_key_col,
    )

    rows = [
        ({"__name__": "foo", "count": "2", "__replica__": "a"}, "t1"),
        ({"__name__": "foo", "count": "2", "__replica__": "b"}, "t1"),
        ({"__name__": "foo", "count": "1"}, "t1"),
        ({"__name__": "foo", "count": "1"}, "t2"),
    ]
    df = spark.createDataFrame(rows, "labels map<string,string>, tenant_id string")
    out = df.select(
        partition_key_col(F.col("labels"), F.col("tenant_id")).alias("exact"),
        colocation_key_col(F.col("labels"), F.col("tenant_id")).alias("fast"),
    ).collect()

    # replica-invariance holds for both tiers
    assert out[0].exact == out[1].exact and out[0].fast == out[1].fast
    # tenant-sensitivity
    assert out[2].exact != out[3].exact and out[2].fast != out[3].fast
    # exact tier matches the pure-Python reference implementation
    expected = sample_partition_key({"__name__": "foo", "count": "2"}, "t1")
    assert out[0].exact == expected


def test_fnv1_64_key_col_vectorized_parity(spark):
    """The r15 vectorized canonical-string tier must render the exact
    'hex %016x' % fnv1_64(keystr) for every row -- including empty
    strings, non-ASCII (multi-byte UTF-8), strings longer than their
    batch-mates (padding never leaks into the fold), and NULL -> NULL."""
    from pyspark.sql import functions as F

    from prometheus_pulsar_remote_write_spark.functions.fnv import fnv1_64_key_col

    vals = [
        "",
        "a",
        "__name__foo" + "k" * 40,
        "__name__signüp" + "k7user12tenant-a",
        "short",
        None,
        "x" * 100,
    ]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "i int, s string")
    got = {r.i: r.key for r in df.select("i", fnv1_64_key_col(F.col("s")).alias("key")).collect()}
    for i, v in enumerate(vals):
        if v is None:
            assert got[i] is None
        else:
            assert got[i] == f"hex {fnv1_64(v.encode('utf-8')):016x}", (i, v)
