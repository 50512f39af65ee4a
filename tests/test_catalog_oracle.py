"""The driver's correctness gate, in miniature: every queries() entry with
an oracle_sql() twin must value-match DuckDB on the same parquet
(sf0.001 here for speed; the driver runs sf0.01 -- scripts/check_oracle.py
runs that locally)."""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod
from scripts.check_oracle import TABLES, compare

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'")
    yield con
    con.close()


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_callable():
    assert len(QUERIES) >= 30
    # every query has a full value-hash oracle (since round 2 even the
    # FNV partition key and the deterministic IVF index are SQL-replayed)
    assert set(QUERIES) == set(ORACLES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_SMOKE)
    if name not in ORACLES:
        assert df.count() > 0
        return
    # HUGEINT widens to float64 on the driver's pandas hash path even
    # though fetchall() returns ints -- ban it at the type level.
    hug = [
        c
        for c, t in zip(duck.sql(ORACLES[name]).columns, duck.sql(ORACLES[name]).types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not hug, f"oracle returns HUGEINT column(s) {hug}; add ::BIGINT"
    rel = duck.execute(ORACLES[name])
    cols = [d[0] for d in rel.description]
    err = compare(name, df, rel.fetchall(), cols)
    assert err is None, err


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_chunking_reconstructs_corpus(spark):
    """Chunk invariants: concatenating each doc's chunk prefixes (the
    non-overlapping first `step` tokens, all of the last chunk) must
    reproduce the doc's token stream exactly; every chunk but the last
    must carry exactly chunk_tokens tokens."""
    from pyspark.sql import functions as F

    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
        _CHUNK_STEP,
        _CHUNK_TOKENS,
        docs_chunking,
    )
    from prometheus_pulsar_remote_write_spark.operators.text import tokens_col
    from prometheus_pulsar_remote_write_spark.schema import load_tables

    chunks = docs_chunking(spark, SF_SMOKE).collect()
    docs = {
        r.doc_id: r.tk
        for r in load_tables(spark, SF_SMOKE, ["documents"])["documents"]
        .select("doc_id", tokens_col(F.col("text")).alias("tk"))
        .collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        rebuilt = []
        for i, r in enumerate(rows):
            toks = r.chunk_text.split(" ") if r.chunk_text else []
            assert len(toks) == r.n_chunk_tokens
            if i < len(rows) - 1:
                # a non-final chunk spans past the next start, so it always
                # holds more than the overlap; full docs fill all 50
                assert _CHUNK_TOKENS - _CHUNK_STEP < r.n_chunk_tokens <= _CHUNK_TOKENS
                rebuilt.extend(toks[:_CHUNK_STEP])
            else:
                rebuilt.extend(toks)
        assert rebuilt == docs[doc_id], doc_id


def test_documents_text_is_ascii_precondition():
    """The multimodal byte-stride oracles (FRAME_SAMPLE_SQL,
    MULTIMODAL_RESIZE_SQL) replay Python ``bytes(payload)`` slicing with
    character substr arithmetic, which is only valid while documents.text
    is pure ASCII (byte offsets == char offsets; DuckDB's md5 cannot hash
    BLOBs, so an octet-exact oracle is not expressible). The driver
    regenerates testdata between rounds -- fail loudly here if the
    precondition ever breaks, instead of silently diverging in the gate."""
    con = duckdb.connect()
    for sf in ("sf0.001", "sf0.01"):
        path = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(path):
            continue
        n_bad = con.execute(
            f"SELECT count(*) FROM '{path}' "
            "WHERE octet_length(encode(text)) <> length(text)"
        ).fetchone()[0]
        assert n_bad == 0, (
            f"{path}: {n_bad} non-ASCII documents -- the byte-stride "
            "multimodal oracles (docs_vectors.py FRAME_SAMPLE_SQL / "
            "MULTIMODAL_RESIZE_SQL) no longer match Python byte slicing"
        )
    con.close()


def test_null_values_match_oracle_on_fixture(spark, tmp_path):
    """NULL-bearing events fixture: the ordered-fold queries must agree
    with their DuckDB oracles even when ``value`` is NULL (both engines
    coalesce to 0.0 inside the fold, and sort on the identical
    (ts, event_id) key -- ADVICE r4 parity latents, now exercised)."""
    import datetime

    from prometheus_pulsar_remote_write_spark.plans.events_batch import (
        ANOMALY_SQL,
        SESSION_SQL,
        events_anomaly_zscore,
        events_sessionization,
    )

    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                base + datetime.timedelta(minutes=7 * i, microseconds=137 * i),
                i % 4,
                "click" if i % 3 else "view",
                None if i % 5 == 0 else float(i) * 1.37,
                "{}",
            )
        )
    schema = (
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    for fn, sql in ((events_anomaly_zscore, ANOMALY_SQL), (events_sessionization, SESSION_SQL)):
        df = fn(spark, sf_dir)
        rel = con.sql(sql)
        err = compare(fn.__name__, df, rel.fetchall(), [c[0] for c in rel.description])
        assert err is None, f"{fn.__name__}: {err}"
    con.close()


def test_pii_scrub_redacts_planted_pii(spark):
    """The synthetic corpus carries no PII (the catalog entry legitimately
    reports zero redactions), so prove the scrubber on planted fixtures:
    every pattern redacts, counts match, clean text is untouched."""
    from prometheus_pulsar_remote_write_spark.operators.text import pii_scrub

    rows = [
        (1, "contact me at jane.doe+spam@example.co.uk or on +14155550123"),
        (2, "server 192.168.0.1 and 10.0.0.255 responded; host1024 did not"),
        (3, "plain text with no identifiers at all"),
        (4, "a@b.io mailed b@c.org from 8.8.8.8 calling +4930123456"),
    ]
    out = {
        r["doc_id"]: r
        for r in pii_scrub(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (1, 0, 1)
    assert out[1]["scrubbed"] == "contact me at <EMAIL> or on <PHONE>"
    assert (out[2]["n_email"], out[2]["n_ipv4"], out[2]["n_phone"]) == (0, 2, 0)
    assert out[2]["scrubbed"] == "server <IP> and <IP> responded; host1024 did not"
    assert out[3]["scrubbed"] == rows[2][1]  # untouched
    assert (out[4]["n_email"], out[4]["n_ipv4"], out[4]["n_phone"]) == (2, 1, 1)
    assert out[4]["scrubbed"] == "<EMAIL> mailed <EMAIL> from <IP> calling <PHONE>"

    # the DuckDB twin agrees on the same planted rows
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, ?)" for i, _ in rows)
        + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import PII_SCRUB_SQL

    duck = {r[0]: r for r in con.execute(PII_SCRUB_SQL).fetchall()}
    import hashlib

    for doc_id, r in out.items():
        d = duck[doc_id]
        assert (d[1], d[2], d[3]) == (r["n_email"], r["n_ipv4"], r["n_phone"])
        assert d[4] == hashlib.md5(r["scrubbed"].encode()).hexdigest()
    con.close()


def test_boilerplate_removal_drops_planted_shared_blocks(spark, tmp_path):
    """Plant one 5-token block shared verbatim by two documents plus a
    third all-unique document: the shared block is dropped from both
    carriers, the unique doc survives untouched."""
    import hashlib

    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
        docs_boilerplate_removal,
    )

    shared = "subscribe to our mailing list"
    rows = [
        (1, shared + " alpha beta gamma delta epsilon", "en", "s0", 0),
        (2, shared + " zeta eta theta iota kappa", "en", "s0", 0),
        (3, "wholly unique words nothing repeated here at all", "en", "s0", 0),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    out = {r["doc_id"]: r for r in docs_boilerplate_removal(spark, sf_dir).collect()}
    assert out[1]["n_dropped"] == 1 and out[2]["n_dropped"] == 1
    assert out[1]["clean_digest"] == hashlib.md5(
        b"alpha beta gamma delta epsilon"
    ).hexdigest()
    assert out[3]["n_dropped"] == 0
    assert out[3]["clean_digest"] == hashlib.md5(rows[2][1].encode()).hexdigest()


def test_rp_projection_matches_numpy(spark, tmp_path):
    """The integer random projection equals the straight numpy product of
    the quantized vector with the md5-derived +-1 matrix."""
    import math

    import numpy as np

    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
        _RP_SIGNS,
        emb_rp_projection,
    )

    rng = np.random.RandomState(7)
    vecs = rng.randn(3, 64).astype("float32") * 0.2
    rows = [(i, [float(x) for x in vecs[i]], i % 2) for i in range(3)]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    )
    out = {r["vec_id"]: r for r in emb_rp_projection(spark, sf_dir).collect()}
    signs = np.array(_RP_SIGNS)  # (16, 64)
    for i in range(3):
        q = np.array([math.floor(float(x) * 1e6) for x in vecs[i]], dtype=np.int64)
        expect = signs @ q
        assert out[i]["p0"] == int(expect[0])
        assert out[i]["p1"] == int(expect[1])


def test_containment_detects_planted_subset(spark, tmp_path):
    """A short doc whose text is a verbatim prefix of a longer doc has
    containment 1000 (every shingle of the small set is in the big set);
    an unrelated doc produces no pair."""
    from prometheus_pulsar_remote_write_spark.operators.dedup import (
        containment_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    big = small + " eta theta iota kappa lambda mu nu xi omicron pi"
    rows = [
        (1, small, "en", "s0", 0),
        (2, big, "en", "s0", 0),
        (3, "totally different words with no shared trigrams at all", "en", "s0", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = containment_pairs(df, threshold_milli=900).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_small"], r["id_big"], r["containment_milli"]) == (1, 2, 1000)


def test_deriv_predict_matches_numpy_least_squares(spark, tmp_path):
    """consume_deriv_predict's integer-sum regression equals numpy's
    least-squares slope/extrapolation on a hand-built series (within the
    floor quantization)."""
    import numpy as np

    from prometheus_pulsar_remote_write_spark.plans.pipeline import (
        consume_deriv_predict,
    )

    # one user, one window: strictly increasing values on known seconds
    base = 1704067200  # 2024-01-01T00:00:00Z, window-aligned
    pts = [(0, 10.00), (60, 11.50), (120, 14.00), (300, 18.25), (540, 21.00)]
    rows = [
        (i, __import__("datetime").datetime.utcfromtimestamp(base + dt), 7,
         "signup", val, '{"k": 1}')
        for i, (dt, val) in enumerate(pts)
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "events.parquet")
    )
    out = consume_deriv_predict(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]
    x = np.array([p[0] for p in pts], dtype=float)
    yc = np.array([round(p[1] * 100) for p in pts], dtype=float)
    slope, intercept = np.polyfit(x, yc, 1)
    assert r["deriv_micro"] == int(np.floor(slope * 1e4))
    assert r["predict_milli"] == int(np.floor((intercept + slope * 1200.0) * 10.0))


def test_boilerplate_removal_all_boilerplate_doc(spark, tmp_path):
    """A document consisting ONLY of a shared block collapses to empty
    clean text (md5('') digest, zero length) -- and both engines agree."""
    import hashlib

    from prometheus_pulsar_remote_write_spark.plans.docs_vectors import (
        docs_boilerplate_removal,
    )

    shared = "one two three four five"
    rows = [
        (1, shared, "en", "s0", 0),
        (2, shared + " unique suffix words here extra", "en", "s0", 0),
    ]
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(sf_dir, "documents.parquet")
    )
    out = {r["doc_id"]: r for r in docs_boilerplate_removal(spark, sf_dir).collect()}
    assert out[1]["n_dropped"] == 1 and out[1]["clean_len"] == 0
    assert out[1]["clean_digest"] == hashlib.md5(b"").hexdigest()


def test_spark_sql_api_parity_on_q1(spark):
    """The engine surface is usable SQL-first too: registering the lake
    tables as temp views and running ANSI SQL through spark.sql yields
    exactly the DataFrame-API result (same rounding, same rows)."""
    from prometheus_pulsar_remote_write_spark.plans.relational import (
        q1_pricing_summary,
    )
    from prometheus_pulsar_remote_write_spark.schema import load_tables

    li = load_tables(spark, SF_SMOKE, ["lineitem"])["lineitem"]
    li.createOrReplaceTempView("lineitem_v")
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                 AS sum_charge,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               round(avg(l_discount), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem_v
        WHERE l_shipdate <= timestamp'1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )
    got = sorted(tuple(r) for r in sql.collect())
    want = sorted(tuple(r) for r in q1_pricing_summary(spark, SF_SMOKE).collect())
    assert got == want and got


def test_driver_window_rotation_invariants():
    """Catalog-order regression guard for the data-driven rotation:
    changed-this-round entries lead the driver's 50-entry window, and
    the rest of the window is the STALEST evidence first (no entry
    outside the window has an older latest-green record than one
    inside), so every catalog entry's driver record keeps refreshing."""
    from prometheus_pulsar_remote_write_spark.plans.catalog import (
        _CHANGED,
        _LATEST,
    )

    names = list(QUERIES)
    window = names[:50]
    for n in _CHANGED:
        assert n in QUERIES, f"_CHANGED names unknown entry {n}"
    for n in _CHANGED[:50]:
        assert n in window, f"changed entry {n} fell out of the window"
    # stalest-first: everything after the (capped) changed head sorts by
    # latest-green round; never-recorded entries (including _CHANGED
    # overflow beyond the 50-window) have round 0 and sort FIRST, so
    # they lead the next round's window automatically
    tail = [n for n in names if n not in set(_CHANGED[:50])]
    rounds = [_LATEST.get(n, 0) for n in tail]
    assert rounds == sorted(rounds), "window tail is not stalest-first"


def test_no_duplicate_literal_keys_in_plan_module_dicts():
    """Python dicts silently last-wins on duplicate literal keys, so
    `len(QUERIES)` can't catch a key listed twice -- parse each plan
    module's SOURCE and assert every dict display uses each string key
    at most once (a duplicate misstates the section's entry count to a
    reader even when the values are identical)."""
    import ast
    import inspect

    from prometheus_pulsar_remote_write_spark.plans import (
        docs_vectors,
        events_batch,
        pipeline,
        relational,
    )

    for module in (pipeline, docs_vectors, events_batch, relational):
        tree = ast.parse(inspect.getsource(module))
        for node in ast.walk(tree):
            if not isinstance(node, ast.Dict):
                continue
            keys = [
                k.value
                for k in node.keys
                if isinstance(k, ast.Constant) and isinstance(k.value, str)
            ]
            dupes = sorted({k for k in keys if keys.count(k) > 1})
            assert not dupes, (
                f"{module.__name__}: duplicate dict keys {dupes} "
                f"at line {node.lineno}"
            )
