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
