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
    rel = duck.execute(ORACLES[name])
    cols = [d[0] for d in rel.description]
    err = compare(name, df, rel.fetchall(), cols)
    assert err is None, err


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
