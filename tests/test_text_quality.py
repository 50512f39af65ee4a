"""Quality-score edge semantics: the e4 fixed-point formulas must treat a
zero-token document as NULL on BOTH engines (Spark ANSI mode would raise
DIVIDE_BY_ZERO on a bare div; DuckDB's // 0 silently NULLs -- the same
crash-vs-NULL asymmetry class the Benford NULLIF fix closed)."""

import duckdb

from prometheus_pulsar_remote_write_spark.operators.text import quality_features
from prometheus_pulsar_remote_write_spark.plans.docs_vectors import TOKEN_STATS_SQL


def test_zero_token_doc_yields_null_not_crash(spark):
    docs = spark.createDataFrame(
        [
            (1, "", "en", "t", 0),
            (2, "   ", "en", "t", 3),  # whitespace-only: tokens drop to 0
            (3, "the quick brown fox.", "en", "t", 20),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    got = {r.doc_id: (r.type_token_ratio, r.quality_score)
           for r in quality_features(docs).collect()}
    assert got[1] == (None, None)
    assert got[2] == (None, None)
    assert got[3][0] is not None and got[3][1] is not None

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, '', 'en', 't', 0), (2, '   ', 'en', 't', 3), "
        "(3, 'the quick brown fox.', 'en', 't', 20)) "
        "AS t(doc_id, text, lang, source, n_chars)"
    )
    want = {
        r[0]: (r[5], r[6])
        for r in con.execute(TOKEN_STATS_SQL).fetchall()
    }
    con.close()
    assert want[1] == (None, None) and want[2] == (None, None)
    assert got[3] == want[3]


def test_quoted_text_column_name(spark):
    """_quality_e4_exprs must survive a column name that needs quoting."""
    df = spark.createDataFrame(
        [(1, "the quick brown fox")], "doc_id long, `my text` string"
    )
    out = quality_features(df, text_col="my text").collect()
    assert out[0].quality_score is not None
