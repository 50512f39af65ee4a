#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry from __spark_entry__.py and its
``oracle_sql()`` twin on the same parquet tables, then compares:
row count, sorted column names, and order-insensitive values
(floats compared to 1e-9 after both sides' explicit rounding).

Usage:
    python scripts/check_oracle.py                 # all queries @ sf0.01
    python scripts/check_oracle.py q1 emb_cosine_topk
    SF_DIR=/root/testdata/sf0.001 python scripts/check_oracle.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows_sortable(rows):
    return sorted(
        [tuple(_norm_cell(c) for c in r) for r in rows],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


#: STRICT_FLOAT=1 compares floats bit-exactly, as the driver's value-hash
#: does; the default keeps a 1e-9 relative tolerance for quick local runs.
STRICT_FLOAT = os.environ.get("STRICT_FLOAT", "") not in ("", "0")


def _cells_equal(a, b):
    # TYPE-STRICT, like the driver's value-hash: an int64 on one side and a
    # float/Decimal on the other hashes differently even when numerically
    # equal (bit us in round 1 on floor()/ceil() and sum(CASE...)).
    if type(a) is not type(b):
        return False
    if isinstance(a, float):
        if math.isinf(a) or math.isinf(b):
            return a == b
        if STRICT_FLOAT:
            return a == b or (math.isnan(a) and math.isnan(b))
        return abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
    if isinstance(a, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    return a == b


def compare(name, spark_df, duck_rows, duck_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(duck_cols)
    if s_cols != d_cols:
        return f"SCHEMA mismatch: spark={s_cols} duck={d_cols}"
    s_idx = [spark_df.columns.index(c) for c in s_cols]
    d_idx = [duck_cols.index(c) for c in d_cols]
    s_rows = _rows_sortable([[r[i] for i in s_idx] for r in spark_df.collect()])
    d_rows = _rows_sortable([[r[i] for i in d_idx] for r in duck_rows])
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (sv, dv) in enumerate(zip(sr, dr)):
            if not _cells_equal(sv, dv):
                return (
                    f"VALUE mismatch at sorted-row {i} col {s_cols[c]}: "
                    f"spark={sv!r} duck={dv!r}"
                )
    return None


def main():
    only = set(sys.argv[1:])
    import __spark_entry__ as entry_mod

    from prometheus_pulsar_remote_write_spark.session import get_spark

    spark = get_spark(
        master=os.environ.get("SPARK_MASTER", "local[8]"),
        shuffle_partitions=8,
        extra_conf={"spark.default.parallelism": "8"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    names = [n for n in queries if not only or n in only]
    failures = []
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, SF_DIR)
            if name not in oracles:
                n = df.count()
                print(f"  {name:34s} ROWS-ONLY rows={n} ({time.time()-t0:.1f}s)")
                if n == 0:
                    failures.append((name, "rows-only query returned 0 rows"))
                continue
            orel = con.sql(oracles[name])
            # HUGEINT survives fetchall() as a Python int (so a naive
            # compare passes) but widens to float64 through pandas --
            # which is how the driver hashes it: 1.0 != 1 => hash
            # mismatch. DuckDB's sum(INTEGER) is HUGEINT, so any summed
            # int column must be ::BIGINT-cast in the oracle (round 3:
            # events_sessionization's session_seq).
            hug = [
                c
                for c, t in zip(orel.columns, orel.types)
                if "HUGEINT" in str(t).upper()
            ]
            if hug:
                err = f"oracle returns HUGEINT column(s) {hug}; add ::BIGINT"
                failures.append((name, err))
                print(f"  {name:34s} FAIL {err} ({time.time()-t0:.1f}s)")
                continue
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
            err = compare(name, df, duck_rows, duck_cols)
            if err:
                failures.append((name, err))
                print(f"  {name:34s} FAIL {err[:120]} ({time.time()-t0:.1f}s)")
            else:
                print(f"  {name:34s} PASS rows={len(duck_rows)} ({time.time()-t0:.1f}s)")
        except Exception as exc:
            failures.append((name, str(exc)))
            print(f"  {name:34s} ERROR {str(exc).splitlines()[0][:150]} ({time.time()-t0:.1f}s)")
    print()
    if failures:
        print(f"{len(failures)}/{len(names)} FAILED:")
        for name, err in failures:
            print(f"  {name}: {err[:200]}")
        sys.exit(1)
    print(f"all {len(names)} queries match")


if __name__ == "__main__":
    main()
