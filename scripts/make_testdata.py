#!/usr/bin/env python
"""Seeded, self-contained twin of the driver's synthetic testdata
generator (TESTDATA.md / FIXTURES.md §4): emits the ten tables --
``region nation customer supplier part orders lineitem events documents
embeddings`` -- as one parquet file each, schema-identical to the
driver-generated tables at /root/testdata (pinned by
tests/test_testdata_generator.py against the real driver output where it
exists), with the same scale rules and value models observed there:

  rows(sf): customer 150k*sf, supplier 10k*sf, part 200k*sf,
            orders 1.5M*sf, lineitem 6M*sf, events 1M*sf
            (user_id < 15k*sf); region 5, nation 25 fixed;
            documents max(500, 50k*sf), embeddings max(500, 20k*sf)
            (the driver floors both at 500 for sf <= 0.01).

VALUES ARE NOT BYTE-IDENTICAL to the driver's (its RNG stream is not
public); every test that needs exact values reads whatever fixture set
conftest resolved, so Spark-vs-DuckDB oracles stay self-consistent on
either. Purpose: `pytest tests/` runs green on a fresh clone / CI runner
with no pre-existing /root/testdata (.github/workflows/test.yml).

Usage:
  python scripts/make_testdata.py --out .testdata [--sf 0.001 --sf 0.01]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOC_VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]
LANGS = ["en", "fr", "es", "zh", "de"]
LANG_P = [0.40, 0.16, 0.16, 0.14, 0.14]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]

_DAY_US = 86_400_000_000


def _rng(seed: int, sf: float, table: str) -> np.random.Generator:
    # one independent stream per (seed, sf, table) so adding a table or
    # reordering generation never perturbs the others; crc32 (not hash())
    # keeps the stream stable across processes/PYTHONHASHSEED
    import zlib

    return np.random.default_rng(
        [seed, int(round(sf * 1_000_000)), zlib.crc32(table.encode())]
    )


def _ts_us(dates_us: np.ndarray) -> pa.Array:
    return pa.array(dates_us.astype("int64"), type=pa.timestamp("us"))


def gen_region() -> pa.Table:
    return pa.table(
        {
            "r_regionkey": pa.array(np.arange(5, dtype=np.int32)),
            "r_name": REGIONS,
        }
    )


def gen_nation() -> pa.Table:
    keys = np.arange(25, dtype=np.int32)
    return pa.table(
        {
            "n_nationkey": pa.array(keys),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array((keys % 5).astype(np.int32)),
        }
    )


def gen_customer(sf: float, seed: int) -> pa.Table:
    r = _rng(seed, sf, "customer")
    n = max(1, round(150_000 * sf))
    return pa.table(
        {
            "c_custkey": pa.array(np.arange(n, dtype=np.int64)),
            "c_name": [f"Customer#{i:09d}" for i in range(n)],
            "c_nationkey": pa.array(r.integers(0, 25, n).astype(np.int32)),
            "c_acctbal": np.round(r.uniform(-1_000, 10_000, n), 2),
            "c_mktsegment": np.array(SEGMENTS)[r.integers(0, 5, n)],
        }
    )


def gen_supplier(sf: float, seed: int) -> pa.Table:
    r = _rng(seed, sf, "supplier")
    n = max(1, round(10_000 * sf))
    return pa.table(
        {
            "s_suppkey": pa.array(np.arange(n, dtype=np.int64)),
            "s_name": [f"Supplier#{i:09d}" for i in range(n)],
            "s_nationkey": pa.array(r.integers(0, 25, n).astype(np.int32)),
            "s_acctbal": np.round(r.uniform(-1_000, 10_000, n), 2),
        }
    )


def gen_part(sf: float, seed: int) -> pa.Table:
    r = _rng(seed, sf, "part")
    n = max(1, round(200_000 * sf))
    keys = np.arange(n, dtype=np.int64)
    names = [
        f"{P_ADJS[a]} {P_NOUNS[b]}"
        for a, b in zip(r.integers(0, len(P_ADJS), n), r.integers(0, len(P_NOUNS), n))
    ]
    return pa.table(
        {
            "p_partkey": pa.array(keys),
            "p_name": names,
            "p_brand": [f"Brand#{b}" for b in r.integers(1, 26, n)],
            "p_type": np.array(P_TYPES)[r.integers(0, len(P_TYPES), n)],
            "p_size": pa.array(r.integers(1, 51, n).astype(np.int32)),
            "p_retailprice": 900.0 + (keys % 1000) / 10.0,
        }
    )


def gen_orders(sf: float, seed: int, n_customer: int) -> pa.Table:
    r = _rng(seed, sf, "orders")
    n = max(1, round(1_500_000 * sf))
    day0 = np.datetime64("1995-01-01").astype("datetime64[us]").astype("int64")
    days = r.integers(0, 2405, n)  # .. 2001-08-01 inclusive
    return pa.table(
        {
            "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
            "o_custkey": pa.array(r.integers(0, n_customer, n).astype(np.int64)),
            "o_orderstatus": np.array(["F", "O", "P"])[r.integers(0, 3, n)],
            "o_totalprice": np.round(r.uniform(1_000, 500_000, n), 2),
            "o_orderdate": _ts_us(day0 + days * _DAY_US),
            "o_orderpriority": np.array(PRIORITIES)[r.integers(0, 5, n)],
        }
    )


def gen_lineitem(sf: float, seed: int, n_orders: int, n_part: int, n_supp: int) -> pa.Table:
    r = _rng(seed, sf, "lineitem")
    n = max(1, round(6_000_000 * sf))
    day0 = np.datetime64("1995-01-02").astype("datetime64[us]").astype("int64")
    return pa.table(
        {
            "l_orderkey": pa.array(r.integers(0, n_orders, n).astype(np.int64)),
            "l_partkey": pa.array(r.integers(0, n_part, n).astype(np.int64)),
            "l_suppkey": pa.array(r.integers(0, n_supp, n).astype(np.int64)),
            "l_linenumber": pa.array(r.integers(1, 8, n).astype(np.int32)),
            "l_quantity": r.integers(1, 51, n).astype(np.float64),
            "l_extendedprice": np.round(r.uniform(900, 105_000, n), 2),
            "l_discount": np.round(r.uniform(0, 0.10, n), 2),
            "l_tax": np.round(r.uniform(0, 0.08, n), 2),
            "l_returnflag": np.array(["A", "N", "R"])[r.integers(0, 3, n)],
            "l_linestatus": np.array(["F", "O"])[r.integers(0, 2, n)],
            "l_shipdate": _ts_us(day0 + r.integers(0, 2499, n) * _DAY_US),
        }
    )


def gen_events(sf: float, seed: int) -> pa.Table:
    r = _rng(seed, sf, "events")
    n = max(1, round(1_000_000 * sf))
    n_users = max(1, round(15_000 * sf))
    t0 = np.datetime64("2024-01-01").astype("datetime64[us]").astype("int64")
    span = 30 * _DAY_US
    ts = np.sort(t0 + r.integers(0, span, n))  # ts ascends with event_id
    value = np.maximum(0.01, np.round(r.exponential(50.0, n), 2))
    # plant the zero-rounding edge the driver corpus carries at sf0.1:
    # a value < 0.005 strips its Benford first digit to the empty
    # string, which crashed BOTH engines' ANSI ''::INT cast until the
    # round-11 NULLIF fix -- keep the edge in every generated corpus so
    # the CI strict gate exercises it at sf0.01 forever (0.004 stays
    # positive: exact 0 would poke the log-domain sketches instead)
    if n >= 1:
        value[0] = 0.004
    return pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": _ts_us(ts),
            "user_id": pa.array(r.integers(0, n_users, n).astype(np.int64)),
            "event_type": np.array(EVENT_TYPES)[r.integers(0, len(EVENT_TYPES), n)],
            "value": value,
            "props": [f'{{"k": {k}}}' for k in r.integers(0, 100, n)],
        }
    )


def gen_documents(sf: float, seed: int) -> pa.Table:
    r = _rng(seed, sf, "documents")
    n = max(500, round(50_000 * sf))  # driver floor: 500 at sf<=0.01
    vocab = np.array(DOC_VOCAB)
    texts = []
    for i in range(n):
        if i > 0 and r.random() < 0.05:
            # planted near-duplicate (the driver corpus carries ~5%
            # near-copies at 3-shingle Jaccard ~0.9-0.99 -- the
            # MinHash/SimHash/PPJoin family needs real positives)
            words = texts[int(r.integers(0, i))].split()
            words = [
                str(vocab[r.integers(0, len(vocab))]) if r.random() < 0.02 else w
                for w in words
            ]
            texts.append(" ".join(words))
        else:
            texts.append(
                " ".join(vocab[r.integers(0, len(vocab), r.integers(10, 100))])
            )
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": texts,
            "lang": np.array(LANGS)[r.choice(len(LANGS), n, p=LANG_P)],
            "source": [f"src{s}" for s in r.integers(0, 20, n)],
            "n_chars": pa.array(np.array([len(t) for t in texts], dtype=np.int64)),
        }
    )


def gen_embeddings(sf: float, seed: int) -> pa.Table:
    r = _rng(seed, sf, "embeddings")
    n, dim = max(500, round(20_000 * sf)), 64  # driver floor: 500
    vecs = r.standard_normal((n, dim)).astype(np.float32)
    # planted near-twins (sigma=0.01 perturbations): ~5% of vectors,
    # plus one twin for each of the five query heads (vec_id 0..4) the
    # similarity tests probe -- near-dup vector structure makes ANN
    # recall floors a property of the operator, not of instance luck.
    # Random twins start at i=5 and are applied BEFORE the head twins:
    # if a head vector 0..4 were itself re-perturbed after its twin at
    # n-5+i was copied, the guaranteed head-twin property the ANN recall
    # tests rely on would silently break.
    twin_of = {}
    for i in range(5, n - 5):
        if r.random() < 0.05:
            twin_of[i] = int(r.integers(0, i))
    if n >= 10:
        twin_of.update({n - 5 + i: i for i in range(5)})
    for i, j in twin_of.items():
        vecs[i] = vecs[j] + 0.01 * r.standard_normal(dim).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": pa.array(r.integers(0, 10, n).astype(np.int32)),
        }
    )


def generate(out_dir: str, sf: float, seed: int = 42) -> dict:
    """Write all ten tables under ``out_dir`` (one <table>.parquet file
    each, matching the driver layout); returns {table: n_rows}."""
    os.makedirs(out_dir, exist_ok=True)
    customer = gen_customer(sf, seed)
    part = gen_part(sf, seed)
    supplier = gen_supplier(sf, seed)
    orders = gen_orders(sf, seed, customer.num_rows)
    tables = {
        "region": gen_region(),
        "nation": gen_nation(),
        "customer": customer,
        "supplier": supplier,
        "part": part,
        "orders": orders,
        "lineitem": gen_lineitem(
            sf, seed, orders.num_rows, part.num_rows, supplier.num_rows
        ),
        "events": gen_events(sf, seed),
        "documents": gen_documents(sf, seed),
        "embeddings": gen_embeddings(sf, seed),
    }
    for name, tbl in tables.items():
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"))
    return {name: tbl.num_rows for name, tbl in tables.items()}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="output root; tables land in <out>/sf<sf>/")
    ap.add_argument(
        "--sf", action="append", type=float, default=None,
        help="scale factor(s); default 0.001 and 0.01 (the unit/oracle tiers)",
    )
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    for sf in args.sf or [0.001, 0.01]:
        sf_dir = os.path.join(args.out, f"sf{sf:g}")
        counts = generate(sf_dir, sf, args.seed)
        print(sf_dir, counts)


if __name__ == "__main__":
    main()
