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
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from prometheus_pulsar_remote_write_spark.plans import catalog
from prometheus_pulsar_remote_write_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    for name, fn in catalog.QUERIES.items():
        if only and name not in only and not any(name.startswith(o) for o in only):
            continue
        try:
            p = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
            print(
                f"  {name:34s} exchanges={p.count('Exchange'):2d}"
                f" bhj={p.count('BroadcastHashJoin'):2d}"
                f" smj={p.count('SortMergeJoin'):2d}"
                f" python={p.count('PythonUDF') + p.count('MapInPandas') + p.count('ArrowEval'):2d}"
                f" window={p.count('Window'):2d}"
            )
        except Exception as exc:  # plan-only audit: report and continue
            print(f"  {name:34s} ERROR {str(exc).splitlines()[0][:100]}")
    spark.stop()


if __name__ == "__main__":
    main()
