"""Aggregated query catalog: every operator surface from SURVEY.md §2
with its DuckDB oracle (where ANSI-SQL-expressible).

Sections:
  relational -- §2.F F6 joins/aggs/windows/setops/scalars over TPC-H-ish
  events     -- §2.F F7 batch equivalents of the streaming windows
  pipeline   -- §2.B/C/D produce & consume path semantics as batch queries
  docs       -- §2.F F1/F2/F4/F5 dedup, text analysis, multimodal
  vectors    -- §2.F F3 similarity search
"""

from __future__ import annotations

from . import docs_vectors, events_batch, pipeline, relational

QUERIES: dict = {}
ORACLES: dict = {}

# Module order sets dict order, and the driver's correctness gate checks
# the first 50 entries per round. Rounds 2-3 verified the relational +
# events surface (CORRECTNESS_r0{2,3}.json, all hash-green); this round
# leads with the pipeline/docs/vectors entries so every query in the
# catalog has driver-recorded hash evidence across rounds.
for module in (pipeline, docs_vectors, events_batch, relational):
    QUERIES.update(module.QUERIES)
    ORACLES.update(module.ORACLES)


def flagship(spark, sf_dir):
    """Produce-pipeline flagship: the reference's whole produce semantics
    (A1 event ingest -> B4 tenant -> B1 sample projection -> C1 JSON wire
    payloads) as one DataFrame query."""
    return pipeline.produce_serialize_json(spark, sf_dir)
