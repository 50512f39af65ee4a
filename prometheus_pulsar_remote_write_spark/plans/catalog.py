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

# Dict order decides which entries the driver's correctness gate records
# (first 50 per round). Rounds 1-4 left every recorded entry hash-green
# except the two list-cell canonicalizer failures (reshaped this round);
# round 5 leads with the 4 evidence-gap queries plus every new round-5
# operator, followed by the produce/consume pipeline family (r4-green).
# Everything outside the window is unchanged since its green record and
# stays locally strict-verified via scripts/check_oracle.py (all 132
# entries PASS at sf0.01 this round).
for module in (pipeline, docs_vectors, events_batch, relational):
    QUERIES.update(module.QUERIES)
    ORACLES.update(module.ORACLES)

#: The driver records the first 50 dict entries per round, so dict order
#: IS the evidence-rotation policy. From round 7 on it is data-driven:
#: entries whose code/oracle changed this round lead (the explicit
#: ``_CHANGED`` list, updated per round), followed by every other entry
#: ordered by STALEST latest-green driver record (computed from the
#: committed CORRECTNESS_r*.json files at import time). This guarantees
#: the oldest evidence is always the next to be re-recorded without
#: hand-maintaining a 50-name list. Everything outside the window stays
#: locally strict-verified via scripts/check_oracle.py and the
#: full-catalog pytest oracle run.
_CHANGED: list = [
    # round 11: running the strict gate at a NEW SCALE (driver sf0.1 --
    # a fifth instance varying data volume instead of seed) caught two
    # real defects the four sf0.01 corpora could not: (a) quality_score
    # landing on a 0.83125 half boundary where Spark and DuckDB round
    # DOUBLEs differently -- now exact e4 integer fixed point on both
    # engines (operators/text.py::_QUALITY_E4), changing these three
    # entries' formulas; (b) events_benford_audit crashing BOTH engines'
    # ANSI ''::INT cast on any value rounding to 0 -- now NULLIF on both
    # sides. A GENERATED sf0.1 corpus (the new manual CI job's recipe)
    # then caught recon_err_r landing on a 1e-7 half boundary in the PQ
    # pair -- round(DOUBLE, n) itself is the engine-dependent op, so
    # both engines now quantize with floor(x*1e6 + 0.5), pure IEEE
    # double arithmetic. These six lead the window; the remaining 44
    # slots still cover the full 24-entry r6 cohort plus 20 of the r7
    # tail.
    "docs_token_stats",
    "docs_curation_pipeline",
    "docs_family_canonical",
    "events_benford_audit",
    "emb_pq_assign",
    "emb_residual_pq_assign",
]


def _latest_green_rounds() -> dict:
    """Latest round each entry has a green driver record, parsed from the
    repo-root CORRECTNESS_r*.json files (absent/unparseable files are
    simply skipped -- a fresh clone degrades to alphabetical order)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    latest: dict = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                recs = json.load(fh)
        except Exception:
            continue
        for name, rec in recs.items():
            if isinstance(rec, dict) and rec.get("err") is None and rec.get("rows_match"):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


_LATEST = _latest_green_rounds()
# The head is capped at the driver's 50-record window: when a round adds
# more changed/new entries than fit, the overflow needs no special
# handling -- a never-recorded entry has _LATEST 0 and therefore sorts
# FIRST in the stalest tail, so it leads the next round's window
# automatically.
_PRIORITY = _CHANGED[:50] + sorted(
    (k for k in QUERIES if k not in _CHANGED[:50]),
    key=lambda k: (_LATEST.get(k, 0), k),
)

QUERIES = {
    **{k: QUERIES[k] for k in _PRIORITY if k in QUERIES},
    **{k: v for k, v in QUERIES.items() if k not in _PRIORITY},
}


def flagship(spark, sf_dir):
    """Produce-pipeline flagship: the reference's whole produce semantics
    (A1 event ingest -> B4 tenant -> B1 sample projection -> C1 JSON wire
    payloads) as one DataFrame query."""
    return pipeline.produce_serialize_json(spark, sf_dir)
