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
    # round 12: (a) the two measured-unsafe LSH defaults shipped their
    # scale-safe parameterizations -- emb_neardup_lsh at 4 bands x 8 bits
    # (sign-LSH, Arrow signature tier, star cap mirrored in SQL) and the
    # text drop-set path (curation funnel + near-dup dedup) with the
    # hot-bucket star cap on and mirrored in its capped SQL twin; (b) the
    # entire round(avg)/round(ratio) residual lottery class (SCALE.md §9
    # risk map) converted to exact integer rationals or pure-IEEE
    # floor(x*1e6+0.5) quantization on BOTH engines -- 16 entries' output
    # formulas changed, so they lead the window; the stalest-tail sort
    # fills the remaining slots.
    "emb_neardup_lsh",
    "docs_neardup_dedup",
    "docs_curation_pipeline",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q17_small_quantity_revenue",
    "agg_stats_by_status",
    "variant_functions_showcase",
    "docs_lang_profile",
    "docs_bpe_token_stats",
    "docs_lexical_diversity",
    "docs_repetition_filter",
    "emb_label_centroids",
    "events_markov_transitions",
    "events_anomaly_zscore",
    "consume_avg_over_time",
    "consume_vector_matching",
    "consume_holt_winters",
    "consume_quantile_over_time",
    # second sweep of the same class: percent_rank/cume_dist are exact
    # rationals (rank/n), brand_avg was a missed round(avg), and the
    # array showcase's per-row float rounds get floor-quantization
    "window_lead_lag_ntile",
    "correlated_above_brand_avg",
    "array_functions_showcase",
    # third sweep closes the WATCHED classes too: percentiles become
    # exact cent-integer interpolation (f100 = q*(n-1) mod 1 has
    # denominator 100) on a rank-based plan, and sd_price computes its
    # moments as exact integer sums (agg_stats_by_status already leads
    # the window from the avg conversion)
    "agg_percentiles_by_status",
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
