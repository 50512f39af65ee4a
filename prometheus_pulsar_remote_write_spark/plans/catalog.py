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
    # round 13: entries whose OUTPUT FORMULA (or filter semantics)
    # changed this round, so they lead the driver window.
    # (a) emb_neardup_exact: the r12 floor-quantization change was
    # deliberately deferred from the r12 window (SCALE.md §10) -- it is
    # the only entry whose current formula has never been
    # driver-recorded, so it goes first.
    "emb_neardup_exact",
    # (b) the aggregate-reclaim sweep: q1 derives its display sums from
    # the integer sums, agg_stats derives the cent sum from the decimal
    # moment sum, correlated's filter became the exact integer
    # inequality.
    "q1_pricing_summary",
    "agg_stats_by_status",
    "correlated_above_brand_avg",
    # (b2) the revenue-sum exactness sweep: the true value of
    # sum(l_extendedprice*(1-l_discount)) is a multiple of 1e-4 (not
    # 1e-2), so round(sum(DOUBLE), 2) had REACHABLE half boundaries --
    # the q9 r10-incident class, previously mislabelled SAFE. Every
    # disc-price / charge / promo-ratio / market-share aggregate now
    # sums exact e4/e6 integers (BIGINT for key-bounded groups,
    # DECIMAL(38,0)/HUGEINT for unbounded ones) and derives the
    # display value by half-up integer arithmetic.
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q11_important_part_value",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q19_disjunctive_join",
    "nation_market_hhi",
    # (c) the floor-quantization sweep that zeroes the last watched
    # float class (round() in ORDERING and quantized-output positions,
    # SCALE.md §9): every IVF/PQ cosine rank, quantized cosine/distance
    # output, and n-gram jaccard converts to floor(x*10^k + 0.5)/10^k
    # on BOTH engines.
    "emb_cosine_topk",
    "emb_ivf_topk",
    "emb_ivf_recall",
    "emb_nprobe_sweep",
    "emb_kmeans_assign",
    "emb_int8_quantize",
    "emb_semdedup",
    "emb_pq_assign",
    "emb_residual_pq_assign",
    "emb_pq_adc_topk",
    "emb_matryoshka_recall",
    "emb_pq_distortion",
    "emb_hubness_report",
    "emb_triplet_consistency",
    "docs_neardup_pairs",
    "docs_neardup_dedup",
    "docs_curation_pipeline",
    "docs_jaccard_index_pairs",
    "docs_jaccard_ppjoin",
    "docs_bbit_minhash",
    "docs_jaccard_threshold_curve",
    "docs_dup_families",
    "docs_leakage_safe_split",
    # (d) emb_power_iteration's component_micro is floor(x*1e6 + 0.5)
    # on both engines (was python-round under a wobbling floor); q22's
    # dormant-rich threshold is the exact integer inequality
    # bc*n > sum_cents (avg(c_acctbal) was an order-dependent double
    # sum feeding a > filter whose boundary an e2 balance can hit)
    "emb_power_iteration",
    "q22_dormant_rich_customers",
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
