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

#: Round-6 window head (the driver records the first 50): entries whose
#: code or oracle changed this round first (the new real-decode entry,
#: the pagerank/window-energy/curation-memo touches), then every
#: remaining entry ordered by STALEST latest-green driver record --
#: after r5's 50/50 all 145 prior entries are green, so the window's job
#: now is rotating the oldest evidence (r1 docs/emb basics, r3
#: relational showcases) up to a fresh record. Everything outside the
#: window stays locally strict-verified via scripts/check_oracle.py and
#: the full-catalog pytest oracle run.
_PRIORITY = [
    # new / changed in round 6
    "multimodal_real_decode",
    "emb_semdedup",
    "emb_residual_pq_assign",
    "docs_bpe_learn_merges",
    "docs_bpe_tokenize",
    "events_scd2_intervals",
    "docs_dup_span_coverage",
    "docs_family_canonical",
    "docs_perplexity_sample",
    "consume_irate_idelta",
    "events_ddsketch_quantiles",
    "events_cms_key_drift",
    "consume_rate_extrapolated",
    "consume_rate_counter",
    "consume_series_similarity",
    "consume_alert_firing",
    "docs_textrank_keywords",
    "multimodal_window_energy",
    "docs_curation_pipeline",
    "docs_neardup_dedup",
    # latest green r1
    "docs_token_stats",
    "docs_lang_profile",
    "docs_language_id",
    "docs_simhash16",
    "docs_exact_dedup",
    "emb_cosine_topk",
    "emb_neardup_lsh",
    # latest green r3 (stalest-first order)
    "events_tumbling_hourly",
    "events_funnel_conversion",
    "events_sliding_10m_5m",
    "events_dedup_per_minute",
    "events_type_value_buckets",
    "events_asof_attribution",
    "events_range_join_conversions",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "semi_join_high_quantity",
    "anti_join_customers_no_orders",
    "rollup_order_counts",
    "cube_lineitem_flags",
    "window_top3_orders_per_segment",
    "window_running_revenue",
    "top_parts_by_retailprice",
    "setop_nation_coverage",
    "scalar_functions_showcase",
    "date_functions_showcase",
    "agg_stats_by_status",
    "having_frequent_customers",
]

QUERIES = {
    **{k: QUERIES[k] for k in _PRIORITY},
    **{k: v for k, v in QUERIES.items() if k not in _PRIORITY},
}


def flagship(spark, sf_dir):
    """Produce-pipeline flagship: the reference's whole produce semantics
    (A1 event ingest -> B4 tenant -> B1 sample projection -> C1 JSON wire
    payloads) as one DataFrame query."""
    return pipeline.produce_serialize_json(spark, sf_dir)
