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
_CHANGED = [
    # new in round 7
    "docs_bm25_topk",            # inverted-index sparse retrieval
    "consume_holt_winters",      # PromQL double exponential smoothing
    "events_theta_set_ops",      # KMV sketch union/intersection
    "emb_decontamination",       # semantic eval-leakage report
    "multimodal_image_dhash",    # real-PNG perceptual hash dedup
    "docs_quality_logreg",       # quantized-gradient GD classifier
    "docs_bbit_minhash",         # 2-bit MinHash Jaccard estimation
    "unpivot_lineitem_measures", # wide-to-long melt showcase
    "docs_leakage_safe_split",   # family-aware split assignment
    "docs_mixture_plan",         # token-budget mixture planning
    "consume_count_values",      # PromQL count_values
    "events_misra_gries_topk",   # arrival-order MG heavy hitters
    "emb_matryoshka_recall",     # truncated-dim recall report
    "consume_scrape_gaps",       # per-series cadence gap detection
    "emb_power_iteration",       # PCA top component, quantized matvec
    "events_join_size_estimate", # CMS inner-product cardinality
    "events_seasonal_anomaly",   # hour-of-day median/MAD outliers
    "emb_dim_winsor_stats",      # per-dim exact percentile QC
    "events_holt_winters_seasonal",  # triple-HW hourly forecasting
    "consume_time_weighted_avg",     # LOCF time-weighted mean
    "consume_interpolated_vector",   # linear-interp gapfill
    "events_cusum_changepoints",     # sequential shift detection
    "docs_dedup_sweep",              # dedup method-comparison table
    "events_slo_burn_rate",          # multi-window SLO burn alerts
    "docs_vocab_coverage",           # train/eval OOV report
    "basket_brand_lift",             # market-basket association lift
    "emb_pq_distortion",             # codebook-health per subspace
    "emb_centroid_drift",            # per-label embedding drift
    "customer_rfm_segments",         # RFM quintile segmentation
    "docs_langid_quality",           # precision/recall/F1 eval
    "docs_postings_compression",     # delta+varint index sizing
    "consume_lttb_downsample",       # LTTB visual downsampling
    "consume_m4_downsample",         # M4 pixel-exact downsampling
    "events_k_anonymity",            # quasi-identifier privacy audit
    "events_benford_audit",          # first-digit forensic audit
    "customer_pareto_curve",         # revenue concentration deciles
    "docs_zipf_slope",               # Zipf's-law corpus fit
    "events_gini_inequality",        # load-concentration coefficient
    "docs_pmi_collocations",         # PMI collocation mining
    "emb_hubness_report",            # kNN-graph hubness QC
    "events_bot_regularity",         # inter-event-time CV abuse signal
    "nation_market_hhi",             # Herfindahl concentration index
    "consume_m4_fidelity",           # downsampling error bound report
    "docs_readability",              # Flesch-shaped grade filter
    "consume_sli_availability",      # per-series nines report
    "events_survival_curve",         # age-sliced retention decay
    "emb_triplet_consistency",       # metric-space margin audit
    "consume_heatmap_buckets",       # 2-D dashboard histogram feed
    "orders_seasonality_index",      # monthly demand baseline
    "events_dau_mau_stickiness",     # engagement ratio
    "docs_jaccard_threshold_curve",  # dedup threshold sensitivity
    "emb_isotropy_score",            # pair-join-free space isotropy
    "orders_shipping_delay_sla",     # fulfillment SLA percentiles
    "events_transition_entropy",     # behavioral diversity score
    "events_touch_attribution",      # first- vs last-touch credits
    # code or oracle touched in round 7
    "docs_bpe_tokenize",       # explode_outer single-agg plan rewrite
    "events_scd2_intervals",   # oracle ORDER BY parity fix
    "consume_instant_vector",  # broadcast-pinned eval grid
    "emb_semdedup",            # k-means-refined balanced centroids
    "docs_neardup_pairs",      # all-JVM signature tier
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
