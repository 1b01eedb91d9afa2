"""Registry-wide physical-plan linter.

Builds (does not execute) every registered query's plan at the given sf dir
and flags the structures that kill 100 TB runs:

  - ``CartesianProduct``       — hard fail, no exceptions
  - ``BroadcastNestedLoopJoin`` — fail unless allowlisted (legit only for
    1-row scalar broadcasts, e.g. global thresholds / histogram bounds)
  - ``Exchange SinglePartition`` — fail unless allowlisted (legit only for
    bounded frames: per-bucket offset counts, global top-k merge, final
    1-row aggregates)

Per-query pushdown/broadcast specifics stay in tests/test_plans.py; this is
the safety net that covers every NEW query automatically the moment it is
registered.

Usage: python tools/plan_lint.py [sf_dir]   (exit 1 on any finding)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simtradedata_spark.queries import QUERIES
from simtradedata_spark.session import get_spark

# 1-row / bounded-scalar broadcasts where a nested-loop build is the point.
ALLOW_BNLJ = {
    "important_parts",       # global HAVING threshold (1 row)
    "top_supplier_revenue",  # global max scalar (1 row)
    "value_histogram",       # min/max bounds (1 row)
    "dormant_rich_customers",  # integer-exact mean threshold (1 row)
    "frequent_tokens",       # global token-count threshold (1 row)
    "cms_token_frequency",   # same 1-row total-count threshold scalar
    "tfidf_top_terms",       # corpus doc-count scalar (1 row)
    "perplexity_scores",     # corpus token-total scalar (1 row)
    "bigram_perplexity",     # same corpus-total scalar (1 row)
    "corpus_datacard",       # grand-total row for shares (1 row)
    "table_profile",         # per-column totals vs table count (1 row)
    "negative_pairs",        # max-id scalar for the modular draw (1 row)
    # market-generator seed cross-joins: symbols × trading-days (both
    # bounded dimensions — they ARE the row source, never fact × fact)
    "synthetic_bars", "exrights_events", "valuation_table",
    "fundamentals_asof", "income_statement_asof", "balance_statement_asof",
    "cashflow_statement_asof", "eps_asof",
    "profit_ability_asof", "growth_ability_asof", "operating_ability_asof",
    "debt_paying_ability_asof",  # same probes×quarterly-dim shape as above
    # year-mode get_fundamentals: same symbols × broadcast-quarters
    # generator seed (10 × 8 rows), no probe join at all
    "statements_by_year", "statements_by_year_latest",
    "index_membership", "index_churn",
    "tick_vwap", "minute_bars_vwap", "minute_bars_fold",
    "rolling_beta", "factor_ic", "adjusted_bars_post",
    "stock_metadata", "gear_prices", "sort_msg_industry",
    "etf_info", "cb_info", "tick_directions",
    # calendar densification: dates × group dims, both bounded (J6)
    "region_daily_ffill",
    # documented quadratic BASELINE path; lsh_ann/ivf_ann are the scale path
    "cosine_top5",
    # bounded query-batch broadcast (5 vectors), same class as cosine_top5
    "text_ann_top3",
    # bounded query-batch broadcast (10 vectors), hard-negative mining
    "hard_negatives",
    # bounded query-batch broadcast (10 queries) over 8-byte PQ codes —
    # scoring every corpus code against the broadcast batch IS the ADC scan
    "pq_ann_top5",
    # bounded k-row centroid broadcast (Lloyd assignment is a cross join
    # against the k×d centroid table by construction)
    "kmeans_clusters", "semantic_dedup", "cluster_balanced_sample",
    # 1-row LM-totals scalar folded into the bucket-ratio dim
    "dsir_selection",
    # composed end-to-end chain: inherits dsir_selection's 1-row totals
    # cross join (the only BNLJ in its plan — every other stage is the
    # standalone certified shape)
    "full_curation_funnel",
    # corpus-total scalar (perplexity LM) + bounded ntile offset frames
    "curriculum_buckets",
}

# Bounded frames that legitimately pass through one partition.
ALLOW_SINGLE_PARTITION = {
    "rfm_segments",          # ≤num_buckets-row ntile offset frames
    "sequence_packing",      # same two-pass cumsum offset frames
    "price_quantiles",       # global sort-merge of 32 boundary rows
    "customer_spend_deciles",  # ntile offsets (global_ntile)
    "curriculum_buckets",    # same global_ntile offset frames
    "daily_factor_top3",     # bounded top-k driver merge
    "region_daily_ffill",    # distinct-dates dim for the calendar seed
    "conversion_funnel",     # final funnel rollup (few step-count rows)
    "classifier_eval",       # distinct-margin rank frame (~feature
                             # cardinality rows) + 1-row metric reduce
}


def lint(sf_dir: str) -> dict[str, list[str]]:
    spark = get_spark("plan-lint")
    findings: dict[str, list[str]] = {}
    for name, (fn, _sql) in QUERIES.items():
        try:
            plan = (
                fn(spark, sf_dir)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as e:  # a broken plan is itself a finding
            findings.setdefault(name, []).append(f"plan build failed: {e}")
            continue
        if "CartesianProduct" in plan:
            findings.setdefault(name, []).append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_BNLJ:
            findings.setdefault(name, []).append(
                "BroadcastNestedLoopJoin (not allowlisted)"
            )
        n_sp = plan.count("Exchange SinglePartition")
        if n_sp and name not in ALLOW_SINGLE_PARTITION:
            # Auto-allow the unavoidable class: a KEYLESS (global scalar)
            # aggregate merges its map-side partial buffers in one
            # partition — bounded by #partitions, not by data. Each
            # partial/final pair shows two "HashAggregate(keys=[]" nodes
            # around one SinglePartition exchange.
            keyless_pairs = plan.count("HashAggregate(keys=[]") // 2
            if n_sp > keyless_pairs:
                findings.setdefault(name, []).append(
                    "Exchange SinglePartition (not allowlisted, "
                    f"{n_sp} found vs {keyless_pairs} keyless-agg merges)"
                )
    return findings


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    findings = lint(sf_dir)
    for name, flags in sorted(findings.items()):
        for f in flags:
            print(f"LINT {name}: {f}")
    print(f"checked {len(QUERIES)} queries, {len(findings)} with findings")
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main())
