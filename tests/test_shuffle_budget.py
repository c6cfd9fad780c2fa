"""Shuffle-budget regression guard for every bench-tagged query.

Each entry pins the number of Exchange operators in the compiled plan at
sf0.001 (engine session, shuffle_partitions=4). A failure means a code
change added a shuffle to a hot query — the exact regression class that
is invisible at test scale and dominant at 100 TB. Budgets are the
MEASURED counts (not aspirational); lowering one is an improvement,
raising one needs a reviewed justification.

pagerank_topk budgets 0 because its returned plan reads the final
localCheckpoint — its per-iteration shuffles (one per round, asserted in
test_graph.py semantics) happen during construction, not in the
returned plan.
"""

import pytest

from reddit_data_pipeline_engineering_spark.plans.queries import REGISTRY, queries

from .conftest import SF_SMALL

queries()  # force registration

BUDGETS = {
    "asof_last_purchase": 2,
    "bloom_semijoin_reduction": 4,
    # 1 pair-agg + 1 broadcast + the (order, part) distinct printed once
    # per join side (identical subplans — AQE ReuseExchange dedups them
    # at runtime). The distinct is the correctness fix: an order holding
    # a part twice must not double-count its pairs.
    "copurchase_pairs": 4,
    "corpus_prep_stats": 3,
    "cosine_topk": 0,
    "daily_topk": 1,
    "decontaminate_ngrams": 5,
    "embedding_blocked_topk": 2,
    "exact_dedup": 1,
    "exact_percentiles": 2,
    "flagship_top_locations": 3,
    "forecast_revenue": 1,
    "forward_fill": 1,
    "hash_split_stats": 3,
    "hll_distinct_sketch": 5,
    "ivf_kmeans_topk": 1,
    "ivf_probe_topk": 0,
    "large_volume_customers": 5,
    "local_supplier_volume": 7,
    "market_share": 9,
    "marts_kernel": 4,
    "minhash_lsh_pairs": 2,
    "minhash_signatures": 0,
    "ngram_jaccard_topk": 3,
    "pagerank_topk": 0,
    "pivot_wide": 1,
    "pq_topk": 1,
    "pricing_summary": 2,
    "quality_filter_gates": 2,
    "repetition_stats": 3,
    "returned_item_losses": 4,
    "rollup_orders": 1,
    "scd2_dimension": 2,
    "shipping_priority": 3,
    "value_stats": 2,
    "vocab_topk": 2,
    "waiting_suppliers": 5,
    "window_dedup": 1,
    "zorder_layout": 2,
}


def test_budget_covers_every_bench_query():
    bench = {n for n, s in REGISTRY.items() if "bench" in s.tags}
    assert bench == set(BUDGETS), (
        "bench tag set changed — add/remove the measured budget here"
    )


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_shuffle_budget(name, spark):
    plan = (
        REGISTRY[name]
        .fn(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    got = plan.count("Exchange ")
    assert got <= BUDGETS[name], (
        f"{name}: {got} exchanges > budget {BUDGETS[name]} — a shuffle "
        "crept into a hot query"
    )
