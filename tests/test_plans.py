"""Physical-plan audits: SCALE.md §2's plan-shape claims, asserted.

These tests pin the *shape* of the plans Catalyst produces — broadcast vs
sort-merge, partition pruning, filter/column pushdown, TakeOrdered — so a
refactor that silently degrades a plan (e.g. loses a broadcast and shuffles
the fact table) fails CI, not the 100 TB run."""

from pyspark.sql import functions as F

from simtradedata_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_read_range_prunes_partitions(warehouse):
    bounded = warehouse.read_range("bars", "2022-03-01", "2022-03-31")
    p = plan(bounded)
    assert "PartitionFilters" in p
    assert "trade_year" in p.split("PartitionFilters")[1][:200]
    # unbounded read keeps an empty partition-filter list
    p_all = plan(warehouse.read("bars"))
    assert "PartitionFilters: []" in p_all


def test_region_revenue_all_dims_broadcast(spark):
    p = plan(QUERIES["region_revenue"][0](spark, SF))
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p


def test_pricing_summary_pushdown_and_pruning(spark):
    p = plan(QUERIES["pricing_summary"][0](spark, SF))
    assert "PushedFilters" in p and "l_shipdate" in p.split("PushedFilters")[1][:200]
    # column pruning: the scan must not read join keys the query never uses
    read_schema = p.split("ReadSchema")[1]
    assert "l_partkey" not in read_schema and "l_suppkey" not in read_schema


def test_top_customers_uses_take_ordered(spark):
    p = plan(QUERIES["top_customers"][0](spark, SF))
    assert "TakeOrderedAndProject" in p


def test_order_priority_returns_semi_join(spark):
    p = plan(QUERIES["order_priority_returns"][0](spark, SF))
    assert "LeftSemi" in p


def test_shipping_priority_single_shuffle_join(spark):
    """The filtered customer dim must broadcast; only the fact-fact
    orders⋈lineitem join may shuffle."""
    p = plan(QUERIES["shipping_priority"][0](spark, SF))
    assert "BroadcastHashJoin" in p
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1


def test_moving_avg_single_exchange(spark):
    """Window over (key, time): exactly one hash-partitioning exchange."""
    from simtradedata_spark.operators.windows import moving_avg

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    ma = moving_avg(li, "l_extendedprice", 3, ["l_suppkey"], ["l_shipdate"])
    assert plan(ma).count("Exchange hashpartitioning") == 1


def test_get_price_prunes_partitions(api):
    """The §3.2 point: a backtest-day slice is a partition-pruned scan."""
    df = api._bars(["600000.SS"], start="2022-02-01", end="2022-02-28")
    p = plan(df)
    assert "PartitionFilters" in p
    pf = p.split("PartitionFilters")[1][:250]
    assert "2022" in pf
    # the symbol predicate reaches the parquet row groups too
    assert "PushedFilters" in p and "symbol" in p.split("PushedFilters")[1][:250]


def test_benchmark_contamination_broadcasts_gram_set(spark):
    """The benchmark n-gram side must ride broadcast — the corpus is the
    only relation allowed to shuffle (operators/decontam.py plan claim)."""
    p = plan(QUERIES["benchmark_contamination"][0](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_hash_sample_is_shuffle_free_scan_filter(spark):
    """Deterministic sampling is a pure scan+filter+partial-agg pipeline:
    the only exchange allowed is the final groupBy on source."""
    p = plan(QUERIES["hash_sample_docs"][0](spark, SF))
    assert p.count("Exchange") <= 1
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p


def test_global_ntile_no_single_partition_window(spark):
    """customer_spend_deciles must not contain an unpartitioned window —
    the distributed two-pass rank replaces it."""
    df = QUERIES["customer_spend_deciles"][0](spark, SF)
    p = plan(df)
    # a global window shows up as 'Window [...] Sort [... global=true' with
    # an Exchange SinglePartition feeding it
    assert "SinglePartition" not in p


def test_cci_orders_no_python_eval(spark):
    p = plan(QUERIES["cci_orders"][0](spark, SF))
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    assert "FlatMapGroupsInPandas" not in p


def test_doc_repetition_single_scan_no_join(spark):
    """The repetition stats must be ONE scan with stacked aggregations —
    a regression to the self-join form doubles the tokenization work."""
    p = plan(QUERIES["doc_repetition"][0](spark, SF))
    assert "Join" not in p
    assert p.count("FileScan parquet") == 1


def test_important_parts_broadcasts_threshold(spark):
    """Q11 shape: the 1-row threshold must broadcast (BNLJ over 1 row is
    fine); the fact side must aggregate with a map-side partial."""
    p = plan(QUERIES["important_parts"][0](spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_top_supplier_revenue_broadcasts_scalar_and_dim(spark):
    p = plan(QUERIES["top_supplier_revenue"][0](spark, SF))
    assert "SortMergeJoin" not in p
    assert p.count("BroadcastHashJoin") >= 1


def test_chunk_documents_no_shuffle(spark):
    """Chunking is scan-local: explode + projections, zero exchanges."""
    p = plan(QUERIES["doc_chunks"][0](spark, SF))
    assert "Exchange" not in p
    assert "Generate explode" in p


def test_weighted_mixture_no_shuffle(spark):
    p = plan(QUERIES["mixture_epochs"][0](spark, SF))
    assert "Exchange" not in p


def test_tfidf_df_table_broadcast(spark):
    """The vocabulary-sized document-frequency table must broadcast —
    a sort-merge join here would shuffle the corpus-sized tf side twice."""
    p = plan(QUERIES["tfidf_top_terms"][0](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_conversion_funnel_single_exchange(spark):
    # three chained window minima share the user_id partitioning: ONE
    # exchange feeds all three WindowExecs, plus the final tiny rollup
    p = plan(QUERIES["conversion_funnel"][0](spark, SF))
    assert p.count("Exchange hashpartitioning(user_id") <= 1


def test_char_contamination_broadcasts_benchmark(spark):
    p = plan(QUERIES["char_contamination"][0](spark, SF))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_value_histogram_broadcasts_bounds(spark):
    p = plan(QUERIES["value_histogram"][0](spark, SF))
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_rfm_segments_no_single_partition_window(spark):
    """The per-customer frame must never funnel through one task. Since the
    fused-count rewrite, multi_ntile's returned plan carries no
    SinglePartition exchange at all (offsets are literals; the only
    remaining shuffles are the per-tile bucket-hash rank windows) — any
    SinglePartition that ever reappears must be a ≤num_buckets-row count
    frame."""
    import re

    p = plan(QUERIES["rfm_segments"][0](spark, SF))
    # per-customer ranking shuffles are hash-partitioned by bucket: one per
    # tile window plus one per per-bucket count aggregate
    assert 3 <= p.count("Exchange hashpartitioning(__bkt") <= 6
    for m in re.finditer(r"Exchange SinglePartition", p):
        tail = p[m.end() : m.end() + 500]
        assert "__cnt" in tail or "__bkt" in tail


def test_filtered_revenue_pure_scan_aggregate(spark):
    """Q6 shape: every predicate reaches the parquet scan; no join at all."""
    p = plan(QUERIES["filtered_revenue"][0](spark, SF))
    assert "Join" not in p
    pushed = p.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_nation_pair_volume_one_fact_shuffle(spark):
    """Q7 shape: supplier/customer/nation all broadcast; only
    lineitem ⋈ orders may shuffle."""
    p = plan(QUERIES["nation_pair_volume"][0](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2
    assert p.count("SortMergeJoin") + p.count("ShuffledHashJoin") <= 1


def test_customer_order_distribution_preserves_outer(spark):
    """Q13 shape: the priority filter must stay in the join (LeftOuter),
    never collapse the outer join to inner."""
    p = plan(QUERIES["customer_order_distribution"][0](spark, SF))
    assert "LeftOuter" in p


def test_part_supplier_diversity_anti_join(spark):
    """Q16 shape: the NOT-IN decorrelates to a broadcast LeftAnti."""
    p = plan(QUERIES["part_supplier_diversity"][0](spark, SF))
    assert "LeftAnti" in p and "BroadcastHashJoin" in p


def test_waiting_suppliers_reuses_orderkey_partitioning(spark):
    """Q21 shape: per-(order,supplier) agg, per-order rollup, and the join
    back all hang off l_orderkey hash partitioning — Catalyst must not
    insert a second full-width exchange on the same key for the rollup."""
    p = plan(QUERIES["waiting_suppliers"][0](spark, SF))
    assert "TakeOrderedAndProject" in p
    # the whole quantifier chain (per-supplier agg → per-order window →
    # filter) hangs off ONE l_orderkey exchange, and lineitem is scanned once
    assert p.count("Exchange hashpartitioning(l_orderkey") == 1
    assert p.count("lineitem.parquet") <= 1


def test_dormant_rich_customers_broadcast_scalar_and_anti(spark):
    """Q22 shape: the integer-exact threshold arrives as a broadcast scalar
    (nested-loop on a 1-row build is fine); dormancy is a LeftAnti."""
    p = plan(QUERIES["dormant_rich_customers"][0](spark, SF))
    assert "LeftAnti" in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_min_cost_supplier_reuses_partkey_exchange(spark):
    """Q2 shape: the per-part min and the join back share the
    (l_partkey, l_suppkey)→l_partkey partitioning chain; part and supplier
    dims broadcast."""
    p = plan(QUERIES["min_cost_supplier"][0](spark, SF))
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p or p.count("SortMergeJoin") <= 2
