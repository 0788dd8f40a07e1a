"""Plan-shape assertions for the headline queries: predicate pushdown,
broadcast dimension joins, single-exchange windowing. These are the
properties that decide 100 TB behavior — a green oracle gate with a bad
plan is only half done."""

from __future__ import annotations

from hdfs_hive_sql_playground_spark import plans
from hdfs_hive_sql_playground_spark.queries import all_queries

SPECS = all_queries()


def test_q01_filter_pushed_to_scan(spark, sf_dir):
    df = SPECS["q01_pricing_summary"].fn(spark, sf_dir)
    plans.assert_pushed_filters(df, "LessThanOrEqual(l_shipdate")
    # partial+final aggregation over exactly one shuffle
    assert plans.count_exchanges(df) == 1


def test_q12_broadcast_dims_and_pushdown(spark, sf_dir):
    df = SPECS["q12_region_revenue"].fn(spark, sf_dir)
    plans.assert_pushed_filters(df, "GreaterThanOrEqual(o_orderdate")
    assert plans.count_broadcast_joins(df) >= 2  # nation + region at minimum
    plans.assert_no_cartesian(df)


def test_q62_single_exchange_for_both_windows(spark, sf_dir):
    df = SPECS["q62_sessionize"].fn(spark, sf_dir)
    # lag window, running-sum window, and the final agg all reuse ONE
    # user_id exchange
    assert plans.count_exchanges(df) == 1


def test_q80_dedup_single_exchange(spark, sf_dir):
    df = SPECS["q80_exact_dedup"].fn(spark, sf_dir)
    assert plans.count_exchanges(df) == 1
    plans.assert_no_cartesian(df)


def test_no_collect_style_plans(spark, sf_dir):
    """Registry-wide plan invariants: CartesianProduct is banned everywhere
    (no driver funnels / all-pairs stages), and no plan may carry the raw
    documents.text column through an Exchange — at 100 TB the shuffle
    carries hashes, grams, and signatures, never documents."""
    for name, spec in SPECS.items():
        if name.startswith(("q7", "q8")) and "jdbc" in name:
            continue
        df = spec.fn(spark, sf_dir)
        p = plans.executed_plan(df)
        assert "CartesianProduct" not in p, name
        for line in p.splitlines():
            if "Exchange" in line:
                assert "text#" not in line, (name, line)


def test_q18_in_subquery_decorrelates_to_semi_join(spark, sf_dir):
    df = SPECS["q18_top_volume_orders"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "LeftSemi" in p  # IN + HAVING became a semi-join, not a per-row subquery
    plans.assert_no_cartesian(df)


def test_q17_left_join_distribution_no_cartesian(spark, sf_dir):
    df = SPECS["q17_custdist"].fn(spark, sf_dir)
    plans.assert_no_cartesian(df)


def test_q65_asof_join_single_exchange_no_nested_loop(spark, sf_dir):
    df = SPECS["q65_asof_join"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    # union-window formulation: ONE user_id shuffle, and crucially no
    # BroadcastNestedLoopJoin (what a naive ts-inequality join would plan)
    assert plans.count_exchanges(df) == 1
    assert "BroadcastNestedLoop" not in p


def test_q66_range_join_is_equi_not_nested_loop(spark, sf_dir):
    df = SPECS["q66_range_join_bucketed"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "BroadcastNestedLoop" not in p
    plans.assert_no_cartesian(df)


def test_q37_not_exists_decorrelates_to_anti_join(spark, sf_dir):
    df = SPECS["q37_global_sales_opportunity"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "Anti" in p  # NOT EXISTS became an anti-join, not a per-row subquery
    assert "BroadcastNestedLoop" not in p or "Anti" in p
    plans.assert_no_cartesian(df)


def test_q39_topk_not_global_sort(spark, sf_dir):
    df = SPECS["q39_null_ordering"].fn(spark, sf_dir)
    plan = plans.executed_plan(df)
    # Each ORDER BY ... LIMIT branch must plan as per-partition top-k
    # (TakeOrderedAndProject), never a full-shuffle global Sort.
    assert plan.count("TakeOrderedAndProject") == 2
    assert plans.count_exchanges(df) == 0


def test_q98_banded_simhash_equi_join_no_cartesian(spark, sf_dir):
    df = SPECS["q98_simhash_banded_neardup"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    # The candidate stage must be a (band, byte)-keyed equi-join: all-pairs
    # Hamming comparison would plan a nested-loop/cartesian.
    plans.assert_no_cartesian(df)
    assert "BroadcastNestedLoop" not in p


def test_q100_bigram_topk_takeordered_not_global_sort(spark, sf_dir):
    df = SPECS["q100_bigram_topk"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    # Top-k over the bigram counts: per-partition heap + driver merge, not
    # a full global sort of the vocabulary.
    assert "TakeOrderedAndProject" in p
    # one exchange for the bigram aggregation, none for the ordering
    assert plans.count_exchanges(df) == 1


def test_q104_sketch_recount_is_broadcast_bounded(spark, sf_dir):
    """The heavy-hitter recount must join candidates by BROADCAST (the
    sketch output is tiny) so the only wide shuffle aggregates candidate
    tokens, never the full token stream."""
    df = SPECS["q104_heavy_hitters"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    assert plans.count_broadcast_joins(df) >= 1  # candidate semi-join
    assert "BroadcastNestedLoopJoin" in p  # the 1-row N-total join
    plans.assert_no_cartesian(df)


def test_q106_repetition_signals_zero_shuffle(spark, sf_dir):
    """Gopher-style repetition stats are a pure projection: no exchange,
    no explode-induced shuffle, nothing but a map-side pass."""
    df = SPECS["q106_repetition_signals"].fn(spark, sf_dir)
    assert plans.count_exchanges(df) == 0


def test_q107_frame_sample_single_pass_no_shuffle(spark, sf_dir):
    """Frame sampling is one mapInPandas over the scan — exploding frames
    must not introduce an exchange."""
    df = SPECS["q107_frame_sample"].fn(spark, sf_dir)
    assert plans.count_exchanges(df) == 0
    assert "MapInPandas" in plans.executed_plan(df)


def test_q108_probe_index_is_broadcast(spark, sf_dir):
    """Decontamination must broadcast the probe index; the corpus side
    joins map-side and only hit rows reach an exchange."""
    df = SPECS["q108_decontaminate"].fn(spark, sf_dir)
    assert plans.count_broadcast_joins(df) >= 1
    plans.assert_no_cartesian(df)


def test_q109_only_hashes_shuffle(spark, sf_dir):
    """Incremental dedup shuffles 128-bit content hashes, never text: no
    plan node may carry the text column past the scan projection."""
    df = SPECS["q109_incremental_dedup"].fn(spark, sf_dir)
    p = plans.executed_plan(df)
    assert "LeftAnti" in p
    # text appears only inside the scan/md5 projection, not in exchanges:
    for line in p.splitlines():
        if "Exchange" in line:
            assert "text#" not in line
