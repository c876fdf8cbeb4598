"""Plan-shape regression tests — the 100 TB contract (SURVEY §4).

Correctness tests prove the small-scale answer; these prove the *plan* is
the one that survives a 1000-executor cluster: filters reach the parquet
scan, projections prune the read schema, dimension joins broadcast, top-k
never globally sorts, and aggregation is partial+final.
"""

import pytest

import __spark_entry__ as entry
from qvarn_mr_spark.plans import (
    assert_broadcast_join,
    assert_columns_pruned,
    assert_filter_pushed,
    assert_max_shuffles,
    assert_no_shuffle_join,
    assert_partial_aggregation,
    assert_top_k,
)


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return entry.queries()[name](spark, sf_dir)
    return run


def test_search_pushes_down_and_prunes(q):
    df = q("search_exact_ci")
    # only the shown columns + the filter column are read (4 of 5)
    assert_columns_pruned(df, "customer.parquet", 4)
    assert_filter_pushed(df, "customer.parquet", "IsNotNull(c_mktsegment)")


def test_q1_scan_shape(q):
    df = q("q1_pricing")
    assert_filter_pushed(df, "lineitem.parquet", "LessThanOrEqual(l_shipdate")
    assert_columns_pruned(df, "lineitem.parquet", 7)   # 7 of 11 columns
    assert_partial_aggregation(df)
    assert_max_shuffles(df, 1)                          # one agg shuffle only


def test_q3_broadcasts_and_takeordered(q):
    df = q("q3_topk_revenue")
    assert_broadcast_join(df, 2)       # orders + customer build sides
    assert_no_shuffle_join(df)
    assert_top_k(df)
    assert_filter_pushed(df, "orders.parquet", "LessThan(o_orderdate")
    assert_filter_pushed(df, "lineitem.parquet", "GreaterThan(l_shipdate")
    assert_columns_pruned(df, "customer.parquet", 2)


def test_q5_star_join_all_broadcast(q):
    df = q("q5_region_revenue")
    assert_broadcast_join(df, 3)       # supplier, customer, nation(+region)
    assert_no_shuffle_join(df)         # the fact table is never shuffled
    assert_max_shuffles(df, 1)         # only the final groupBy


def test_mr_pipeline_single_shuffle(q):
    # map stage is narrow; reduce is one partial+final hash aggregate
    df = q("mr_sum")
    assert_partial_aggregation(df)
    assert_max_shuffles(df, 1)


def test_mr_join_aggregates_before_join(q):
    from qvarn_mr_spark.plans import explain_str
    df = q("mr_join")
    txt = explain_str(df, "formatted")
    # per-type last-writer aggregation must happen BEFORE the N-way join —
    # max_by partials prove the pre-join dedup that keeps join inputs 1 row/key
    assert "partial_max_by" in txt


def test_topk_queries_never_global_sort(q):
    assert_top_k(q("events_top_users"))


def test_knn_broadcasts_queries(q):
    # query side broadcast: the corpus is never shuffled for scoring
    assert_broadcast_join(q("knn_bruteforce"), 1)


def test_dedup_exact_partial_agg(q):
    df = q("dedup_exact")
    assert_partial_aggregation(df)
    assert_max_shuffles(df, 1)


def test_text_profile_codegen_compiles(q, spark):
    """The staged profile_frame must stay compilable: with codegen fallback
    disabled, a Janino failure (the round-1 regression: hundreds of inlined
    _normalized_for_words copies blowing the 64 KB method limit) raises
    instead of silently running interpreted."""
    prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        df = q("text_profile")
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)
    # the staging must survive Catalyst: normalized text is materialized
    # exactly once (one regexp_replace in the whole physical plan)
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(df, "formatted")
    assert txt.count("regexp_replace(lower(") == 1


def test_q7_dims_broadcast_filters_pushed(q):
    """Q7: both nation-pruned dimension sides broadcast; the date range and
    the two-nation IN reach the scans; one shuffle (the final agg)."""
    df = q("q7_nation_volume")
    assert_broadcast_join(df, 3)
    assert_no_shuffle_join(df)
    assert_filter_pushed(df, "lineitem.parquet",
                         "GreaterThanOrEqual(l_shipdate")
    assert_filter_pushed(df, "nation.parquet", "In(n_name")
    assert_max_shuffles(df, 1)


def test_q19_disjunction_pushed_to_both_scans(q):
    """Q19: Catalyst must extract the OR-of-ANDs into scan-level filters on
    BOTH sides — the quantity disjunction on lineitem, the brand IN on
    part — and broadcast the pruned part side."""
    df = q("q19_disjunctive_revenue")
    assert_filter_pushed(df, "lineitem.parquet", "Or(Or(And(")
    assert_filter_pushed(df, "part.parquet", "In(p_brand")
    assert_broadcast_join(df, 1)
    assert_no_shuffle_join(df)


def test_asof_bucketed_splits_on_time_bucket(q):
    """The skew-safe as-of join's big window must partition on
    (key, _bkt) — the hot key is split across time buckets — and nothing
    may plan as a nested loop."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("events_asof_bucketed"), "formatted")
    assert "_bkt" in txt
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_embedding_nn_ivf_no_cartesian(q):
    """The global-NN scale path must never cross-join the corpus with
    itself: candidates come from an equi-join on cluster_id. The only
    nested-loop allowed is the broadcast-centroid scoring pass."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("embedding_nn_ivf"), "formatted")
    assert "CartesianProduct" not in txt
    # the assignment subtree appears twice (probes + members consume it);
    # both nested loops broadcast the small filtered centroid set, never
    # the corpus — runtime dedupes the shared window Exchange via reuse
    import re
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", txt)) <= 2
    # candidate generation is the bucketed equi-join on cluster_id
    assert "SortMergeJoin" in txt or "ShuffledHashJoin" in txt


def test_q2_argmin_per_group_shape(q):
    """Q2: the part/region filters reach the scans, every dimension is
    broadcast (lineitem is never the build side), the winner is picked by
    rank — at most the offers agg + the window repartition shuffle."""
    df = q("q2_min_cost_supplier")
    assert_filter_pushed(df, "part.parquet", "EqualTo(p_type,LARGE)")
    assert_filter_pushed(df, "region.parquet", "EqualTo(r_name,EUROPE)")
    assert_columns_pruned(df, "lineitem.parquet", 4)
    assert_broadcast_join(df, 2)
    assert_no_shuffle_join(df)
    assert_max_shuffles(df, 2)
    assert_top_k(df)


def test_q9_single_shuffle_profit(q):
    """Q9: the 'red' prefix filter is pushed into the part scan, lineitem
    reads only the 6 needed columns of 11, and the five-table join needs
    exactly one shuffle (the final nation×year aggregate)."""
    df = q("q9_product_profit")
    assert_filter_pushed(df, "part.parquet", "StringStartsWith(p_name,red)")
    assert_columns_pruned(df, "lineitem.parquet", 6)
    assert_no_shuffle_join(df)
    assert_partial_aggregation(df)
    assert_max_shuffles(df, 1)


def test_q11_scalar_threshold_broadcast(q):
    """Q11: the HAVING threshold is a one-row broadcast (never a shuffle
    join); the nation filter is pushed down on both reuses of the base."""
    df = q("q11_important_parts")
    assert_filter_pushed(df, "nation.parquet", "EqualTo(n_name,NATION_1)")
    assert_no_shuffle_join(df)
    assert_partial_aggregation(df)
    assert_max_shuffles(df, 2)      # grouped agg + scalar agg


def test_q12_conditional_agg_one_pass(q):
    """Q12: the date range reaches the lineitem scan (3 of 11 columns
    read) and both CASE counters come out of ONE partial+final aggregate —
    no second join pass per counter."""
    df = q("q12_priority_lines")
    assert_filter_pushed(df, "lineitem.parquet",
                         "GreaterThanOrEqual(l_shipdate")
    assert_columns_pruned(df, "lineitem.parquet", 3)
    assert_partial_aggregation(df)
    assert_max_shuffles(df, 1)


def test_q16_distinct_inside_aggregate(q):
    """Q16: the NOT IN complaint set is a broadcast anti join and the
    distinct-supplier count is a two-phase aggregate (partial distinct),
    never a pre-join .distinct() shuffle of the bridge."""
    df = q("q16_supplier_variety")
    assert_filter_pushed(df, "supplier.parquet", "LessThan(s_acctbal,0.0)")
    assert_filter_pushed(df, "part.parquet", "Not(EqualTo(p_brand,Brand#45))")
    assert_no_shuffle_join(df)
    assert_max_shuffles(df, 2)      # partial-distinct + final agg


def test_q20_semi_join_chain_narrows(q):
    """Q20: every step narrows — part prefix and nation filters pushed,
    the part set semi-joined (broadcast) into lineitem, one grouped
    threshold shuffle, and the supplier probe never shuffles."""
    df = q("q20_heavy_shippers")
    assert_filter_pushed(df, "part.parquet", "StringStartsWith(p_name,red)")
    assert_filter_pushed(df, "nation.parquet", "EqualTo(n_name,NATION_2)")
    assert_filter_pushed(df, "lineitem.parquet",
                         "GreaterThanOrEqual(l_shipdate")
    assert_no_shuffle_join(df)
    assert_max_shuffles(df, 1)


def test_q21_exists_decorrelated_no_loops(q):
    """Q21: both correlated subqueries must decorrelate into joins — no
    per-row nested-loop re-execution of lineitem, and the top-k is a
    TakeOrderedAndProject, never a global sort."""
    from qvarn_mr_spark.plans import explain_str
    df = q("q21_sole_returners")
    txt = explain_str(df, "formatted")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
    assert_top_k(df)


def test_hyperplane_near_dup_bucketed_no_cartesian(q):
    """Cosine-LSH near-dup: candidates must come from the band-bucket
    equi-join — no cross join of the corpus anywhere, and the signature
    pass is a narrow projection (no shuffle below the candidate join)."""
    from qvarn_mr_spark.plans import explain_str
    df = q("embedding_near_dup_lsh")
    txt = explain_str(df, "formatted")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt


def test_sessionize_bucketed_windows_on_time_bucket(q):
    """The skew-safe sessionize's event-scale window must partition on
    (user, _bkt) — a hot user's history is split across buckets; only the
    metadata-sized spine may window on user alone."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("events_sessionize_bucketed"), "formatted")
    assert "_bkt" in txt
    assert "CartesianProduct" not in txt


def test_hll_rollup_partial_aggregates(q):
    """Sketch aggregation must partial-combine map-side like any hash
    aggregate (sketches merge associatively), and the day→type re-merge
    adds one more exchange at most: sketch rollups never reshuffle raw
    rows twice."""
    df = q("events_distinct_users_hll")
    assert_partial_aggregation(df)
    # day-level rollup + type-level merge, PLUS the r12 self-certifying
    # companion: one exact count-distinct pass (expand + final agg — its
    # own two exchanges) joined on the ~5-row type key, and the final
    # orderBy range exchange. 5 total; the SKETCH path alone still
    # contributes only two.
    assert_max_shuffles(df, 5)


def test_theta_funnel_tiny_join(q):
    """The funnel's cross join is 1 row x 1 row (two merged sketches) —
    never a data-scale Cartesian: both sides must be aggregates."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("events_user_funnel_theta"), "formatted")
    assert txt.count("HashAggregate") >= 2


def test_dedup_joins_not_force_broadcast(q):
    """The Jaccard verify joins bring per-document shingle counts back onto
    the pair stream. Those count tables are corpus-cardinality (one row per
    doc) — a forced broadcast there is a driver/executor OOM at 100 TB, so
    the logical plan must carry no hint; AQE may still pick broadcast at
    runtime when the side is genuinely small."""
    from qvarn_mr_spark.plans import assert_no_broadcast_hint
    assert_no_broadcast_hint(q("dedup_jaccard"))
    assert_no_broadcast_hint(q("dedup_corpus"))


def test_semantic_dedup_bucketed_no_cartesian(q):
    """Semantic dedup pairs come from the per-cluster equi-join; the only
    nested-loop allowed is the 1-row broadcast of the centroid set into
    the assignment pass."""
    import re
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("embedding_semantic_dedup"), "formatted")
    assert "CartesianProduct" not in txt
    # centroid broadcast (once per assignment) is the documented exception
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", txt)) <= 2


def test_line_dedup_one_key_shuffle_no_reassembly(q):
    """line_dedup must shuffle distinct line keys (agg + join back), and
    NEVER sort/window the corpus to reassemble documents — the original
    array is filtered in place."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("doc_line_dedup"), "formatted")
    assert "CartesianProduct" not in txt
    assert "Window" not in txt          # no positional reassembly
    assert "Sort [doc_id" not in txt    # no global doc re-sort


def test_bloom_decontaminate_filter_before_verify_join(q):
    """The Bloom membership probe must run as a Filter on the corpus side
    BELOW the exact verify join (map-side pruning), and the packed
    filter must arrive by broadcast."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("doc_decontaminate_bloom"), "formatted")
    assert "getbit" in txt.lower()
    assert "BroadcastExchange" in txt
    assert "CartesianProduct" not in txt


def test_fuzzy_decontaminate_broadcasts_eval_keys(q):
    """Fuzzy decontamination must keep the corpus side map-side: the
    benchmark-bounded eval key set broadcasts (explicit hint — the r4
    no-hint rule covers corpus-cardinality sides only), the corpus's band
    keys come from the per-row Column expression, and no shuffle join
    appears anywhere."""
    from qvarn_mr_spark.plans import assert_no_shuffle_join, explain_str
    df = q("doc_decontaminate_fuzzy")
    assert_no_shuffle_join(df)
    txt = explain_str(df, "simple")
    assert "BroadcastHashJoin" in txt


def test_bigram_surprisal_partial_aggs(q):
    """The bigram LM fit and the per-doc scoring aggregate must both
    map-side combine; the LM tables are persisted (InMemoryTableScan in
    the executed plan), so the corpus is tokenized at most twice."""
    from qvarn_mr_spark.plans import assert_partial_aggregation, explain_str
    df = q("doc_bigram_surprisal")
    assert_partial_aggregation(df)
    df.write.format("noop").mode("overwrite").save()
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in txt


def test_trigram_surprisal_partial_aggs(q):
    """Trigram LM: same contract as the bigram twin one rung deeper —
    map-side combine on the fits and the per-doc scoring aggregate, LM
    tables persisted so each consumer reads one computation."""
    from qvarn_mr_spark.plans import assert_partial_aggregation
    df = q("doc_trigram_surprisal")
    assert_partial_aggregation(df)
    df.write.format("noop").mode("overwrite").save()
    txt = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in txt


def test_mixture_search_broadcasts_grid(q):
    """The (tau x source) fraction grid joins the corpus as a broadcast —
    the |taus|-fold fan-out must happen map-side, never through a shuffle
    join on the corpus."""
    from qvarn_mr_spark.plans import explain_str
    df = q("doc_mixture_search")
    txt = explain_str(df, "simple")
    assert "BroadcastHashJoin" in txt


def test_corpus_dsir_prepare_broadcasts_pick(q):
    """The DSIR stage's k-row pick must come back as a broadcast join —
    the gated corpus is filtered to the selection without a corpus-sized
    shuffle for the semi-join."""
    from qvarn_mr_spark.plans import explain_str
    df = q("corpus_dsir_prepare")
    assert "BroadcastHashJoin" in explain_str(df, "simple")


def test_kmeans_assign_broadcast_argmax_no_sort(q):
    """The fitted-centroid assignment must be the ivf_assign plan shape:
    broadcast centroid side, min_by hash aggregate — partial+final, and
    never a sort-merge join or window sort over the corpus."""
    from qvarn_mr_spark.plans import assert_partial_aggregation, explain_str
    df = q("embedding_kmeans_assign")
    txt = explain_str(df, "simple")
    assert "BroadcastNestedLoopJoin" in txt or "BroadcastExchange" in txt
    assert "SortMergeJoin" not in txt
    assert_partial_aggregation(df)


def test_density_sample_broadcasts_cluster_sizes(q):
    """The k-row cluster-size table joins back as a broadcast — the only
    corpus-sized shuffle in the sampler is the assignment argmax."""
    from qvarn_mr_spark.plans import explain_str
    df = q("embedding_density_sample")
    txt = explain_str(df, "simple")
    assert "BroadcastHashJoin" in txt
    assert "SortMergeJoin" not in txt


def test_perplexity_buckets_scale_path_has_no_window(q):
    """method='thresholds' is the 100 TB form: cut points come from one
    percentile_approx aggregate broadcast back, so the plan has NO
    Window operator (the exact ntile twin pays a per-language sort; the
    scale path must not)."""
    from qvarn_mr_spark.plans import explain_str
    df = q("doc_perplexity_buckets_scale")
    txt = explain_str(df, "simple")
    assert "Window" not in txt
    assert "BroadcastHashJoin" in txt     # the cuts join back broadcast
    exact = explain_str(q("doc_perplexity_buckets"), "simple")
    assert "Window" in exact              # the oracle-parity twin sorts


def test_c4_rules_scan_stage_no_shuffle_no_udf(q):
    """The C4 rule profile is pure Column work: zero exchanges, zero
    Python evals — the gate must cost a scan, nothing more."""
    from qvarn_mr_spark.plans import assert_max_shuffles, explain_str
    df = q("doc_c4_rules")
    assert_max_shuffles(df, 0)
    txt = explain_str(df, "simple")
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_random_project_scan_stage(q):
    """JL projection: literal matrix folded into scan-stage expressions —
    no shuffle, no Python, no join (nothing to broadcast)."""
    from qvarn_mr_spark.plans import assert_max_shuffles, explain_str
    df = q("embedding_random_project")
    assert_max_shuffles(df, 0)
    txt = explain_str(df, "simple")
    assert "Join" not in txt
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_pca_project_scan_stage(q):
    """PCA projection with a committed model is scan-stage JVM work —
    the one-pass fit happened offline; the projection plan must show
    no shuffle and no Python eval."""
    from qvarn_mr_spark.plans import assert_max_shuffles, explain_str
    df = q("embedding_pca")
    assert_max_shuffles(df, 0)
    txt = explain_str(df, "simple")
    assert "BatchEvalPython" not in txt and "ArrowEvalPython" not in txt


def test_triangle_count_no_cartesian(q):
    """The wedge join must be an equi-join on x and the closure an
    equi-join on (b, c) — never a cartesian/nested-loop product."""
    from qvarn_mr_spark.plans import explain_str
    txt = explain_str(q("graph_triangles"), "simple")
    assert "CartesianProduct" not in txt
    assert "BroadcastNestedLoopJoin" not in txt
