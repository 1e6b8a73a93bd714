"""Plan-shape regression net over the whole registered query surface.

Builds the physical plan of every ``queries()`` entry at sf0.001 and
asserts no unpartitioned cartesian product sneaks in — the one join
shape that is always wrong at scale. (Bounded broadcast cross joins —
the 1-row scalar in stim_normalize, the documented brute-force ANN
baseline — plan as BroadcastNestedLoopJoin and are allowed.)
"""

from __future__ import annotations

import sys

from tests.conftest import SF001


def test_no_cartesian_product_in_any_registered_query(spark):
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    from tools.audit_plans import PYTHON_ALLOWED

    failures = []
    for name, fn in entry.queries().items():
        try:
            df = fn(spark, SF001)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # a query that cannot even plan is a bug
            failures.append(f"{name}: failed to plan ({exc})")
            continue
        if "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
        n_py = plan.count("EvalPython") + plan.count("InPandas")
        if n_py and name not in PYTHON_ALLOWED:
            failures.append(f"{name}: unexpected Python/Arrow stage")
    assert not failures, "\n".join(failures)


def _plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pipeline_plan_has_exactly_one_channel_exchange(spark):
    """PLANS.md's headline claim, pinned: the whole native pipeline
    (smooth → envelopes → diastolic → peaks → attributes) shares ONE
    channel exchange; every window stage reuses or in-partition
    re-sorts that distribution. Since round 12 that single exchange is
    RANGE partitioning (one channel per partition — the straggler fix,
    PLANS.md "Round-12 channel partitioning"); rangepartitioning
    satisfies the windows' ClusteredDistribution, so ANY
    hashpartitioning exchange appearing means someone broke the
    shared-partitioning discipline."""
    from myodish_peak_analysis_spark.api import PeakPipeline
    from myodish_peak_analysis_spark.schema import signal_frame
    from tests.conftest import SF001

    sig = signal_frame(spark, SF001, n_channels=1)
    pipe = (
        PeakPipeline(sig)
        .smooth()
        .envelopes()
        .diastolic()
        .detect_peaks()
        .attributes()
    )
    plan = _plan_of(pipe.df if hasattr(pipe, "df") else pipe)
    n_ex = (
        plan.count("Exchange")
        - plan.count("BroadcastExchange")
        - plan.count("ReusedExchange")
    )
    # n_channels=1 degenerates rangepartitioning(1) to SinglePartition,
    # so the pin is structural: ONE shuffle total, and it is never the
    # hash partitioner the round-12 fix replaced.
    assert n_ex == 1, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 0, plan[:2000]
    multi = signal_frame(spark, SF001, n_channels=2)
    mplan = _plan_of(
        (lambda p: p.df if hasattr(p, "df") else p)(
            PeakPipeline(multi).smooth().envelopes()
        )
    )
    assert mplan.count("Exchange rangepartitioning") == 1, mplan[:2000]
    assert mplan.count("Exchange hashpartitioning") == 0, mplan[:2000]


def test_stratified_sample_plan_is_exchange_free(spark):
    """The multiplicative-hash keep/drop decision must stay in the scan
    stage: zero exchanges of any kind (PLANS.md's zero-movement claim)."""
    from myodish_peak_analysis_spark.llm.sampling import stratified_sample
    from myodish_peak_analysis_spark.schema import read_table
    from tests.conftest import SF001

    plan = _plan_of(stratified_sample(read_table(spark, SF001, "documents")))
    assert "Exchange" not in plan, plan[:2000]


def test_blocklist_filter_corpus_never_shuffles(spark):
    """LEFT ANTI by content hash: the corpus side must be filtered
    map-side against a broadcast — no hashpartitioning exchange."""
    from myodish_peak_analysis_spark.llm.dedup import blocklist_filter
    from myodish_peak_analysis_spark.schema import read_table
    from tests.conftest import SF001

    from pyspark.sql import functions as F

    docs = read_table(spark, SF001, "documents")
    block = docs.limit(5).select(F.md5("text").alias("text_hash"))
    plan = _plan_of(blocklist_filter(docs, block))
    assert "Exchange hashpartitioning" not in plan, plan[:2000]


def test_round5_plan_shapes(spark):
    """Round-5 claims pinned: Q10 ranks via distributed TakeOrdered
    (never a global Sort+Limit materialization), the bloom blocklist's
    joins are all broadcast (the corpus never shuffles), and the Q6
    aggregate has no Exchange except the final single-row merge."""
    from myodish_peak_analysis_spark.operators.relational import (
        forecast_revenue_change,
        top_loss_customers,
    )
    from myodish_peak_analysis_spark.llm.dedup import blocklist_filter_bloom
    from myodish_peak_analysis_spark.schema import read_table
    from tests.conftest import SF001

    li = read_table(spark, SF001, "lineitem")
    plan = _plan_of(
        top_loss_customers(
            read_table(spark, SF001, "customer"),
            read_table(spark, SF001, "orders"),
            li,
            read_table(spark, SF001, "nation"),
        )
    )
    assert "TakeOrderedAndProject" in plan

    docs = read_table(spark, SF001, "documents")
    bad = docs.limit(5).selectExpr("md5(text) AS text_hash")
    plan = _plan_of(blocklist_filter_bloom(docs, bad))
    assert "BroadcastHashJoin" in plan
    # no shuffle of the corpus: no hash/range repartition anywhere —
    # the only allowed exchanges are the broadcasts themselves and the
    # SinglePartition merges building the tiny bucket/blocklist sides
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan

    plan = _plan_of(forecast_revenue_change(li))
    # scan-agg: one partial agg, one final agg, one single-partition
    # exchange between them; no join operators at all
    assert "Join" not in plan


def test_topk_per_group_plan_has_partial_window_group_limit(spark):
    """The skew-safety contract of the default (optimizer-route)
    topk_per_group: Spark must plant a PARTIAL WindowGroupLimit below
    the exchange so each map task ships <= k rows per group. If an
    engine change drops the rewrite, this fails and the salted
    two-phase form (salt=N) becomes the default again — see
    tools/bench_skew.py for the measurement that justified the switch."""
    from myodish_peak_analysis_spark.operators.analytics import topk_per_group
    from myodish_peak_analysis_spark.schema import read_table
    from tests.conftest import SF001

    docs = read_table(spark, SF001, "documents")
    plan = _plan_of(topk_per_group(docs, "source", "n_chars", "doc_id", k=5))
    assert "WindowGroupLimit" in plan and "Partial" in plan, plan[:2000]


def test_relational_broadcast_hints_only_on_bounded_frames():
    """Policy guard (round 7): explicit ``F.broadcast()`` hints in the
    TPC-H-shaped operators are allowed ONLY on frames whose size is
    SF-INDEPENDENT — nation/region (25/5 rows at every SF) and scalar/
    per-group aggregates. Hints on customer/supplier/part-derived
    frames (including filtered subsets: one segment, one brand) are
    scale bugs: the rel scaling decade measured them as the only two
    sub-0.8x ops in the family (nation_revenue 0.36x, top_revenue
    0.56x at 100x), and a controlled 100x A/B showed AQE-chosen
    strategies strictly beat the hard hint (40.2s vs 36.3s) while the
    hint OOMs outright at warehouse scale. Adding a new hint requires
    updating this allowlist with a boundedness argument."""
    import ast

    path = "myodish_peak_analysis_spark/operators/relational.py"
    src = open(path).read()
    allowed = {
        # nation x region: 25 x 5 rows at every SF
        'nation.join( region.filter(F.col("r_name") == region_name),'
        " nation.n_regionkey == region.r_regionkey,"
        ' ).select("n_nationkey", "n_name")',
        # the 25-row nation dim, bare or projected
        "nation",
        'nation.select("n_nationkey", "n_name")',
        # per-segment average balance: <= |segments| rows
        'seg.filter(F.col("_bal_c") > 0) .groupBy("c_mktsegment")'
        ' .agg(F.avg("_bal_c").alias("_avg_c"))',
        # global-max scalar: 1 row (mx = rev.agg(max(_rev_c)))
        "mx",
    }
    seen = []
    for node in ast.walk(ast.parse(src)):
        if (
            isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr == "broadcast"
        ):
            seen.append(" ".join(ast.get_source_segment(src, node.args[0]).split()))
    assert seen, "expected bounded-dim broadcast hints to exist"
    rogue = [s for s in seen if s not in allowed]
    assert not rogue, (
        "broadcast() hint on a frame not in the bounded allowlist "
        f"(SF-growing side? justify + update the list): {rogue}"
    )
