"""The runtime plan guard: scale-killing shapes raise BEFORE any job
runs; healthy declared plans pass with accurate facts."""

import pytest
from pyspark.sql import functions as F

from vector_db_ingestor_spark.plans import (
    PlanViolation,
    assert_scalable,
    plan_report,
)
from vector_db_ingestor_spark.queries import QUERIES
from vector_db_ingestor_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_cartesian_product_is_rejected(spark):
    a = load_table(spark, SF_DIR, "nation")
    b = load_table(spark, SF_DIR, "region")
    theta = a.crossJoin(b).filter(F.col("n_nationkey") > F.col("r_regionkey"))
    with pytest.raises(PlanViolation, match="NestedLoop|Cartesian"):
        assert_scalable(theta)


def test_healthy_topk_passes_with_facts(spark):
    df = QUERIES["q_topk_cosine"](spark, SF_DIR)
    facts = assert_scalable(df, max_shuffles=1)
    assert facts["take_ordered"]
    assert not facts["nested_loop"] and not facts["cartesian"]


def test_python_eval_cap_enforced(spark):
    docs = load_table(spark, SF_DIR, "documents")

    @F.udf("int")
    def plus1(x):
        return (x or 0) + 1

    # three CHAINED row-UDF stages with barriers Catalyst cannot
    # collapse (each feeds a python eval of the previous eval's output)
    df = docs.select(plus1(F.col("n_chars")).alias("a"))
    df = df.select(plus1(F.col("a")).alias("b"), F.col("a"))
    df = df.filter(F.col("b") > 0).select(plus1(F.col("b")).alias("c"))
    report = plan_report(df)
    if report["python_evals"] > 2:  # Catalyst version-dependent fusion
        with pytest.raises(PlanViolation, match="Python eval"):
            assert_scalable(df)
    else:
        assert_scalable(df)  # fused below the cap: acceptable plan


def test_global_window_detection(spark):
    ev = load_table(spark, SF_DIR, "events")
    from pyspark.sql import Window

    unpart = ev.withColumn(
        "rk", F.row_number().over(Window.orderBy("ts"))
    )
    assert plan_report(unpart)["global_windows"] >= 1
    with pytest.raises(PlanViolation, match="unpartitioned Window"):
        assert_scalable(unpart, forbid_global_window=True)

    part = ev.withColumn(
        "rk", F.row_number().over(Window.partitionBy("user_id").orderBy("ts"))
    )
    assert plan_report(part)["global_windows"] == 0
    assert_scalable(part, forbid_global_window=True)


def test_stateful_pandas_stage_counts_once(spark):
    """ADVICE r11: substring counting made every
    FlatMapGroupsInPandasWithState line ALSO count as a
    FlatMapGroupsInPandas — one stateful op plus one mapInPandas
    reported 3 python evals and tripped the default cap.  Node names
    are now matched whole, line-anchored."""
    from vector_db_ingestor_spark.plans.guard import plan_report as pr

    # synthesize the two plan texts rather than standing up a
    # streaming query: the counter is a pure function of the plan
    # string (same entry point plan_report uses internally)
    import vector_db_ingestor_spark.plans.guard as guard

    fake_plan = "\n".join([
        "*(1) Project [a]",
        "+- FlatMapGroupsInPandasWithState [grp], state=...",
        "   +- MapInPandas f(x)",
        "      +- Exchange hashpartitioning(grp, 32)",
    ])
    orig = guard._physical_plan
    guard._physical_plan = lambda df: fake_plan
    try:
        facts = pr(None)
    finally:
        guard._physical_plan = orig
    assert facts["python_evals"] == 2  # not 3: WithState counts once


def test_shuffle_budget(spark):
    ev = load_table(spark, SF_DIR, "events")
    agg = ev.groupBy("event_type").count()
    facts = assert_scalable(agg, max_shuffles=1)
    assert facts["shuffles"] <= 1
    with pytest.raises(PlanViolation, match="shuffle"):
        assert_scalable(agg.repartition(7).groupBy("event_type").count(),
                        max_shuffles=1)
