"""Incremental rollup maintenance: refresh processes ONLY unseen
partitions, re-runs are no-ops, serve() merges partials to exactly the
direct aggregate over all history (HLL distinct merged exactly —
register-wise union — per the pinned mergeability contract)."""

import os

from pyspark.sql import functions as F

from vector_db_ingestor_spark.operators.rollup import (
    list_source_partitions,
    processed_partitions,
    refresh_rollup,
    serve_rollup,
)
from vector_db_ingestor_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"


def _direct(ev):
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias(
                "approx_users"
            ),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_rollup_incremental_exactly_once(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    days = sorted(r.day for r in ev.select("day").distinct().collect())
    assert len(days) >= 3
    src = str(tmp_path / "events")
    state = str(tmp_path / "state")

    # land the first two days, refresh
    ev.filter(F.col("day").isin(days[:2])).write.partitionBy("day").mode(
        "overwrite"
    ).parquet(src)
    assert sorted(refresh_rollup(
        spark, src, state, ["event_type"]
    )) == days[:2]
    got = _rows(serve_rollup(spark, state, ["event_type"]))
    want = _rows(_direct(ev.filter(F.col("day").isin(days[:2])).drop("day")))
    assert got == want

    # append one more day: ONLY it is processed
    ev.filter(F.col("day") == days[2]).write.partitionBy("day").mode(
        "append"
    ).parquet(src)
    assert refresh_rollup(spark, src, state, ["event_type"]) == [days[2]]
    got = _rows(serve_rollup(spark, state, ["event_type"]))
    want = _rows(_direct(ev.filter(F.col("day").isin(days[:3])).drop("day")))
    assert got == want

    # already current: refresh is a no-op
    assert refresh_rollup(spark, src, state, ["event_type"]) == []
    assert processed_partitions(state) == days[:3]
    assert list_source_partitions(src) == days[:3]

    # serve never touches event history: partials only
    n_partial_rows = spark.read.parquet(
        os.path.join(state, "partials")
    ).count()
    n_events = ev.filter(F.col("day").isin(days[:3])).count()
    assert n_partial_rows < n_events / 10
