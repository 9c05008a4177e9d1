"""Mergeable KMV sketch operator (operators/sketches.py) — the
production topology behind the q_sketch_kmv query pair: per-partition
bounded-state candidates, associative merge, q_sketch_kmv readout rule.
"""

import pytest
from pyspark.sql import functions as F

from vector_db_ingestor_spark.operators.sketches import (
    hash48_py,
    kmv_distinct_milli,
    kmv_estimate,
    kmv_merge_candidates,
    kmv_partition_candidates,
)
from vector_db_ingestor_spark.tables import load_table


def _bigrams(spark, sf_dir):
    """The q_sketch_kmv element stream: distinct-able word bigrams."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != "")
    return (
        docs.select(ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("ws"), i),
                        F.element_at(F.col("ws"), i + 1),
                    ),
                )
            ).alias("t")
        )
    )


def test_streamed_sketch_equals_exact_window_form(spark, sf_dir):
    """The mapInPandas kernel must reproduce the window plan's k
    smallest distinct hashes EXACTLY (same salt, same 48-bit md5
    prefix) — the streamed production shape and the hash-checked query
    pair are one contract, not two sketches that happen to agree."""
    elems = _bigrams(spark, sf_dir)
    k = 64
    streamed = [
        r["h"]
        for r in kmv_merge_candidates(
            kmv_partition_candidates(elems, "t", k), k
        ).collect()
    ]
    exact = [
        r["h"]
        for r in elems.select(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("kmv:"), F.col("t"))), 1, 12
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h")
        )
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    ]
    assert streamed == exact and len(streamed) == k


def test_merge_of_split_streams_equals_union_sketch(spark):
    """Associativity: sketch(A) merged with sketch(B) == sketch(A∪B),
    with A and B OVERLAPPING (the union must dedup, not double-keep) —
    the property that lets per-day/per-shard sketches roll up without
    rescanning history."""
    k = 16
    a = spark.createDataFrame([(f"e{i}",) for i in range(300)], "t string")
    b = spark.createDataFrame(
        [(f"e{i}",) for i in range(150, 450)], "t string"
    )
    both = a.unionByName(b)
    merged = kmv_merge_candidates(
        kmv_partition_candidates(a, "t", k).unionByName(
            kmv_partition_candidates(b, "t", k)
        ),
        k,
    )
    direct = kmv_merge_candidates(kmv_partition_candidates(both, "t", k), k)
    assert [r["h"] for r in merged.collect()] == [
        r["h"] for r in direct.collect()
    ]


def test_candidates_bounded_per_partition(spark):
    """The scale contract: each input partition emits at most k rows
    (k longs per partition to the merge), however many rows it holds."""
    k = 8
    df = spark.createDataFrame(
        [(f"x{i}",) for i in range(5000)], "t string"
    ).repartition(4)
    cands = kmv_partition_candidates(df, "t", k)
    per_part = cands.groupBy(F.spark_partition_id().alias("p")).count()
    assert all(r["count"] <= k for r in per_part.collect())
    assert cands.count() <= 4 * k


def test_small_stream_reports_exact_count(spark):
    """Fewer than k distinct elements → the candidate set IS the
    distinct set and the readout is exact (est = n * 1000), including
    duplicate and NULL elements."""
    k = 64
    rows = [("a",), ("b",), ("c",), ("a",), (None,)]
    df = spark.createDataFrame(rows, "t string")
    out = kmv_distinct_milli(spark, df, "t", k).first()
    assert out["k_used"] == 3
    assert out["est_milli"] == 3000
    assert out["kth_hash"] == max(hash48_py(t) for t in ("a", "b", "c"))


def test_estimate_rule_matches_query_pair(spark, sf_dir):
    """Full-sketch readout: floor(1000 * (k-1) * 2^48 / kth) — the
    q_sketch_kmv milli-encoding — and within 15% of the true distinct
    count on the fixture bigrams (k=64 KMV's ~1/sqrt(k-1) ≈ 13% s.d.)."""
    elems = _bigrams(spark, sf_dir)
    k = 64
    out = kmv_distinct_milli(spark, elems, "t", k).first()
    truth = elems.distinct().count()
    if out["k_used"] < k:
        pytest.skip("fixture too small for a full sketch at k=64")
    assert out["est_milli"] == int(
        1000.0 * (k - 1) * float(2**48) / out["kth_hash"]
    )
    assert abs(out["est_milli"] / 1000.0 - truth) / truth < 0.15


def test_zero_kth_hash_refused_not_zerodivision(spark):
    """ADVICE r12: a full sketch whose kth minimum hash is 0 (only
    reachable at k=1 with an element whose salted 48-bit md5 prefix is
    0 — constructible, the salt is public) must raise a descriptive
    error, not ZeroDivisionError."""
    merged = spark.createDataFrame([(0,)], "h long")
    with pytest.raises(ValueError, match="kth minimum hash is 0"):
        kmv_estimate(spark, merged, k=1)
