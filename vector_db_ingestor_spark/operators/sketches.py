"""Mergeable KMV distinct-count sketch — the production topology.

The declared/queued sketch QUERY pairs (``q_sketch_kmv`` /
``q_sketch_linear`` / ``q_sketch_cms`` / ``q_sketch_bloom`` in
:mod:`vector_db_ingestor_spark.queries`) are evidence-shaped: one
closed-form plan per key whose every cell is hash-checkable against the
DuckDB oracle.  Their per-stratum exact-k-smallest step is a window sort
over the full DISTINCT element set — correct and spill-safe, but it
shuffles every distinct element once, which is exactly the pass a
100 TB sketch exists to avoid.

This module is the topology those docstrings promise ("sketch per
partition and merge driver-side — k longs per partition"):

* :func:`kmv_partition_candidates` — ONE linear scan, no shuffle:
  each input partition streams through an Arrow ``mapInPandas`` stage
  that keeps the k smallest distinct 48-bit hashes seen so far (bounded
  state: one k-element array per task, whatever the partition size) and
  emits at most k rows when the partition is exhausted.
* :func:`kmv_merge_candidates` — associative merge: the k smallest of
  the union of candidate sets.  k·P candidate rows in, ≤k out; merging
  sketches of disjoint (or overlapping!) element streams equals
  sketching the union, so per-partition / per-day / per-shard sketches
  roll up without rescanning history — the HLL-union property
  (``tests/test_operators.py::test_hll_sketches_merge_exactly``) for an
  exact-k-minimum sketch the engine fully owns.
* :func:`kmv_estimate` — the ``q_sketch_kmv`` readout rule over a merged
  candidate set: ``(k-1) * 2^48 / kth_min`` in milli-units; a stream
  with fewer than k distinct elements reports its EXACT count (the
  candidate set then IS the distinct set).

Why mapInPandas and not built-ins: Spark has no exact per-partition
k-minimum aggregate (``hll_sketch_agg`` is approximate-by-register;
window ``row_number`` requires the full sort this avoids), so this is
the documented escalation — a custom stateful per-partition operator as
an Arrow-batched kernel, never row-at-a-time Python.

Hash contract: the 48-bit prefix of ``md5('kmv:' || element)`` —
bit-identical to ``q_sketch_kmv``'s column expression and its DuckDB
oracle, pinned by ``tests/test_sketches.py`` (the streamed sketch must
reproduce the window plan's kth hash exactly).

When to use which (measured, SCALE_PROBE round-12 KMV probe): the
streamed form pays a fixed Arrow round-trip the JVM ``distinct`` form
doesn't, so BELOW ~100x-sf0.1 corpus scale the shuffle-bearing exact
form is cheaper; the streamed slope is scan-only (1.39 at 100x/30x vs
2.66 with the shuffle) and the legs cross at the 100x point — above
it, and wherever sketches must persist and merge incrementally, use
this module.

Sizing k (VERDICT r12 #7): KMV's relative standard error is
``~1/sqrt(k-2)`` (Beyer et al., "On Synopses for Distinct-Value
Estimation Under Multiset Operations", SIGMOD 2007), independent of
stream size — pick k from the error you can tolerate, pay k longs per
partition in state and k·P rows into the merge:

    k      rse     ~95% bound   state/partition
    64     ~13%    ±25%         512 B
    256    ~6.3%   ±13%         2 KiB
    1024   ~3.1%   ±6%          8 KiB
    4096   ~1.6%   ±3%          32 KiB
    16384  ~0.8%   ±1.6%        128 KiB

Streams with fewer than k distinct hashes report exactly (per-hash —
see :func:`kmv_estimate` on the 48-bit collision caveat), so k also
sets the exact/estimate crossover.  At 100 TB / 10k partitions even
k=16384 merges only ~160M longs (~1.3 GB) — still candidate-scale,
but prefer a tree merge (per-shard ``kmv_merge_candidates``, then
merge the merges) past ~10^4 partitions so no single task unions the
full candidate set.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KMV_SALT = "kmv:"
HASH_SPACE = float(2**48)


def _hash48(col) -> "F.Column":
    """48-bit salted md5 prefix as BIGINT — the exact expression
    ``q_sketch_kmv`` and its oracle share (queries.py)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(KMV_SALT), col)), 1, 12), 16, 10
        )
        .cast("long")
    )


def hash48_py(element: str) -> int:
    """Python twin of :func:`_hash48` for tests and driver-side probes."""
    return int(
        hashlib.md5((KMV_SALT + element).encode()).hexdigest()[:12], 16
    )


def kmv_partition_candidates(
    df: DataFrame, element_col: str, k: int = 64
) -> DataFrame:
    """Per-partition KMV candidates in ONE linear pass, zero shuffles.

    The element column is hashed JVM-side (vectorized md5), then each
    partition streams through a bounded-state Arrow kernel: a running
    set of the ≤k smallest distinct hashes, updated per batch with a
    vectorized unique-then-truncate (never per row), emitted once at
    partition end.  Output is ≤ k rows per input partition — the "k
    longs per partition" the sketch family's 100 TB story ships to the
    merge, instead of shuffling the full distinct element set.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # NULL elements hash to NULL (concat semantics) and can't be a
    # minimum — drop them JVM-side so the kernel sees clean int64
    hashed = df.select(_hash48(F.col(element_col)).alias("h")).filter(
        F.col("h").isNotNull()
    )

    def keep_k_smallest(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        best = np.empty(0, dtype=np.int64)
        for b in batches:
            if len(b) == 0:
                continue
            best = np.unique(
                np.concatenate([best, b["h"].to_numpy(dtype=np.int64)])
            )[:k]
        yield pd.DataFrame({"h": best})

    return hashed.mapInPandas(keep_k_smallest, "h long")


def kmv_merge_candidates(candidates: DataFrame, k: int = 64) -> DataFrame:
    """The k smallest DISTINCT hashes of a union of candidate sets.

    Associative and idempotent: merging per-partition, per-day, or
    per-shard candidate outputs (even over overlapping element streams)
    equals sketching the union directly, so sketches persist and roll
    up incrementally.  Input is candidate-scale (k·P rows), so the
    distinct + ordered-limit here moves k·P longs, not corpus data.
    """
    return candidates.select("h").distinct().orderBy("h").limit(k)


def kmv_estimate(
    spark: SparkSession, merged: DataFrame, k: int = 64
) -> DataFrame:
    """``q_sketch_kmv``'s readout over a merged candidate set: one row
    ``(k_used, kth_hash, est_milli)``.  ``k_used < k`` means the stream
    had fewer than k distinct HASHES, so the candidate set is the whole
    distinct hash set and the report is exact *per hash* — under a
    48-bit collision two elements share one hash and the small-set
    readout undercounts by the collision multiplicity (the window-form
    query ``q_sketch_kmv`` reports exact_distinct over ELEMENTS, so the
    two diverge exactly there; bit-identity between the forms covers
    the kth-hash estimation path, not element-exactness).  Otherwise
    the kth minimum estimates density:
    ``floor(1000 * (k-1) * 2^48 / kth)``.  The candidate set is
    sketch-scale (≤k rows) — collecting it is driver-model state, not a
    data-path collect."""
    rows = merged.orderBy("h").collect()
    k_used = len(rows)
    kth = rows[-1]["h"] if rows else None
    if k_used < k:
        est = k_used * 1000
    elif kth == 0:
        # kth is the LARGEST of the k smallest distinct hashes; it can
        # only be 0 if k == 1 and the single candidate hashes to 0 (the
        # salt is public, so such an element is constructible).  Density
        # "everything below 0" is undefined — refuse loudly instead of
        # ZeroDivisionError.
        raise ValueError(
            "kmv_estimate: kth minimum hash is 0 (k == 1 with a "
            "zero-hash element); the density estimate is undefined — "
            "use k >= 2"
        )
    else:
        est = int(1000.0 * (k_used - 1) * HASH_SPACE / kth)
    return spark.createDataFrame(
        [(k_used, kth, est)],
        "k_used long, kth_hash long, est_milli long",
    )


def kmv_distinct_milli(
    spark: SparkSession, df: DataFrame, element_col: str, k: int = 64
) -> DataFrame:
    """End-to-end: partition candidates → merge → estimate.  One linear
    scan of ``df``, one candidate-scale merge, one sketch-scale readout
    — the full-corpus distinct count without a corpus-wide shuffle."""
    return kmv_estimate(
        spark,
        kmv_merge_candidates(
            kmv_partition_candidates(df, element_col, k), k
        ),
        k,
    )
