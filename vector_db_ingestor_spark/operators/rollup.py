"""Incremental aggregate maintenance — the materialized-view pattern
for append-only partitioned data.

A 100 TB event store is appended in partitions (day=..., batch=...);
re-aggregating the whole history on every refresh is O(history) per
day and is how dashboards die.  The standard fix: keep PER-PARTITION
PARTIAL aggregates of mergeable measures, process only partitions the
manifest has not seen, and serve final results by merging the (tiny)
partials.  Everything here is mergeable by construction — counts and
sums add, min/max fold, and distinct users ride as a datasketches HLL
binary column that merges register-wise (exactness of that merge is
pinned by tests/test_operators.py::test_hll_sketches_merge_exactly).

Exactly-once without a transaction log: each refresh OVERWRITES the
partial for a partition (idempotent — a re-run of the same partition
converges to the same bytes) and the manifest is committed by atomic
rename AFTER the partials land, so a crash between the two replays
the partition instead of losing it.

Scale notes: a refresh reads only the NEW partitions (partition
pruning via the source layout); serve() reads only partials —
O(partitions x groups) rows, not O(events).  The partial schema is
the classic map-side-combine shape promoted to storage.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(state_dir: str) -> str:
    return os.path.join(state_dir, "_manifest.json")


def processed_partitions(state_dir: str) -> list[str]:
    try:
        with open(_manifest_path(state_dir)) as fh:
            return sorted(json.load(fh)["partitions"])
    except (OSError, json.JSONDecodeError, KeyError):
        return []


def list_source_partitions(source_dir: str, key: str = "day") -> list[str]:
    """Partition values present in an append-only ``key=value`` layout."""
    try:
        names = os.listdir(source_dir)
    except OSError:
        return []
    pre = f"{key}="
    return sorted(n[len(pre):] for n in names if n.startswith(pre))


def refresh_rollup(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    group_cols: list[str],
    value_col: str = "value",
    distinct_col: str = "user_id",
    partition_key: str = "day",
) -> list[str]:
    """Process every source partition the manifest has not seen: write
    a per-partition partial-aggregate parquet (idempotent overwrite),
    then commit the manifest atomically.  Returns the partitions
    processed this call (empty = the rollup was already current)."""
    done = set(processed_partitions(state_dir))
    todo = [p for p in list_source_partitions(source_dir, partition_key) if p not in done]
    for p in todo:
        part = spark.read.parquet(
            os.path.join(source_dir, f"{partition_key}={p}")
        )
        partial = part.groupBy(*group_cols).agg(
            F.count("*").alias("n_rows"),
            F.sum(value_col).alias("sum_value"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
            F.hll_sketch_agg(distinct_col).alias("users_hll"),
        )
        partial.write.mode("overwrite").parquet(
            os.path.join(state_dir, "partials", f"{partition_key}={p}")
        )
    if todo:
        os.makedirs(state_dir, exist_ok=True)
        tmp = _manifest_path(state_dir) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"partitions": sorted(done | set(todo))}, fh)
        os.replace(tmp, _manifest_path(state_dir))
    return todo


def serve_rollup(
    spark: SparkSession, state_dir: str, group_cols: list[str]
) -> DataFrame:
    """Final-merge the stored partials: counts and sums add, min/max
    fold, the HLL sketches union register-wise.  Reads O(partitions x
    groups) rows — never the event history."""
    partials = spark.read.parquet(os.path.join(state_dir, "partials"))
    return partials.groupBy(*group_cols).agg(
        F.sum("n_rows").alias("n_rows"),
        F.round(F.sum("sum_value"), 2).alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
        F.hll_sketch_estimate(F.hll_union_agg("users_hll")).alias("approx_users"),
    )
