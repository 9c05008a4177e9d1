"""SparkSession factory.

Settings chosen for oracle parity and scale:

* ``spark.sql.session.timeZone=UTC`` — DuckDB timestamps are UTC-naive;
  pinning the session TZ makes timestamp comparisons exact.
* ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver's
  ``events.parquet`` carries TIMESTAMP(NANOS); Spark reads it as long
  nanos and :mod:`vector_db_ingestor_spark.tables` converts to
  microsecond timestamps (identical to DuckDB's ns->us truncation).
* AQE on (+ skew-join handling) — at 100 TB the runtime re-plan picks
  broadcast joins and splits skewed partitions; it is free locally.
* shuffle partitions default to the local core count — at cluster scale
  this would be ~2-3x total executor cores; AQE coalesces the excess.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vector_db_ingestor_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # start shuffles 4x wider than the core count and let AQE
        # coalesce back to the advisory size: small shuffles end up at
        # the same effective parallelism, while heavy wide-row shuffles
        # (e.g. corpus-wide shingle aggregation) stop crossing the
        # per-partition spill threshold as input grows — measured 3x on
        # dedup_passage's 100x leg (SCALE_PROBE round-12 A/B: 34.0s at
        # 32 fixed partitions vs 11.1s at 128)
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(4 * shuffle_partitions),
        )
        # without this, AQE cannot coalesce under a persist()ed subtree
        # (cached plan output partitioning is frozen by default), so
        # the wide initial shuffles above would stay wide wherever a
        # plan caches an intermediate — measured 3x on the bigram-LM
        # scorer's cached dtf (6.2s vs 2.3s at fixture scale) with no
        # effect on any uncached plan
        .config(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
            "true",
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        # the console progress bar shares bench.py's stdout tail window
        # (the driver parses the LAST 2000 bytes): a \r-fragment before
        # the summary line eats budget the line needs — observed ~67B
        # in the r12 record.  Purely cosmetic locally; off everywhere.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
