"""Table loaders for the driver's synthetic parquet fixtures.

``load_table`` is the single entry point every query uses: a plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown / column
pruning / partition pruning on the scan.  The one normalization is the
``events`` table, whose parquet footer declares TIMESTAMP(NANOS):
with ``spark.sql.legacy.parquet.nanosAsLong`` the column arrives as long
nanoseconds and is converted here to a microsecond timestamp via integer
division (truncation — bit-identical to DuckDB's TIMESTAMP_NS ->
TIMESTAMP cast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # the driver's session may not carry this config; it is runtime-settable
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # `/` would be DOUBLE division: int64 nanos exceed a double's
        # 53-bit mantissa, so the quotient can round UP one microsecond.
        # `div` is exact integer division = DuckDB's ns->us truncation.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use).

    Memoized per (session, sf_dir): many SQL-surface queries call this
    and re-registering ten views per query is pure analyzer overhead.
    """
    key = "_vdb_registered_sf_dir"
    registry = getattr(spark, key, None)
    if registry == sf_dir:
        return
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    try:
        setattr(spark, key, sf_dir)
    except AttributeError:  # pragma: no cover - slotted session impls
        pass
