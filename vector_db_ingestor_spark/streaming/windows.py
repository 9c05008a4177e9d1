"""Structured Streaming surface.

The reference is batch-only (SURVEY §2A: "no streaming"); these are the
streaming-shaped extensions the north star allows: continuous ingestion
and windowed event aggregation.  Batch/stream parity is deliberate —
``q_stream_tumbling`` runs the same logical plan in batch mode for the
DuckDB oracle, and :func:`tumbling_counts` builds it for either a batch
or a streaming DataFrame (Spark's unified API: the plan is identical,
only the source/sink differ).

At scale: watermark bounds state (late events beyond 10 minutes are
dropped); the shuffle for the window agg is keyed by (window,
event_type) — naturally balanced since windows rotate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


EVENTS_SCHEMA = (
    "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window per-type counts/sums; works on batch and
    streaming inputs alike."""
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window per-type counts/sums (each event lands in
    window/slide overlapping windows); batch and streaming alike.

    At scale the fan-out factor is window/slide — keep it small (2 here)
    so the pre-aggregation stays map-side; for large ratios aggregate to
    slide-granularity buckets first, then roll buckets into windows.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows: events closer than ``gap`` merge into
    one session (Spark's merge is strict — a gap of exactly ``gap``
    starts a new session, since window end is exclusive).

    Batch mode this is a shuffle on ``key_col`` + sort-merge of
    overlapping intervals; under Structured Streaming the same plan runs
    with state bounded by the watermark.
    """
    src = events
    if watermark is not None:
        src = src.withWatermark("ts", watermark)
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), key_col)
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            "n_events",
            "total_value",
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes its event time, so state is
    O(keys per watermark horizon) instead of O(all keys ever) — the
    difference between a dedup that runs forever and one that OOMs.

    Guarantees: duplicates arriving within the watermark horizon of the
    first occurrence are dropped; a duplicate arriving later than the
    horizon may re-emit (at-least-once dedup).  For exactly-once
    content-level dedup against ALL history, use the
    ``stream_ingest_dedup`` sink-side anti-join instead — this operator
    is the in-flight, infinite-stream half of that story.

    Works on batch inputs too (plain dropDuplicates) so the oracle can
    check the batch shape.
    """
    keys = keys or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(keys)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def _ts_unit_from_footer(path: str) -> str:
    """Sniff the parquet physical unit of the ``ts`` column (``'ns'``,
    ``'us'``, ``'ms'`` or ``'s'``) from the footers of EVERY file under
    ``path``.  Fixture generators have shipped both ``timestamp[ns]``
    and ``timestamp[us]`` over time; assuming one of them silently
    collapses or inflates every event time ~1000x, so the source must
    read the footers rather than guess.  A directory mixing units
    (exactly the generator drift this guards against) raises instead of
    silently reading the other-unit files ~1000x off — one schema must
    win for the whole stream, so mixed inputs need an upstream rewrite."""
    import glob
    import os

    import pyarrow.parquet as pq

    candidates = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
        or sorted(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    )
    if not candidates:
        raise FileNotFoundError(f"no parquet files under {path!r}")
    units: dict[str, str] = {}
    for cand in candidates:  # footer-only metadata reads: cheap
        field = pq.read_schema(cand).field("ts")
        # plain int64 ts: treat as nanos (legacy fixtures)
        units[cand] = getattr(field.type, "unit", None) or "ns"
    distinct = sorted(set(units.values()))
    if len(distinct) > 1:
        sample = {u: next(c for c, cu in units.items() if cu == u) for u in distinct}
        raise ValueError(
            f"mixed ts units {distinct} under {path!r} "
            f"(e.g. {sample}); rewrite the inputs to one unit first"
        )
    return distinct[0]


def stream_events_from_parquet(
    spark: SparkSession, path: str, ts_is_nanos: bool | None = None
) -> DataFrame:
    """readStream over the driver's events parquet (file source stands in
    for kafka; the transformation chain is source-agnostic).

    ``ts_is_nanos=None`` (default) sniffs the ``ts`` physical type from
    the parquet footer: ``timestamp[us]``/``[ms]``/``[s]`` files read
    with the plain TIMESTAMP schema, while ``timestamp[ns]`` (which
    Spark cannot represent directly) reads as LONG under ``nanosAsLong``
    and is integer-divided down to micros.  Pass a bool to force either
    path (used by tests to cover both physical types)."""
    if ts_is_nanos is None:
        ts_is_nanos = _ts_unit_from_footer(path) == "ns"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = EVENTS_SCHEMA.replace("ts TIMESTAMP", "ts LONG") if ts_is_nanos else EVENTS_SCHEMA
    src = spark.readStream.schema(schema).parquet(path)
    if ts_is_nanos:
        # integer div: float division rounds some int64 nanos up 1us
        # (53-bit mantissa), diverging from batch load_table / DuckDB
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return src


def stream_stream_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join (click -> purchase attribution): each
    purchase pairs with the same user's clicks at most ``horizon``
    before it.

    The one Structured Streaming join family with real two-sided state:
    both inputs buffer rows until the other side's watermark passes the
    time-range bound, so state is O(events per watermark horizon) per
    side — the watermarks are REQUIRED for streaming inputs (without
    them Spark must keep both sides forever).  The time-range predicate
    (purchase_ts between click_ts and click_ts + horizon) is what lets
    the engine compute the state-expiry bound.

    Works identically on batch inputs (the unified-API twin the oracle
    checks): same join, no watermark, a plain range hash join.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return c.join(
        p,
        F.expr(
            f"user_id = p_user_id AND purchase_ts >= click_ts "
            f"AND purchase_ts <= click_ts + INTERVAL {horizon}"
        ),
    ).select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")


def stateful_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: per-user running event count /
    value total, kept in ``applyInPandasWithState`` state across
    micro-batches (the "custom stateful operator" path for semantics the
    built-in windowed aggs can't express).

    State per key is two scalars — O(distinct users) memory, partitioned
    by the groupBy hash, so state scales horizontally with executors.
    Batch-mode fallback (a non-streaming input) computes the same totals
    with a plain aggregation, so tests can assert parity.
    """
    import pandas as pd  # local import: keep module import light

    out_schema = "user_id LONG, n_events LONG, total_value DOUBLE"
    state_schema = "n LONG, total DOUBLE"

    if not events.isStreaming:
        return (
            events.groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )

    def update(key, pdf_iter, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update, out_schema, state_schema, "update", "NoTimeout"
        )
    )


def run_windowed_stream_demo(
    spark: SparkSession, events_dir: str, window: str = "1 hour"
) -> DataFrame:
    """Drive the streaming agg to completion over the fixture files and
    return the (batch-queryable) result — used by tests to prove
    batch/stream parity of the plan."""
    stream = stream_events_from_parquet(spark, events_dir)
    agg = tumbling_counts(stream, window=window, watermark="10 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("stream_tumbling_demo")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql("SELECT * FROM stream_tumbling_demo")
