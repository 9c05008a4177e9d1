"""Range and as-of joins — operators Spark lacks natively, composed
from built-ins so Catalyst can still optimize them.

The reference has no joins at all (SURVEY §2A "not present"); these are
the temporal-join operators a training-data/event pipeline needs.

Design notes for 100 TB:

* A naive theta join (``a.ts BETWEEN b.ts - i AND b.ts``) becomes a
  broadcast-nested-loop join — quadratic work.  :func:`range_join`
  instead discretizes time into buckets of the window width, explodes
  each probe row into the (at most 2) buckets its window can touch,
  and equi-joins on the bucket key — a plain hash shuffle join with a
  residual filter, linear in input size and AQE/skew-aware.
* :func:`asof_join` uses the union-sort trick: tag both sides, union,
  and carry the build side's latest values forward with a running
  ``last(ignorenulls)`` window per key.  One shuffle on the key; no
  per-row probing.  This is how "latest event at or before t" scales.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType


def range_join_count(
    probe: DataFrame,
    build: DataFrame,
    probe_ts: str,
    build_ts: str,
    window_seconds: int,
    probe_keys: list[str],
    count_alias: str = "n_matches",
) -> DataFrame:
    """For each probe row, count build rows with
    ``probe_ts - window <= build_ts <= probe_ts``.

    Implemented as bucketed equi-join: bucket = floor(epoch / window);
    a qualifying build row lives in the probe's bucket or the one
    before, so the probe explodes into those two bucket keys and the
    join is a hash join on ``bucket`` + residual range filter.
    """
    w = F.lit(window_seconds)
    p = probe.select(
        *probe_keys,
        F.col(probe_ts).alias("__pts"),
        F.explode(
            F.array(
                F.floor(F.unix_timestamp(F.col(probe_ts)) / w),
                F.floor(F.unix_timestamp(F.col(probe_ts)) / w) - 1,
            )
        ).alias("__bucket"),
    )
    b = build.select(
        F.col(build_ts).alias("__bts"),
        F.floor(F.unix_timestamp(F.col(build_ts)) / w).alias("__bucket"),
    )
    # left join so probes with zero matches survive; the residual range
    # predicate is applied as a conditional count, NOT a post-join filter
    # (a filter would drop probes whose bucket candidates all miss).
    joined = p.join(b, "__bucket", "left")
    in_range = (F.col("__bts") <= F.col("__pts")) & (
        F.col("__bts") >= F.col("__pts") - F.make_interval(secs=w)
    )
    return joined.groupBy(*probe_keys).agg(
        F.count(F.when(in_range, F.col("__bts"))).alias(count_alias)
    )


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    by: str,
    probe_ts: str,
    build_ts: str,
    value_cols: list[str],
    strict: bool = False,
    tolerance: Column | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each probe row, the build row with the
    greatest ``build_ts <= probe_ts`` (``<`` if strict) within the same
    ``by`` key.  Build must be unique per (by, build_ts) for
    deterministic output — pre-aggregate it if not.

    ``direction`` (round 15, full pandas ``merge_asof`` parity):
    ``"backward"`` (default, the rule above), ``"forward"`` (the
    SMALLEST ``build_ts >= probe_ts``, ``>`` if strict — the
    next-quote / next-deploy attribution shape), or ``"nearest"``
    (whichever of the two is closer in time; an exact tie prefers the
    backward row, matching pandas).  ``strict`` maps to pandas
    ``allow_exact_matches=False`` and applies to both sides of
    ``nearest``.  Forward rides the same union-sort plan with a
    ``first(ignorenulls)`` following window instead of a
    ``last(ignorenulls)`` preceding one; nearest carries both structs
    over the one shuffle (two sorts, same partitioning, no second
    exchange).  Differentially tested against real ``pd.merge_asof``
    across direction x strict x tolerance
    (``tests/test_operators.py``).

    ``tolerance`` (round 14, pandas ``merge_asof(tolerance=...)``
    parity): an interval Column (e.g. ``F.expr("INTERVAL 12 HOURS")``).
    A match older than ``probe_ts - tolerance`` is nulled out — the
    probe row survives with null values (left-join semantics), exactly
    like a no-match, because a stale quote/click is not a match.  The
    matched build timestamp rides the same carried struct, so the
    tolerance check adds NO extra shuffle or join.

    Whole-row semantics (round 15): the matched build row is carried as
    ONE struct ``(build_ts, *value_cols)``, so every output value — and
    the timestamp the tolerance gate checks — comes from the SAME
    (newest qualifying) build row, exactly like pandas ``merge_asof``.
    A null value on that newest row yields null (it does not resurrect
    an older row's value, which per-column ``last(ignorenulls)``
    carries would).

    Union-sort trick: one shuffle on ``by``, a running
    ``last(..., ignorenulls=True)`` window, then keep probe rows.
    """
    if "__asof_bts" in value_cols:
        raise ValueError("asof_join: value column name __asof_bts is reserved")
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"asof_join: direction={direction!r} not in backward/forward/nearest"
        )
    pcols = probe.columns
    vrow = F.struct(
        F.col(build_ts).alias("__asof_bts"),
        *[F.col(c) for c in value_cols],
    )
    vrow_type = build.select(vrow.alias("__vrow")).schema["__vrow"].dataType
    p = probe.select(
        F.col(by).alias("__by"),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.struct(*pcols).alias("__probe"),
        F.lit(None).cast(vrow_type).alias("__vrow"),
    )
    b = build.select(
        F.col(by).alias("__by"),
        F.col(build_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.lit(None).cast(
            p.schema["__probe"].dataType
        ).alias("__probe"),
        vrow.alias("__vrow"),
    )
    # Carried-match columns.  Equal-ts tie handling is encoded in the
    # secondary sort: for BACKWARD a build row at exactly probe_ts must
    # fall inside the preceding-or-current frame unless strict (build
    # rows sort before probe rows, or after when strict); for FORWARD
    # it must fall inside the current-or-following frame unless strict
    # (probe rows sort first, or after the builds when strict).
    base = Window.partitionBy("__by")

    def _carried(d: str) -> Column:
        if d == "backward":
            order = [
                F.col("__ts").asc(),
                F.col("__is_probe").asc() if not strict else F.col("__is_probe").desc(),
            ]
            w = base.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, -1 if strict else 0
            )
            return F.last("__vrow", ignorenulls=True).over(w)
        order = [
            F.col("__ts").asc(),
            F.col("__is_probe").desc() if not strict else F.col("__is_probe").asc(),
        ]
        w = base.orderBy(*order).rowsBetween(0, Window.unboundedFollowing)
        return F.first("__vrow", ignorenulls=True).over(w)

    carry_cols = (
        [_carried("backward").alias("__mb"), _carried("forward").alias("__mf")]
        if direction == "nearest"
        else [_carried(direction).alias("__m")]
    )
    carried = p.unionByName(b).select(
        "__by", "__ts", "__is_probe", "__probe", *carry_cols
    )
    probe_rows = carried.filter(F.col("__is_probe") == 1)

    def _in_tol(m: Column, d: str) -> Column:
        """Null out a carried match whose ts violates the tolerance
        bound for its direction (backward: not older than ts - tol;
        forward: not newer than ts + tol)."""
        if tolerance is None:
            return m
        if d == "backward":
            ok = m["__asof_bts"] >= (F.col("__ts") - tolerance)
        else:
            ok = m["__asof_bts"] <= (F.col("__ts") + tolerance)
        return F.when(ok, m)

    if direction == "nearest":
        ts_type = probe.schema[probe_ts].dataType
        _t = (
            F.unix_micros
            if isinstance(ts_type, TimestampType)
            else (lambda c: c)
        )
        mb = _in_tol(F.col("__mb"), "backward")
        mf = _in_tol(F.col("__mf"), "forward")
        # tie (equidistant) prefers backward, matching pandas
        pick_b = mf.isNull() | (
            mb.isNotNull()
            & (
                (_t(F.col("__ts")) - _t(mb["__asof_bts"]))
                <= (_t(mf["__asof_bts"]) - _t(F.col("__ts")))
            )
        )
        m = F.when(pick_b, mb).otherwise(mf)
    else:
        m = _in_tol(F.col("__m"), direction)
    vals = [m[c].alias(f"asof_{c}") for c in value_cols]
    return probe_rows.select(
        *[F.col(f"__probe.{c}").alias(c) for c in pcols], *vals
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-salted equi-join, result-identical to ``big.join(small, key, how)``
    for ``how`` in {'inner', 'left', 'left_semi', 'left_anti'}.

    For a shuffle join whose key distribution is skewed (one hot key
    lands an entire reducer), salt the big side into ``n_salts``
    sub-keys with a deterministic hash of the whole row, and replicate
    the small side once per salt via ``explode(sequence(...))`` — the
    hot key's rows now spread over ``n_salts`` reducers.  For
    big-side-preserving joins the salt is a join-key refinement on
    replicated rows, never a filter, so results are exactly the plain
    join's.  Small-side-preserving joins ('right', 'full') are
    rejected: an unmatched small-side row exists once per salt copy and
    would be emitted ``n_salts`` times instead of once.

    At 100 TB prefer AQE's skew-join splitting when it triggers
    (``spark.sql.adaptive.skewJoin``); explicit salting is for the
    cases AQE can't fix: skewed *aggregations* downstream of the join
    or storage-partitioned inputs AQE won't re-split.  ``n_salts``
    should be about (hot-key rows / target partition rows); the small
    side pays an n_salts x replication, so keep it for genuinely small
    dimensions.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "semi",
               "left_anti", "anti", "leftsemi", "leftanti", "leftouter"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not identity-preserving under "
            "small-side replication; use one of inner/left/left_semi/left_anti"
        )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("__salt", salt.cast("int"))
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, [key, "__salt"], how).drop("__salt")


def bucketed_write(
    df: DataFrame,
    name: str,
    key: str,
    n_buckets: int = 32,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Write ``df`` as a bucketed (and per-bucket sorted) catalog table
    — the storage-layout half of shuffle elimination.

    The 100 TB rationale: a fact table that is joined or aggregated on
    the same key every day (orders x customer, events x user) pays a
    full corpus shuffle per query unless the layout already clusters
    that key.  ``bucketBy(n, key)`` hash-partitions rows into a fixed
    bucket count AT WRITE TIME; every later equi-join between two
    tables bucketed identically on the join key — and every groupBy on
    the bucket key — satisfies the required child distribution straight
    off the scan, so Catalyst plans NO Exchange (asserted in
    tests/test_plans.py).  One write-time shuffle is amortized over
    every subsequent query — the same trade the IVF-PQ codes index
    makes for ANN serving (operators/similarity.py), applied to the
    relational core.

    ``sort=True`` additionally orders each bucket file by the key so
    sort-merge joins can skip their Sort when Spark reads one file per
    bucket.  ``path`` makes the table external (data under ``path``,
    e.g. a test tmp dir) instead of the session warehouse.

    Sizing at scale: pick ``n_buckets`` so one bucket of the LARGEST
    co-bucketed table fits an executor core's working set (~128-512 MB
    of parquet); both sides must use the SAME count — Spark joins
    unequal bucket counts only by re-shuffling one side.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two co-bucketed catalog tables (see
    :func:`bucketed_write`).  Results are identical to joining the
    unbucketed frames; the point is the PLAN — with both sides
    bucketed on ``key`` with equal counts, the join runs shuffle-free
    off the scans.  Broadcast is suppressed via a merge-join hint so
    tiny test inputs exercise the same shuffle-free sort-merge path
    that production-sized tables would take (a broadcast would hide
    the layout's benefit behind the small-table fast path)."""
    left = spark.table(left_name).hint("merge")
    right = spark.table(right_name).hint("merge")
    return left.join(right, key, how)


def interval_overlap_count(
    probe: DataFrame,
    build: DataFrame,
    probe_start: str,
    probe_end: str,
    build_start: str,
    build_end: str,
    probe_keys: list[str],
    bucket_seconds: int,
    count_alias: str = "n_overlaps",
) -> DataFrame:
    """For each probe INTERVAL, count build INTERVALS overlapping it
    (``ps <= be AND bs <= pe``, closed ends) — the interval x interval
    generalization of :func:`range_join_count`, and another operator
    whose naive form is a nested-loop theta join.

    Scale shape: both sides explode into the time buckets their
    interval touches (``sequence(floor(s/w), floor(e/w))`` — bounded by
    interval_length/w + 1, so pick ``bucket_seconds`` at or above the
    typical interval length), the join is a plain hash equi-join on the
    bucket, and each overlapping pair is counted EXACTLY ONCE via the
    canonical-bucket residual: a pair may share several buckets, but
    only the bucket containing the overlap's start
    (``floor(greatest(ps, bs) / w)``) scores it.  Left semantics —
    probes with zero overlaps keep a 0 count (conditional count, not a
    post-join filter); a probe with a NULL start/end survives as a
    0-count row too (``explode_outer`` — a NULL interval overlaps
    nothing, but the probe key must not vanish from the report).
    Build rows with NULL bounds are dropped (they can match nothing)."""
    w = F.lit(bucket_seconds)

    def secs(col: str) -> Column:
        return F.unix_timestamp(F.col(col))

    p = probe.select(
        *probe_keys,
        secs(probe_start).alias("__ps"),
        secs(probe_end).alias("__pe"),
        F.explode_outer(
            F.sequence(
                F.floor(secs(probe_start) / w), F.floor(secs(probe_end) / w)
            )
        ).alias("__bucket"),
    )
    b = build.select(
        secs(build_start).alias("__bs"),
        secs(build_end).alias("__be"),
        F.explode(
            F.sequence(
                F.floor(secs(build_start) / w), F.floor(secs(build_end) / w)
            )
        ).alias("__bucket"),
    )
    joined = p.join(b, "__bucket", "left")
    overlaps = (
        (F.col("__ps") <= F.col("__be"))
        & (F.col("__bs") <= F.col("__pe"))
        & (
            F.floor(F.greatest(F.col("__ps"), F.col("__bs")) / w)
            == F.col("__bucket")
        )
    )
    # the probe's own bucket fan-out folds back in the same aggregation
    # that counts the matches: the canonical-bucket term scores each
    # overlapping pair on exactly one of the probe's exploded rows
    return joined.groupBy(*probe_keys).agg(
        F.count(F.when(overlaps, 1)).alias(count_alias)
    )


def radius_neighbor_count(
    points: DataFrame,
    probes: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    probe_x: str = "px",
    probe_y: str = "py",
    radius_col: str = "r",
    cell_width: float | None = None,
    probe_keys: list[str] | None = None,
    count_alias: str = "n_neighbors",
) -> DataFrame:
    """For each probe point, count data points within its (closed)
    radius — the 2-D member of the bucketed-theta-join family
    (:func:`range_join_count`: 1-D point-in-window;
    :func:`interval_overlap_count`: 1-D interval x interval).  The
    naive form is a cross join with a distance predicate
    (BroadcastNestedLoopJoin, quadratic, rejected by plans/guard).

    Scale shape: each point lands in ONE grid cell of width
    ``cell_width`` (must be >= every probe radius — asserted); each
    probe explodes to its 3x3 cell neighborhood, a superset of any
    disc with r <= w; the join is a plain hash equi-join on the cell
    string and the exact disc predicate is the residual.  Left
    semantics: probes with zero neighbors keep a 0-count row; a probe
    or point with a NULL coordinate is handled like
    :func:`interval_overlap_count`'s NULL intervals — NULL-coordinate
    probes surface as 0-count rows, NULL-coordinate points match
    nothing.  At 100 TB points shuffle once by cell (or pre-bucket the
    table by cell via :func:`bucketed_write` for a shuffle-free probe
    side); the probe set is broadcast scale.
    """
    if probe_keys is None:
        probe_keys = ["probe_id"]
    mx = probes.agg(F.max(radius_col)).collect()[0][0]
    if cell_width is None:
        cell_width = float(mx)
    w = float(cell_width)
    if mx is not None and float(mx) > w:
        raise ValueError(
            f"cell_width {w} < max radius {mx}: the 3x3 cover would miss "
            "neighbors; pass cell_width >= every probe radius"
        )
    pts = points.select(
        F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.concat_ws(
            ":", F.floor(F.col(x_col) / w), F.floor(F.col(y_col) / w)
        ).alias("__cell"),
    ).filter(F.col("__x").isNotNull() & F.col("__y").isNotNull())
    cover = probes.select(
        *probe_keys,
        F.col(probe_x).alias("__px"),
        F.col(probe_y).alias("__py"),
        F.col(radius_col).alias("__r"),
        F.explode_outer(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(-1), F.lit(1)),
                    lambda dx: F.transform(
                        F.sequence(F.lit(-1), F.lit(1)),
                        lambda dy: F.concat_ws(
                            ":",
                            F.floor(F.col(probe_x) / w) + dx,
                            F.floor(F.col(probe_y) / w) + dy,
                        ),
                    ),
                )
            )
        ).alias("__cell"),
    )
    hit = (
        (F.col("__x") - F.col("__px")) * (F.col("__x") - F.col("__px"))
        + (F.col("__y") - F.col("__py")) * (F.col("__y") - F.col("__py"))
        <= F.col("__r") * F.col("__r")
    )
    # inner hash join against the broadcast cover (the cheap, provably
    # broadcastable shape), then a left join back to the full probe set
    # restores zero-neighbor and NULL-coordinate probes as 0-count rows
    counted = (
        pts.join(F.broadcast(cover), "__cell")
        .groupBy(*probe_keys)
        .agg(F.count(F.when(hit, 1)).alias(count_alias))
    )
    return probes.select(*probe_keys).join(counted, probe_keys, "left").select(
        *probe_keys,
        F.coalesce(F.col(count_alias), F.lit(0)).alias(count_alias),
    )
