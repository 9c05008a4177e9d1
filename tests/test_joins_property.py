"""Property-based tests: the bucketed range join and union-sort as-of
join must agree with a brute-force Python reference on arbitrary
timestamp layouts (ties, duplicates, empty sides, boundary hits)."""

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from vector_db_ingestor_spark.operators.joins import asof_join, range_join_count

BASE = dt.datetime(2024, 1, 1)

# offsets in seconds; small domain forces collisions/ties/boundaries
offsets = st.integers(min_value=0, max_value=600)


@settings(max_examples=25, deadline=None)
@given(
    probe_offs=st.lists(offsets, min_size=1, max_size=8, unique=True),
    build_offs=st.lists(offsets, min_size=0, max_size=12),
    window=st.sampled_from([60, 300]),
)
def test_range_join_count_matches_brute_force(spark, probe_offs, build_offs, window):
    probe_rows = [(i, BASE + dt.timedelta(seconds=o)) for i, o in enumerate(probe_offs)]
    build_rows = [(BASE + dt.timedelta(seconds=o),) for o in build_offs]
    probe = spark.createDataFrame(probe_rows, "event_id INT, ts TIMESTAMP")
    build = (
        spark.createDataFrame(build_rows, "ts TIMESTAMP")
        if build_rows
        else spark.createDataFrame([], "ts TIMESTAMP")
    )
    out = {
        r.event_id: r.n
        for r in range_join_count(
            probe, build, "ts", "ts", window, ["event_id"], "n"
        ).collect()
    }
    for eid, pts in probe_rows:
        expected = sum(
            1
            for (bts,) in build_rows
            if bts <= pts and bts >= pts - dt.timedelta(seconds=window)
        )
        assert out[eid] == expected, (eid, pts, build_rows, window)


@settings(max_examples=25, deadline=None)
@given(
    probe_data=st.lists(
        st.tuples(st.integers(0, 3), offsets), min_size=1, max_size=8
    ),
    build_data=st.lists(
        st.tuples(st.integers(0, 3), offsets, st.integers(0, 99)),
        min_size=0,
        max_size=12,
    ),
    strict=st.booleans(),
)
def test_asof_join_matches_brute_force(spark, probe_data, build_data, strict):
    probe_rows = [
        (i, uid, BASE + dt.timedelta(seconds=o))
        for i, (uid, o) in enumerate(probe_data)
    ]
    build_rows = [
        (uid, BASE + dt.timedelta(seconds=o), val) for uid, o, val in build_data
    ]
    probe = spark.createDataFrame(probe_rows, "event_id INT, user_id INT, ts TIMESTAMP")
    build = (
        spark.createDataFrame(build_rows, "user_id INT, ts TIMESTAMP, click_id INT")
        if build_rows
        else spark.createDataFrame([], "user_id INT, ts TIMESTAMP, click_id INT")
    )
    out = {
        r.event_id: r.asof_click_id
        for r in asof_join(
            probe, build, by="user_id", probe_ts="ts", build_ts="ts",
            value_cols=["click_id"], strict=strict,
        ).collect()
    }
    assert set(out) == {i for i, _, _ in probe_rows}
    for eid, uid, pts in probe_rows:
        cands = [
            (bts, val)
            for buid, bts, val in build_rows
            if buid == uid and (bts < pts if strict else bts <= pts)
        ]
        # the operator carries the LATEST build value at/before ts;
        # among equal timestamps the last one in window order wins —
        # make the expectation deterministic by max on (ts, value)
        expected = max(cands)[1] if cands else None
        if cands and sum(1 for c in cands if c[0] == max(cands)[0]) > 1:
            # equal-ts ties: accept any of the tied values
            tied = {v for t, v in cands if t == max(cands)[0]}
            assert out[eid] in tied, (eid, cands, out[eid])
        else:
            assert out[eid] == expected, (eid, cands, out[eid], strict)


# coordinates on a small grid with fractional parts: forces cell-edge
# hits, exact-radius boundaries, shared cells, and negative cells
coords = st.floats(
    min_value=-30.0, max_value=80.0, allow_nan=False, allow_infinity=False
).map(lambda v: round(v, 2))


@settings(max_examples=20, deadline=None)
@given(
    points=st.lists(st.tuples(coords, coords), min_size=0, max_size=15),
    probes=st.lists(
        st.tuples(coords, coords, st.sampled_from([1.0, 7.5, 25.0])),
        min_size=1,
        max_size=5,
    ),
)
def test_radius_neighbor_count_matches_brute_force(spark, points, probes):
    """The 3x3 cell cover + residual must agree with the quadratic
    cross join on arbitrary layouts — closed boundary included."""
    from vector_db_ingestor_spark.operators.joins import radius_neighbor_count

    pts = (
        spark.createDataFrame(points, "x DOUBLE, y DOUBLE")
        if points
        else spark.createDataFrame([], "x DOUBLE, y DOUBLE")
    )
    pr = spark.createDataFrame(
        [(i, px, py, r) for i, (px, py, r) in enumerate(probes)],
        "probe_id INT, px DOUBLE, py DOUBLE, r DOUBLE",
    )
    out = {
        row.probe_id: row.n_neighbors
        for row in radius_neighbor_count(
            pts, pr, cell_width=25.0, probe_keys=["probe_id"]
        ).collect()
    }
    for i, (px, py, r) in enumerate(probes):
        want = sum(
            1 for x, y in points if (x - px) ** 2 + (y - py) ** 2 <= r * r
        )
        assert out[i] == want, (i, (px, py, r), points)


def test_radius_neighbor_count_rejects_undersized_cells(spark):
    """cell_width < max radius would silently miss neighbors outside
    the 3x3 cover — refused loudly."""
    import pytest

    from vector_db_ingestor_spark.operators.joins import radius_neighbor_count

    pts = spark.createDataFrame([(0.0, 0.0)], "x DOUBLE, y DOUBLE")
    pr = spark.createDataFrame(
        [(1, 0.0, 0.0, 50.0)], "probe_id INT, px DOUBLE, py DOUBLE, r DOUBLE"
    )
    with pytest.raises(ValueError, match="cell_width"):
        radius_neighbor_count(pts, pr, cell_width=25.0, probe_keys=["probe_id"])


def test_radius_neighbor_count_null_coordinates(spark):
    """NULL-coordinate probes surface as 0-count rows; NULL-coordinate
    points match nothing (the interval_overlap_count NULL contract)."""
    from vector_db_ingestor_spark.operators.joins import radius_neighbor_count

    pts = spark.createDataFrame(
        [(0.0, 0.0), (None, 1.0)], "x DOUBLE, y DOUBLE"
    )
    pr = spark.createDataFrame(
        [(1, 0.0, 0.0, 5.0), (2, None, 0.0, 5.0)],
        "probe_id INT, px DOUBLE, py DOUBLE, r DOUBLE",
    )
    out = {
        r.probe_id: r.n_neighbors
        for r in radius_neighbor_count(
            pts, pr, cell_width=5.0, probe_keys=["probe_id"]
        ).collect()
    }
    assert out == {1: 1, 2: 0}
