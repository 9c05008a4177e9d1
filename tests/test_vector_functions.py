import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from vector_db_ingestor_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
    normalize,
)


@pytest.fixture(scope="module")
def vec_df(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0], [4.0, 5.0, 6.0]),
            (2, [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]),
            (3, [2.0, 0.0, 0.0], [2.0, 0.0, 0.0]),
        ],
        "id INT, a ARRAY<DOUBLE>, b ARRAY<DOUBLE>",
    )


def test_dot(vec_df):
    rows = {r.id: r.d for r in vec_df.select("id", dot("a", "b").alias("d")).collect()}
    assert rows[1] == pytest.approx(32.0)
    assert rows[2] == 0.0
    assert rows[3] == pytest.approx(4.0)


def test_cosine(vec_df):
    rows = {
        r.id: r.c
        for r in vec_df.select("id", cosine_similarity("a", "b").alias("c")).collect()
    }
    assert rows[1] == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))
    assert rows[2] == 0.0
    assert rows[3] == pytest.approx(1.0)


def test_l2(vec_df):
    rows = {
        r.id: (r.n, r.d)
        for r in vec_df.select(
            "id", l2_norm("a").alias("n"), l2_distance("a", "b").alias("d")
        ).collect()
    }
    assert rows[1][0] == pytest.approx(math.sqrt(14))
    assert rows[1][1] == pytest.approx(math.sqrt(27))


def test_normalize(vec_df):
    out = vec_df.select("id", normalize("a").alias("u")).collect()
    for r in out:
        assert np.linalg.norm(r.u) == pytest.approx(1.0)


def test_float_arrays_upcast(spark):
    # fixtures store array<float>; arithmetic must happen in double
    df = spark.createDataFrame([(1, [0.1, 0.2])], "id INT, v ARRAY<FLOAT>")
    (out,) = df.select(dot("v", "v").alias("d")).collect()
    f = np.float64(np.float32(0.1)) ** 2 + np.float64(np.float32(0.2)) ** 2
    assert out.d == pytest.approx(float(f), rel=1e-12)
