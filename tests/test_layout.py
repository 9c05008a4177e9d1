"""Z-order layout: multi-dimensional clustering must localize range
predicates on EVERY z-column to a small subset of files, where a plain
single-column sort localizes only its own column."""

import math

from pyspark.sql import functions as F

from vector_db_ingestor_spark.operators.layout import (
    normalize_to_bits,
    zorder_key,
    zorder_write,
)
from vector_db_ingestor_spark.tables import load_table

SF_DIR = "/root/testdata/sf0.01"
N_FILES = 16


def _files_hit(spark, path, pred):
    return (
        spark.read.parquet(path)
        .filter(pred)
        .select(F.input_file_name())
        .distinct()
        .count()
    )


def test_zorder_localizes_both_dimensions(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "s")
    # equidepth: events.value is long-tailed (its low 10% of RANGE
    # holds 63% of rows) — exactly the case the quantile cells exist for
    zorder_write(ev, zpath, ["user_id", "value"], n_files=N_FILES, equidepth=True)
    # baseline: classic single-column sort layout
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # ~10%-of-ROWS slabs per dimension (quantile, not span: a span slab
    # on a skewed column selects most of the table and every layout
    # rightly touches most files for it)
    u10 = ev.stat.approxQuantile("user_id", [0.1], 0.001)[0]
    v10 = ev.stat.approxQuantile("value", [0.1], 0.001)[0]
    u_pred = F.col("user_id") <= u10
    v_pred = F.col("value") <= v10

    # content identical either way
    assert (
        spark.read.parquet(zpath).count()
        == spark.read.parquet(spath).count()
        == ev.count()
    )

    z_u, z_v = _files_hit(spark, zpath, u_pred), _files_hit(spark, zpath, v_pred)
    s_u, s_v = _files_hit(spark, spath, u_pred), _files_hit(spark, spath, v_pred)

    # the sorted layout nails its own column and fails the other
    assert s_u <= math.ceil(N_FILES * 0.25)
    assert s_v == N_FILES  # value rows are spread over every file
    # z-order localizes BOTH: each 10% slab intersects ~a strip of the
    # 2-d rectangle grid, well under the full file set
    assert z_u <= N_FILES // 2, f"user_id slab hit {z_u}/{N_FILES} z-files"
    assert z_v <= N_FILES // 2, f"value slab hit {z_v}/{N_FILES} z-files"


def test_zorder_key_is_morton_interleave(spark):
    df = spark.createDataFrame([(3, 5)], "a long, b long")  # 0b011, 0b101
    got = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=3).alias("z")
    ).first()["z"]
    # bit b of col i at position b*2+i: a=011 -> bits0,1; b=101 -> bits0,2
    # z = a0<<0 | b0<<1 | a1<<2 | b1<<3 | a2<<4 | b2<<5
    #   = 1 | 2 | 4 | 0 | 0 | 32 = 39
    assert got == 39


def test_zorder_write_honors_explicit_bits_with_equidepth(spark, tmp_path, monkeypatch):
    """ADVICE r11: equidepth=True silently overwrote the caller's
    ``bits`` with 8.  An explicit ``bits=4`` must now drive the
    quantile-cell count (2**4 cells -> 15 boundaries per column)."""
    import vector_db_ingestor_spark.operators.layout as layout

    seen = []
    orig = layout.normalize_equidepth

    def spy(col, boundaries):
        seen.append(len(boundaries))
        return orig(col, boundaries)

    monkeypatch.setattr(layout, "normalize_equidepth", spy)
    ev = load_table(spark, SF_DIR, "events").limit(500)
    layout.zorder_write(
        ev, str(tmp_path / "z4"), ["user_id", "value"],
        n_files=2, bits=4, equidepth=True,
    )
    assert seen == [15, 15]  # 2**4 - 1 boundaries, NOT 2**8 - 1


def test_normalize_clamps_and_spans(spark):
    df = spark.createDataFrame([(0.0,), (50.0,), (100.0,), (-5.0,), (200.0,)], "x double")
    out = [
        r[0]
        for r in df.select(normalize_to_bits(F.col("x"), 0.0, 100.0, bits=4)).collect()
    ]
    assert out[0] == 0 and out[2] == 15 and out[3] == 0 and out[4] == 15
    assert 0 < out[1] < 15
