"""Hash-based sampling/splitting: deterministic, partition-invariant,
disjoint-by-construction."""

import pytest
from pyspark.sql import functions as F

from vector_db_ingestor_spark.operators.sampling import (
    sample_by_hash,
    sample_stratified,
    split_by_hash,
)


def test_sample_by_hash_deterministic_and_partition_invariant(spark):
    df = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    s1 = {r.k for r in sample_by_hash(df, "k", 0.1).collect()}
    s2 = {r.k for r in sample_by_hash(df.repartition(17), "k", 0.1).collect()}
    assert s1 == s2, "sample must not depend on partitioning"
    # rate lands near the target (hash uniformity)
    assert 0.08 < len(s1) / 10_000 < 0.12
    # nested fractions: a 5% sample is a subset of the 10% sample
    s_small = {r.k for r in sample_by_hash(df, "k", 0.05).collect()}
    assert s_small <= s1
    with pytest.raises(ValueError):
        sample_by_hash(df, "k", 1.5)


def test_sample_stratified_rates(spark, sf_dir):
    from vector_db_ingestor_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = sample_stratified(
        docs, "lang", {"en": 1.0, "de": 0.5}, key_col="doc_id"
    )
    by_lang = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    totals = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang.get("en") == totals["en"]          # keep-all stratum
    assert 0 < by_lang.get("de", 0) < totals["de"]     # partial stratum
    assert "fr" not in by_lang                          # default 0.0


def test_split_by_hash_disjoint_exhaustive_stable(spark):
    df = spark.range(5_000).select(F.col("id").cast("string").alias("k"))
    split = split_by_hash(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 5_000              # exhaustive
    assert counts["train"] > counts["val"]
    # membership survives appends: the same key gets the same split in
    # a differently-sized input
    bigger = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    m1 = {r.k: r.split for r in split.collect()}
    m2 = {r.k: r.split for r in split_by_hash(bigger, "k",
          {"train": 0.8, "val": 0.1, "test": 0.1}).collect()}
    assert all(m2[k] == v for k, v in m1.items())
    # different salts decorrelate decisions over the same keys
    alt = {r.k: r.split for r in split_by_hash(df, "k",
          {"train": 0.8, "val": 0.1, "test": 0.1}, salt="other").collect()}
    assert any(alt[k] != v for k, v in m1.items())


def test_split_by_md5_contracts(spark):
    """split_by_md5: same disjoint/exhaustive/append-stable contracts as
    split_by_hash, plus cross-engine re-derivability (DuckDB computes
    the identical assignment from md5 hex)."""
    import duckdb

    from vector_db_ingestor_spark.operators.sampling import split_by_md5

    df = spark.range(3_000).select(F.col("id").cast("string").alias("k"))
    weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    split = split_by_md5(df, "k", weights)
    counts = {r.split: r.n for r in split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 3_000              # exhaustive
    # membership survives appends
    m1 = {r.k: r.split for r in split.collect()}
    bigger = spark.range(6_000).select(F.col("id").cast("string").alias("k"))
    m2 = {r.k: r.split for r in split_by_md5(bigger, "k", weights).collect()}
    assert all(m2[k] == v for k, v in m1.items())
    # cross-engine parity: DuckDB re-derives every assignment exactly
    con = duckdb.connect()
    duck = dict(
        con.execute(
            """
            SELECT k, CASE WHEN b < 'e66666' THEN 'train'
                           WHEN b < 'f33333' THEN 'val'
                           ELSE 'test' END
            FROM (SELECT CAST(range AS VARCHAR) AS k,
                         substring(md5('split' || CAST(range AS VARCHAR)), 1, 6) AS b
                  FROM range(3000))
            """
        ).fetchall()
    )
    assert m1 == duck


def test_sample_stratified_md5_contracts(spark):
    from vector_db_ingestor_spark.operators.sampling import sample_stratified_md5

    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "zh") for i in range(300)], "doc_id int, lang string"
    )
    kept = sample_stratified_md5(
        df, "lang", {"en": 0.5, "zh": 1.0}, "doc_id"
    )
    ids = sorted(r.doc_id for r in kept.collect())
    # zh stratum keeps everything
    zh = {i for i in range(300) if i % 3 == 0}
    assert zh <= set(ids)
    # deterministic under repartitioning
    ids2 = sorted(
        r.doc_id
        for r in sample_stratified_md5(
            df.repartition(13), "lang", {"en": 0.5, "zh": 1.0}, "doc_id"
        ).collect()
    )
    assert ids == ids2
    # append-stable: sampling a superset never changes old verdicts
    bigger = df.union(
        spark.createDataFrame([(i, "en") for i in range(300, 400)], "doc_id int, lang string")
    )
    ids3 = {r.doc_id for r in sample_stratified_md5(
        bigger, "lang", {"en": 0.5, "zh": 1.0}, "doc_id").collect()}
    assert set(ids) == {i for i in ids3 if i < 300}
    # en rate lands near 50%
    n_en = len([i for i in ids if i % 3])
    assert 0.35 < n_en / 200 < 0.65
