"""Integration: the training-corpus build a user of this engine
actually runs, composed from the round-12 pieces in one session —
curation cascade -> per-language reservoir cap -> token-budget
acceptance report.  Each stage is individually hash-gated; this test
pins that they COMPOSE (schemas line up, verdicts drive filters,
invariants hold end-to-end)."""

from pyspark.sql import Window
from pyspark.sql import functions as F


def test_curate_cap_account_composition(spark, sf_dir):
    from vector_db_ingestor_spark.queries import (
        q_curation_pipeline_impl,
        q_tokens_per_source_impl,
    )
    from vector_db_ingestor_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    # stage 1: curation verdict drives the survivor filter
    verdict = q_curation_pipeline_impl(spark, sf_dir)
    survivors = docs.join(
        verdict.filter("keep").select("doc_id"), "doc_id"
    )
    n_keep = survivors.count()
    assert 0 < n_keep <= n_docs
    # exact-dup elimination really happened: no two survivors share text
    assert (
        survivors.select("text").distinct().count() == n_keep
    )

    # stage 2: reservoir cap — at most 10 survivors per language, the
    # SAME hash-rank rule q_sample_reservoir pins, applied to the
    # filtered corpus (composability: the operator idiom is a plain
    # window over whatever frame you hand it)
    h = F.md5(F.concat_ws("\x01", F.lit("resv1"), F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy(h.asc(), F.col("doc_id").asc())
    capped = (
        survivors.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .drop("rk")
    )
    per_lang = {
        r["lang"]: r["n"]
        for r in capped.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert per_lang and all(n <= 10 for n in per_lang.values())

    # stage 3: the acceptance report runs on the BUILT corpus — write
    # it as a fixture dir and call the production accounting key on it
    import tempfile

    with tempfile.TemporaryDirectory(prefix="corpus_") as tmp:
        capped.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        report = q_tokens_per_source_impl(spark, tmp).toPandas()
    assert report["cum_share"].iloc[-1] == 1.0
    assert int(report["n_docs"].sum()) == capped.count()
    # every surviving stratum is a stratum of the capped corpus
    got_strata = set(zip(report["source"], report["lang"]))
    want_strata = {
        (r["source"], r["lang"])
        for r in capped.select("source", "lang").distinct().collect()
    }
    assert got_strata == want_strata
