"""Round-15 queue item: q_dedup_containment — the asymmetric
min-side-containment near-subset detector (the excerpt/re-publication
duplication shape Jaccard washes out).  The uniform DuckDB gate runs
via scripts/check_oracle.py --queue and the registry-wide parametrized
test; this file pins the SEMANTIC properties the oracle can't state:
a true subset doc scores containment 1.0 while its jaccard is tiny,
containment dominates jaccard on every shared pair, and the rare-gram
cap drops exactly the boilerplate-only containments.
"""

import duckdb
import pandas as pd

from vector_db_ingestor_spark.operators.dedup import (
    containment_pairs,
    ngram_jaccard_pairs,
)
from vector_db_ingestor_spark.queries import QUEUED_QUERIES, _CONTAIN


def test_containment_differential_vs_duckdb(spark, sf_dir):
    """Declaration-window insurance: Spark impl vs DuckDB oracle,
    value-for-value on the fixture."""
    fn, sql = QUEUED_QUERIES["q_dedup_containment"]
    got = (
        fn(spark, sf_dir)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(sql)
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for col in ("id_a", "id_b", "sz_a", "sz_b", "n_inter"):
        assert list(got[col]) == list(want[col]), col
    assert (got["containment"] - want["containment"]).abs().max() < 1e-9


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, lang STRING, text STRING")


def test_containment_catches_subset_jaccard_misses(spark):
    """The metric's reason to exist: a short doc fully embedded in a
    long one scores containment 1.0 while jaccard ~ |A|/|B| is far
    below any dedup threshold."""
    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"unique{i} word{i}" for i in range(120))
    docs = _docs(
        spark,
        [
            (1, "en", quote),
            (2, "en", filler + " " + quote + " " + filler.upper()),
        ],
    )
    out = containment_pairs(docs, threshold=0.9, max_df=5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.containment == 1.0
    # the contained side is recoverable from the sizes
    assert r.sz_a < r.sz_b
    # jaccard on the SAME pair is far below any dedup threshold
    jac = ngram_jaccard_pairs(
        docs, threshold=0.0, max_df=5
    ).collect()
    assert jac and jac[0].jaccard < 0.1


def test_containment_dominates_jaccard(spark, sf_dir):
    """containment = inter/min(sz) >= inter/union = jaccard on every
    pair both report (same shingles, same candidates at max_df)."""
    from vector_db_ingestor_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in containment_pairs(
            docs, block_col="lang", n=2, threshold=0.0,
            max_df=_CONTAIN["max_df"],
        ).collect()
    }
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            docs, block_col="lang", n=2, threshold=0.0,
            max_df=_CONTAIN["max_df"],
        ).collect()
    }
    assert set(cont) == set(jac) != set()
    assert all(cont[p] >= jac[p] - 1e-9 for p in cont)


def test_containment_cap_drops_boilerplate_only_pairs(spark):
    """The recall contract, stated positively: a pair whose every
    shared gram is hot (> max_df docs) is NOT reported — docs
    'contained' purely in boilerplate must not merge — while a pair
    sharing one rare gram still is."""
    boiler = "all rights reserved copyright notice footer"
    docs = _docs(
        spark,
        [(i, "en", f"doc number {i} body {boiler}") for i in range(1, 9)]
        + [
            (100, "en", boiler),                      # pure boilerplate
            (101, "en", f"rare signature phrase {boiler}"),
            (102, "en", "rare signature phrase"),
        ],
    )
    out = containment_pairs(docs, threshold=0.5, max_df=5)
    pairs = {(r.id_a, r.id_b) for r in out.collect()}
    # 100's grams are all hot (boiler appears in 10 docs > max_df=5):
    # no pair involving 100 survives, despite containment 1.0 uncapped
    assert not any(100 in p for p in pairs)
    # the rare 'rare signature phrase' bigrams still pair 101 with 102
    assert (101, 102) in pairs
