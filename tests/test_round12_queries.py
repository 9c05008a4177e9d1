"""Round-12 queue additions (rounds 16-20 declaration windows):
reservoir sampling, passage dedup, HITS, KMV sketch, A/B stats,
spatial join, PQ quality, token accounting, BPE training, curation.

Each key already runs through the registry-wide differential gate
(test_round11_queries.py::test_queue_registry_pair_is_hash_green);
these tests pin the QUALITY/SEMANTIC properties the hash alone
doesn't: estimator error bounds, greedy-merge semantics, boundary
closedness, rule precedence, cross-key invariants.  Micro-fixtures
are written as <tmp_path>/<table>.parquet so the PRODUCTION impls run
unmodified (load_table reads <sf_dir>/<name>.parquet)."""

import hashlib

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ reservoir

def test_sample_reservoir_exact_k_and_membership(spark, sf_dir):
    """Exactly min(k, |stratum|) rows per language, and the kept set is
    literally the k smallest salted hashes — recomputed here in plain
    Python, so a Spark-side hash or window regression cannot hide."""
    from vector_db_ingestor_spark.queries import q_sample_reservoir_impl
    from vector_db_ingestor_spark.tables import load_table

    got = q_sample_reservoir_impl(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang"
    ).toPandas()

    def h(doc_id):
        return hashlib.md5(f"resv1\x01{doc_id}".encode()).hexdigest()

    for lang, grp in docs.groupby("lang"):
        want = sorted(
            ((h(d), d) for d in grp["doc_id"]),
        )[: 10]
        want_ids = [d for _, d in want]
        kept = got[got["lang"] == lang].sort_values("sample_rank")
        assert list(kept["doc_id"]) == want_ids, lang
        assert list(kept["sample_rank"]) == list(range(1, len(want_ids) + 1))


# ------------------------------------------------------- passage dedup

def test_dedup_passage_micro_fixture(spark, tmp_path):
    """Adversarial micro-corpus: a 5-gram shared by two docs and
    repeated inside one of them counts (n_docs=2, n_occurrences=3);
    a doc under 5 words contributes nothing; a passage repeated only
    WITHIN one doc is not cross-doc evidence and is excluded."""
    from vector_db_ingestor_spark.queries import q_dedup_passage_impl

    shared = "the quick brown fox jumps"
    rows = [
        (1, f"{shared} over the lazy dog {shared}", "en", "a", 0),
        (2, f"prefix words here {shared} suffix", "en", "b", 0),
        (3, "tiny doc", "en", "c", 0),  # < 5 words: no shingles
        (4, "solo solo solo solo solo solo solo solo", "en", "d", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = q_dedup_passage_impl(spark, str(tmp_path)).toPandas()
    row = got[got["passage"] == shared]
    assert len(row) == 1
    assert int(row["n_docs"].iloc[0]) == 2
    assert int(row["n_occurrences"].iloc[0]) == 3
    assert int(row["example_doc_id"].iloc[0]) == 1
    # within-doc-only repetition ("solo solo solo solo solo") never
    # appears: every reported passage spans >1 document
    assert (got["n_docs"] > 1).all()


# ---------------------------------------------------------------- HITS

def test_graph_hits_normalization_and_structure(spark, sf_dir):
    """The top-authority row normalizes to exactly 1.0 (it IS the max),
    units are non-negative, and the graph's quadratic in-degree
    structure produces real spread (not uniform scores)."""
    from vector_db_ingestor_spark.queries import q_graph_hits_impl

    got = q_graph_hits_impl(spark, sf_dir).toPandas()
    assert len(got) == 20
    assert got["authority"].iloc[0] == 1.0  # sorted by auth desc
    assert (got["auth_units"] >= 0).all() and (got["hub_units"] >= 0).all()
    assert (got["authority"] <= 1.0).all() and (got["hub"] <= 1.0).all()
    assert got["auth_units"].nunique() > 5  # structure, not uniformity


# ------------------------------------------------------------------ KMV

def test_sketch_kmv_estimation_branch_and_error(spark, sf_dir):
    """The k=64 estimator must actually FIRE on the fixture (bigram
    universe ~900 per language) and land within 20% of the exact
    distinct count (theoretical stderr ~ 1/sqrt(k-2) = 12.7%); a
    stratum below k reports its exact count in milli-units."""
    from vector_db_ingestor_spark.queries import _KMV_K, q_sketch_kmv_impl

    got = q_sketch_kmv_impl(spark, sf_dir).toPandas()
    est_rows = got[got["k_used"] == _KMV_K]
    assert len(est_rows) >= 1, "estimation branch never fired"
    for _, r in est_rows.iterrows():
        err = abs(r["est_milli"] / 1000.0 / r["exact_distinct"] - 1.0)
        assert err <= 0.20, (r["lang"], err)
    small = got[got["k_used"] < _KMV_K]
    assert (small["est_milli"] == small["exact_distinct"] * 1000).all()


def test_sketch_kmv_union_row_is_merge_of_strata(spark, sf_dir):
    """Mergeability, asserted literally: the union row's kth hash is
    the kth smallest of the UNION of the per-stratum kept hashes — a
    driver could merge per-partition sketches without this query."""
    from vector_db_ingestor_spark.queries import _KMV_K, q_sketch_kmv_impl
    from vector_db_ingestor_spark.tables import load_table

    got = q_sketch_kmv_impl(spark, sf_dir).toPandas()
    union = got[got["lang"] == "__union__"]
    assert len(union) == 1
    # recompute the union sketch from raw data in plain Python
    docs = load_table(spark, sf_dir, "documents").select("text").toPandas()
    grams = set()
    for t in docs["text"]:
        ws = [w for w in t.strip().lower().split() if w]
        grams.update(f"{a} {b}" for a, b in zip(ws, ws[1:]))
    hs = sorted(
        int(hashlib.md5(f"kmv:{g}".encode()).hexdigest()[:12], 16)
        for g in grams
    )
    assert int(union["kth_hash"].iloc[0]) == hs[_KMV_K - 1]
    assert int(union["exact_distinct"].iloc[0]) == len(grams)


# ------------------------------------------------------------ A/B stats

def test_stats_ab_known_micro_fixture(spark, tmp_path):
    """Hand-checkable experiment: arm A (even users) all value 10.0
    with one 14.0; arm B (odd users) all 10.0 with one 6.0.  Means
    differ symmetrically; t must be positive, finite, and equal to the
    closed-form Welch value."""
    import math

    rows = []
    for i in range(40):
        uid = i  # 20 even (A), 20 odd (B)
        v = 10.0
        if i == 0:
            v = 14.0
        if i == 1:
            v = 6.0
        rows.append((i, uid, "exp", v))
    spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, event_type STRING, value DOUBLE"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    from vector_db_ingestor_spark.queries import q_stats_ab_impl

    got = q_stats_ab_impl(spark, str(tmp_path)).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["n_a"] == 20 and r["n_b"] == 20
    # milli-units: mean_a = 10200, mean_b = 9800
    assert r["mean_a_milli"] == pytest.approx(10200.0)
    assert r["mean_b_milli"] == pytest.approx(9800.0)
    # per-arm sum of squared deviations: 19*(200)^2 + (3800)^2
    var = (19 * 200.0**2 + 3800.0**2) / 19
    t = (10200.0 - 9800.0) / math.sqrt(var / 20 + var / 20)
    assert r["t_stat"] == pytest.approx(round(t, 4))  # = 1.4142


# ---------------------------------------------------------- spatial join

def test_join_spatial_closed_boundary_and_cell_edges(spark, tmp_path):
    """Disc membership is CLOSED (distance exactly r counts) and the
    3x3 cell cover finds points in neighbor cells: a point just across
    a cell boundary from its probe must still be counted."""
    from vector_db_ingestor_spark.queries import (
        _SPATIAL_PROBES,
        q_join_spatial_impl,
    )

    # probe 1: (50, 20, r=20).  Points: exactly on the radius
    # (x=70, y=20 -> d=20), just inside across a cell edge
    # (x=49, y=20: cell 1 vs probe cell 2), just outside (d=20.3).
    # y = (event_id % 997)/10 -> choose event_ids giving y=20.0: 200.
    rows = [
        (200, "2024-01-01", 0, "e", 70.0, None),   # d = 20.0: counted
        (1197, "2024-01-01", 0, "e", 49.0, None),  # neighbor cell: counted
        (2194, "2024-01-01", 0, "e", 70.3, None),  # d = 20.3: not counted
    ]
    spark.createDataFrame(
        rows,
        "event_id LONG, ds STRING, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        r["probe_id"]: r["n_neighbors"]
        for _, r in q_join_spatial_impl(spark, str(tmp_path))
        .toPandas()
        .iterrows()
    }
    # all three synthetic event_ids give y = 20.0 (200 % 997 = 200,
    # 1197 % 997 = 200, 2194 % 997 = 200)
    assert got[1] == 2
    # every probe keeps a row (left semantics), zeros included
    assert set(got) == {p[0] for p in _SPATIAL_PROBES}
    assert got[5] == 0


# ------------------------------------------------------------ PQ quality

def test_vec_pq_quality_consistent_with_drift_report(spark, sf_dir):
    """Cross-key invariant: the quality report's per-cell row counts
    must equal the drift report's occupancy for every non-empty cell
    (same assignment expression, same corpus), and errors are
    non-negative with total rows == corpus size."""
    from vector_db_ingestor_spark.queries import (
        q_ivf_drift_report_impl,
        q_vec_pq_quality_impl,
    )
    from vector_db_ingestor_spark.tables import load_table

    q = q_vec_pq_quality_impl(spark, sf_dir).toPandas()
    d = q_ivf_drift_report_impl(spark, sf_dir).toPandas()
    drift_n = {int(r["cid"]): int(r["n"]) for _, r in d.iterrows()}
    for _, r in q.iterrows():
        assert int(r["n"]) == drift_n[int(r["cid"])]
    assert (q["err_sum_micro"] >= 0).all()
    n_emb = load_table(spark, sf_dir, "embeddings").count()
    assert int(q["n"].sum()) == n_emb


# ------------------------------------------------------- token accounting

def test_tokens_per_source_shares_partition_unity(spark, sf_dir):
    """Shares sum to ~1, the last cumulative share is exactly 1.0 (the
    final running total IS the grand total), and ranks are dense in
    contribution order."""
    from vector_db_ingestor_spark.queries import q_tokens_per_source_impl

    got = q_tokens_per_source_impl(spark, sf_dir).toPandas()
    assert list(got["rank"]) == list(range(1, len(got) + 1))
    assert got["cum_share"].iloc[-1] == 1.0
    assert abs(got["share"].sum() - 1.0) < 1e-3
    assert (got["n_tokens"].diff().dropna() <= 0).all()  # sorted desc


# ------------------------------------------------------------ BPE train

def test_bpe_train_greedy_merge_micro_fixture(spark, tmp_path):
    """The hand-computable corpus 'aaa aaa ab': merge 1 must be (a, a)
    with weighted count 4 (two pairs in each of two 'aaa'), and its
    application must be GREEDY left-to-right — 'aaa' becomes
    [aa, a], never [a, aa] — making merge 2 (aa, a) with count 2,
    then merge 3 the leftover (a, b)."""
    from vector_db_ingestor_spark.queries import q_bpe_train_impl

    spark.createDataFrame(
        [(1, "aaa aaa ab", "en", "s", 0)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = q_bpe_train_impl(spark, str(tmp_path)).toPandas()
    rows = [
        (int(r["iteration"]), r["l"], r["r"], int(r["pair_count"]))
        for _, r in got.iterrows()
    ]
    assert rows == [
        (1, "a", "a", 4),
        (2, "aa", "a", 2),
        (3, "a", "b", 1),
    ]


def test_bpe_train_fixture_merges_are_plausible(spark, sf_dir):
    """On the real fixture: three merges, all counts positive and
    non-increasing (a later merge can never beat an earlier one — the
    earlier argmax would have chosen it), and merged symbols grow."""
    from vector_db_ingestor_spark.queries import q_bpe_train_impl

    got = q_bpe_train_impl(spark, sf_dir).toPandas()
    assert list(got["iteration"]) == [1, 2, 3]
    counts = list(got["pair_count"])
    assert all(c > 0 for c in counts)
    assert counts == sorted(counts, reverse=True)


# ------------------------------------------------------------- curation

def test_curation_pipeline_rule_precedence(spark, tmp_path):
    """First-failing-rule semantics on an adversarial micro-corpus: a
    doc that is BOTH a duplicate and too short reports exact_dup (the
    cascade order), the duplicate group's min doc_id is the keeper,
    and each later rule fires only when every earlier one passes."""
    from vector_db_ingestor_spark.queries import q_curation_pipeline_impl

    good = "the quick brown fox jumps over the lazy dog today"
    rows = [
        (1, good, "en", "s", 0),                      # keep
        (2, "hi", "en", "s", 0),                      # too_short
        (3, "hi", "en", "s", 0),                      # dup of 2 -> exact_dup
        (4, "12345 67890 11111 22222 33333", "en", "s", 0),  # low_alpha
        (5, "spam spam spam spam spam nice words here ok fine", "en", "s", 0),
        (6, good, "en", "s", 0),                      # dup of 1 -> exact_dup
    ]
    spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    got = {
        int(r["doc_id"]): r["reason"]
        for _, r in q_curation_pipeline_impl(spark, str(tmp_path))
        .toPandas()
        .iterrows()
    }
    assert got == {
        1: "keep",
        2: "too_short",       # the representative still fails length
        3: "exact_dup",       # dup beats too_short (cascade order)
        4: "low_alpha",
        5: "high_repetition",  # 5/10 share > 0.3
        6: "exact_dup",
    }
