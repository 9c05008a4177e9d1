"""Round-9 additions: Gopher-style filter-cascade report, token-entropy
scoring, cross-source near-dup overlap matrix.  Each is checked against
an independent driver-side Python recomputation on the fixtures (the
DuckDB hash gate is scripts/check_oracle.py + the driver)."""

import math
import re
from collections import Counter

import pandas as pd
import pytest

from vector_db_ingestor_spark.operators.text_analysis import STOPWORDS
from vector_db_ingestor_spark.queries import (
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_WORDS,
    GOPHER_MWL_HI,
    GOPHER_MWL_LO,
    QUERIES,
)


@pytest.fixture(scope="module")
def docs_pdf(sf_dir):
    return pd.read_parquet(f"{sf_dir}/documents.parquet")


def _py_flags(text: str) -> dict:
    toks = re.split(r"\s+", text.strip())
    n_words = len(toks)
    nonspace = len(re.sub(r"\s+", "", text.strip()))
    mwl = nonspace / max(n_words, 1)
    symr = len(re.sub(r"[^.!?,;:]", "", text)) / max(len(text), 1)
    stop_hits = sum(1 for t in re.split(r"\s+", text.strip().lower()) if t in STOPWORDS)
    return {
        "min_words": n_words < GOPHER_MIN_WORDS,
        "max_words": n_words > GOPHER_MAX_WORDS,
        "mean_word_len": mwl < GOPHER_MWL_LO or mwl > GOPHER_MWL_HI,
        "symbol_ratio": symr > GOPHER_MAX_SYMBOL_RATIO,
        "no_stopwords": stop_hits == 0,
    }


def test_filter_report_matches_python_recount(spark, sf_dir, docs_pdf):
    got = {
        r["rule"]: (r["n_fail"], r["fail_rate"])
        for r in QUERIES["q_docs_filter_report"](spark, sf_dir).collect()
    }
    flags = [_py_flags(t) for t in docs_pdf["text"]]
    n = len(flags)
    want = {rule: sum(f[rule] for f in flags) for rule in flags[0]}
    want["pass_all"] = sum(1 for f in flags if not any(f.values()))
    assert set(got) == set(want)
    for rule, expect in want.items():
        n_fail, rate = got[rule]
        assert n_fail == expect, rule
        assert rate == pytest.approx(expect / n, abs=1e-6), rule
    # the cascade must discriminate on the fixtures: survivors are a
    # strict, non-empty subset
    assert 0 < got["pass_all"][0] < n


def test_text_entropy_matches_python_recount(spark, sf_dir, docs_pdf):
    got = {
        r["doc_id"]: r
        for r in QUERIES["q_text_entropy"](spark, sf_dir).collect()
    }
    assert len(got) == len(docs_pdf)
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        toks = [t for t in re.split(r"\s+", text.strip().lower()) if t]
        tf = Counter(toks)
        n = len(toks)
        row = got[doc_id]
        assert row["n_tokens"] == n
        assert row["n_terms"] == len(tf)
        assert row["ttr"] == pytest.approx(len(tf) / n, abs=1e-6)
        ent = math.log(n) - sum(c * math.log(c) for c in tf.values()) / n
        assert row["entropy"] == pytest.approx(ent, abs=1e-5)
        # Shannon bound: 0 <= H <= ln(n_terms), up to the 6dp rounding
        # the query applies (half-ulp = 5e-7)
        assert -5e-7 <= row["entropy"] <= math.log(len(tf)) + 5e-7


def test_crosssource_totals_match_candidate_pairs(spark, sf_dir, docs_pdf):
    from vector_db_ingestor_spark.operators.dedup import minhash_candidates
    from vector_db_ingestor_spark.tables import load_table

    out = QUERIES["q_dedup_crosssource"](spark, sf_dir).collect()
    assert out, "fixtures are built to contain cross-source near-dups"
    docs = load_table(spark, sf_dir, "documents")
    n_cand = minhash_candidates(
        docs, num_perm=64, bands=16, shingle_n=3, hash_family="md5"
    ).count()
    assert sum(r["n_pairs"] for r in out) == n_cand
    src = dict(zip(docs_pdf["doc_id"], docs_pdf["source"]))
    assert set(src.values()) >= {r["source_a"] for r in out}
    for r in out:
        assert r["source_a"] <= r["source_b"]
        assert r["n_pairs"] >= 1
        assert 0.0 <= r["avg_est"] <= r["max_est"] <= 1.0
