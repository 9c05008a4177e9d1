"""Declared query inventory (SURVEY.md §2B) — Spark implementations and
their DuckDB oracle SQL, consumed by ``__spark_entry__.py``.

Contract (driver): each entry in :data:`QUERIES` is a callable
``(spark, sf_dir) -> DataFrame``; :data:`ORACLE_SQL` holds the
equivalent ANSI SQL DuckDB runs on the same parquet views.  Keys
without oracle SQL get a rows-only check (non-SQL-expressible ops).

Determinism rules (FIXTURES.md): no uuid/rand/now, explicit tie-breaks
on every rank/limit, every computed column aliased identically on both
sides, floats rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_ingestor_spark.constants import PROBE_64, probe_sql_literal
from vector_db_ingestor_spark.operators import text_analysis as ta
from vector_db_ingestor_spark.operators.chunker import chunk_documents
from vector_db_ingestor_spark.operators.context import assemble_context
from vector_db_ingestor_spark.operators.dedup import (
    dedup_exact,
    embedding_near_dups,
    minhash_candidates,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from vector_db_ingestor_spark.operators.topk import knn_per_group, topk_cosine
from vector_db_ingestor_spark.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


_PROBE_SQL = probe_sql_literal()
# cosine against the fixed probe, rendered exactly like functions/vector.py
_SCORE_SQL = (
    f"round(list_dot_product(embedding::DOUBLE[], {_PROBE_SQL})"
    f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    f" * sqrt(list_dot_product({_PROBE_SQL}, {_PROBE_SQL}))), 6)"
)


# =====================================================================
# P1 relational basics
# =====================================================================

@query(
    "q_scan_project",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
    FROM orders
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + projection; Catalyst prunes the read schema to the
    four selected columns (check: ReadSchema in .explain)."""
    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )


@query(
    "q_filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
    FROM lineitem
    WHERE (l_quantity > 30.0 AND l_discount <= 0.05)
       OR (l_returnflag = 'R' AND l_tax > 0.07)
    """,
)
def q_filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive/disjunctive predicates, pushed to the parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 30.0) & (F.col("l_discount") <= 0.05)) | (
        (F.col("l_returnflag") == "R") & (F.col("l_tax") > 0.07)
    )
    return li.filter(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )


@query(
    "q_sort_limit",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
    LIMIT 100
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-n: compiles to TakeOrderedAndProject (per-partition
    k-heaps, no full sort) — the pattern that scales to 100 TB."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .orderBy(
            F.col("l_extendedprice").desc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
    )


# =====================================================================
# P0 vector / reference-capability core
# =====================================================================

@query(
    "q_topk_cosine",
    oracle=f"""
    WITH scored AS (
        SELECT vec_id, label, {_SCORE_SQL} AS score
        FROM embeddings
        WHERE label IN (1, 3, 5, 7)
    )
    SELECT vec_id, label, score,
           CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank
    FROM scored
    ORDER BY score DESC, vec_id ASC
    LIMIT 10
    """,
)
def q_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10+R11: filtered exact top-k cosine vs the fixed probe
    (reference search_for_rag, src/PDFToChromaIngester.py:250-287)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return topk_cosine(
        emb, PROBE_64, k=10, predicate=F.col("label").isin(1, 3, 5, 7)
    ).select("vec_id", "label", "score", "rank")


@query(
    "q_knn_per_label",
    oracle=f"""
    SELECT vec_id, label, score, rank FROM (
        SELECT vec_id, label, {_SCORE_SQL} AS score,
               CAST(row_number() OVER (
                   PARTITION BY label
                   ORDER BY {_SCORE_SQL} DESC, vec_id ASC) AS INTEGER) AS rank
        FROM embeddings
    ) WHERE rank <= 3
    """,
)
def q_knn_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k (batched R10): best 3 probe-neighbors per label."""
    emb = load_table(spark, sf_dir, "embeddings")
    return knn_per_group(emb, PROBE_64, group_col="label", k=3).select(
        "vec_id", "label", "score", "rank"
    )


@query(
    "q_dedup_exact",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash, lowest doc_id survives."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup_exact(docs).select("doc_id", "lang", "source", "n_chars")


@query(
    "q_doc_stats",
    oracle=f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars,
           round(avg(length(text)), 6) AS avg_chars,
           CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_ws_tokens,
           CAST(sum(len(regexp_extract_all(text, '{ta.TOKEN_REGEX}'))) AS BIGINT) AS total_re_tokens,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 6) AS avg_ws_tokens
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
)
def q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus statistics (text analysis north star)."""
    return ta.doc_stats(load_table(spark, sf_dir, "documents"), "source")


def q_chunk_explode_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 chunker as 1->N explosion (rows-only check: the last-match
    sentence snapping is not SQL-expressible; golden pytest instead)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return chunk_documents(docs, chunk_size=150, overlap=20).select(
        "doc_id", "chunk_index", "chunk"
    )


QUERIES["q_chunk_explode"] = q_chunk_explode_impl
