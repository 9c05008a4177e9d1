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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from vector_db_ingestor_spark.functions.literals import (
    lit_double_matrix,
    lit_doubles,
)

from vector_db_ingestor_spark.constants import (
    EMBEDDING_DIM,
    PROBE_64,
    PROBE_BATCH,
    probe_sql_literal,
)
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


def _score_sql_for(probe_lit: str) -> str:
    """Cosine against a probe literal, rendered exactly like
    functions/vector.py."""
    return (
        f"round(list_dot_product(embedding::DOUBLE[], {probe_lit})"
        f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
        f" * sqrt(list_dot_product({probe_lit}, {probe_lit}))), 6)"
    )


# cosine against the fixed probe
_SCORE_SQL = _score_sql_for(_PROBE_SQL)


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


def _topk_batch_oracle(k: int = 5) -> str:
    from vector_db_ingestor_spark.constants import PROBE_BATCH

    probes = " UNION ALL ".join(
        f"SELECT {i} AS query_idx, {probe_sql_literal(p)} AS qv"
        for i, p in enumerate(PROBE_BATCH)
    )
    return f"""
    WITH p AS ({probes})
    SELECT query_idx, vec_id, score, rank FROM (
        SELECT query_idx, vec_id, score,
               CAST(row_number() OVER (
                   PARTITION BY query_idx
                   ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank
        FROM (
            SELECT p.query_idx, e.vec_id,
                   round(list_dot_product(e.embedding::DOUBLE[], p.qv)
                         / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                            * sqrt(list_dot_product(p.qv, p.qv))), 6) AS score
            FROM embeddings e CROSS JOIN p
        )
    ) WHERE rank <= {k}
    """


@query("q_topk_batch", oracle=_topk_batch_oracle())
def q_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched multi-probe exact top-k (Chroma query_texts list parity,
    src/PDFToChromaIngester.py:228-231): 3 probes, ONE collection scan,
    per-probe window rank."""
    from vector_db_ingestor_spark.constants import PROBE_BATCH
    from vector_db_ingestor_spark.operators.topk import topk_cosine_batch

    emb = load_table(spark, sf_dir, "embeddings")
    probes = spark.createDataFrame(
        [(i, p) for i, p in enumerate(PROBE_BATCH)],
        "query_idx INT, query_vec ARRAY<DOUBLE>",
    )
    return topk_cosine_batch(emb, probes, k=5).select(
        "query_idx", "vec_id", "score", "rank"
    )


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
    """R4 chunker as 1->N explosion.  The fixed-window sentence-snapping
    loop IS SQL-expressible after all: a recursive CTE advances the
    (start, snapped-end) state exactly like the Python loop, so the
    reference-parity chunker gets an exact value oracle (upgraded from
    rows-only; the golden pytest remains the unit gate)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # small parquet arrives as one split; rebalance so the Arrow
        # UDF stage uses every core (at scale the scan is already wide)
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return chunk_documents(docs, chunk_size=150, overlap=20).select(
        "doc_id", "chunk_index", "chunk"
    )


# Python str.strip() whitespace set (every code point where
# str.isspace() is true, CPython 3.x / Unicode 15) as a DuckDB string
# expression — trim() with only the 6 ASCII chars would diverge from the
# chunker kernel on \x1c-\x1f, NEL, NBSP and the U+2000 block.
_PY_STRIP_SET = " || ".join(
    f"chr({cp})"
    for cp in (
        [0x09, 0x0A, 0x0B, 0x0C, 0x0D, 0x1C, 0x1D, 0x1E, 0x1F, 0x20,
         0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
)


def _chunker_oracle(chunk_size: int = 150, overlap: int = 20) -> str:
    """DuckDB recursive-CTE mirror of operators/chunker.chunk_text
    (reference parity: src/PDFToChromaIngester.py:94-124).

    State per doc is (start, snapped end); each recursion step is one
    loop iteration: window = text[end-overlap : end+1], snap to the
    LAST sentence ending in the window (max of four reverse-strpos
    scans, the rfind equivalent), stride = snapped_end - overlap.
    Pieces are trimmed with Python's str.strip() whitespace set and
    empties dropped BEFORE numbering; short docs pass through whole and
    unstripped — every quirk the Python chunker preserves verbatim.
    Positions are 0-based throughout, converted only inside substr.
    """
    cs, ov = chunk_size, overlap
    needles = [
        ("'. '", "' .'"),
        ("'! '", "' !'"),
        ("'? '", "' ?'"),
        ("(chr(10) || chr(10))", "(chr(10) || chr(10))"),
    ]

    def last0(rev: str) -> str:
        return (
            f"(CASE WHEN strpos(reverse(w), {rev}) = 0 THEN -1 "
            f"ELSE length(w) - (strpos(reverse(w), {rev}) - 1) - 2 END)"
        )

    def snapped_end(start: str) -> str:
        w = f"substr(text, ({start}) + {cs} - {ov} + 1, {ov} + 1)"
        best = (
            f"(SELECT greatest({', '.join(last0(rev) for _, rev in needles)})"
            f" FROM (SELECT {w} AS w))"
        )
        return (
            f"(CASE WHEN ({start}) + {cs} < n THEN "
            f"(CASE WHEN {best} >= 0 THEN ({start}) + {cs} - {ov} + {best} + 2 "
            f"ELSE ({start}) + {cs} END) "
            f"ELSE ({start}) + {cs} END)"
        )

    strip_set = _PY_STRIP_SET
    return f"""
    WITH RECURSIVE st AS (
        SELECT doc_id, text, length(text) AS n, 0 AS s,
               {snapped_end('0')} AS e
        FROM documents WHERE length(text) > {cs}
        UNION ALL
        SELECT doc_id, text, n, e - {ov} AS s,
               {snapped_end(f'(e - {ov})')} AS e
        FROM st WHERE e - {ov} < n
    ),
    pieces AS (
        SELECT doc_id, s,
               trim(substr(text, s + 1, e - s), {strip_set}) AS chunk
        FROM st
    )
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
                AS INTEGER) AS chunk_index,
           chunk
    FROM pieces WHERE chunk <> ''
    UNION ALL
    SELECT doc_id, CAST(0 AS INTEGER) AS chunk_index, text AS chunk
    FROM documents WHERE length(text) <= {cs}
    """


QUERIES["q_chunk_explode"] = q_chunk_explode_impl
ORACLE_SQL["q_chunk_explode"] = _chunker_oracle()


# =====================================================================
# P1 relational core: joins
# =====================================================================

@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join orders x customer. customer is ~1.5% the size of
    orders, so AQE converts the shuffle join to broadcast at runtime."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "c_custkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "q_join_broadcast",
    oracle="""
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with explicitly broadcast dims (nation: 25 rows,
    region: 5 rows) — zero shuffle on the fact side until the final
    5-group aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
        )
        .orderBy("r_name")
    )


@query(
    "q_join_semi_anti",
    oracle="""
    SELECT c_custkey, c_name, 'has_urgent_order' AS tag
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT c_custkey, c_name, 'no_urgent_order' AS tag
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
)
def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi (EXISTS) and left_anti (NOT EXISTS) on one build side."""
    c = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    semi = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .withColumn("tag", F.lit("has_urgent_order"))
    )
    anti = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .withColumn("tag", F.lit("no_urgent_order"))
    )
    return semi.unionAll(anti)


@query(
    "q_join_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 150000.0) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer survives; nulls where the
    filtered probe side has no match (filter applied pre-join, which
    outer joins cannot push down — ordering matters and is explicit)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


# =====================================================================
# P1 relational core: aggregation
# =====================================================================

@query(
    "q_agg_group",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 6) AS avg_qty,
           round(avg(l_extendedprice), 6) AS avg_price,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate with map-side partial agg;
    the shuffle moves only (2-key x 8-agg) partial states."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct_customers,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(max(o_totalprice), 2) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(distinct) expands to a two-stage aggregate in Spark; the
    first stage dedups (key, custkey) pairs map-side."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_distinct_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
        )
        .orderBy("o_orderpriority")
    )


# configured HLL++ accuracy for q_agg_approx; the within-rsd quality
# pin (tests/test_operators.py) references this same constant so the
# test bound can never silently diverge from the query's rsd
AGG_APPROX_RSD = 0.02


def q_agg_approx_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — constant memory per
    group at any scale; rows-only check (approximate by design)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", AGG_APPROX_RSD).alias("approx_parts"),
            F.count("*").alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


QUERIES["q_agg_approx"] = q_agg_approx_impl


# =====================================================================
# P1 relational core: windows
# =====================================================================

@query(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
               CAST(row_number() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn,
               CAST(rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
               CAST(dense_rank() OVER (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
        FROM orders
    ) WHERE rn <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per partition; single shuffle on
    the partition key serves all three window functions."""
    o = load_table(spark, sf_dir, "orders")
    w_tb = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    w = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.row_number().over(w_tb).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS moving_avg,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_sum
    FROM events
    """,
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (ROWS -2..0) and running (unbounded..0) frame aggregates.
    Streaming frames — constant memory per partition at any scale."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 6).alias("moving_avg"),
        F.round(
            F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 6
        ).alias("running_sum"),
    )


@query(
    "q_window_analytic",
    oracle="""
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_value,
           lead(event_type) OVER w AS next_type,
           first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag / lead / first_value analytic functions."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("event_type").over(w).alias("next_type"),
        F.first("value").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "first_val"
        ),
    )


# =====================================================================
# P1 relational core: set ops + scalar function battery
# =====================================================================

@query(
    "q_set_ops",
    oracle="""
    WITH urgent AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE o_orderpriority = '1-URGENT'),
         finished AS (SELECT DISTINCT o_custkey FROM orders
                      WHERE o_orderstatus = 'F')
    SELECT o_custkey, 'both' AS tag FROM (SELECT * FROM urgent INTERSECT SELECT * FROM finished)
    UNION ALL
    SELECT o_custkey, 'urgent_only' AS tag FROM (SELECT * FROM urgent EXCEPT SELECT * FROM finished)
    UNION ALL
    SELECT o_custkey, 'finished_only' AS tag FROM (SELECT * FROM finished EXCEPT SELECT * FROM urgent)
    """,
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION ALL with set (distinct) semantics."""
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey").distinct()
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return (
        urgent.intersect(finished).withColumn("tag", F.lit("both"))
        .unionAll(urgent.exceptAll(finished).withColumn("tag", F.lit("urgent_only")))
        .unionAll(finished.exceptAll(urgent).withColumn("tag", F.lit("finished_only")))
    )


@query(
    "q_scalar_fns",
    oracle="""
    SELECT event_id,
           upper(event_type) AS type_upper,
           substr(event_type, 1, 3) AS type_prefix,
           event_type || ':' || CAST(user_id AS VARCHAR) AS type_user,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           CAST(date_part('year', ts) AS INTEGER) AS ts_year,
           CAST(date_part('month', ts) AS INTEGER) AS ts_month,
           CAST(date_part('day', ts) AS INTEGER) AS ts_day,
           CAST(date_part('hour', ts) AS INTEGER) AS ts_hour,
           CAST(date_diff('day', DATE '2024-01-01', ts::DATE) AS INTEGER) AS days_since,
           round(value * 1.1, 4) AS value_taxed,
           round(abs(value - 50.0), 4) AS value_dev,
           CAST(strftime(date_trunc('month', ts), '%Y-%m-%d') AS VARCHAR) AS month_str
    FROM events
    WHERE event_type IN ('click', 'purchase', 'error')
    """,
)
def q_scalar_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar function battery: string / json / date / math built-ins,
    all JVM-side expressions inside one codegen stage."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("event_type").isin("click", "purchase", "error")).select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.concat_ws(":", F.col("event_type"), F.col("user_id").cast("string")).alias(
            "type_user"
        ),
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        F.year("ts").alias("ts_year"),
        F.month("ts").alias("ts_month"),
        F.dayofmonth("ts").alias("ts_day"),
        F.hour("ts").alias("ts_hour"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "days_since"
        ),
        F.round(F.col("value") * 1.1, 4).alias("value_taxed"),
        F.round(F.abs(F.col("value") - 50.0), 4).alias("value_dev"),
        F.date_format(F.date_trunc("month", "ts"), "yyyy-MM-dd").alias("month_str"),
    )


# =====================================================================
# P0 RAG context assembly + multimodal struct + UDF surface
# =====================================================================

@query(
    "q_context_budget",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id, text,
               CAST(row_number() OVER (PARTITION BY source
                    ORDER BY n_chars DESC, doc_id ASC) AS INTEGER) AS rank
        FROM documents
        QUALIFY rank <= 10
    ), pieces AS (
        SELECT source, rank,
               '[Source: ' || source || ', Chunk: ' || source || '_chunk_'
                 || CAST(doc_id AS VARCHAR) || ']' || chr(10) || text || chr(10) AS piece
        FROM ranked
    ), cum AS (
        SELECT source, rank, piece,
               sum(length(piece)) OVER (PARTITION BY source ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_len
        FROM pieces
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_pieces,
           string_agg(piece, e'\\n---\\n' ORDER BY rank) AS context,
           CAST(length(string_agg(piece, e'\\n---\\n' ORDER BY rank)) AS INTEGER) AS context_len
    FROM cum
    WHERE cum_len <= 2500
    GROUP BY source
    """,
)
def q_context_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14 greedy char-budget context assembly
    (get_context_for_rag, src/PDFToChromaIngester.py:289-314): rank top
    10 docs per source, format as the reference's piece template, keep
    the prefix whose running length fits the 2500-char budget, join with
    the reference separator."""
    from vector_db_ingestor_spark.operators.context import format_piece

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    ranked = (
        docs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .withColumn(
            "piece",
            format_piece(
                F.col("source"),
                F.concat(F.col("source"), F.lit("_chunk_"), F.col("doc_id")),
                F.col("text"),
            ),
        )
    )
    return assemble_context(
        ranked, group_col="source", rank_col="rank", piece_col="piece", budget=2500
    ).select("source", "n_pieces", "context", "context_len")


@query(
    "q_multimodal_struct",
    oracle="""
    SELECT doc_id, lang, label,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(length(text) AS INTEGER) AS text_chars,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS emb_norm
    FROM documents d
    JOIN embeddings e ON d.doc_id = e.vec_id
    WHERE d.n_chars > 200 AND e.label < 5
    """,
)
def q_multimodal_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal column pattern: text + embedding carried together as
    one struct column through a join and filter, fields projected out at
    the end.  The struct survives Catalyst column pruning — only the
    struct fields actually read reach the scan."""
    from vector_db_ingestor_spark.functions.vector import l2_norm

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    joined = (
        docs.join(emb, docs.doc_id == emb.vec_id)
        .filter((F.col("n_chars") > 200) & (F.col("label") < 5))
        .withColumn("mm", F.struct(F.col("text"), F.col("embedding")))
    )
    return joined.select(
        "doc_id",
        "lang",
        "label",
        F.size(F.col("mm.embedding")).alias("dim"),
        F.length(F.col("mm.text")).alias("text_chars"),
        F.round(l2_norm(F.col("mm.embedding")), 6).alias("emb_norm"),
    )


@query(
    "q_udf_surface",
    oracle="""
    SELECT vec_id,
           'L' || CAST(label AS VARCHAR) AS label_tag,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS emb_norm
    FROM embeddings
    """,
)
def q_udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDF surface (R7-shaped): one row-at-a-time Python UDF (label tag)
    and one Arrow-batched pandas UDF (vectorized L2 norm via numpy) —
    the two Python extension points, both SQL-mirrorable for the oracle.
    The pandas UDF is the pattern the embedding stage uses
    (cf. src/PDFToChromaIngester.py:41-49)."""
    from vector_db_ingestor_spark.functions.udfs import emb_norm_udf, label_tag_udf

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        label_tag_udf(F.col("label")).alias("label_tag"),
        emb_norm_udf(F.col("embedding")).alias("emb_norm"),
    )


# =====================================================================
# P0 text analysis battery
# =====================================================================

@query(
    "q_text_quality",
    oracle="""
    SELECT doc_id,
           round(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                 / greatest(length(text), 1), 6) AS punct_ratio,
           round(len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                     t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                 / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1), 6)
               AS stop_ratio,
           round(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1), 6)
               AS mean_tok_len,
           round(0.4 * least(length(text) / 500.0, 1.0)
               + 0.3 * (1.0 - least(length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                                    / greatest(length(text), 1), 1.0))
               + 0.3 * least((len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                              t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
                              / greatest(len(string_split_regex(lower(trim(text)), '\\s+')), 1))
                             / 0.1, 1.0), 6) AS quality
    FROM documents
    """,
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: punctuation ratio, stopword ratio, mean token
    length, combined deterministic [0,1] score — all JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(ta.punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(ta.stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
        F.round(ta.mean_token_len(F.col("text")), 6).alias("mean_tok_len"),
        ta.quality_score(F.col("text")).alias("quality"),
    )


@query(
    "q_text_lang",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
           len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               t -> list_contains(['the','and','of','to','with'], t))) AS hits_en,
           len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               t -> list_contains(['der','die','das','und','mit'], t))) AS hits_de,
           len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               t -> list_contains(['el','los','las','por','con'], t))) AS hits_es,
           len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
               t -> list_contains(['le','les','des','et','avec'], t))) AS hits_fr
        FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
                WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
                WHEN hits_es >= hits_fr THEN 'es'
                ELSE 'fr' END AS lang_pred,
           (lang = CASE WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
                WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
                WHEN hits_es >= hits_fr THEN 'es'
                ELSE 'fr' END) AS is_match
    FROM scored
    """,
)
def q_text_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit argmax with a fixed
    priority order (en > de > es > fr on ties) — a declared
    deterministic rule, mirrored verbatim in the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")

    def hits(words):
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    h_en = hits(["the", "and", "of", "to", "with"])
    h_de = hits(["der", "die", "das", "und", "mit"])
    h_es = hits(["el", "los", "las", "por", "con"])
    h_fr = hits(["le", "les", "des", "et", "avec"])
    pred = (
        F.when((h_en >= h_de) & (h_en >= h_es) & (h_en >= h_fr), "en")
        .when((h_de >= h_es) & (h_de >= h_fr), "de")
        .when(h_es >= h_fr, "es")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        "lang",
        pred.alias("lang_pred"),
        (F.col("lang") == pred).alias("is_match"),
    )


@query(
    "q_text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           CAST(count(*) OVER (
               PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
           ) AS BIGINT) AS fp_count
    FROM documents
    """,
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 over case/whitespace-normalized
    text + per-fingerprint cardinality (near-exact dup detection key)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = ta.fingerprint(F.col("text"))
    w = Window.partitionBy(fp)
    return docs.select(
        "doc_id",
        fp.alias("fp"),
        F.count("*").over(w).alias("fp_count"),
    )


# =====================================================================
# P2: grouping sets
# =====================================================================

@query(
    "q_agg_rollup_cube",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q_agg_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (prio, status), (prio), () — one pass,
    Spark expands to a union of grouping sets inside the aggregate."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


# =====================================================================
# P0 dedup family (north star)
# =====================================================================

def q_dedup_minhash_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs (shingle -> 64 minhash perms -> 16
    bands -> bucket join) with the signature-agreement jaccard
    estimate.  Uses the portable md5 hash family, so the whole
    pipeline — signatures, band buckets, candidate set, and the
    est_jaccard values themselves — is a closed form the DuckDB oracle
    reproduces exactly (upgraded from a rows-only check)."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_candidates(
        docs, num_perm=64, bands=16, shingle_n=3, hash_family="md5"
    ).orderBy("id_a", "id_b")


def _minhash_md5_cte(num_perm: int, bands: int, shingle_n: int) -> str:
    """Shared WITH-clause body mirroring the md5 minhash family
    (minhash_signature / minhash_perm_consts in operators/dedup.py):
    grams -> 32-bit md5 base -> affine-permutation minima -> band-key
    structs.  Both minhash oracles build on this so the closed form
    lives in exactly one place."""
    from vector_db_ingestor_spark.operators.dedup import (
        MINHASH_P,
        minhash_perm_consts,
    )

    r = num_perm // bands
    mins = ",\n               ".join(
        f"list_min(list_transform(hh, x -> (x * {a} + {b}) % {MINHASH_P}))"
        for a, b in minhash_perm_consts(num_perm)
    )
    structs = ",\n            ".join(
        "{'bi': %d, 'bk': md5(%s)}"
        % (
            b,
            " || '|' || ".join(f"s[{b * r + j + 1}]::VARCHAR" for j in range(r)),
        )
        for b in range(bands)
    )
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    gram = " || ' ' || ".join(f"{toks}[i+{j}]" if j else f"{toks}[i]"
                              for j in range(shingle_n))
    hi = f"len({toks})" if shingle_n == 2 else f"len({toks}) - {shingle_n - 2}"
    return f"""
    WITH g AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, {hi}),
                   i -> {gram})) AS grams
        FROM documents
    ),
    h AS (
        SELECT doc_id, grams,
               list_transform(grams,
                   x -> CAST('0x' || substring(md5(x), 1, 8) AS BIGINT)) AS hh
        FROM g WHERE len(grams) > 0
    ),
    sig AS (
        SELECT doc_id, grams,
               [{mins}] AS s
        FROM h
    ),
    bands AS (
        SELECT doc_id, grams, s, unnest([
            {structs}
        ], recursive := true)
        FROM sig
    )"""


def _minhash_md5_candidates_oracle(num_perm: int = 64, bands: int = 16) -> str:
    """DuckDB mirror of md5-family minhash CANDIDATES + estimate
    (trigram shingles): the shared candidate CTEs plus est_jaccard =
    fraction of agreeing minhash components."""
    return f"""{_minhash_md5_cte(num_perm, bands, shingle_n=3)}
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_filter(range(1, {num_perm} + 1),
                 i -> a.s[i] = b.s[i])) / {num_perm}.0, 6) AS est_jaccard
    FROM bands a JOIN bands b
      ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    """


QUERIES["q_dedup_minhash"] = q_dedup_minhash_impl
ORACLE_SQL["q_dedup_minhash"] = _minhash_md5_candidates_oracle()


def q_dedup_simhash_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (64-bit fingerprint, pigeonhole band
    blocking, Hamming <= 10).  Python stage = one vectorized pandas UDF
    for the fingerprint; blocking join is JVM-side.  The FNV-1a
    fingerprint is a closed form, so the oracle reproduces fingerprints,
    band blocking, and Hamming distances exactly (HUGEINT arithmetic
    mirrors the mod-2^64 fold) — upgraded from a rows-only check.

    Recall note: max_hamming=10 > bands-1=3, so this is BANDED recall
    by declaration — pairs at Hamming 4-10 whose differing bits spread
    across all four bands share no block and are missed (the oracle
    mirrors the banding, so hash parity is unaffected).  The operator
    warns at call time; candidate-generation semantics are intended
    here."""
    import warnings

    docs = load_table(spark, sf_dir, "documents")
    with warnings.catch_warnings():
        # banded-recall semantics are deliberate for this key (see
        # docstring); silence the operator's partial-recall warning so
        # driver/bench logs stay clean
        warnings.simplefilter("ignore", UserWarning)
        pairs = simhash_near_dups(docs, max_hamming=10, bands=4)
    return pairs.orderBy("id_a", "id_b")


def _simhash_oracle(max_hamming: int = 10, bands: int = 4) -> str:
    """DuckDB mirror of simhash_near_dups: per-token FNV-1a 64, +-1 bit
    votes, strict-majority fingerprint, 16-bit pigeonhole bands,
    bit_count(xor) Hamming verify.  The HUGEINT fold reproduces the
    mod-2^64 FNV arithmetic exactly; `ascii(c)` equals the utf-8 byte
    only on ASCII text, so this oracle is valid for ASCII corpora (the
    fixtures are all-ASCII — pinned in tests/test_operators.py, which
    also checks the fold against the Python reference)."""
    from vector_db_ingestor_spark.operators.dedup import simhash_band_layout

    n_bands = max_hamming + 1 if bands == "auto" else bands
    # the layout constants are SHARED with the operator (same function),
    # so engine and oracle can never disagree on band boundaries
    layout = simhash_band_layout(n_bands)
    powers = ", ".join(f"({i}, {1 << i}::HUGEINT)" for i in range(64))
    band_rows = ", ".join(
        f"({b}, {off}, {(1 << width) - 1})"
        for b, (off, width) in enumerate(layout)
    )
    return f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents WHERE trim(text) <> ''
    ),
    th AS (
        SELECT doc_id,
               list_reduce(
                   list_prepend(14695981039346656037::HUGEINT,
                       list_transform(string_split(tok, ''),
                                      c -> ascii(c)::HUGEINT)),
                   (h, b) -> ((h - (h % 256) + xor(h % 256, b))
                              * 1099511628211::HUGEINT)
                             % 18446744073709551616::HUGEINT) AS h
        FROM toks
    ),
    bits AS (
        SELECT doc_id, p.i, p.pw,
               sum(CASE WHEN (h // p.pw) % 2 = 1 THEN 1 ELSE -1 END) AS vote
        FROM th CROSS JOIN (VALUES {powers}) AS p(i, pw)
        GROUP BY doc_id, p.i, p.pw
    ),
    fp AS (
        SELECT doc_id,
               CAST(CASE WHEN u >= 9223372036854775808::HUGEINT
                         THEN u - 18446744073709551616::HUGEINT
                         ELSE u END AS BIGINT) AS fp
        FROM (SELECT doc_id,
                     sum(CASE WHEN vote > 0 THEN pw ELSE 0::HUGEINT END) AS u
              FROM bits GROUP BY doc_id)
    ),
    allfp AS (
        SELECT d.doc_id, coalesce(f.fp, 0) AS fp
        FROM documents d LEFT JOIN fp f ON d.doc_id = f.doc_id
    ),
    banded AS (
        SELECT doc_id, fp, b.bi,
               (fp >> b.off) & b.mask AS bv
        FROM allfp CROSS JOIN (VALUES {band_rows}) AS b(bi, off, mask)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS hamming
    FROM banded a JOIN banded b
      ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
    """


QUERIES["q_dedup_simhash"] = q_dedup_simhash_impl
ORACLE_SQL["q_dedup_simhash"] = _simhash_oracle()


def q_dedup_simhash_auto_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with COMPLETE recall: ``bands="auto"``
    derives max_hamming+1 = 11 near-equal bands covering all 64 bits,
    so every pair at Hamming <= 10 shares at least one band by the
    pigeonhole principle — no warning, no silently-missed pairs
    (contrast q_dedup_simhash's 4-band candidate semantics, which
    finds 24% of these pairs at this distance; SCALE_PROBE.md
    round-10).  Scale contract: 5-6-bit bands make within-band
    candidate volume ~n^2/2^width — near-quadratic in corpus size —
    so at 100 TB this is the exhaustive verify stage on a pre-blocked
    subset, not the corpus-wide candidate generator (the operator
    docstring states the dial).  The oracle reuses the FNV-1a HUGEINT
    fold and takes its band layout from the SAME simhash_band_layout
    call as the engine."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dups(docs, max_hamming=10, bands="auto").orderBy(
        "id_a", "id_b"
    )


QUERIES["q_dedup_simhash_auto"] = q_dedup_simhash_auto_impl
ORACLE_SQL["q_dedup_simhash_auto"] = _simhash_oracle(max_hamming=10, bands="auto")


@query(
    "q_dedup_ngram",
    oracle="""
    SELECT * FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        FROM (SELECT doc_id, lang,
                     list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                         i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                              string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
              FROM documents) a
        JOIN (SELECT doc_id, lang,
                     list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                         i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                              string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
              FROM documents) b
          ON a.lang = b.lang AND a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.2
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-bigram Jaccard near-dup pairs, lang-blocked self-join.
    At 100 TB the block key becomes minhash band buckets and this exact
    computation is the verify stage on candidates only."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, block_col="lang", n=2, threshold=0.2,
        # pre-vetted fixture corpus (plan-audited, hash-green): skip the
        # hot-gram guard's eager pre-pass and keep the builder fully lazy
        max_hot_df=None,
    )


def _lsh_bucket_sql(vec_expr: str, dim: int, n_bits: int) -> str:
    """DuckDB expression reproducing rp_lsh_bucket bit-for-bit: the
    hyperplanes are closed-form literals, so the approximate op gets an
    EXACT oracle."""
    from vector_db_ingestor_spark.operators.similarity import _hyperplane

    terms = []
    for bit in range(n_bits):
        lit = "[" + ", ".join(repr(x) for x in _hyperplane(dim, bit)) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product({vec_expr}, {lit}) > 0"
            f" THEN {1 << bit} ELSE 0 END)"
        )
    return " + ".join(terms)


def _dedup_embed_oracle(dim: int = 64, n_bits: int = 8, threshold: float = 0.3) -> str:
    # cosine as dot of pre-normalized vectors — the EXACT formula the
    # Spark operator uses (normalize once per row, one dot per pair);
    # mirroring the formulation keeps the rounded doubles bit-identical
    masks = ", ".join(str(1 << b) for b in range(n_bits))
    return f"""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                   x -> x / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS nv,
               {_lsh_bucket_sql("embedding::DOUBLE[]", dim, n_bits)} AS bkt
        FROM embeddings
    )
    SELECT * FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_dot_product(a.nv, b.nv), 6) AS cosine
        FROM e a JOIN e b
          ON a.vec_id < b.vec_id
         AND (a.bkt = b.bkt OR xor(a.bkt, b.bkt) IN ({masks}))
    ) WHERE cosine >= {threshold}
    """


@query("q_dedup_embed", oracle=_dedup_embed_oracle())
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucket blocked (random
    hyperplanes + 1-bit multiprobe) with exact cosine verify on
    candidates — the 100 TB blocking strategy, oracle-verified exactly
    because the hyperplanes are closed-form literals DuckDB can
    evaluate too."""
    from vector_db_ingestor_spark.constants import EMBEDDING_DIM

    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dups(emb, threshold=0.3, dim=EMBEDDING_DIM, n_bits=8)


# =====================================================================
# P2 temporal joins + streaming-shaped window agg
# =====================================================================

@query(
    "q_join_range",
    oracle="""
    SELECT e.event_id, CAST(count(c.ts) AS BIGINT) AS n_clicks
    FROM (SELECT event_id, ts FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT ts FROM events WHERE event_type = 'click') c
      ON c.ts <= e.ts AND c.ts >= e.ts - INTERVAL 5 MINUTE
    GROUP BY e.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: clicks within 5 minutes before each error.
    Implemented as a bucketed equi-join (operators/joins.py) — a hash
    join on time buckets + residual filter, not a nested-loop join."""
    from vector_db_ingestor_spark.operators.joins import range_join_count

    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("ts")
    return range_join_count(
        errors, clicks, "ts", "ts", 300, ["event_id"], count_alias="n_clicks"
    )


@query(
    "q_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, c.click_id AS asof_click_id
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_id
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest click at or before it
    per user.  Union-sort trick (operators/joins.py): one shuffle on
    user_id + a running last(ignorenulls) window — no per-row probing."""
    from vector_db_ingestor_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join(
        purchases, clicks, by="user_id", probe_ts="ts", build_ts="ts",
        value_cols=["click_id"],
    ).select("event_id", "user_id", F.col("asof_click_id"))


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate over the event stream, batch
    mode (oracle parity).  The same plan runs under Structured Streaming
    with a watermark — see streaming/windows.py and its test."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


# =====================================================================
# P2 approximate similarity search (rows-only: approximate by design)
# =====================================================================

def q_simjoin_lsh_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.ml BucketedRandomProjectionLSH approximate similarity
    self-join on unit-normalized embeddings."""
    from vector_db_ingestor_spark.operators.similarity import simjoin_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    return simjoin_lsh(emb, threshold_l2=1.2).orderBy("id_a", "id_b")


QUERIES["q_simjoin_lsh"] = q_simjoin_lsh_impl


def q_ann_lsh_topk_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH-bucketed approximate top-k for the fixed
    probe (bucket equi-join instead of full scan).  Hash-verified: the
    closed-form hyperplanes make bucketing deterministic, so the DuckDB
    oracle reproduces candidate set and ranking exactly."""
    from vector_db_ingestor_spark.constants import EMBEDDING_DIM
    from vector_db_ingestor_spark.operators.similarity import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    probes = spark.createDataFrame(
        [(0, PROBE_64)], schema="query_id INT, query_vec ARRAY<DOUBLE>"
    )
    return lsh_topk(emb, probes, dim=EMBEDDING_DIM, k=10, n_bits=4)


QUERIES["q_ann_lsh_topk"] = q_ann_lsh_topk_impl


def _ivf_open(spark: SparkSession, sf_dir: str):
    """Open (building on first use) the session's IVF index for
    ``sf_dir``: build-once under ``spark-warehouse/``, query-many —
    mirroring a deployment where ``ivf_write`` runs at ingest time and
    queries only ever see ``ivf_read``.  The cache key fingerprints the
    source parquet (size + mtime), so regenerated fixtures invalidate
    the index instead of silently serving stale assignments; the reuse
    gate is the ``_INDEX_SUCCESS`` marker ``ivf_write`` drops only
    after the centroid sidecar, not the collection's own ``_SUCCESS``
    (which lands before the sidecar exists)."""
    import hashlib
    import os

    from vector_db_ingestor_spark.constants import EMBEDDING_DIM
    from vector_db_ingestor_spark.operators.similarity import (
        ivf_index_complete,
        ivf_read,
        ivf_write,
    )

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = hashlib.md5(f"{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:10]
    except OSError:
        # non-local sf_dir: no fingerprint, rebuild every run.  The
        # path must be session-unique — a shared fixed path with
        # mode=overwrite would let two concurrent drivers on the same
        # warehouse clobber each other's index mid-read.
        fp = f"nofp_{hashlib.md5(spark.sparkContext.applicationId.encode()).hexdigest()[:10]}"
    index_path = os.path.join(
        repo_root, "spark-warehouse", f"ivf_index_{tag}_c8_i2_{fp}"
    )
    # without a source fingerprint a PRE-EXISTING marker proves nothing
    # about freshness, but the nofp path embeds this application's id —
    # a complete index there was built by THIS session, so reuse it
    # (a bench loop re-opens the index many times per session; one
    # build, not one per call)
    if fp.startswith("nofp") and not ivf_index_complete(spark, index_path):
        # session-unique paths would otherwise accumulate one
        # index-sized directory per application on a shared warehouse:
        # best-effort removal when THIS session exits (its own path
        # only — never another live session's)
        import atexit
        import shutil

        emb = load_table(spark, sf_dir, "embeddings")
        ivf_write(emb, index_path, dim=EMBEDDING_DIM, n_centroids=8, iters=2)
        atexit.register(shutil.rmtree, index_path, True)
    elif not ivf_index_complete(spark, index_path):
        emb = load_table(spark, sf_dir, "embeddings")
        ivf_write(emb, index_path, dim=EMBEDDING_DIM, n_centroids=8, iters=2)
    return ivf_read(spark, index_path)


def q_ann_ivf_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k over a PREBUILT index: build-once (train +
    persist partitioned by ``cid``), query-many (shortlist + pruned
    scan, zero training in the query path) — see :func:`_ivf_open` for
    the cache/freshness contract."""
    from vector_db_ingestor_spark.operators.similarity import ivf_topk

    indexed, centroids = _ivf_open(spark, sf_dir)
    return ivf_topk(indexed, centroids, PROBE_64, k=10, nprobe=4)


QUERIES["q_ann_ivf"] = q_ann_ivf_impl


def q_ann_ivf_batch_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF: two probes answered by ONE scan of the union'd
    shortlist partitions, a broadcast (cid, query) table routing rows
    to the probes that shortlisted their cid (operators/similarity.
    ivf_topk_batch).  Rows-only like its single-probe twin (the
    float-iterative k-means model is not cross-engine mirrorable);
    per-probe equality with ivf_topk is pinned in
    tests/test_vector_functions.py."""
    from vector_db_ingestor_spark.operators.similarity import ivf_topk_batch

    indexed, centroids = _ivf_open(spark, sf_dir)
    probe2 = list(reversed(PROBE_64))
    return ivf_topk_batch(
        indexed, centroids, [(0, PROBE_64), (1, probe2)], k=10, nprobe=4
    )


QUERIES["q_ann_ivf_batch"] = q_ann_ivf_batch_impl


def _ivf_assign_centroids(dim: int = 64, n: int = 8) -> list[list[float]]:
    """Fixed deterministic centroids (md5-derived, the `_hyperplane`
    generator at an offset bit-space) for the IVF *assignment*
    companion key: the float-iterative k-means TRAINING is what keeps
    `q_ann_ivf`/`q_ann_ivf_batch` rows-only, so this key pins the other
    two (closed-form) thirds of the IVF path — nearest-centroid argmax
    assignment and nprobe shortlist selection — against literal
    centroids both engines can see."""
    from vector_db_ingestor_spark.operators.similarity import _hyperplane

    return [_hyperplane(dim, 1000 + j) for j in range(n)]


def q_ann_ivf_assign_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checked companion to the rows-only IVF family: with the
    centroid model held as literals, recompute every vector's cid
    (`_assign_cid`, the exact expression ivf_write/ivf_topk use, with
    sims rounded to 6dp so both engines argmax identical values) and
    the probe's nprobe=4 shortlist membership (`ivf_shortlist`,
    driver-side closed form).  The oracle independently re-derives BOTH
    from the same literals — so the assignment argmax, its first-wins
    tie-break, and the shortlist ranking are all cross-engine verified
    even though k-means training itself stays Spark-only."""
    from vector_db_ingestor_spark.operators.similarity import (
        _assign_cid,
        ivf_shortlist,
    )

    cents = _ivf_assign_centroids()
    shortlist = ivf_shortlist(cents, PROBE_64, nprobe=4)
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        _assign_cid(vec, cents, round_dp=6).alias("cid"),
    ).withColumn("in_shortlist", F.col("cid").isin(shortlist))


def _ivf_assign_oracle(nprobe: int = 4) -> str:
    """DuckDB mirror: same centroid literals, same rounded cosine,
    list_position/list_max argmax (first-wins like array_position),
    and the shortlist re-ranked in SQL (cosine desc, cid asc, LIMIT
    nprobe) instead of trusting the Spark side's Python selection."""
    cents = _ivf_assign_centroids()

    def cvec(c: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = cvec(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    cent_rows = ", ".join(f"({i}, {cvec(c)})" for i, c in enumerate(cents))
    sims = ", ".join(cos_sql(c) for c in cents)
    return f"""
    WITH cents(cid, cvec) AS (VALUES {cent_rows}),
    short AS (
        SELECT cid FROM cents
        ORDER BY (list_dot_product(cvec, {_PROBE_SQL})
                  / (sqrt(list_dot_product(cvec, cvec))
                     * sqrt(list_dot_product({_PROBE_SQL}, {_PROBE_SQL})))) DESC,
                 cid ASC
        LIMIT {nprobe}
    ),
    assigned AS (
        SELECT vec_id,
               CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id, [{sims}] AS sims FROM embeddings)
    )
    SELECT vec_id, cid, cid IN (SELECT cid FROM short) AS in_shortlist
    FROM assigned
    """


QUERIES["q_ann_ivf_assign"] = q_ann_ivf_assign_impl
ORACLE_SQL["q_ann_ivf_assign"] = _ivf_assign_oracle()


def q_ann_ivf_filtered_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-13 queue item: FILTERED ANN under the hash gate — the
    ``search_ann(filter_metadata=...)`` semantics (reference R11 at
    the index rung) on the literal-centroid IVF model.  The
    q_ann_ivf_assign assignment expression builds ``cid`` in-plan,
    then the PRODUCTION ``ivf_topk`` prunes to the probe's nprobe=4
    shortlist and applies the label predicate INSIDE the probed cells
    before exact cosine ranking — non-matching rows never enter the
    top-k (Chroma's filtered-HNSW shape, not post-filtering).  The
    oracle re-derives assignment argmax, shortlist ranking, filter,
    and the rounded-cosine top-10 from the same literals, so every
    piece of the filtered serving path is cross-engine checked.
    Scale: one narrow scan + TakeOrderedAndProject, zero shuffles."""
    from vector_db_ingestor_spark.operators.similarity import (
        _assign_cid,
        ivf_topk,
    )

    cents = _ivf_assign_centroids()
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    indexed = emb.withColumn("cid", _assign_cid(vec, cents, round_dp=6))
    return ivf_topk(
        indexed, cents, PROBE_64, k=10, nprobe=4,
        predicate=F.col("label").isin(1, 3, 5, 7),
    )


def _ivf_filtered_oracle(nprobe: int = 4, k: int = 10) -> str:
    """DuckDB mirror: the q_ann_ivf_assign CTEs (same centroid
    literals, same rounded-cosine argmax and shortlist re-rank) with
    the label filter applied inside shortlisted cells and the
    q_topk_cosine scorer ranking the survivors."""
    cents = _ivf_assign_centroids()

    def cvec(c: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = cvec(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    cent_rows = ", ".join(f"({i}, {cvec(c)})" for i, c in enumerate(cents))
    sims = ", ".join(cos_sql(c) for c in cents)
    return f"""
    WITH cents(cid, cvec) AS (VALUES {cent_rows}),
    short AS (
        SELECT cid FROM cents
        ORDER BY (list_dot_product(cvec, {_PROBE_SQL})
                  / (sqrt(list_dot_product(cvec, cvec))
                     * sqrt(list_dot_product({_PROBE_SQL}, {_PROBE_SQL})))) DESC,
                 cid ASC
        LIMIT {nprobe}
    ),
    assigned AS (
        SELECT vec_id, label, embedding,
               CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id, label, embedding, [{sims}] AS sims
              FROM embeddings)
    )
    SELECT vec_id, cid, {_SCORE_SQL} AS score
    FROM assigned
    WHERE cid IN (SELECT cid FROM short) AND label IN (1, 3, 5, 7)
    ORDER BY score DESC, vec_id ASC
    LIMIT {k}
    """


def q_ann_ivf_escalate_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-14 queue item: the filtered-ANN RECALL CONTRACT under the
    hash gate — ``search_ann(filter_metadata=..., escalate=True)``'s
    decision rule (double nprobe on underfill until filled or all
    cells probed; at all-cells-probed the result is the exact filtered
    top-k) expressed as ONE closed-form plan so DuckDB can replay it.

    On the literal-centroid model: cells are ranked by probe cosine
    (driver-side, the `ivf_shortlist` ordering), each filtered
    candidate carries its cell's probe rank ``rr``, one conditional
    aggregation counts survivors at every escalation depth (1, 2, 4),
    and a CASE picks the smallest depth with >= k survivors (else all
    8 cells).  The top-k within the chosen prefix wins, and
    ``nprobe_used`` is emitted as evidence of the escalation decision.
    The production loop (pipeline.py search_ann) probes incrementally
    instead of counting all cells up front — this closed form is the
    cross-engine-checkable statement of its SEMANTICS, e2e-tested at
    tests/test_pipeline.py::test_search_ann_filtered_escalation.
    Scale: two narrow scans (count pass reads cid+label only via
    column pruning; serve pass is TakeOrdered within the prefix) and
    one 1-row broadcast — no shuffle of data rows."""
    from vector_db_ingestor_spark.functions.vector import cosine_similarity
    from vector_db_ingestor_spark.operators.similarity import (
        _assign_cid,
        ivf_shortlist,
    )

    k = 25
    cents = _ivf_assign_centroids()
    order = ivf_shortlist(cents, PROBE_64, nprobe=len(cents))
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    pred = F.col("label") == 9
    cand = (
        emb.withColumn("cid", _assign_cid(vec, cents, round_dp=6))
        .filter(pred)
    )
    rr = F.lit(None).cast("int")
    for pos, cid in enumerate(order):
        rr = F.when(F.col("cid") == cid, pos + 1).otherwise(rr)
    cand = cand.withColumn("rr", rr)
    counts = cand.agg(
        F.count(F.when(F.col("rr") <= 1, 1)).alias("c1"),
        F.count(F.when(F.col("rr") <= 2, 1)).alias("c2"),
        F.count(F.when(F.col("rr") <= 4, 1)).alias("c4"),
    ).select(
        F.when(F.col("c1") >= k, 1)
        .when(F.col("c2") >= k, 2)
        .when(F.col("c4") >= k, 4)
        .otherwise(len(cents))
        .cast("int")
        .alias("nprobe_used")
    )
    scored = (
        cand.crossJoin(F.broadcast(counts))
        .filter(F.col("rr") <= F.col("nprobe_used"))
        .withColumn(
            "score",
            F.round(cosine_similarity(vec, lit_doubles(PROBE_64)), 6),
        )
    )
    w = Window.orderBy(F.col("score").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "cid", "score", "rank", "nprobe_used")
    )


def _ivf_escalate_oracle(k: int = 25) -> str:
    """DuckDB mirror: same centroid literals; cells ranked by probe
    cosine (the ivf_shortlist ordering re-derived in SQL), candidates
    filtered and tagged with their cell's rank, FILTER counts at each
    escalation depth, the same CASE picks nprobe_used, and the
    rounded-cosine top-k within the chosen prefix wins."""
    cents = _ivf_assign_centroids()

    def cvec(c: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = cvec(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    cent_rows = ", ".join(f"({i}, {cvec(c)})" for i, c in enumerate(cents))
    sims = ", ".join(cos_sql(c) for c in cents)
    n_cells = len(cents)
    return f"""
    WITH cents(cid, cvec) AS (VALUES {cent_rows}),
    ranked_cells AS (
        SELECT cid,
               CAST(row_number() OVER (
                   ORDER BY (list_dot_product(cvec, {_PROBE_SQL})
                             / (sqrt(list_dot_product(cvec, cvec))
                                * sqrt(list_dot_product({_PROBE_SQL},
                                                        {_PROBE_SQL})))) DESC,
                            cid ASC) AS INTEGER) AS rr
        FROM cents
    ),
    assigned AS (
        SELECT vec_id, label, embedding,
               CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id, label, embedding, [{sims}] AS sims
              FROM embeddings)
    ),
    cand AS (
        SELECT a.vec_id, a.cid, a.embedding, rc.rr
        FROM assigned a JOIN ranked_cells rc USING (cid)
        WHERE a.label = 9
    ),
    chosen AS (
        SELECT CAST(CASE WHEN count(*) FILTER (rr <= 1) >= {k} THEN 1
                         WHEN count(*) FILTER (rr <= 2) >= {k} THEN 2
                         WHEN count(*) FILTER (rr <= 4) >= {k} THEN 4
                         ELSE {n_cells} END AS INTEGER) AS nprobe_used
        FROM cand
    )
    SELECT vec_id, cid, score,
           CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC)
                AS INTEGER) AS rank,
           nprobe_used
    FROM (
        SELECT c.vec_id, c.cid, {_SCORE_SQL} AS score, ch.nprobe_used
        FROM cand c CROSS JOIN chosen ch
        WHERE c.rr <= ch.nprobe_used
    )
    ORDER BY score DESC, vec_id ASC
    LIMIT {k}
    """


# =====================================================================
# P0 ingestion pipeline + multimodal plumbing (rows-only: UDF-backed)
# =====================================================================

def q_ingest_pipeline_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference EP1 ingest chain (extract -> chunk -> enrich ->
    embed, src/PDFToChromaIngester.py:126-205) driven over fixture
    documents wrapped as synthetic single-stream PDFs: exercises the
    stdlib PDF extractor, chunker, metadata projections, deterministic
    ids and the embedding pandas UDF in one plan.  Hash-verified:
    extraction is the identity on the synthetic wrapping and the
    chunker has a recursive-CTE mirror, so the oracle recomputes
    chunk uids/counts/lengths exactly (upgraded from rows-only; the
    embedding stage is pinned by emb_dim here and by its own unit
    tests)."""
    from vector_db_ingestor_spark.pipeline import build_chunks

    docs = load_table(spark, sf_dir, "documents")
    files = docs.select(
        F.concat(F.lit("mem://"), F.col("doc_id")).alias("source"),
        F.concat(F.col("source"), F.lit("_"), F.col("doc_id"), F.lit(".pdf")).alias(
            "filename"
        ),
        F.col("n_chars").alias("file_bytes"),
        F.to_binary(
            F.concat(F.lit("stream\n("), F.col("text"), F.lit(") Tj\nendstream")),
            F.lit("utf-8"),
        ).alias("content"),
    )
    chunks = build_chunks(files, metadata={"category": "fixture"}, chunk_size=200, overlap=30)
    return chunks.select(
        "chunk_uid", "filename", "chunk_index", "total_chunks",
        F.length("text").alias("chunk_chars"), F.size("embedding").alias("emb_dim"),
    )


def _ingest_pipeline_oracle() -> str:
    """DuckDB mirror of the fused ingest chain over the synthetic
    single-stream PDFs: extraction is the identity on the fixture
    wrapping (``stream\\n(text) Tj\\nendstream`` round-trips verbatim —
    asserted against the real extractor in tests/test_pipeline.py), so
    the oracle chunks the raw text with the recursive-CTE chunker
    mirror (cs=200, ov=30), rebuilds the filename, and recomputes the
    deterministic sha-256 chunk uids.  total_chunks counts every piece
    the chunker returned (including whitespace-only pieces the kernel
    skips at emission), exactly like the Python loop."""
    ws = _PY_STRIP_SET
    return f"""
    WITH base AS ({_chunker_oracle(chunk_size=200, overlap=30)}),
    named AS (
        SELECT b.doc_id, b.chunk_index, b.chunk,
               d.source || '_' || CAST(d.doc_id AS VARCHAR) || '.pdf' AS filename,
               CAST(count(*) OVER (PARTITION BY b.doc_id) AS INTEGER)
                   AS total_chunks
        FROM base b JOIN documents d USING (doc_id)
    )
    SELECT sha256(filename || chr(1) || CAST(chunk_index AS VARCHAR)
                  || chr(1) || chunk) AS chunk_uid,
           filename, chunk_index, total_chunks,
           CAST(length(chunk) AS INTEGER) AS chunk_chars,
           CAST(64 AS INTEGER) AS emb_dim
    FROM named
    WHERE trim(chunk, {ws}) <> ''
    """


QUERIES["q_ingest_pipeline"] = q_ingest_pipeline_impl
ORACLE_SQL["q_ingest_pipeline"] = _ingest_pipeline_oracle()


def _multimodal_features_oracle(dim: int = 16) -> str:
    """Exact mirror of the sha256-chain stub decode (binary_ops.py
    ``_fake_decode``): byte i of sha256(utf8(text)) — recovered from the
    hex digest nibble-by-nibble — maps to ``(byte-128)/128``; the energy
    is the sum of squares.  All terms are exact dyadic rationals, so the
    double sums are bit-identical across engines.  dim must be <= 32
    (one digest block)."""
    assert dim <= 32
    byte_expr = (
        "((strpos('0123456789abcdef', h[2*i+1]) - 1) * 16"
        " + (strpos('0123456789abcdef', h[2*i+2]) - 1))"
    )
    return f"""
    SELECT media_id, modality, {dim} AS feat_dim,
           round(list_sum(list_transform(range(0, {dim}),
                 i -> pow(({byte_expr} - 128) / 128.0, 2))), 6) AS feat_energy
    FROM (SELECT doc_id AS media_id, 'text' AS modality,
                 sha256(coalesce(text, '')) AS h
          FROM documents)
    """


@query("q_multimodal_features", oracle=_multimodal_features_oracle())
def q_multimodal_features_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing over fixture data: text bytes
    as opaque binary content, deterministic stub decode to a fixed-dim
    feature vector via mapInPandas (multimodal/binary_ops.py).

    Hash-checked even though decode is a stub: the stub derives
    features from a sha256 chain precisely so the oracle can recompute
    them — the Arrow-batched mapInPandas plumbing under test is the
    same shape a real decoder would use."""
    from vector_db_ingestor_spark.multimodal.binary_ops import extract_features

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.to_binary(F.col("text"), F.lit("utf-8")).alias("content"),
        F.named_struct(
            F.lit("width"), F.lit(0), F.lit("height"), F.lit(0),
            F.lit("sample_rate"), F.lit(0), F.lit("duration_ms"),
            F.col("n_chars").cast("int"),
        ).alias("meta"),
    )
    feats = extract_features(media, dim=16)
    return feats.select(
        "media_id", "modality", "feat_dim",
        F.round(F.aggregate("features", F.lit(0.0), lambda a, x: a + x * x), 6).alias(
            "feat_energy"
        ),
    )


# =====================================================================
# Extended coverage: exact quantiles, pivot, SQL surface, streaming-
# shaped session/sliding windows (batch mode for oracle parity; the
# same plans run under Structured Streaming — streaming/windows.py)
# =====================================================================

@query(
    "q_agg_quantile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS price_q25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS price_q50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS price_q75,
           round(median(l_quantity), 4) AS qty_median,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    ``percentile`` == DuckDB ``quantile_cont``).  Exact percentile is a
    sort-based agg; at 100 TB prefer ``approx_percentile`` (t-digest,
    one pass, mergeable map-side) — kept exact here for the oracle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.25)), 4).alias("price_q25"),
        F.round(F.percentile("l_extendedprice", F.lit(0.50)), 4).alias("price_q50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.75)), 4).alias("price_q75"),
        F.round(F.median("l_quantity"), 4).alias("qty_median"),
        F.count("*").alias("n"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'F'), 2) AS qty_f,
           round(sum(l_quantity) FILTER (WHERE l_linestatus = 'O'), 2) AS qty_o,
           round(sum(l_extendedprice) FILTER (WHERE l_linestatus = 'F'), 2) AS price_f,
           round(sum(l_extendedprice) FILTER (WHERE l_linestatus = 'O'), 2) AS price_o
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation).  Explicit pivot values keep
    the plan a single hash-agg pass — no value-discovery job, no second
    shuffle; semantically identical to SQL FILTERed aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("price"),
        )
    )
    return p.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.col("F_price").alias("price_f"),
        F.col("O_price").alias("price_o"),
    )


@query(
    "q_sql_tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_sql_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL API surface: TPC-H Q3 shape (shipping priority) via
    ``spark.sql`` over registered views — same Catalyst plan as the
    DataFrame API (filters pushed below the joins into both scans, the
    customer side broadcast under AQE, top-10 as TakeOrderedAndProject)."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               date_format(o_orderdate, 'yyyy-MM-dd') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > TIMESTAMP '1998-01-01'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
        """
    )


@query(
    "q_stream_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         < INTERVAL 30 MINUTE THEN 0 ELSE 1 END AS new_sess
        FROM events
    ), sess AS (
        SELECT user_id, ts, value,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sess_no
        FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM sess
    GROUP BY user_id, sess_no
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows (30-minute gap, strict merge: a gap of
    exactly 30 min starts a new session — window end is exclusive).
    Oracle is the classic gaps-and-islands rewrite.  Batch mode here;
    the identical plan streams with a watermark (streaming/windows.py
    ``session_windows``)."""
    from vector_db_ingestor_spark.streaming.windows import session_windows

    ev = load_table(spark, sf_dir, "events")
    out = session_windows(ev, gap="30 minutes", key_col="user_id")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        "n_events",
        "total_value",
    )


@query(
    "q_stream_sliding",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM (
        SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS ws,
               event_type, value
        FROM events, range(2) t(k)
    )
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h/1h window counts per event type; each event fans out
    to exactly window/slide = 2 windows (the oracle materializes that
    fan-out with range(2)).  Batch mode; streams unchanged."""
    from vector_db_ingestor_spark.streaming.windows import sliding_counts

    ev = load_table(spark, sf_dir, "events")
    out = sliding_counts(ev, window="2 hours", slide="1 hour")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "total_value",
    )


# =====================================================================
# SQL surface widening: full TPC-H Q1, correlated subquery; skew-salted
# join (result-identical to the plain join, verified by the oracle);
# exact token frequency (text analysis)
# =====================================================================

_TPCH_Q1 = """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """


@query("q_sql_tpch_q1", oracle=_TPCH_Q1)
def q_sql_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary) through the SQL surface: the filter
    reaches the parquet scan as a pushed predicate, the aggregation is
    partial (map-side) then final — one shuffle of 6 tiny groups."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q1)


_SQL_SUBQ_CORR = """
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
    FROM orders o
    WHERE o_totalprice > 2 * (
        SELECT avg(o2.o_totalprice) FROM orders o2
        WHERE o2.o_custkey = o.o_custkey
    )
    """


@query("q_subquery_correlated", oracle=_SQL_SUBQ_CORR)
def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: orders at >2x their customer's mean.
    Catalyst decorrelates into an aggregate + equi-join — same shape
    a hand-written window/join would produce, declared declaratively."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_SUBQ_CORR)


@query(
    "q_join_skew_salted",
    oracle="""
    SELECT l.l_orderkey, l.l_partkey, p.p_brand,
           round(l.l_quantity, 2) AS qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size >= 25
    """,
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact->dim join (operators/joins.py salted_join):
    8-way salt on the fact side, dim replicated 8x — result-identical
    to the plain join, which is exactly what the oracle verifies."""
    from vector_db_ingestor_spark.operators.joins import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 25)
        .select("p_partkey", "p_brand")
    )
    joined = salted_join(
        li, p.withColumnRenamed("p_partkey", "l_partkey"), "l_partkey", n_salts=8
    )
    return joined.select(
        "l_orderkey", "l_partkey", "p_brand", F.round("l_quantity", 2).alias("qty")
    )


@query(
    "q_token_freq",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    )
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token ASC
    LIMIT 50
    """,
)
def q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus-wide token frequency, top 50 (text analysis).
    explode -> hash-agg -> TakeOrderedAndProject: the heavy shuffle is
    the (token, partial-count) pairs after map-side combine, and the
    global sort collapses into a per-partition top-k + driver merge."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(50)
    )


@query(
    "q_array_fns",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS n,
           round(embedding[1]::DOUBLE, 6) AS first_val,
           round(list_sum(list_transform(embedding::DOUBLE[], x -> abs(x))), 6) AS abs_sum,
           CAST(len(list_filter(embedding::DOUBLE[], x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_aggregate(embedding::DOUBLE[], 'max'), 6) AS max_val,
           round(list_sum(list_transform(embedding[1:8]::DOUBLE[], x -> x * x)), 6) AS head_energy,
           round(list_dot_product(embedding::DOUBLE[], list_reverse(embedding::DOUBLE[])), 6) AS rev_dot
    FROM embeddings
    """,
)
def q_array_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array / higher-order function battery (transform, filter,
    aggregate, zip_with, slice, reverse) — all JVM-side expressions in
    one narrow projection; HOFs evaluate per-row with zero shuffles."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size(e).alias("n"),
        F.round(F.element_at(e, 1), 6).alias("first_val"),
        F.round(
            F.aggregate(
                F.transform(e, lambda x: F.abs(x)), F.lit(0.0), lambda a, x: a + x
            ),
            6,
        ).alias("abs_sum"),
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.round(F.array_max(e), 6).alias("max_val"),
        F.round(
            F.aggregate(F.slice(e, 1, 8), F.lit(0.0), lambda a, x: a + x * x), 6
        ).alias("head_energy"),
        F.round(
            F.aggregate(
                F.zip_with(e, F.reverse(e), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, v: a + v,
            ),
            6,
        ).alias("rev_dot"),
    )


_SQL_WINDOW_RANGE = """
    SELECT event_id, user_id, round(value, 2) AS value,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY value
               RANGE BETWEEN 5.0 PRECEDING AND CURRENT ROW), 2) AS near_sum,
           CAST(count(*) OVER (
               PARTITION BY user_id ORDER BY value
               RANGE BETWEEN 5.0 PRECEDING AND 5.0 FOLLOWING) AS BIGINT) AS near_n
    FROM events
    """


@query("q_window_range", oracle=_SQL_WINDOW_RANGE)
def q_window_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-framed windows (value-distance frames, not row counts) —
    complements q_window_frame's ROWS frames.  Non-integral range
    boundaries are SQL-syntax-only (the pythonic ``rangeBetween`` takes
    long offsets), so this goes through the SQL surface."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_WINDOW_RANGE)


_SQL_GROUPING_SETS = """
    SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """


@query("q_grouping_sets", oracle=_SQL_GROUPING_SETS)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): one scan expanded to
    the three groupings, aggregated in a single shuffle."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SQL_GROUPING_SETS)


@query(
    "q_string_fns",
    oracle="""
    SELECT c_custkey,
           regexp_replace(c_name, '[0-9]+', '#') AS name_masked,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           split_part(c_name, '#', 1) AS name_head,
           CAST(levenshtein(c_mktsegment, 'BUILDING') AS INTEGER) AS seg_dist,
           reverse(c_mktsegment) AS seg_rev,
           CAST(strpos(c_name, '1') AS INTEGER) AS pos_one
    FROM customer
    """,
)
def q_string_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string battery: regexp_replace / lpad / split_part /
    levenshtein / reverse / instr — all codegen'd builtins."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_head"),
        F.levenshtein("c_mktsegment", F.lit("BUILDING")).alias("seg_dist"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.instr("c_name", "1").alias("pos_one"),
    )


@query(
    "q_json_map",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_val,
           CAST(len(json_keys(props)) AS INTEGER) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def q_json_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON -> MapType round-trip: parse events.props into
    map<string,int>, then map_keys / element_at — the open-ended
    metadata pattern (reference's schemaless metadata dicts,
    src/PDFToChromaIngester.py:145-150) done with typed map columns.
    Array outputs are serialized to csv strings so any downstream
    engine (and the driver's pandas canonicalizer) can hash them."""
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("m", m)
        .select(
            "event_id",
            F.element_at("m", "k").alias("k_val"),
            F.size(F.map_keys("m")).alias("n_keys"),
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys"),
        )
    )


def q_dedup_minhash_verified_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage near-dup at scale: MinHash LSH candidate generation +
    exact Jaccard verification restricted to candidates.

    Oracle strategy: the md5 hash family makes the signature — and
    therefore the banded candidate set — re-derivable by any engine, so
    the oracle mirrors the WHOLE pipeline (signature -> bands ->
    candidate join -> exact-jaccard verify) and the equality contract
    holds at every corpus size, independent of band recall.  (The
    earlier xxhash64 variant could only be checked against the full
    jaccard pair set, which is equal only on fixtures where recall
    happens to be complete.)  The operator remains approximate by
    construction — recall follows the 1-(1-s^r)^b curve — but what it
    computes is now exactly specified."""
    from vector_db_ingestor_spark.operators.dedup import minhash_verified_pairs

    docs = load_table(spark, sf_dir, "documents")
    return minhash_verified_pairs(
        docs, threshold=0.2, num_perm=64, bands=16, shingle_n=2,
        hash_family="md5",
    )


def _minhash_md5_oracle(
    threshold: float = 0.2, num_perm: int = 64, bands: int = 16
) -> str:
    """DuckDB mirror of the md5-family minhash VERIFIED pipeline: the
    shared candidate CTEs plus the exact-jaccard verify filter."""
    return f"""{_minhash_md5_cte(num_perm, bands, shingle_n=2)},
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
        FROM bands a JOIN bands b
          ON a.bi = b.bi AND a.bk = b.bk AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, jaccard FROM cand WHERE jaccard >= {threshold}
    """


QUERIES["q_dedup_minhash_verified"] = q_dedup_minhash_verified_impl
ORACLE_SQL["q_dedup_minhash_verified"] = _minhash_md5_oracle(
    threshold=0.2, num_perm=64, bands=16
)


@query(
    "q_window_stats",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           CAST(nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-analytic windows: ntile / percent_rank / cume_dist /
    nth_value per priority partition."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("second_key"),
    )


@query(
    "q_agg_stats",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS price_sd,
           round(var_samp(l_quantity), 4) AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_cov,
           round(min(l_extendedprice), 2) AS price_min,
           round(max(l_extendedprice), 2) AS price_max
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev/variance/corr/covar) — all
    single-pass mergeable moments, map-side partial."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_sd"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_cov"),
        F.round(F.min("l_extendedprice"), 2).alias("price_min"),
        F.round(F.max("l_extendedprice"), 2).alias("price_max"),
    )


@query(
    "q_conditional_fns",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 200000 THEN 'high'
                WHEN o_totalprice > 100000 THEN 'mid'
                ELSE 'low' END AS price_band,
           coalesce(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_sub,
           least(o_totalprice, 150000.0) AS price_capped,
           round(greatest(o_totalprice - 100000, 0.0), 2) AS price_excess,
           CASE WHEN o_orderstatus = 'O' THEN CAST(round(o_totalprice) AS BIGINT) ELSE 0 END AS open_px
    FROM orders
    """,
)
def q_conditional_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression battery: CASE/when, nullif+coalesce,
    least/greatest — pure codegen projections."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 200000, "high")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("low")
        .alias("price_band"),
        F.coalesce(
            F.nullif("o_orderpriority", F.lit("1-URGENT")), F.lit("URGENT!")
        ).alias("prio_sub"),
        F.least("o_totalprice", F.lit(150000.0)).alias("price_capped"),
        F.round(
            F.greatest(F.col("o_totalprice") - 100000, F.lit(0.0)), 2
        ).alias("price_excess"),
        F.when(
            F.col("o_orderstatus") == "O",
            F.round(F.col("o_totalprice")).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint")).alias("open_px"),
    )


@query(
    "q_agg_collect",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           array_to_string(list_sort(array_agg(DISTINCT source)), ',') AS sources,
           array_to_string(array_agg(doc_id ORDER BY n_chars DESC, doc_id)[1:3], ',') AS top3_longest
    FROM documents
    GROUP BY lang
    """,
)
def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregates with deterministic ordering: sorted
    collect_set and an ordered top-3 via sorted struct collection.
    collect_* concentrate a group on one reducer — fine for bounded
    groups (sources per lang); at 100 TB cap with slice() as here or
    pre-aggregate.  Collection columns are csv-serialized so the
    driver's pandas canonicalizer can sort/hash them."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias("sources"),
        F.array_join(
            F.slice(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct((-F.col("n_chars")).alias("neg"), "doc_id")
                        )
                    ),
                    lambda s: s.doc_id,
                ),
                1,
                3,
            ),
            ",",
        ).alias("top3_longest"),
    )


def q_multimodal_frames_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan (multimodal north star): 1->N frame
    timestamps exploded JVM-side from typed metadata; the decode of
    selected frames would be a second mapInPandas pass.  Rows-only."""
    from vector_db_ingestor_spark.multimodal.binary_ops import frame_sample_plan

    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("modality"),
        F.to_binary(F.col("text"), F.lit("utf-8")).alias("content"),
        F.named_struct(
            F.lit("width"), F.lit(640), F.lit("height"), F.lit(480),
            F.lit("sample_rate"), F.lit(0),
            F.lit("duration_ms"), (F.col("n_chars") * 10).cast("int"),
        ).alias("meta"),
    )
    frames = frame_sample_plan(media, every_ms=500)
    return frames.groupBy("media_id").agg(
        F.count("*").alias("n_frames"),
        F.max("frame_ts_ms").alias("last_frame_ms"),
    )


QUERIES["q_multimodal_frames"] = q_multimodal_frames_impl


# closed-form oracle: frames at 0,500,...,<= duration-1 where
# duration = n_chars*10  =>  n = (duration-1)//500 + 1
ORACLE_SQL["q_multimodal_frames"] = """
    SELECT doc_id AS media_id,
           CAST((n_chars * 10 - 1) // 500 + 1 AS BIGINT) AS n_frames,
           CAST(((n_chars * 10 - 1) // 500) * 500 AS INTEGER) AS last_frame_ms
    FROM documents
"""


_TPCH_Q6 = """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """


@query("q_sql_tpch_q6", oracle=_TPCH_Q6)
def q_sql_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate —
    every predicate pushed to the parquet scan, no shuffle beyond the
    single-group final agg."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q6)


@query(
    "q_udtf_tokens",
    oracle="""
    SELECT doc_id, CAST(i AS INTEGER) AS pos, tok AS token
    FROM (
        SELECT doc_id,
               unnest(toks) AS tok,
               unnest(range(1, len(toks) + 1)) AS i
        FROM (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents
        )
    )
    WHERE tok <> ''
    """,
)
def q_udtf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface: LATERAL table-function call producing
    (pos, token) per document — the modern 1->N API next to the
    chunker's pandas-UDF+posexplode."""
    from vector_db_ingestor_spark.functions.udfs import tokenize_udtf
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    spark.udtf.register("tokenize", tokenize_udtf())
    return spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM documents d, LATERAL tokenize(d.text) t
        WHERE t.token <> ''
        """
    )


_TPCH_Q12 = """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate > o_orderdate
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """


@query("q_sql_tpch_q12", oracle=_TPCH_Q12)
def q_sql_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (order priority line counts): join +
    conditional counts with an inter-table date predicate (fixtures
    carry no shipmode/commitdate; return flag stands in)."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q12)


_TPCH_Q14 = """
    SELECT round(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                   THEN l_extendedprice * (1 - l_discount)
                                   ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """


@query("q_sql_tpch_q14", oracle=_TPCH_Q14)
def q_sql_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): fact->dim join (part broadcasts
    under AQE) + conditional revenue ratio."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q14)


@query(
    "q_time_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1
        FROM events
    ), spine AS (
        SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS hr FROM bounds
    ), agg AS (
        SELECT date_trunc('hour', ts) AS hr, event_type,
               count(*) AS n, round(sum(value), 2) AS total
        FROM events GROUP BY 1, 2
    )
    SELECT strftime(s.hr, '%Y-%m-%d %H:%M:%S') AS hour,
           t.event_type,
           CAST(coalesce(a.n, 0) AS BIGINT) AS n_events,
           coalesce(a.total, 0.0) AS total_value
    FROM spine s
    CROSS JOIN (SELECT DISTINCT event_type FROM events) t
    LEFT JOIN agg a ON a.hr = s.hr AND a.event_type = t.event_type
    """,
)
def q_time_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly rollup (hypertable-style): a dense time spine
    generated with sequence()+explode, cross-joined with the (tiny)
    type dimension, left-joined to the aggregates, nulls filled.
    The spine is O(hours) — driver-free, broadcast-size; the only big
    shuffle is the hourly pre-aggregation, which is the minimum any
    rollup pays."""
    ev = load_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hr"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("hr")
    )
    types = ev.select("event_type").distinct()
    return (
        spine.crossJoin(types)
        .join(agg, ["hr", "event_type"], "left")
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n_events"),
            F.coalesce("total", F.lit(0.0)).alias("total_value"),
        )
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT n.n_name, r.r_name
    FROM nation n CROSS JOIN region r
    WHERE n.n_regionkey <> r.r_regionkey
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (small x small; BroadcastNestedLoopJoin) with
    a non-equi residual predicate."""
    n = load_table(spark, sf_dir, "nation").select("n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").select("r_name", "r_regionkey")
    return (
        n.crossJoin(r)
        .filter(F.col("n_regionkey") != F.col("r_regionkey"))
        .select("n_name", "r_name")
    )


@query(
    "q_grouped_zscore",
    oracle="""
    SELECT event_id, user_id,
           round(CASE WHEN stddev_samp(value) OVER w > 0
                      THEN (value - avg(value) OVER w) / stddev_samp(value) OVER w
                 END, 6) AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def q_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map custom operator (applyInPandas): per-user z-score of
    event values computed with whole-group pandas semantics — the
    escape hatch for per-group logic window functions can't express
    (model scoring, per-group fits).  This particular statistic IS
    window-expressible, which is exactly what makes it oracle-checkable;
    the operator shape (one shuffle on the group key, Arrow batch per
    group) is what transfers.  Skewed groups are the 100 TB caveat: a
    whole group must fit one task, so key by bounded entities (users),
    never by hot categories."""
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        mean = pdf["value"].mean()
        z = (
            np.round((pdf["value"] - mean) / sd, 6)
            if pd.notna(sd) and sd > 0
            else pd.Series([np.nan] * len(pdf), index=pdf.index)
        )
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "zscore": z}
        )

    return ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id LONG, user_id LONG, zscore DOUBLE"
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(count(s.s_suppkey) AS BIGINT) AS n_suppliers,
           round(coalesce(sum(s.s_acctbal), 0.0), 2) AS total_acctbal
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    LEFT JOIN supplier s ON s.s_nationkey = n.n_nationkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way dimension join (region <- nation <- supplier, TPC-H
    Q5 fragment): both dims broadcast; covers the supplier table and
    mixed inner/left chains under join reordering."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return (
        r.join(F.broadcast(n), n.n_regionkey == r.r_regionkey)
        .join(s, s.s_nationkey == n.n_nationkey, "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("s_suppkey").alias("n_suppliers"),
            F.round(F.coalesce(F.sum("s_acctbal"), F.lit(0.0)), 2).alias(
                "total_acctbal"
            ),
        )
    )


@query(
    "q_string_fns2",
    oracle="""
    SELECT doc_id,
           regexp_extract(source, 'src([0-9]+)', 1) AS src_num,
           CAST(len(regexp_extract_all(text, '[aeiou]+')) AS INTEGER) AS vowel_runs,
           translate(lang, 'aeiou', 'AEIOU') AS lang_t,
           repeat(lang, 2) AS lang2,
           left(text, 12) AS head12,
           right(source, 2) AS tail2
    FROM documents
    """,
)
def q_string_fns2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string battery: regex capture groups, extract_all counts,
    translate / repeat / left / right."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", r"src([0-9]+)", 1).alias("src_num"),
        F.size(F.regexp_extract_all("text", F.lit(r"[aeiou]+"), 0)).alias("vowel_runs"),
        F.translate("lang", "aeiou", "AEIOU").alias("lang_t"),
        F.repeat("lang", 2).alias("lang2"),
        F.left("text", F.lit(12)).alias("head12"),
        F.right("source", F.lit(2)).alias("tail2"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(val, 2) AS val
    FROM (
        UNPIVOT (SELECT l_orderkey, l_linenumber,
                        l_quantity AS qty, l_extendedprice AS price, l_tax AS tax
                 FROM lineitem WHERE l_orderkey < 100)
        ON qty, price, tax
        INTO NAME metric VALUE val
    )
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (inverse of q_pivot): wide measure columns to
    (metric, value) rows — a JVM-side Expand node, one row in, three
    out, no shuffle."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 100)
        .select(
            "l_orderkey", "l_linenumber",
            F.col("l_quantity").alias("qty"),
            F.col("l_extendedprice").alias("price"),
            F.col("l_tax").alias("tax"),
        )
    )
    return li.unpivot(
        ["l_orderkey", "l_linenumber"], ["qty", "price", "tax"], "metric", "v"
    ).select("l_orderkey", "l_linenumber", "metric", F.round("v", 2).alias("val"))


@query(
    "q_date_fns",
    oracle="""
    SELECT event_id,
           CAST(date_trunc('week', ts) AS DATE) AS week_start,
           last_day(CAST(ts AS DATE)) AS month_end,
           CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
           CAST(quarter(ts) AS INTEGER) AS qtr,
           CAST(ts + INTERVAL 2 MONTH AS DATE) AS plus2m,
           CAST(ts + INTERVAL 10 DAY AS DATE) AS plus10d
    FROM events WHERE event_type = 'signup'
    """,
)
def q_date_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime battery: week truncation, month end, day-of-week
    (aligned to Spark's 1=Sunday convention), quarter, interval adds."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    return ev.select(
        "event_id",
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
        F.last_day(F.col("ts").cast("date")).alias("month_end"),
        F.dayofweek("ts").alias("dow"),
        F.quarter("ts").alias("qtr"),
        F.add_months(F.col("ts").cast("date"), 2).alias("plus2m"),
        F.date_add(F.col("ts").cast("date"), 10).alias("plus10d"),
    )


@query(
    "q_join_nullsafe",
    oracle="""
    SELECT a.o_orderkey AS key_a, b.o_orderkey AS key_b
    FROM (SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS p
          FROM orders WHERE o_orderkey < 60) a
    JOIN (SELECT o_orderkey, nullif(o_orderpriority, '3-MEDIUM') AS p
          FROM orders WHERE o_orderkey < 60) b
      ON a.p IS NOT DISTINCT FROM b.p AND a.o_orderkey < b.o_orderkey
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): null keys
    match each other, unlike plain equi-joins which drop them."""
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 60)
        .select(
            "o_orderkey", F.nullif("o_orderpriority", F.lit("3-MEDIUM")).alias("p")
        )
    )
    a = o.selectExpr("o_orderkey as key_a", "p as pa")
    b = o.selectExpr("o_orderkey as key_b", "p as pb")
    return (
        a.join(b, a.pa.eqNullSafe(b.pb) & (a.key_a < b.key_b))
        .select("key_a", "key_b")
    )


def q_ann_lsh_multiprobe_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH top-k: probe bucket + all 1-bit-flip neighbors —
    recall close to exact at a fraction of the scan.  Hash-verified:
    the closed-form hyperplanes make the bucketing deterministic, so
    the oracle reproduces it exactly."""
    from vector_db_ingestor_spark.constants import EMBEDDING_DIM
    from vector_db_ingestor_spark.operators.similarity import lsh_topk_multiprobe

    emb = load_table(spark, sf_dir, "embeddings")
    probes = spark.createDataFrame(
        [(0, PROBE_64)], schema="query_id INT, query_vec ARRAY<DOUBLE>"
    )
    return lsh_topk_multiprobe(emb, probes, dim=EMBEDDING_DIM, k=10, n_bits=4)


QUERIES["q_ann_lsh_multiprobe"] = q_ann_lsh_multiprobe_impl


@query(
    "q_bitwise_fns",
    oracle="""
    SELECT user_id,
           CAST(bit_and(event_id & 255) AS BIGINT) AS mask_and,
           CAST(bit_or(event_id & 255) AS BIGINT) AS mask_or,
           CAST(bit_xor(event_id & 255) AS BIGINT) AS mask_xor,
           CAST(min(event_id << 2) AS BIGINT) AS min_shl,
           CAST(max(event_id >> 3) AS BIGINT) AS max_shr,
           CAST(sum(bit_count(CAST(event_id AS BIGINT))) AS BIGINT) AS popcount_sum
    FROM events
    GROUP BY user_id
    """,
)
def q_bitwise_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise battery: &, shifts, bit_count scalar ops and
    bit_and/bit_or/bit_xor aggregates."""
    ev = load_table(spark, sf_dir, "events")
    masked = F.col("event_id").bitwiseAND(F.lit(255))
    return ev.groupBy("user_id").agg(
        F.bit_and(masked).alias("mask_and"),
        F.bit_or(masked).alias("mask_or"),
        F.bit_xor(masked).alias("mask_xor"),
        F.min(F.shiftleft("event_id", 2)).alias("min_shl"),
        F.max(F.shiftright("event_id", 3)).alias("max_shr"),
        F.sum(F.bit_count("event_id")).alias("popcount_sum"),
    )


@query(
    "q_predicates_like",
    oracle="""
    SELECT c_custkey,
           c_name LIKE '%1%' AS has_one,
           c_mktsegment ILIKE 'bui%' AS is_building_i,
           regexp_matches(c_name, '[0-9]{2}$') AS ends_2digits,
           starts_with(c_mktsegment, 'HOUSE') AS seg_house,
           ends_with(c_name, '0') AS name_ends0,
           contains(c_mktsegment, 'MACH') AS seg_mach
    FROM customer
    """,
)
def q_predicates_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-predicate battery: LIKE / ILIKE / regex match /
    starts_with / ends_with / contains as boolean projections."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_name").like("%1%").alias("has_one"),
        F.col("c_mktsegment").ilike("bui%").alias("is_building_i"),
        F.col("c_name").rlike("[0-9]{2}$").alias("ends_2digits"),
        F.startswith("c_mktsegment", F.lit("HOUSE")).alias("seg_house"),
        F.endswith("c_name", F.lit("0")).alias("name_ends0"),
        F.contains("c_mktsegment", F.lit("MACH")).alias("seg_mach"),
    )


@query(
    "q_math_fns",
    oracle="""
    SELECT event_id,
           round(sqrt(abs(value)), 6) AS sq,
           round(pow(value, 2), 4) AS sqr,
           round(exp(value / 100.0), 6) AS ex,
           round(ln(abs(value) + 1.0), 6) AS lg,
           round(log10(abs(value) + 1.0), 6) AS lg10,
           CAST(ceil(value) AS BIGINT) AS cl,
           CAST(floor(value) AS BIGINT) AS fl,
           CAST(sign(value - 50.0) AS INTEGER) AS sgn,
           CAST(value % 7 AS DOUBLE) AS md
    FROM events WHERE event_type = 'view'
    """,
)
def q_math_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery: sqrt/pow/exp/ln/log10/ceil/floor/sign/mod — IEEE
    doubles on both engines, rounded to common precision."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "view")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.round(F.sqrt(F.abs(v)), 6).alias("sq"),
        F.round(F.pow(v, 2), 4).alias("sqr"),
        F.round(F.exp(v / 100.0), 6).alias("ex"),
        F.round(F.log(F.abs(v) + 1.0), 6).alias("lg"),
        F.round(F.log10(F.abs(v) + 1.0), 6).alias("lg10"),
        F.ceil(v).alias("cl"),
        F.floor(v).alias("fl"),
        F.signum(v - 50.0).cast("int").alias("sgn"),
        (v % 7).cast("double").alias("md"),
    )


# =====================================================================
# P2 analytics battery round 2: multiway SQL, event analytics,
# corpus-cleaning composite
# =====================================================================

_TPCH_Q5 = """
    SELECT n_name, round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """


@query("q_sql_tpch_q5", oracle=_TPCH_Q5)
def q_sql_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-table star join with a
    same-nation customer/supplier correlation.  region->nation is a
    broadcast chain; AQE picks broadcast vs shuffle for the fact-side
    joins; aggregation is map-side partial on n_name."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q5)


@query(
    "q_event_funnel",
    oracle="""
    WITH s AS (
        SELECT user_id, min(ts) AS signup_ts
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS first_purchase_ts
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s.signup_ts
        GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts, p.first_purchase_ts,
           (p.first_purchase_ts IS NOT NULL
            AND p.first_purchase_ts <= s.signup_ts + INTERVAL 7 DAY) AS converted_7d
    FROM s LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel: first signup per user, first purchase at or
    after it, 7-day conversion flag.  Two small grouped aggregates +
    one equi-join — no window over the raw stream, so the heavy table
    is touched twice with pushed event_type filters and aggregated
    before anything joins."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(p, "user_id", "left").select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        (
            F.col("first_purchase_ts").isNotNull()
            & (F.col("first_purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 7 DAYS"))
        ).alias("converted_7d"),
    )


@query(
    "q_gaps_islands",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
             - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
               AS island
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, island, count(*) AS run_len
        FROM seq GROUP BY user_id, event_type, island
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS max_run,
           CAST(sum(run_len) AS BIGINT) AS n_events
    FROM runs GROUP BY user_id, event_type
    """,
)
def q_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive same-type events
    per user via the classic double-row_number difference; both windows
    share one shuffle on user_id (the second partitions by a superset
    key)."""
    ev = load_table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    runs = seq.groupBy("user_id", "event_type", "island").agg(
        F.count("*").alias("run_len")
    )
    return runs.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_runs"),
        F.max("run_len").alias("max_run"),
        F.sum("run_len").alias("n_events"),
    )


@query(
    "q_retention_cohort",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_week,
           CAST(floor(date_diff('day', f.cohort_week, e.ts) / 7.0) AS INTEGER) AS week_offset,
           CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-seen week, activity
    counted per week offset.  The first-seen table is tiny (one row per
    user) -> broadcast back onto the stream; distinct-count shuffles on
    (cohort, offset)."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(first_seen), "user_id")
        .select(
            "cohort_week",
            F.floor(
                F.datediff(F.to_date("ts"), F.to_date("cohort_week")) / 7.0
            ).cast("int").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "q_regexp_fns",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS INTEGER) AS k_val,
           len(regexp_extract_all(props, '[0-9]')) AS n_digits,
           regexp_replace(props, '[0-9]+', '#', 'g') AS masked,
           regexp_matches(props, '^\\{"k": [0-9]+\\}$') AS well_formed
    FROM events WHERE event_type = 'click'
    """,
)
def q_regexp_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex battery over the JSON props payload: capture-group
    extract, per-char match count, global replace, full-string match —
    all JVM regex, no UDFs."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    return ev.select(
        "event_id",
        F.regexp_extract("props", r'"k": ([0-9]+)', 1).cast("int").alias("k_val"),
        F.size(F.regexp_extract_all("props", F.lit("([0-9])"), 1)).alias("n_digits"),
        F.regexp_replace("props", "[0-9]+", "#").alias("masked"),
        F.col("props").rlike(r'^\{"k": [0-9]+\}$').alias("well_formed"),
    )


@query(
    "q_agg_conditional",
    oracle="""
    SELECT user_id,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_clicks,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_errors,
           round(CAST(sum(value) FILTER (WHERE event_type = 'purchase') AS DOUBLE), 4) AS purchase_total,
           round(avg(value), 6) AS avg_value
    FROM events
    GROUP BY user_id
    """,
)
def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER-clause semantics): one pass over
    the stream computes per-user click/error counts and purchase
    revenue — the idiomatic replacement for N filtered self-joins."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "click", 1)).alias("n_clicks"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), 4
        ).alias("purchase_total"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )


@query(
    "q_histogram",
    oracle="""
    SELECT CAST(floor(value / 50.0) * 50 AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(avg(value), 6) AS avg_value,
           round(CAST(min(value) AS DOUBLE), 6) AS min_value,
           round(CAST(max(value) AS DOUBLE), 6) AS max_value
    FROM events
    GROUP BY bucket
    """,
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram as a groupBy on the bucket expression —
    the distributed equivalent of width_bucket; one partial-aggregated
    shuffle regardless of bucket count."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (F.floor(F.col("value") / 50.0) * 50).cast("bigint")
    return ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"),
        F.round(F.avg("value"), 6).alias("avg_value"),
        F.round(F.min("value"), 6).alias("min_value"),
        F.round(F.max("value"), 6).alias("max_value"),
    )


@query(
    "q_docs_clean_pipeline",
    oracle="""
    WITH metrics AS (
        SELECT doc_id, lang, source, text,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               round(CAST(len(text) - len(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
                     / len(text), 6) AS punct_ratio
        FROM documents
        WHERE len(text) > 0
    ),
    filtered AS (
        SELECT * FROM metrics
        WHERE lang IN ('en', 'de', 'es')
          AND n_tokens BETWEEN 5 AND 2000
          AND punct_ratio < 0.2
    )
    SELECT doc_id, lang, source, n_tokens, punct_ratio
    FROM filtered
    QUALIFY row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1
    """,
)
def q_docs_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-cleaning composite (the training-data pre-processing
    shape): quality metrics -> language + length + punctuation filters
    -> exact dedup keeping the lowest doc_id.  All built-in
    expressions; the only shuffle is the dedup window, partitioned by
    full text (uniform-hash key)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    punct_ratio = F.round(
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[.,!?;:]", ""))
        ).cast("double")
        / F.length("text"),
        6,
    )
    metrics = docs.select(
        "doc_id", "lang", "source", "text",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
    )
    filtered = metrics.filter(
        F.col("lang").isin("en", "de", "es")
        & F.col("n_tokens").between(5, 2000)
        & (F.col("punct_ratio") < 0.2)
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "source", "n_tokens", "punct_ratio")
    )


@query(
    "q_array_set_fns",
    oracle="""
    WITH t AS (
        SELECT vec_id,
               list_transform(embedding[1:8],  x -> CAST(floor(x * 100) AS INTEGER)) AS ia,
               list_transform(embedding[5:12], x -> CAST(floor(x * 100) AS INTEGER)) AS ib
        FROM embeddings
    )
    SELECT vec_id,
           coalesce(array_to_string(list_sort(list_distinct(list_concat(ia, ib))), ','), '') AS u,
           coalesce(array_to_string(list_sort(list_distinct(list_intersect(ia, ib))), ','), '') AS i,
           coalesce(array_to_string(list_sort(list_distinct(list_filter(ia, x -> NOT list_contains(ib, x)))), ','), '') AS d,
           list_contains(ia, 0) AS has_zero,
           len(list_distinct(ia)) AS n_distinct_a
    FROM t
    """,
)
def q_array_set_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set-algebra battery: union / intersect / except /
    contains / distinct-count on integerized embedding slices (floor
    avoids cross-engine round-half ambiguity; results sorted then
    csv-serialized so set order is canonical and the output is
    hashable by any engine's canonicalizer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    to_int = lambda c: F.transform(c, lambda x: F.floor(x * 100).cast("int"))  # noqa: E731
    as_csv = lambda c: F.array_join(c.cast("array<string>"), ",")  # noqa: E731
    t = emb.select(
        "vec_id",
        to_int(F.slice(e, 1, 8)).alias("ia"),
        to_int(F.slice(e, 5, 8)).alias("ib"),
    )
    return t.select(
        "vec_id",
        as_csv(F.array_sort(F.array_union("ia", "ib"))).alias("u"),
        as_csv(F.array_sort(F.array_intersect("ia", "ib"))).alias("i"),
        as_csv(F.array_sort(F.array_except("ia", "ib"))).alias("d"),
        F.array_contains("ia", 0).alias("has_zero"),
        F.size(F.array_distinct("ia")).alias("n_distinct_a"),
    )


_TPCH_Q10 = """
    SELECT c_custkey, c_name,
           round(CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE), 4) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """


@query("q_sql_tpch_q10", oracle=_TPCH_Q10)
def q_sql_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): fact-fact join filtered on
    both scans, nation broadcast, top-20 revenue customers as
    TakeOrderedAndProject (deterministic c_custkey tie-break added —
    revenue ties would be oracle-unstable otherwise)."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q10)


_TPCH_Q18 = """
    SELECT c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           round(CAST(qty AS DOUBLE), 2) AS total_qty
    FROM (
        SELECT l_orderkey, sum(l_quantity) AS qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 50
    ) big
    JOIN orders   ON o_orderkey = big.l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """


@query("q_sql_tpch_q18", oracle=_TPCH_Q18)
def q_sql_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): HAVING-filtered aggregate
    subquery joined back to orders/customer — the aggregate runs FIRST
    so only qualifying orderkeys join; top-25 via
    TakeOrderedAndProject with an orderkey tie-break."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q18)


@query(
    "q_dedup_clusters",
    oracle="""
    WITH RECURSIVE
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
            FROM (SELECT doc_id, lang,
                         list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                             i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                                  string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
                  FROM documents) a
            JOIN (SELECT doc_id, lang,
                         list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                             i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                                  string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
                  FROM documents) b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
        ) WHERE jaccard >= 0.2
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT d.doc_id,
           least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
    FROM documents d LEFT JOIN reach r ON d.doc_id = r.u
    GROUP BY d.doc_id
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster resolution: near-dup pairs (exact lang-blocked
    bigram jaccard >= 0.2) -> connected components via min-label
    propagation -> (doc_id, cluster_id = min id in component).  The
    oracle computes the same components with a recursive-CTE transitive
    closure — exact equality, including singletons."""
    from vector_db_ingestor_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, block_col="lang", n=2, threshold=0.2,
        # pre-vetted fixture corpus (plan-audited, hash-green): skip the
        # hot-gram guard's eager pre-pass and keep the builder fully lazy
        max_hot_df=None,
    )
    return dedup_clusters(pairs, docs, id_col="doc_id")


@query(
    "q_split_train",
    oracle="""
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs FROM (
        SELECT CASE WHEN b < 'e66666' THEN 'train'
                    WHEN b < 'f33333' THEN 'val'
                    ELSE 'test' END AS split
        FROM (SELECT substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 6) AS b
              FROM documents)
    ) GROUP BY split ORDER BY split
    """,
)
def q_split_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test split by disjoint cumulative hash ranges over
    doc_id: deterministic, partition-invariant, membership survives
    appends.  Uses the md5-hex draw (split_by_md5) so any engine can
    re-derive every row's assignment — cumulative thresholds 0.90 ->
    'e66666', 0.95 -> 'f33333'.  Determinism/disjointness/stability
    contracts are pinned in tests/test_sampling.py."""
    from vector_db_ingestor_spark.operators.sampling import split_by_md5

    docs = load_table(spark, sf_dir, "documents")
    return (
        split_by_md5(docs, "doc_id", {"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("split")
    )


# =====================================================================
# corpus-hygiene additions (round 2): PII scrub, repetition, contamination
# =====================================================================

@query(
    "q_pii_redact",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               substring(text, 1, 60) || ' contact user' || CAST(doc_id AS VARCHAR)
               || '@' || source || '.example.com or call 555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS contact_blob
        FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(contact_blob,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
           len(regexp_extract_all(contact_blob, '\\b\\d{3}-\\d{4}\\b')) AS n_phones,
           regexp_replace(
               regexp_replace(contact_blob,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
               '\\b\\d{3}-\\d{4}\\b', '[PHONE]', 'g') AS redacted
    FROM raw
    """,
)
def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (training-data hygiene): emails and phone numbers
    redacted with per-row match counts.  The synthetic corpus carries no
    natural PII, so the query first derives a deterministic contact blob
    from (doc_id, source) — the regex engines then have real matches to
    find on every row, and both sides compute them exactly.  All JVM
    regex projections; zero extra passes beyond the scan."""
    from vector_db_ingestor_spark.operators.text_analysis import redact_pii

    docs = load_table(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 60),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@"),
            F.col("source"),
            F.lit(".example.com or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("contact_blob"),
    )
    return redact_pii(raw, "contact_blob").drop("contact_blob")


@query(
    "q_text_repetition",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS token
        FROM documents
    ),
    counts AS (
        SELECT doc_id, token, count(*) AS cnt FROM toks GROUP BY doc_id, token
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY cnt DESC, token ASC) AS rn
        FROM counts
    )
    SELECT doc_id,
           CAST(sum(cnt) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_distinct,
           max(CASE WHEN rn = 1 THEN token END) AS top_token,
           CAST(max(cnt) AS BIGINT) AS top_count,
           round(1.0 - CAST(count(*) AS DOUBLE) / sum(cnt), 6) AS rep_ratio
    FROM ranked
    GROUP BY doc_id
    """,
)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition profile (low-quality / degenerate-text
    signal): token totals, distinct counts, deterministic dominant
    token, repetition ratio.  Explode -> map-side-combined token
    counts; the window rank and final rollup share one hash exchange on
    doc_id."""
    from vector_db_ingestor_spark.operators.text_analysis import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs)


def _ngram_list_sql(n: int) -> str:
    """DuckDB expression for the distinct word n-gram list of ``text``,
    mirroring operators.dedup.word_shingles bit-for-bit."""
    toks = "string_split_regex(lower(trim(text)), '\\s+')"
    gram = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(n))
    return f"list_distinct(list_transform(range(1, len({toks}) - {n - 2}), i -> {gram}))"


@query(
    "q_contamination",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, unnest({_ngram_list_sql(2)}) AS g FROM documents
    ),
    e AS (
        SELECT doc_id AS eval_id, unnest({_ngram_list_sql(2)}) AS g
        FROM documents WHERE doc_id % 97 = 0
    )
    SELECT c.doc_id,
           CAST(count(DISTINCT c.g) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT e.eval_id) AS BIGINT) AS n_eval_docs
    FROM c JOIN e USING (g)
    WHERE c.doc_id <> e.eval_id
    GROUP BY c.doc_id
    """,
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (pre-training hygiene): per corpus doc,
    distinct word-bigrams shared with a benchmark split (doc_id % 97 =
    0 stands in for the held-out eval set) and how many eval docs it
    touches.  Eval grams broadcast — the corpus side never shuffles
    before its final per-doc aggregation."""
    from vector_db_ingestor_spark.operators.text_analysis import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    eval_docs = docs.filter(F.col("doc_id") % 97 == 0)
    return contamination_report(docs, eval_docs, n=2)


@query(
    "q_dedup_ngram_capped",
    oracle="""
    WITH sh AS (
        SELECT doc_id, lang,
               list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                   i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                        string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
        FROM documents
    ),
    t AS (SELECT doc_id, lang, unnest(grams) AS g FROM sh),
    df AS (SELECT lang, g, count(*) AS dfreq FROM t GROUP BY lang, g),
    rare AS (
        SELECT t.doc_id, t.lang, t.g FROM t JOIN df USING (lang, g)
        WHERE df.dfreq <= 5
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM rare a JOIN rare b ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
    )
    SELECT * FROM (
        SELECT id_a, id_b,
               round(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                     / len(list_distinct(list_concat(x.grams, y.grams))), 6) AS jaccard
        FROM cand JOIN sh x ON cand.id_a = x.doc_id JOIN sh y ON cand.id_b = y.doc_id
    ) WHERE jaccard >= 0.2
    """,
)
def q_dedup_ngram_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-gram-capped n-gram Jaccard dedup — the 100 TB variant of
    q_dedup_ngram: candidate pairs generated from RARE grams only
    (document frequency <= 5), exact Jaccard verified on the full gram
    sets of candidates.  Kills the df^2/2 join blow-up of stopword-like
    shingles; the documented recall contract drops only pairs whose
    every shared gram is hot (boilerplate-only overlap).  The oracle
    mirrors the cap exactly, so this is hash-verified, not rows-only."""
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, block_col="lang", n=2, threshold=0.2, max_df=5)


# =====================================================================
# round-2 additions: vector surface, quantization, LSH oracle upgrades
# =====================================================================

@query(
    "q_vector_fns",
    oracle=f"""
    SELECT vec_id,
           round(list_dot_product(embedding::DOUBLE[], {_PROBE_SQL}), 6) AS dot_p,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm,
           round(list_distance(embedding::DOUBLE[], {_PROBE_SQL}), 6) AS l2_dist,
           {_SCORE_SQL} AS cosine,
           round((embedding::DOUBLE[])[1]
                 / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS unit_first
    FROM embeddings
    """,
)
def q_vector_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-function surface battery: dot product, L2 norm, L2
    distance, cosine, and unit-normalized first component against the
    fixed probe — every distance in functions/vector.py.

    Higher-order aggregates are interpreted (not codegen'd) and
    interpreted projections get no common-subexpression elimination, so
    the raw dot and norm folds are materialized ONCE in a first
    projection and the derived metrics (cosine = dot/(|v||p|),
    unit_first = v[1]/|v|) are scalar arithmetic on those columns —
    3 folds per row instead of 6, bit-identical doubles either way.
    The probe's own norm is a foldable literal expression (constant-
    folded at plan time, zero per-row cost)."""
    from vector_db_ingestor_spark.functions.vector import dot, l2_distance, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    p = lit_doubles(PROBE_64)
    v = F.col("embedding").cast("array<double>")
    raw = emb.select(
        "vec_id",
        v.alias("v"),
        dot(v, p).alias("dp"),
        l2_norm(v).alias("nrm"),
        l2_distance(v, p).alias("l2"),
    )
    return raw.select(
        "vec_id",
        F.round("dp", 6).alias("dot_p"),
        F.round("nrm", 6).alias("norm"),
        F.round("l2", 6).alias("l2_dist"),
        F.round(F.col("dp") / (F.col("nrm") * l2_norm(p)), 6).alias("cosine"),
        F.round(F.element_at(F.col("v"), 1) / F.col("nrm"), 6).alias("unit_first"),
    )


@query(
    "q_vec_quantize",
    oracle="""
    WITH scaled AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               greatest(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 1e-12) AS max_abs
        FROM embeddings
    ),
    q AS (
        SELECT vec_id, v, max_abs,
               list_transform(v, x -> floor(x * 127.0 / max_abs)) AS codes
        FROM scaled
    )
    SELECT vec_id,
           round(max_abs, 6) AS scale_max,
           CAST(len(list_filter(codes, c -> c = 0)) AS INTEGER) AS n_zero,
           round(list_dot_product(v, list_transform(codes, c -> c * max_abs / 127.0))
                 / (sqrt(list_dot_product(v, v))
                    * sqrt(list_dot_product(list_transform(codes, c -> c * max_abs / 127.0),
                                            list_transform(codes, c -> c * max_abs / 127.0)))), 6)
               AS recon_cosine
    FROM q
    """,
)
def q_vec_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding column — the standard
    4x storage/bandwidth cut for 100 TB vector collections — with the
    per-vector scale, zero-code count, and reconstruction cosine as the
    quality report.  floor() (not round) keeps the code assignment
    bit-identical across engines; all HOF expressions, no Python."""
    from vector_db_ingestor_spark.functions.vector import cosine_similarity

    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    max_abs = F.greatest(
        F.array_max(F.transform(v, lambda x: F.abs(x))), F.lit(1e-12)
    )
    with_scale = emb.select("vec_id", v.alias("v"), max_abs.alias("max_abs"))
    codes = F.transform(
        F.col("v"), lambda x: F.floor(x * 127.0 / F.col("max_abs"))
    )
    with_codes = with_scale.withColumn("codes", codes)
    recon = F.transform(
        F.col("codes"), lambda c: c * F.col("max_abs") / 127.0
    )
    return with_codes.select(
        "vec_id",
        F.round("max_abs", 6).alias("scale_max"),
        F.size(F.filter("codes", lambda c: c == 0)).alias("n_zero"),
        F.round(cosine_similarity(F.col("v"), recon), 6).alias("recon_cosine"),
    )


def _lsh_topk_oracle(n_bits: int, k: int, multiprobe: bool) -> str:
    """Exact oracle for the LSH top-k queries: the hyperplanes are
    closed-form literals, so the 'approximate' op is deterministic and
    DuckDB can reproduce the bucket assignment bit-for-bit."""
    probe_bkt = _lsh_bucket_sql(_PROBE_SQL, 64, n_bits)
    if multiprobe:
        masks = ", ".join(str(1 << b) for b in range(n_bits))
        cond = f"(e.bkt = p.bkt OR xor(e.bkt, p.bkt) IN ({masks}))"
    else:
        cond = "e.bkt = p.bkt"
    return f"""
    WITH e AS (
        SELECT vec_id, embedding,
               {_lsh_bucket_sql("embedding::DOUBLE[]", 64, n_bits)} AS bkt
        FROM embeddings
    ),
    p AS (SELECT {probe_bkt} AS bkt),
    scored AS (
        SELECT 0 AS query_id, e.vec_id, {_SCORE_SQL} AS score
        FROM e, p WHERE {cond}
    )
    SELECT query_id, vec_id, score,
           CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY score DESC, vec_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {k}
    """


ORACLE_SQL["q_ann_lsh_topk"] = _lsh_topk_oracle(n_bits=4, k=10, multiprobe=False)
ORACLE_SQL["q_ann_lsh_multiprobe"] = _lsh_topk_oracle(n_bits=4, k=10, multiprobe=True)


_TPCH_Q4 = """
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """


@query("q_sql_tpch_q4", oracle=_TPCH_Q4)
def q_sql_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order-priority checking): correlated EXISTS over
    the fact table — Catalyst rewrites it to a left-semi hash join on
    l_orderkey, so the subquery never executes per-row (fixtures carry
    no commit/receipt dates; late shipment stands in)."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q4)


_TPCH_Q13 = """
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """


@query("q_sql_tpch_q13", oracle=_TPCH_Q13)
def q_sql_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution): left outer join
    keeps zero-order customers, double aggregation — the second groupBy
    is on the tiny (c_count) domain, so its shuffle is negligible; the
    first is the standard fact-side hash agg."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q13)


_TPCH_Q17 = """
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """


@query("q_sql_tpch_q17", oracle=_TPCH_Q17)
def q_sql_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): correlated
    scalar subquery against a per-part average — decorrelated by
    Catalyst into an aggregate-then-join, so the per-part averages
    compute once, not per probe row."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q17)


_TPCH_Q19 = """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 40)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """


@query("q_sql_tpch_q19", oracle=_TPCH_Q19)
def q_sql_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    the OR-of-ANDs mixes join-key-independent part predicates with
    lineitem predicates — the common p_partkey equi-join still drives a
    hash join (part broadcasts), and the disjunction evaluates as a
    post-join filter without falling back to a nested-loop join."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q19)


@query(
    "q_tfidf",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rnk
        FROM scored
    ) WHERE rnk <= 3
    """,
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 TF-IDF terms — the classic corpus salience
    operator.  Term frequencies partial-aggregate map-side; document
    frequencies are a second small hash agg whose result BROADCASTS
    back onto the tf stream (df table cardinality = vocabulary, tiny
    relative to the corpus); the final per-doc top-3 is one window on
    hash(doc_id).  ln-idf parity with DuckDB holds on rounded output
    (both libms are 1-ulp on ln; q_math_fns pins it)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_tbl), "term").select(
        "doc_id",
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tfidf", "rank")
    )


@query(
    "q_dedup_representatives",
    oracle="""
    WITH RECURSIVE
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
            FROM (SELECT doc_id, lang,
                         list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                             i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                                  string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
                  FROM documents) a
            JOIN (SELECT doc_id, lang,
                         list_distinct(list_transform(range(1, len(string_split_regex(lower(trim(text)), '\\s+'))),
                             i -> string_split_regex(lower(trim(text)), '\\s+')[i] || ' ' ||
                                  string_split_regex(lower(trim(text)), '\\s+')[i+1])) AS grams
                  FROM documents) b
              ON a.lang = b.lang AND a.doc_id < b.doc_id
        ) WHERE jaccard >= 0.2
    ),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    clusters AS (
        SELECT d.doc_id, d.lang, d.n_chars,
               least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS cluster_id
        FROM documents d LEFT JOIN reach r ON d.doc_id = r.u
        GROUP BY d.doc_id, d.lang, d.n_chars
    )
    SELECT cluster_id,
           CAST(count(*) AS BIGINT) AS n_members,
           max(lang) AS rep_lang,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM clusters
    GROUP BY cluster_id
    """,
)
def q_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The user-facing end of the dedup pipeline: near-dup pairs →
    connected components → ONE representative row per cluster
    (cluster_id = min doc_id) with member count and collapsed size.
    This is the "what survives dedup" report a training-data pipeline
    actually ships; singletons appear with n_members = 1.  One extra
    hash-agg on cluster_id after label propagation."""
    from vector_db_ingestor_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, block_col="lang", n=2, threshold=0.2,
        # pre-vetted fixture corpus (plan-audited, hash-green): skip the
        # hot-gram guard's eager pre-pass and keep the builder fully lazy
        max_hot_df=None,
    )
    clusters = dedup_clusters(pairs, docs, id_col="doc_id")
    return (
        docs.join(clusters, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_members"),
            F.max("lang").alias("rep_lang"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@query(
    "q_sample_stratified",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE substring(md5('stratified' || CAST(doc_id AS VARCHAR)), 1, 6)
          < CASE lang
                WHEN 'en' THEN '800000'
                WHEN 'de' THEN '400000'
                WHEN 'zh' THEN 'g'
                ELSE '19999a'
            END
    """,
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling with per-language rates (keep
    all rare-language docs, downsample the rest) — the md5-threshold
    variant whose membership an external engine can re-derive exactly.
    A narrow filter riding the scan: no shuffle, stable under
    repartitioning and appends.  en 50%, de 25%, zh 100%, others 10%."""
    from vector_db_ingestor_spark.operators.sampling import sample_stratified_md5

    docs = load_table(spark, sf_dir, "documents")
    return sample_stratified_md5(
        docs.select("doc_id", "lang", "source"),
        strata_col="lang",
        fractions={"en": 0.5, "de": 0.25, "zh": 1.0},
        key_col="doc_id",
        default_fraction=0.1,
    ).select("doc_id", "lang", "source")


# =====================================================================
# round-4 relational + vector additions
# =====================================================================

_TPCH_Q7 = """
    SELECT supp_nation, cust_nation, l_year,
           round(CAST(sum(volume) AS DOUBLE), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
            OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """


@query("q_sql_tpch_q7", oracle=_TPCH_Q7)
def q_sql_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): the nation self-join pattern — the
    same dimension joined twice under different roles (supplier nation
    vs customer nation) with a disjunctive cross-role predicate.  Both
    nation sides broadcast; the fact-fact joins shuffle on their keys
    and the date filter is pushed to the lineitem scan."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q7)


_TPCH_Q8 = """
    SELECT o_year,
           round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'AMERICA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """


@query("q_sql_tpch_q8", oracle=_TPCH_Q8)
def q_sql_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the deepest star join in the
    suite — 8 relations, two roles for nation, a conditional-sum ratio.
    Every dimension (part, supplier, nation x2, region, customer)
    broadcasts; only lineitem-orders shuffles.  The ratio is computed
    in one aggregation via conditional sum, not two passes."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q8)


_TPCH_Q15 = """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           round(CAST(total_revenue AS DOUBLE), 4) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """


@query("q_sql_tpch_q15", oracle=_TPCH_Q15)
def q_sql_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue aggregation feeds both the
    join and the scalar-max threshold.  r15 optimization: the SQL-CTE
    form re-ran the lineitem scan+agg at BOTH references (the executed
    plan showed two lineitem scans and zero ReusedExchange — the
    scalar-subquery exchange is not reused under AQE here), so the
    supplier-sized revenue table is now persisted for the duration of
    the query and the max enters as a broadcast 1-row aggregate over
    the SAME materialized sums — the equality therefore compares
    exactly the values the two-pass plan compared (each pass was
    deterministic and identical), hash-checked against the unchanged
    oracle.  One lineitem pass instead of two at any scale; a global
    window would also work but holds every supplier in one task — the
    cache + scalar join keeps the plan shape scale-free.  The handle is
    registered with :mod:`vector_db_ingestor_spark.caching`.

    Residual float-equality hazard (ADVICE r15 #3): the
    ``total_revenue == __mx`` equality is guaranteed exact only while
    ``rev`` stays cached — if the cache were evicted (or released by
    ``release_all()``) BEFORE materialization, the max branch and the
    join branch would recompute the double sums independently, and
    shuffle-merge-order nondeterminism could make the equality miss
    the true max row.  This is the same hazard the old two-scan form
    carried (not a regression); the cache narrows the window to
    eviction-under-memory-pressure, and MEMORY_AND_DISK spills rather
    than evicts in practice."""
    from vector_db_ingestor_spark.caching import register
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    rev = spark.sql(
        """
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
        """
    ).persist(StorageLevel.MEMORY_AND_DISK)
    register(rev)
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        sup.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_revenue").cast("double"), 4).alias(
                "total_revenue"
            ),
        )
        .orderBy("s_suppkey")
    )


_TPCH_Q22 = """
    SELECT cntrycode,
           CAST(count(*) AS BIGINT) AS numcust,
           round(CAST(sum(c_acctbal) AS DOUBLE), 2) AS totacctbal
    FROM (
        SELECT c_nationkey % 10 AS cntrycode, c_acctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2001-01-01')
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """


@query("q_sql_tpch_q22", oracle=_TPCH_Q22)
def q_sql_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): an uncorrelated
    scalar-average subquery AND an anti-join in one query — customers
    above the average balance with no recent orders (fixtures have no
    phone column, so country code derives from nationkey; every
    customer has SOME order, so the anti-join is date-windowed).
    Catalyst turns NOT EXISTS into a left-anti hash join and evaluates
    the scalar avg once."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q22)


@query(
    "q_vec_centroid",
    oracle="""
    WITH flat AS (
        SELECT label,
               generate_subscripts(embedding, 1) AS pos,
               unnest(embedding::DOUBLE[]) AS v
        FROM embeddings
    ),
    dims AS (
        SELECT label, pos, CAST(round(avg(v) * 100000) AS BIGINT) AS m
        FROM flat GROUP BY label, pos
    )
    SELECT label,
           CAST(count(*) AS BIGINT) AS dim,
           array_to_string(list(m ORDER BY pos), ',') AS centroid
    FROM dims
    GROUP BY label
    """,
)
def q_vec_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the clustering /
    class-prototype primitive (k-means steps, label prototypes for
    nearest-centroid classification).  posexplode -> two hash
    aggregations: the per-(label, dim) partial means combine map-side,
    so the shuffle carries labels x dims rows, never vectors.  Centroid
    components serialize as 1e-5-unit integers (double->string renders
    differently across engines; scaled integers are unambiguous)."""
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>"))
    ).withColumnRenamed("col", "v")
    dims = flat.groupBy("label", "pos").agg(
        F.round(F.avg("v") * 100000, 0).cast("long").alias("m")
    )
    return dims.groupBy("label").agg(
        F.count("*").alias("dim"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s.m.cast("string"),
            ),
            ",",
        ).alias("centroid"),
    )


@query(
    "q_dedup_incremental",
    oracle="""
    WITH corpus AS (
        SELECT md5(text) AS h FROM documents WHERE source <> 'src0'
    ),
    batch AS (
        SELECT doc_id, lang, source, md5(text) AS h
        FROM documents WHERE source = 'src0'
    )
    SELECT b.doc_id, b.lang, b.source,
           CAST(NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
                AS BOOLEAN) AS is_new
    FROM batch b
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: a new batch (source='src0' stands in)
    checked against the existing corpus by content hash — the
    steady-state operation of a continuously-fed corpus (the streaming
    sink's anti-join, stream_ingest_dedup, in its batch form).  The
    corpus side reduces to distinct hashes BEFORE the join, so the
    shuffle carries 16-byte digests, never text; with the collection
    bucketed on the hash the join is co-located and shuffle-free."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = (
        docs.filter(F.col("source") != "src0")
        .select(F.md5("text").alias("h"))
        .distinct()
        .withColumn("seen", F.lit(True))
    )
    batch = docs.filter(F.col("source") == "src0").select(
        "doc_id", "lang", "source", F.md5("text").alias("h")
    )
    return (
        batch.join(corpus, "h", "left")
        .select(
            "doc_id", "lang", "source",
            F.coalesce(~F.col("seen"), F.lit(True)).alias("is_new"),
        )
    )


def _maxsim_slices_sql(col: str, n_slices: int = 4, width: int = 16) -> str:
    """DuckDB list-of-slices expression for the multi-vector stand-in."""
    parts = ", ".join(
        f"({col})[{s * width + 1}:{(s + 1) * width}]" for s in range(n_slices)
    )
    return f"[{parts}]"


def _maxsim_oracle(k: int = 10, n_slices: int = 4, width: int = 16) -> str:
    probe = f"({_PROBE_SQL})"
    q_slices = ", ".join(
        f"{probe}[{s * width + 1}:{(s + 1) * width}]" for s in range(n_slices)
    )
    return f"""
    WITH d AS (
        SELECT vec_id,
               {_maxsim_slices_sql("embedding::DOUBLE[]")} AS dv
        FROM embeddings
    ),
    scored AS (
        SELECT vec_id,
               round(list_sum(list_transform([{q_slices}],
                   q -> list_max(list_transform(dv,
                       t -> list_dot_product(q, t))))), 6) AS maxsim
        FROM d
    )
    SELECT vec_id, maxsim,
           CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY maxsim DESC, vec_id ASC) AS rnk
        FROM scored
    ) WHERE rnk <= {k}
    """


@query("q_topk_maxsim", oracle=_maxsim_oracle())
def q_topk_maxsim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim retrieval: score = sum
    over query token-vectors of the max dot-product against any doc
    token-vector.  Fixtures carry one 64-dim vector per doc, so both
    sides split it into 4 x 16-dim slices as the multi-vector stand-in
    — the plan shape is the real thing: token vectors never explode
    into rows, the whole MaxSim folds as nested HOF expressions inside
    the scan stage, and top-k is TakeOrderedAndProject.  At 100 TB the
    same expression runs per (doc x query) with the query token matrix
    broadcast."""
    from vector_db_ingestor_spark.functions.vector import dot

    n_slices, width, k = 4, 16, 10
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding").cast("array<double>")
    dv = F.array(*[F.slice(e, s * width + 1, width) for s in range(n_slices)])
    qv = F.array(
        *[
            lit_doubles(PROBE_64[s * width : (s + 1) * width])
            for s in range(n_slices)
        ]
    )
    maxsim = F.round(
        F.aggregate(
            F.transform(
                qv,
                lambda q: F.array_max(F.transform(F.col("dv"), lambda t: dot(q, t))),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )
    return (
        emb.select("vec_id", dv.alias("dv"))
        .select("vec_id", maxsim.alias("maxsim"))
        .orderBy(F.col("maxsim").desc(), F.col("vec_id").asc())
        .limit(k)
        .select(
            "vec_id",
            "maxsim",
            F.row_number()
            .over(Window.orderBy(F.col("maxsim").desc(), F.col("vec_id").asc()))
            .alias("rank"),
        )
    )


@query(
    "q_knn_classify",
    oracle=f"""
    WITH nn AS (
        SELECT label FROM (
            SELECT label,
                   row_number() OVER (ORDER BY {_SCORE_SQL} DESC, vec_id ASC) AS rnk
            FROM embeddings
        ) WHERE rnk <= 15
    )
    SELECT label AS predicted_label,
           CAST(count(*) AS BIGINT) AS votes,
           CAST(15 AS INTEGER) AS k
    FROM nn
    GROUP BY label
    ORDER BY votes DESC, predicted_label ASC
    LIMIT 1
    """,
)
def q_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification of the fixed probe: majority label among its
    15 exact nearest neighbors (deterministic tie-breaks at both the
    neighbor rank and the vote count).  The scan+TakeOrderedAndProject
    produces the neighborhood; the vote is a 15-row aggregation — the
    expensive part is the same broadcast-probe scan as every top-k, so
    classifying B probes batches into one scan exactly like
    topk_cosine_batch."""
    from vector_db_ingestor_spark.operators.topk import topk_cosine

    emb = load_table(spark, sf_dir, "embeddings")
    nn = topk_cosine(emb, PROBE_64, k=15)  # label passes through the rank
    return (
        nn.groupBy(F.col("label").alias("predicted_label"))
        .agg(F.count("*").alias("votes"))
        .withColumn("k", F.lit(15))
        .orderBy(F.col("votes").desc(), F.col("predicted_label").asc())
        .limit(1)
    )


def _ann_recall_oracle(k: int = 10, n_bits: int = 4) -> str:
    ann_sql = _lsh_topk_oracle(n_bits=n_bits, k=k, multiprobe=True)
    return f"""
    WITH exact_k AS (
        SELECT vec_id FROM (
            SELECT vec_id,
                   row_number() OVER (ORDER BY {_SCORE_SQL} DESC, vec_id ASC) AS rnk
            FROM embeddings
        ) WHERE rnk <= {k}
    ),
    ann_k AS (SELECT vec_id FROM ({ann_sql}))
    SELECT CAST((SELECT count(*) FROM exact_k) AS BIGINT) AS n_exact,
           CAST((SELECT count(*) FROM ann_k) AS BIGINT) AS n_ann,
           CAST((SELECT count(*) FROM exact_k JOIN ann_k USING (vec_id)) AS BIGINT)
               AS n_overlap,
           round((SELECT count(*) FROM exact_k JOIN ann_k USING (vec_id))
                 / CAST({k} AS DOUBLE), 3) AS recall_at_k
    """


@query("q_ann_recall_report", oracle=_ann_recall_oracle())
def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality report: recall@10 of multiprobe LSH top-k against the
    exact top-k for the fixed probe — the measurement that justifies an
    approximate index before rolling it out (run it on a sampled probe
    set in production; each probe is one bucket-join + one exact scan).
    Deterministic on both paths, so even the QUALITY REPORT is
    oracle-verified exactly."""
    from vector_db_ingestor_spark.constants import EMBEDDING_DIM
    from vector_db_ingestor_spark.operators.similarity import lsh_topk_multiprobe
    from vector_db_ingestor_spark.operators.topk import topk_cosine

    k = 10
    emb = load_table(spark, sf_dir, "embeddings")
    exact_k = topk_cosine(emb, PROBE_64, k=k).select("vec_id")
    probes = spark.createDataFrame(
        [(0, PROBE_64)], schema="query_id INT, query_vec ARRAY<DOUBLE>"
    )
    ann_k = lsh_topk_multiprobe(
        emb, probes, dim=EMBEDDING_DIM, k=k, n_bits=4
    ).select("vec_id")
    # full-outer join + ONE aggregate: each top-k plan (a full table
    # scan) executes exactly once, vs. twice each with separate
    # count/overlap branches
    merged = exact_k.withColumn("in_e", F.lit(1)).join(
        ann_k.withColumn("in_a", F.lit(1)), "vec_id", "full"
    )
    return merged.agg(
        F.count("in_e").alias("n_exact"),
        F.count("in_a").alias("n_ann"),
        F.count(F.when(F.col("in_e").isNotNull() & F.col("in_a").isNotNull(), 1)).alias(
            "n_overlap"
        ),
    ).select(
        "n_exact",
        "n_ann",
        "n_overlap",
        F.round(F.col("n_overlap") / F.lit(float(k)), 3).alias("recall_at_k"),
    )


@query(
    "q_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click->purchase attribution as the batch twin of the
    stream-stream join (streaming/windows.stream_stream_attribution —
    same function, same plan; streaming mode adds two-sided watermarked
    state, proven equal in tests/test_streaming.py).  The equi-key
    (user_id) carries the shuffle; the time range is a residual
    predicate, so this stays a hash join, never a nested loop."""
    from vector_db_ingestor_spark.streaming.windows import stream_stream_attribution

    ev = load_table(spark, sf_dir, "events")
    return stream_stream_attribution(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        horizon="1 hour",
    )


@query(
    "q_text_boilerplate",
    oracle="""
    WITH raw AS (
        SELECT doc_id,
               text || '. Published by ' || source || ' syndicate. '
               || 'All rights reserved ' || source || '.' AS page
        FROM documents
    ),
    lines AS (
        SELECT doc_id, trim(s) AS line
        FROM (SELECT doc_id, unnest(string_split(page, '.')) AS s FROM raw)
        WHERE trim(s) <> ''
    ),
    freq AS (
        SELECT line,
               CAST(count(*) AS BIGINT) AS n_occurrences,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        FROM lines GROUP BY line
    )
    SELECT line, n_occurrences, n_docs
    FROM freq
    WHERE n_docs >= 3
    ORDER BY n_docs DESC, n_occurrences DESC, line ASC
    LIMIT 50
    """,
)
def q_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate detection (the CCNet/RefinedWeb-style
    pretraining cleanup): explode documents into sentence-ish lines,
    count cross-document repetitions, surface lines appearing in >= 3
    distinct docs — headers, footers, nav chrome at web scale.  One
    explode + one hash aggregation (map-side combined); at 100 TB hash
    the line (sha2) for the shuffle key instead of shipping text, and
    the follow-up removal pass is a broadcast anti-join of this
    (tiny) list against the corpus.  The synthetic corpus has no
    natural boilerplate, so per-source footers are seeded
    deterministically first (same fixture pattern as q_pii_redact) —
    the detector then has real cross-document repeats to find."""
    return boilerplate_top50(load_table(spark, sf_dir, "documents"))


def boilerplate_top50(docs: DataFrame) -> DataFrame:
    """DataFrame-core of q_text_boilerplate, shared with
    scripts/scale_probe.py so the probe always measures the production
    plan (the probe feeds replicated inputs; the query feeds fixture
    tables)."""
    page = F.concat(
        F.col("text"),
        F.lit(". Published by "), F.col("source"), F.lit(" syndicate. "),
        F.lit("All rights reserved "), F.col("source"), F.lit("."),
    )
    lines = (
        docs.select(
            "doc_id",
            F.explode(F.split(page, r"\.")).alias("s"),
        )
        .select("doc_id", F.trim("s").alias("line"))
        .filter(F.col("line") != "")
    )
    freq = lines.groupBy("line").agg(
        F.count("*").alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return (
        freq.filter(F.col("n_docs") >= 3)
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occurrences").desc(), F.col("line").asc()
        )
        .limit(50)
    )


@query(
    "q_pack_sequences",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS begin_tok
        FROM t
    )
    SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(floor(begin_tok / 2048) AS BIGINT) AS pack_id,
           CAST(begin_tok % 2048 AS BIGINT) AS offset_in_pack
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for training (context-window binning): docs are
    laid end-to-end per language stream in deterministic doc_id order;
    each doc's pack and offset derive from its FIRST token position
    (pack_id = begin div capacity, offset = begin mod capacity, both
    non-negative by construction; a doc that straddles a pack boundary
    belongs to the pack where it starts and is split at training
    time).  One window cumsum per language partition, no iteration; at
    100 TB the partition key is (lang, shard) so each window stays
    bounded."""
    return pack_sequences_plan(load_table(spark, sf_dir, "documents"))


def pack_sequences_plan(docs: DataFrame, capacity: int = 2048) -> DataFrame:
    """DataFrame-core of q_pack_sequences, shared with
    scripts/scale_probe.py (same drift rationale as
    :func:`boilerplate_top50`)."""
    t = docs.select(
        "doc_id", "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("begin_tok", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return c.select(
        "doc_id", "lang",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(F.col("begin_tok") / capacity).cast("long").alias("pack_id"),
        (F.col("begin_tok") % capacity).cast("long").alias("offset_in_pack"),
    )


@query(
    "q_mixture_weights",
    oracle="""
    WITH tok AS (
        SELECT source,
               CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT)
                   AS n_tokens
        FROM documents GROUP BY source
    ),
    tot AS (SELECT sum(n_tokens) AS total FROM tok)
    SELECT source, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / total, 6) AS actual_share,
           round(1.0 / (SELECT count(*) FROM tok), 6) AS target_share,
           round((1.0 / (SELECT count(*) FROM tok))
                 / (CAST(n_tokens AS DOUBLE) / total), 4) AS sample_weight
    FROM tok, tot
    ORDER BY source
    """,
)
def q_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture weighting for pretraining: per-source token shares
    and the per-source sampling weight that rebalances the corpus to a
    uniform target mixture (weight = target_share / actual_share —
    upsample rare sources, downsample dominant ones).  One hash
    aggregation + two scalar aggregates broadcast back; the weights
    feed sample_by_hash fractions for the actual resample pass."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.groupBy("source").agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("n_tokens")
    )
    tot = tok.agg(
        F.sum("n_tokens").alias("total"), F.count("*").alias("n_sources")
    )
    return (
        tok.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(F.col("n_tokens") / F.col("total"), 6).alias("actual_share"),
            F.round(F.lit(1.0) / F.col("n_sources"), 6).alias("target_share"),
            F.round(
                (F.lit(1.0) / F.col("n_sources"))
                / (F.col("n_tokens") / F.col("total")),
                4,
            ).alias("sample_weight"),
        )
        .orderBy("source")
    )


# =====================================================================
# round-5 additions: hybrid retrieval suite (BM25+RRF, MMR, PQ-ADC)
# =====================================================================

_BM25_TERMS = ["vector", "query", "hash"]
_BM25_K1 = 1.2
_BM25_B = 0.75


def _bm25_sql(terms: list[str], k1: float, b: float) -> str:
    """DuckDB mirror of operators.retrieval.bm25_scores, constant-for-
    constant (Python-computed literals rendered with repr so both
    engines consume identical doubles)."""
    term_list = ", ".join(f"'{t.lower()}'" for t in terms)
    return f"""
    base AS (
        SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
        FROM documents
    ),
    stats AS (
        SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(len(toks)) AS avgdl
        FROM base
    ),
    tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM (SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM base)
        WHERE term IN ({term_list})
        GROUP BY doc_id, dl, term
    ),
    dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    bm AS (
        SELECT tf.doc_id,
               round(sum(round(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * {k1 + 1.0!r})
                   / (tf + {k1!r} * ({1.0 - b!r} + {b!r} * dl / avgdl))
               , 6)), 6) AS bm25
        FROM tf JOIN dfq USING (term) CROSS JOIN stats
        GROUP BY tf.doc_id
    )"""


def _hybrid_oracle(n: int = 20, k: int = 10, k_rrf: int = 60) -> str:
    return f"""
    WITH {_bm25_sql(_BM25_TERMS, _BM25_K1, _BM25_B)},
    bm_top AS (
        SELECT doc_id, CAST(rnk AS INTEGER) AS bm25_rank FROM (
            SELECT doc_id, bm25,
                   row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rnk
            FROM bm
        ) WHERE rnk <= {n}
    ),
    dense AS (SELECT vec_id AS doc_id, {_SCORE_SQL} AS score FROM embeddings),
    dense_top AS (
        SELECT doc_id, CAST(rnk AS INTEGER) AS dense_rank FROM (
            SELECT doc_id, score,
                   row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
            FROM dense
        ) WHERE rnk <= {n}
    ),
    fused AS (
        SELECT coalesce(d.doc_id, s.doc_id) AS doc_id,
               d.dense_rank, s.bm25_rank,
               round(coalesce(1.0 / ({float(k_rrf)!r} + d.dense_rank), 0.0)
                     + coalesce(1.0 / ({float(k_rrf)!r} + s.bm25_rank), 0.0),
                     6) AS rrf
        FROM dense_top d FULL OUTER JOIN bm_top s ON d.doc_id = s.doc_id
    )
    SELECT doc_id, dense_rank, bm25_rank, rrf, CAST(rnk AS INTEGER) AS rank
    FROM (
        SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rnk
        FROM fused
    ) WHERE rnk <= {k}
    """


@query("q_hybrid_rrf", oracle=_hybrid_oracle())
def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: dense cosine top-20 + BM25 keyword top-20,
    fused with reciprocal-rank fusion (k=60), final top-10.  The
    production shape of "vector store + keyword channel" retrieval the
    reference's dense-only search (src/PDFToChromaIngester.py:225-235)
    sits inside.  Scale: each channel's corpus-sized work is one scan
    (dense: TakeOrderedAndProject heap top-n; BM25: partial-agg'd token
    explode filtered to query terms pre-shuffle); fusion joins two
    20-row lists — driver-light at any corpus size."""
    from vector_db_ingestor_spark.functions.vector import cosine_similarity
    from vector_db_ingestor_spark.operators.retrieval import (
        bm25_scores,
        ranked_topn,
        rrf_fuse,
    )
    from vector_db_ingestor_spark.operators.topk import probe_literal

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    dense = emb.select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            cosine_similarity(F.col("embedding"), probe_literal(PROBE_64)), 6
        ).alias("score"),
    )
    dense_top = ranked_topn(dense, "score", "doc_id", 20).select(
        "doc_id", F.col("rank").alias("dense_rank")
    )
    bm = bm25_scores(docs, _BM25_TERMS, k1=_BM25_K1, b=_BM25_B)
    bm_top = ranked_topn(bm, "bm25", "doc_id", 20).select(
        "doc_id", F.col("rank").alias("bm25_rank")
    )
    fused = rrf_fuse({"dense": dense_top, "bm25": bm_top}, id_col="doc_id")
    return ranked_topn(fused, "rrf", "doc_id", 10).select(
        "doc_id", "dense_rank", "bm25_rank", "rrf", "rank"
    )


def _mmr_ctes(p: str, score_sql: str, n: int, k: int, lam: float) -> str:
    """Unrolled greedy MMR as k CTE stages (argmax via ORDER BY/LIMIT 1
    per stage — plain SQL, no recursive aggregation), all names
    prefixed with ``p`` so a probe batch can stack one chain per probe.
    Selection orders on the RAW mmr double (identical IEEE ops on
    identical rounded inputs in both engines); only the output column
    is rounded."""
    cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    parts = [
        f"""{p}short AS MATERIALIZED (
        SELECT vec_id, embedding, {score_sql} AS rel
        FROM embeddings
        ORDER BY rel DESC, vec_id ASC
        LIMIT {n}
    ),
    {p}sims AS MATERIALIZED (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS sim
        FROM {p}short a JOIN {p}short b ON a.vec_id <> b.vec_id
    ),
    {p}p1 AS MATERIALIZED (
        SELECT 1 AS rank, vec_id, rel, {lam!r} * rel - {1.0 - lam!r} * 0.0 AS mmr
        FROM {p}short ORDER BY mmr DESC, vec_id ASC LIMIT 1
    ),
    {p}sel1 AS MATERIALIZED (SELECT vec_id FROM {p}p1)"""
    ]
    for i in range(2, k + 1):
        parts.append(
            f"""{p}p{i} AS MATERIALIZED (
        SELECT {i} AS rank, s.vec_id, s.rel,
               {lam!r} * s.rel - {1.0 - lam!r} * (
                   SELECT max(sim) FROM {p}sims
                   WHERE id_a = s.vec_id
                     AND id_b IN (SELECT vec_id FROM {p}sel{i - 1})
               ) AS mmr
        FROM {p}short s
        WHERE s.vec_id NOT IN (SELECT vec_id FROM {p}sel{i - 1})
        ORDER BY mmr DESC, s.vec_id ASC LIMIT 1
    ),
    {p}sel{i} AS MATERIALIZED (SELECT vec_id FROM {p}sel{i - 1} UNION ALL SELECT vec_id FROM {p}p{i})"""
        )
    return ",\n    ".join(parts)


def _mmr_union(p: str, k: int) -> str:
    return "\n        UNION ALL ".join(
        f"SELECT * FROM {p}p{i}" for i in range(1, k + 1)
    )


def _mmr_oracle(n: int = 20, k: int = 8, lam: float = 0.7) -> str:
    return (
        "\n    WITH "
        + _mmr_ctes("", _SCORE_SQL, n, k, lam)
        + f"""
    SELECT CAST(rank AS INTEGER) AS rank, vec_id, rel, round(mmr, 6) AS mmr
    FROM ({_mmr_union("", k)})
    """
    )


@query("q_topk_mmr", oracle=_mmr_oracle())
def q_topk_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified re-ranking: exact top-20 relevance shortlist,
    then greedy maximal-marginal-relevance selection of 8 (lambda=0.7)
    — the diversity pass RAG stacks run between retrieval and context
    assembly (reference's assembly: src/PDFToChromaIngester.py:250-287).
    Corpus-sized work is ONE TakeOrdered scan; the k-step greedy runs
    on the fixed-size shortlist's JVM-computed pairwise cosines inside
    a single applyInPandas task, so Python never reduces floats — the
    unrolled-SQL oracle replays the identical argmax chain."""
    from vector_db_ingestor_spark.operators.retrieval import (
        mmr_rerank,
        shortlist_with_sims,
    )
    from vector_db_ingestor_spark.operators.topk import probe_literal

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = shortlist_with_sims(emb, probe_literal(PROBE_64), n=20)
    return mmr_rerank(pairs, lam=0.7, k=8)


_MMR_BATCH_PROBES: list[tuple[int, list[float]]] = list(enumerate(PROBE_BATCH))


def _mmr_batch_oracle(n: int = 20, k: int = 8, lam: float = 0.7) -> str:
    """One unrolled greedy chain per probe (prefixed CTE names), final
    UNION ALL tagged with query_id — the per-query semantics are
    EXACTLY _mmr_oracle's, replayed once per probe."""
    ctes, selects = [], []
    for qid, vec in _MMR_BATCH_PROBES:
        p = f"q{qid}_"
        ctes.append(_mmr_ctes(p, _score_sql_for(probe_sql_literal(vec)), n, k, lam))
        selects.append(
            f"""SELECT {qid} AS query_id, CAST(rank AS INTEGER) AS rank,
               vec_id, rel, round(mmr, 6) AS mmr
        FROM ({_mmr_union(p, k)})"""
        )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + "\n    "
        + "\n    UNION ALL ".join(selects)
    )


@query("q_topk_mmr_batch", oracle=_mmr_batch_oracle())
def q_topk_mmr_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched MMR: the 3-probe batch (PROBE_BATCH, q_topk_batch's
    query list) shortlisted from ONE broadcast-probe corpus scan, then
    re-ranked CONCURRENTLY — groupBy(query_id).applyInPandas runs one
    greedy task per query through a single Arrow eval node, the shape a
    RAG serving batch needs (vs q_topk_mmr's one-task serial greedy).
    Per-query results are hash-checked against one unrolled-CTE oracle
    chain per probe."""
    from vector_db_ingestor_spark.operators.retrieval import (
        mmr_rerank_batch,
        shortlist_with_sims_batch,
    )

    probes = spark.createDataFrame(
        _MMR_BATCH_PROBES, schema="query_id INT, query_vec ARRAY<DOUBLE>"
    )
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = shortlist_with_sims_batch(emb, probes, n=20)
    return mmr_rerank_batch(pairs, lam=0.7, k=8)


def _pq_oracle(m: int = 4, ksub: int = 16, k: int = 10) -> str:
    from vector_db_ingestor_spark.operators.similarity import (
        pq_adc_tables,
        pq_codebooks,
    )

    dsub = EMBEDDING_DIM // m
    cbs = pq_codebooks(EMBEDDING_DIM, m, ksub)
    tabs = pq_adc_tables(PROBE_64, cbs)

    def bare(v: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in v) + "]"

    def lst(v: list[float]) -> str:
        return bare(v) + "::DOUBLE[]"

    sub_cols = ", ".join(
        f"list_slice(embedding::DOUBLE[], {s * dsub + 1}, {(s + 1) * dsub}) AS s{s}"
        for s in range(m)
    )
    # reduced squared-L2 (row-constant x.x dropped — argmin-invariant;
    # both engines round the same reduced form, see pq_code)
    dist_cols = []
    for s in range(m):
        cents = ", ".join(
            f"round(-2.0 * list_dot_product(s{s}, {lst(c)})"
            f" + {sum(x * x for x in c)!r}, 6)"
            for c in cbs[s]
        )
        dist_cols.append(f"[{cents}] AS d{s}")
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INTEGER) AS c{s}"
        for s in range(m)
    )
    adc = " + ".join(f"{bare(tabs[s])}[c{s} + 1]" for s in range(m))
    code_names = ", ".join(f"c{s}" for s in range(m))
    return f"""
    WITH sub AS (SELECT vec_id, {sub_cols} FROM embeddings),
    dists AS (SELECT vec_id, {", ".join(dist_cols)} FROM sub),
    codes AS (SELECT vec_id, {code_cols} FROM dists),
    scored AS (
        SELECT vec_id, {code_names}, round({adc}, 6) AS adc FROM codes
    )
    SELECT vec_id, {code_names}, adc,
           vec_id IN (SELECT vec_id FROM scored
                      ORDER BY adc DESC, vec_id ASC LIMIT {k}) AS in_topk
    FROM scored
    """


@query("q_vec_pq_adc", oracle=_pq_oracle())
def q_vec_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization encode + asymmetric-distance (ADC) scoring:
    4 subspaces x 16 centroids, per-subvector argmin L2 code (rounded
    distances, first-wins ties), probe scored via Python-precomputed
    lookup-table literals — m array lookups + m-1 adds per row, the PQ
    scan shape that never touches raw vectors at query time.  Literal
    md5-derived codebooks make every stage closed-form and hash-checked
    cross-engine (codebook TRAINING is the same engine-side seeded-
    Lloyd path the IVF family already demonstrates — q_ann_ivf_assign's
    contract, applied to PQ).  in_topk marks the ADC top-10
    (TakeOrdered + broadcast join, no global window)."""
    from vector_db_ingestor_spark.operators.similarity import (
        pq_adc_tables,
        pq_code,
        pq_codebooks,
    )

    m, ksub = 4, 16
    dsub = EMBEDDING_DIM // m
    cbs = pq_codebooks(EMBEDDING_DIM, m, ksub)
    tabs = pq_adc_tables(PROBE_64, cbs)
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding")
    enc = emb.select(
        "vec_id",
        *[pq_code(vec, cbs[s], s * dsub).alias(f"c{s}") for s in range(m)],
    )
    adc = F.element_at(lit_doubles(tabs[0]), F.col("c0") + 1)
    for s in range(1, m):
        adc = adc + F.element_at(lit_doubles(tabs[s]), F.col(f"c{s}") + 1)
    # materialize the codes once: both the top-10 heap and the output
    # join consume the same encode (at deployment scale the codes are a
    # persisted table built once, like the IVF index — re-encoding per
    # consumer is the one shape PQ exists to avoid).  r16:
    # persist+register, not localCheckpoint — eager=False
    # localCheckpoint still runs analysis+planning at BUILD time
    # (~0.3 s/invocation); the persist declaration is free and the
    # harness reclaims it via release_all()
    from vector_db_ingestor_spark.caching import register

    scored = register(
        enc.withColumn("adc", F.round(adc, 6)).persist(
            StorageLevel.MEMORY_AND_DISK
        )
    )
    top = (
        scored.orderBy(F.col("adc").desc(), F.col("vec_id").asc())
        .limit(10)
        .select("vec_id", F.lit(True).alias("__t"))
    )
    return (
        scored.join(F.broadcast(top), "vec_id", "left")
        .withColumn("in_topk", F.coalesce(F.col("__t"), F.lit(False)))
        .drop("__t")
    )


_PQT = {"m": 4, "ksub": 8, "iters": 2, "cent_dp": 4, "dist_dp": 6}


def _pq_train_ctes(
    dim: int, m: int, ksub: int, iters: int, cent_dp: int, dist_dp: int
) -> list[str]:
    """DuckDB replay of pq_train's ENTIRE seeded Lloyd: md5-ordered
    init, per-iteration assign (reduced-L2 argmin, rounded, first-wins
    via ORDER BY dist, j) and centroid recompute (per-component
    round(avg, cent_dp), empty clusters keep the previous centroid via
    LEFT JOIN + COALESCE), then the final per-subspace code ``fin_s``
    — so the float-iterative TRAINING itself is hash-checked
    cross-engine, not just assignment against pre-agreed literals.
    Returns the CTE list; callers assemble the final select
    (:func:`_pq_train_oracle` for codes, :func:`_ivf_train_oracle` for
    the m=1 cid + shortlist shape)."""
    dsub = dim // m
    dist = (
        f"round(-2.0 * list_dot_product(e.sub, cb.cvec)"
        f" + list_dot_product(cb.cvec, cb.cvec), {dist_dp})"
    )
    ctes = [
        f"""init AS MATERIALIZED (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS j,
               embedding::DOUBLE[] AS v
        FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {ksub}
    )"""
    ]
    for s in range(m):
        lo, hi = s * dsub + 1, (s + 1) * dsub
        ctes.append(
            f"""sub_{s} AS MATERIALIZED (
        SELECT vec_id, list_slice(embedding::DOUBLE[], {lo}, {hi}) AS sub
        FROM embeddings
    ),
    cb0_{s} AS MATERIALIZED (
        SELECT j, list_transform(list_slice(v, {lo}, {hi}),
                                 x -> round(x, {cent_dp})) AS cvec
        FROM init
    )"""
        )
        for it in range(1, iters + 1):
            avg_list = ", ".join(
                f"round(avg(sub[{i + 1}]), {cent_dp})" for i in range(dsub)
            )
            ctes.append(
                f"""asg{it}_{s} AS MATERIALIZED (
        SELECT vec_id, sub, j AS c FROM (
            SELECT e.vec_id, e.sub, cb.j,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist} ASC, cb.j ASC) AS rn
            FROM sub_{s} e CROSS JOIN cb{it - 1}_{s} cb
        ) WHERE rn = 1
    ),
    cb{it}_{s} AS MATERIALIZED (
        SELECT p.j, COALESCE(n.cvec, p.cvec) AS cvec
        FROM cb{it - 1}_{s} p LEFT JOIN (
            SELECT c AS j, [{avg_list}] AS cvec
            FROM asg{it}_{s} GROUP BY c
        ) n ON p.j = n.j
    )"""
            )
        ctes.append(
            f"""fin_{s} AS MATERIALIZED (
        SELECT vec_id, CAST(j AS INTEGER) AS c{s} FROM (
            SELECT e.vec_id, cb.j,
                   row_number() OVER (PARTITION BY e.vec_id
                                      ORDER BY {dist} ASC, cb.j ASC) AS rn
            FROM sub_{s} e CROSS JOIN cb{iters}_{s} cb
        ) WHERE rn = 1
    )"""
        )
    return ctes


def _pq_train_oracle(dim: int = 64) -> str:
    m, ksub, iters = _PQT["m"], _PQT["ksub"], _PQT["iters"]
    ctes = _pq_train_ctes(dim, m, ksub, iters, _PQT["cent_dp"], _PQT["dist_dp"])
    joins = " ".join(f"JOIN fin_{s} USING (vec_id)" for s in range(1, m))
    cols = ", ".join(f"c{s}" for s in range(m))
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT vec_id, {cols}
    FROM fin_0 {joins}
    """
    )


@query("q_vec_pq_train", oracle=_pq_train_oracle(dim=EMBEDDING_DIM))
def q_vec_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ codebook TRAINING, hash-checked end-to-end: per-subspace
    seeded Lloyd (md5-ordered deterministic init, 2 iterations,
    centroids rounded engine-side at every step — similarity.pq_train)
    followed by the final per-subvector code assignment.  Closes the
    q_vec_pq_adc gap the round-5 verdict named: that key pins encode/
    ADC mechanics against PRE-AGREED literal codebooks; this one makes
    the TRAINING that produces codebooks itself cross-engine verified.
    Scale: each Lloyd step is one scan-stage assign + one m*ksub-group
    hash agg; the model is driver-held and re-enters as literals, so
    the iterative plan never grows (ivf_train's pattern)."""
    from vector_db_ingestor_spark.operators.similarity import pq_code, pq_train

    m = _PQT["m"]
    dsub = EMBEDDING_DIM // m
    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(
        emb,
        dim=EMBEDDING_DIM,
        m=m,
        ksub=_PQT["ksub"],
        iters=_PQT["iters"],
        cent_dp=_PQT["cent_dp"],
        dist_dp=_PQT["dist_dp"],
    )
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        *[
            pq_code(vec, cbs[s], s * dsub, round_dp=_PQT["dist_dp"]).alias(f"c{s}")
            for s in range(m)
        ],
    )


_IVFT = {"ksub": 8, "iters": 2, "nprobe": 4, "cent_dp": 4, "dist_dp": 6}


def _reduced_l2(probe: list[float], cent: list[float], dp: int) -> float:
    """Driver-side reduced squared-L2 ``-2 p.c + c.c`` with the same
    left-to-right reduction and rounding both engines use (Python sum
    == sequential list_dot_product; probe/centroid doubles identical)."""
    from decimal import ROUND_HALF_UP, Decimal

    v = -2.0 * sum(p * x for p, x in zip(probe, cent)) + sum(x * x for x in cent)
    return float(Decimal(repr(v)).quantize(Decimal(f"1e-{dp}"), ROUND_HALF_UP))


def _ivf_train_oracle(dim: int = 64) -> str:
    """m=1 instance of the pq_train CTE replay plus the nprobe
    shortlist over the TRAINED centroids: the whole IVF
    train->assign->shortlist path re-derived by DuckDB from the
    parquet.  L2 metric throughout (standard k-means Lloyd; the
    cosine-metric production family keeps its q_ann_ivf_assign
    companion)."""
    ksub, iters, nprobe = _IVFT["ksub"], _IVFT["iters"], _IVFT["nprobe"]
    ctes = _pq_train_ctes(dim, 1, ksub, iters, _IVFT["cent_dp"], _IVFT["dist_dp"])
    ctes.append(
        f"""short AS (
        SELECT j FROM cb{iters}_0
        ORDER BY round(-2.0 * list_dot_product(cvec, {_PROBE_SQL})
                       + list_dot_product(cvec, cvec), {_IVFT["dist_dp"]}) ASC,
                 j ASC
        LIMIT {nprobe}
    )"""
    )
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT vec_id, c0 AS cid, c0 IN (SELECT j FROM short) AS in_shortlist
    FROM fin_0
    """
    )


@query("q_ann_ivf_train", oracle=_ivf_train_oracle(dim=EMBEDDING_DIM))
def q_ann_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TRAINING hash-checked end-to-end: the mirrorable seeded
    Lloyd (pq_train with m=1 — one 'subspace' spanning the full
    vector), then cid assignment against the trained centroids and the
    probe's nprobe=4 shortlist membership, all re-derived by the
    oracle from the parquet.  Completes the IVF evidence ladder: the
    production keys (q_ann_ivf/_batch, full-precision training) stay
    rows-only by design, q_ann_ivf_assign pins assignment+shortlist
    against literal centroids, and this key pins the TRAINING itself
    in its rounded-mirrorable variant (L2 Lloyd, like q_vec_pq_train).
    Scale: identical plan family to ivf_train — per-step narrow assign
    + one ksub-group agg, driver-held model."""
    from vector_db_ingestor_spark.operators.similarity import pq_code, pq_train

    emb = load_table(spark, sf_dir, "embeddings")
    cbs = pq_train(
        emb,
        dim=EMBEDDING_DIM,
        m=1,
        ksub=_IVFT["ksub"],
        iters=_IVFT["iters"],
        cent_dp=_IVFT["cent_dp"],
        dist_dp=_IVFT["dist_dp"],
    )
    cents = cbs[0]
    dists = [(_reduced_l2(PROBE_64, c, _IVFT["dist_dp"]), j) for j, c in enumerate(cents)]
    short = [j for _, j in sorted(dists)[: _IVFT["nprobe"]]]
    vec = F.col("embedding")
    return emb.select(
        "vec_id",
        pq_code(vec, cents, 0, round_dp=_IVFT["dist_dp"]).alias("cid"),
    ).withColumn("in_shortlist", F.col("cid").isin(short))


# =====================================================================
# P2 TPC-H completion: the six relational shapes (Q2/Q9/Q11/Q16/Q20/
# Q21) nothing else in the battery covers.  The fixtures carry no
# partsupp table and no commit/receipt dates, so each keeps its
# query's SHAPE (the plan-level challenge) over the tables that exist:
# lineitem stands in as the part<->supplier bridge, late shipment
# (l_shipdate > o_orderdate, as in q_sql_tpch_q4) stands in for
# receipt-after-commit.
# =====================================================================

_TPCH_Q2 = """
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS uc
            FROM lineitem GROUP BY l_partkey, l_suppkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(uc, 6) AS unit_cost
        FROM part
        JOIN cost ON l_partkey = p_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
          AND r_name = 'EUROPE'
          AND uc = (SELECT min(c2.uc)
                    FROM cost c2
                    JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
                    JOIN nation n2 ON n2.n_nationkey = s2.s_nationkey
                    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
                    WHERE c2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
"""


@query("q_sql_tpch_q2", oracle=_TPCH_Q2)
def q_sql_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each qualifying
    part, only the EU supplier matching the region-wide minimum unit
    cost survives.  r15 optimization: the correlated-subquery form ran
    the ``cost`` CTE TWICE (Catalyst inlines a CTE at every reference —
    two full lineitem scan+agg subtrees in the executed plan); this
    window form computes ``cost`` once, broadcast-joins the EU
    supplier chain once, and derives the per-part minimum with
    ``min(uc) OVER (PARTITION BY l_partkey)`` on that single pass —
    identical rows because ``min`` SELECTS an existing double (no
    accumulation), so the ``uc = mu`` equality compares exactly the
    values the decorrelated-subquery plan compared; hash-checked
    against the UNCHANGED correlated oracle.  One lineitem pass
    instead of two at any scale.  Unit cost stands in for
    ps_supplycost (fixtures carry no partsupp)."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH cost AS (
            SELECT l_partkey, l_suppkey,
                   min(l_extendedprice / l_quantity) AS uc
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eu AS (
            SELECT s_acctbal, s_name, n_name, l_partkey, uc,
                   min(uc) OVER (PARTITION BY l_partkey) AS mu
            FROM cost
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               round(uc, 6) AS unit_cost
        FROM part JOIN eu ON l_partkey = p_partkey
        WHERE p_size BETWEEN 10 AND 20 AND p_type = 'STANDARD'
          AND uc = mu
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
        """
    )


_TPCH_Q9 = """
        SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
               round(CAST(sum(l_extendedprice * (1 - l_discount)
                             - 0.6 * p_retailprice * l_quantity) AS DOUBLE),
                     4) AS sum_profit
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%bolt%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
"""


@query("q_sql_tpch_q9", oracle=_TPCH_Q9)
def q_sql_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): LIKE-filtered part drives
    a 5-table join, profit rolled up by supplier nation x order year.
    The infix '%bolt%' cannot push into parquet, but the part-side
    filter still applies before the join and the filtered part +
    supplier + nation dims all broadcast — only lineitem<->orders
    shuffles.  0.6*p_retailprice*l_quantity stands in for the missing
    ps_supplycost term; group sums are ~1e5 so 4dp rounding sits far
    above double reduction-order noise."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q9)


_TPCH_Q11 = """
        WITH val AS (
            SELECT l_partkey AS ps_partkey,
                   sum(l_extendedprice * (1 - l_discount)) AS v
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name IN ('NATION_7', 'NATION_12')
            GROUP BY l_partkey
        )
        SELECT ps_partkey, round(CAST(v AS DOUBLE), 4) AS part_value
        FROM val
        WHERE v > (SELECT avg(v) * 2.0 FROM val)
        ORDER BY part_value DESC, ps_partkey
"""


@query("q_sql_tpch_q11", oracle=_TPCH_Q11)
def q_sql_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part value from two
    nations' suppliers, kept only when above a GLOBAL scalar threshold
    — the uncorrelated scalar subquery re-aggregates the same CTE, so
    the plan computes val once, reuses the exchange for the tiny total,
    and broadcasts the one-row threshold back against the grouped set.
    Per-part line value stands in for ps_supplycost*ps_availqty; the
    threshold is a multiple of the global AVERAGE (scale-free) rather
    than TPC-H's fixed fraction of the total, which empties out as the
    part count grows (0 rows at sf0.1 with the uniform fixtures)."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q11)


_TPCH_Q16 = """
        SELECT p_brand, p_type, p_size,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_type NOT LIKE 'PROMO%'
          AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q_sql_tpch_q16", oracle=_TPCH_Q16)
def q_sql_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier relationship): distinct-supplier
    count per (brand, type, size) with a NOT IN exclusion list —
    Catalyst turns the subquery into a null-aware broadcast anti-join
    (s_suppkey is non-null, so it stays a cheap hash lookup), part
    predicates apply before the join (size IN pushes to the scan), and
    count(DISTINCT) expands to the standard two-phase partial-distinct
    aggregate.  Negative account balance stands in for the complaints
    LIKE filter."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q16)


_TPCH_Q20 = """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON r_regionkey = n_regionkey
        WHERE r_name = 'AMERICA'
          AND s_suppkey IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'small%')
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey, l_partkey
            HAVING sum(l_quantity) > 48
          )
        ORDER BY s_name, s_acctbal, s_suppkey
"""


@query("q_sql_tpch_q20", oracle=_TPCH_Q20)
def q_sql_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): nested semi-join
    chain — suppliers IN (heavy shippers of parts IN (prefix-LIKE
    part list)).  The inner part list is a broadcast semi-join into
    the lineitem scan (prefix LIKE pushes as a StartsWith filter), the
    HAVING aggregates per (supplier, part) before the outer semi-join,
    and the outer IN becomes a left-semi hash join against the tiny
    supplier dim — no step ever materializes a full join.  The
    quantity threshold stands in for the missing ps_availqty
    comparison."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q20)


_TPCH_Q21 = """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   (l_shipdate > o_orderdate) AS late, o_orderstatus
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        )
        SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON r_regionkey = n_regionkey
        JOIN lo l1 ON s_suppkey = l1.l_suppkey
        WHERE r_name = 'AMERICA' AND l1.late AND l1.o_orderstatus = 'F'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lo l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
"""


@query("q_sql_tpch_q21", oracle=_TPCH_Q21)
def q_sql_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): EXISTS +
    NOT EXISTS self-joins on the fact table — a supplier's late line
    counts only when the order is multi-supplier AND no OTHER supplier
    was late on it.  Both correlated subqueries decorrelate to
    left-semi / left-anti hash joins on l_orderkey (never per-row
    loops).  Like every mainstream engine on canonical Q21, the fact
    table is scanned 3x (outer + semi + anti branch); at 100 TB the
    cheaper production formulation folds all three into ONE
    lineitem<->orders pass with per-order conditional aggregates
    (nsupp > 1 AND nlate = 1 AND the late one is this supplier) — this
    key deliberately keeps the EXISTS shape because exercising
    Catalyst's decorrelation is what it covers.  Late shipment
    (l_shipdate > o_orderdate, as in q_sql_tpch_q4) stands in for
    receipt-after-commit, which the fixtures don't carry."""
    from vector_db_ingestor_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TPCH_Q21)


# =====================================================================
# round-9 additions: filter-cascade report, token entropy,
# cross-source near-dup overlap
# =====================================================================

#: Gopher-style rule thresholds (Rae et al. 2021 §A1.1 give the rule
#: SHAPES — word-count bounds, mean-word-length bounds, symbol ratio,
#: stopword presence; the numeric cut points here are recalibrated to
#: the synthetic fixtures so every rule discriminates: word counts run
#: 10-100 with median ~55 and mean word length sits in a tight
#: 4.0-4.95 band, so the paper's [3, 10] length bounds would never
#: fire).  Shared verbatim with the SQL oracle via f-string rendering.
GOPHER_MIN_WORDS = 20
GOPHER_MAX_WORDS = 90
GOPHER_MWL_LO = 4.2
GOPHER_MWL_HI = 4.8
GOPHER_MAX_SYMBOL_RATIO = 0.1

_STOPWORD_LIST_SQL = "[" + ",".join(f"'{w}'" for w in ta.STOPWORDS) + "]"


@query(
    "q_docs_filter_report",
    oracle=f"""
    WITH m AS (
        SELECT len(string_split_regex(trim(text), '\\s+')) AS n_words,
               length(regexp_replace(trim(text), '\\s+', '', 'g'))
                 / greatest(len(string_split_regex(trim(text), '\\s+')), 1) AS mwl,
               length(regexp_replace(text, '[^.!?,;:]', '', 'g'))
                 / greatest(length(text), 1) AS symr,
               len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                   t -> list_contains({_STOPWORD_LIST_SQL}, t))) AS stop_hits
        FROM documents
    ),
    f AS (
        SELECT (n_words < {GOPHER_MIN_WORDS}) AS f_min,
               (n_words > {GOPHER_MAX_WORDS}) AS f_max,
               (mwl < {GOPHER_MWL_LO} OR mwl > {GOPHER_MWL_HI}) AS f_mwl,
               (symr > {GOPHER_MAX_SYMBOL_RATIO}) AS f_sym,
               (stop_hits = 0) AS f_stop
        FROM m
    ),
    agg AS (
        SELECT count(*) AS n,
               count_if(f_min) AS c_min, count_if(f_max) AS c_max,
               count_if(f_mwl) AS c_mwl, count_if(f_sym) AS c_sym,
               count_if(f_stop) AS c_stop,
               count_if(NOT (f_min OR f_max OR f_mwl OR f_sym OR f_stop)) AS c_pass
        FROM f
    )
    SELECT 'min_words' AS rule, CAST(c_min AS BIGINT) AS n_fail, round(c_min / n, 6) AS fail_rate FROM agg
    UNION ALL SELECT 'max_words', CAST(c_max AS BIGINT), round(c_max / n, 6) FROM agg
    UNION ALL SELECT 'mean_word_len', CAST(c_mwl AS BIGINT), round(c_mwl / n, 6) FROM agg
    UNION ALL SELECT 'symbol_ratio', CAST(c_sym AS BIGINT), round(c_sym / n, 6) FROM agg
    UNION ALL SELECT 'no_stopwords', CAST(c_stop AS BIGINT), round(c_stop / n, 6) FROM agg
    UNION ALL SELECT 'pass_all', CAST(c_pass AS BIGINT), round(c_pass / n, 6) FROM agg
    """,
)
def q_docs_filter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-filter cascade with per-rule drop
    accounting: five deterministic rules (word-count bounds, mean word
    length band, symbol ratio, stopword presence) evaluated in ONE
    scan, reported as (rule, n_fail, fail_rate) rows plus a `pass_all`
    survivors row — the per-rule rejection report a corpus-cleaning
    run ships with.

    Scale: a single map-side-combined global aggregate (flags are
    cheap JVM expressions riding the scan; the exchange carries ONE
    row of counters per partition); the explode to tidy rows touches
    a 1-row DataFrame.  No joins, no data-sized shuffle at any SF.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_words = ta.whitespace_token_count(F.col("text"))
    mwl = ta.mean_token_len(F.col("text"))
    symr = ta.punct_ratio(F.col("text"))
    ltoks = F.split(F.lower(F.trim(F.col("text"))), "\\s+")
    stop_hits = F.size(F.filter(ltoks, lambda t: t.isin(*ta.STOPWORDS)))
    flags = docs.select(
        (n_words < GOPHER_MIN_WORDS).alias("f_min"),
        (n_words > GOPHER_MAX_WORDS).alias("f_max"),
        ((mwl < GOPHER_MWL_LO) | (mwl > GOPHER_MWL_HI)).alias("f_mwl"),
        (symr > GOPHER_MAX_SYMBOL_RATIO).alias("f_sym"),
        (stop_hits == 0).alias("f_stop"),
    )
    agg = flags.agg(
        F.count("*").alias("n"),
        F.count_if(F.col("f_min")).alias("c_min"),
        F.count_if(F.col("f_max")).alias("c_max"),
        F.count_if(F.col("f_mwl")).alias("c_mwl"),
        F.count_if(F.col("f_sym")).alias("c_sym"),
        F.count_if(F.col("f_stop")).alias("c_stop"),
        F.count_if(
            ~(
                F.col("f_min")
                | F.col("f_max")
                | F.col("f_mwl")
                | F.col("f_sym")
                | F.col("f_stop")
            )
        ).alias("c_pass"),
    )

    def rule_row(name: str, c: str):
        return F.struct(
            F.lit(name).alias("rule"),
            F.col(c).alias("n_fail"),
            F.round(F.col(c) / F.col("n"), 6).alias("fail_rate"),
        )

    return agg.select(
        F.explode(
            F.array(
                rule_row("min_words", "c_min"),
                rule_row("max_words", "c_max"),
                rule_row("mean_word_len", "c_mwl"),
                rule_row("symbol_ratio", "c_sym"),
                rule_row("no_stopwords", "c_stop"),
                rule_row("pass_all", "c_pass"),
            )
        ).alias("r")
    ).select("r.*")


@query(
    "q_text_entropy",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
        FROM documents
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ),
    per AS (
        SELECT doc_id,
               sum(tf) AS n_tokens,
               count(*) AS n_terms,
               sum(CAST(round(tf * ln(tf::DOUBLE) * 1000000) AS BIGINT)) AS mn
        FROM tf GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_terms AS BIGINT) AS n_terms,
           round(n_terms / n_tokens, 6) AS ttr,
           round(ln(n_tokens::DOUBLE) - (mn / 1000000.0) / n_tokens, 6) AS entropy
    FROM per
    """,
)
def q_text_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-distribution diversity per doc: unigram Shannon entropy
    (nats) + type-token ratio — the low-entropy tail is boilerplate /
    repetition, a standard corpus-quality cut.

    Cross-engine float discipline: entropy = ln(N) - (1/N)*sum(tf*ln tf)
    where the SUM is carried as exact integer micro-nats
    (round(tf*ln(tf)*1e6) as BIGINT) — integer addition is
    order-insensitive, so hash parity cannot depend on Spark's
    nondeterministic aggregation order (same trick family as the bm25
    pre-rounding; ln itself is parity-proven by q_tfidf/q_math_fns).

    Scale: explode -> two map-side-combined hash aggs keyed by
    (doc_id, term) then doc_id — the same shuffle shape as q_tfidf;
    linear in corpus tokens, no joins.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), "\\s+")).alias("term"),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    per = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.count("*").alias("n_terms"),
        F.sum(
            F.round(F.col("tf") * F.log(F.col("tf")) * 1000000.0, 0).cast("long")
        ).alias("mn"),
    )
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_terms").cast("long").alias("n_terms"),
        F.round(F.col("n_terms") / F.col("n_tokens"), 6).alias("ttr"),
        F.round(
            F.log(F.col("n_tokens"))
            - (F.col("mn") / F.lit(1000000.0)) / F.col("n_tokens"),
            6,
        ).alias("entropy"),
    )


def q_dedup_crosssource_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup overlap matrix: MinHash-LSH candidate
    pairs (the md5 family, identical to q_dedup_minhash) rolled up by
    unordered source pair — the provenance diagnostic a multi-source
    training mix needs before assigning mixture weights (which crawls /
    dumps are near-copies of each other, and how strongly).

    est_jaccard values are exact multiples of 1/64 (dyadic, <= 6
    decimals), so the per-pair sum/avg is EXACT in double regardless of
    Spark's aggregation order — avg/max are hash-parity-safe with no
    pre-rounding needed.

    Scale: candidates come from the band-bucket equi-join (linear, the
    100x-probed minhash path); the two doc_id->source lookups join a
    candidate set that is orders of magnitude smaller than the corpus,
    so AQE picks a broadcast of the PAIR side against the data-sized
    source map (never the reverse); the final rollup keys on at most
    |sources|^2 rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_candidates(
        docs, num_perm=64, bands=16, shingle_n=3, hash_family="md5"
    )
    src = docs.select("doc_id", "source")
    j = pairs.join(
        src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")),
        "id_a",
    ).join(
        src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")),
        "id_b",
    )
    return (
        j.select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "est_jaccard",
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("est_jaccard"), 6).alias("avg_est"),
            F.round(F.max("est_jaccard"), 6).alias("max_est"),
        )
    )


QUERIES["q_dedup_crosssource"] = q_dedup_crosssource_impl
ORACLE_SQL["q_dedup_crosssource"] = f"""
    SELECT least(sa.source, sb.source) AS source_a,
           greatest(sa.source, sb.source) AS source_b,
           CAST(count(*) AS BIGINT) AS n_pairs,
           round(avg(p.est_jaccard), 6) AS avg_est,
           round(max(p.est_jaccard), 6) AS max_est
    FROM ({_minhash_md5_candidates_oracle()}) p
    JOIN documents sa ON sa.doc_id = p.id_a
    JOIN documents sb ON sb.doc_id = p.id_b
    GROUP BY 1, 2
    """


# =====================================================================
# round 10: IVF-PQ combined serving (coarse routing + residual codes)
# =====================================================================

def _ivfpq_params() -> tuple[list[list[float]], list[list[list[float]]], int, int]:
    """Shared model literals for q_ann_ivfpq and its oracle: the IVF
    assignment centroids (same family as q_ann_ivf_assign) and PQ
    codebooks at a DISJOINT md5 seed range (3000+) so the residual
    codebooks are independent of both the raw-vector PQ key (2000+)
    and the coarse centroids (1000+)."""
    from vector_db_ingestor_spark.operators.similarity import pq_codebooks

    m, ksub = 4, 16
    cents = _ivf_assign_centroids()
    cbs = pq_codebooks(EMBEDDING_DIM, m, ksub, seed_base=3000)
    return cents, cbs, m, ksub


def q_ann_ivfpq_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-k: the FAISS IVFPQ serving architecture in one
    declarative plan — nearest-centroid routing over literal coarse
    centroids, nprobe=4 cell pruning, PQ codes over the RESIDUAL
    (vector minus cell centroid), and ADC scoring via
    ``<q,x> ~= <q,c_cid> + sum_s tab_s[code_s]`` with every table a
    Python-precomputed literal.  Completes the ANN family's composed
    end-state: q_ann_ivf_assign pins routing, q_vec_pq_adc pins
    raw-vector PQ, this key pins their composition with residual
    encoding (the part that makes IVF-PQ beat flat PQ at equal code
    budget).  All post-training stages are closed-form, so the oracle
    re-derives routing, residuals, codes, and scores from the same
    literals — hash-exact, not rows-only.  Scan shape: assignment and
    encoding are narrow transforms riding the scan; top-k compiles to
    TakeOrderedAndProject (PLANS.md)."""
    from vector_db_ingestor_spark.operators.similarity import ivfpq_topk

    cents, cbs, _, _ = _ivfpq_params()
    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk(emb, cents, cbs, PROBE_64, k=10, nprobe=4)


def _ivfpq_oracle(
    k: int = 10, nprobe: int = 4, probe: list[float] | None = None
) -> str:
    """DuckDB mirror of the full IVF-PQ serving path from the SAME
    literals: routing argmax (rounded cosine, first-wins), shortlist
    re-ranked in SQL, residual subtraction, per-subspace reduced-L2
    argmin codes, and the literal-table ADC sum in the same
    left-to-right order as the Spark expression.  ``probe`` defaults
    to PROBE_64 (the q_ann_ivfpq key); the batch oracle replays this
    per probe."""
    from vector_db_ingestor_spark.operators.similarity import pq_adc_tables

    if probe is None:
        probe = PROBE_64
    probe_sql = probe_sql_literal(probe)
    cents, cbs, m, _ = _ivfpq_params()
    dsub = EMBEDDING_DIM // m
    tabs = pq_adc_tables(probe, cbs)

    def bare(v: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in v) + "]"

    def lst(v: list[float]) -> str:
        return bare(v) + "::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = lst(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    cent_rows = ", ".join(f"({i}, {lst(c)})" for i, c in enumerate(cents))
    sims = ", ".join(cos_sql(c) for c in cents)
    sub_cols = ", ".join(
        f"list_slice(r, {s * dsub + 1}, {(s + 1) * dsub}) AS s{s}" for s in range(m)
    )
    dist_cols = []
    for s in range(m):
        ds = ", ".join(
            f"round(-2.0 * list_dot_product(s{s}, {lst(c)})"
            f" + {sum(x * x for x in c)!r}, 6)"
            for c in cbs[s]
        )
        dist_cols.append(f"[{ds}] AS d{s}")
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INTEGER) AS c{s}"
        for s in range(m)
    )
    q_dot_c = [float(sum(p * c for p, c in zip(probe, cc))) for cc in cents]
    adc = f"{bare(q_dot_c)}[cid + 1]" + "".join(
        f" + {bare(tabs[s])}[c{s} + 1]" for s in range(m)
    )
    return f"""
    WITH cents(cid, cvec) AS (VALUES {cent_rows}),
    short AS (
        SELECT cid FROM cents
        ORDER BY (list_dot_product(cvec, {probe_sql})
                  / (sqrt(list_dot_product(cvec, cvec))
                     * sqrt(list_dot_product({probe_sql}, {probe_sql})))) DESC,
                 cid ASC
        LIMIT {nprobe}
    ),
    assigned AS (
        SELECT vec_id, v,
               CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v, [{sims}] AS sims
              FROM embeddings)
    ),
    pruned AS (
        SELECT a.vec_id, a.cid,
               list_transform(range(1, {EMBEDDING_DIM} + 1),
                              i -> a.v[i] - c.cvec[i]) AS r
        FROM assigned a JOIN cents c ON a.cid = c.cid
        WHERE a.cid IN (SELECT cid FROM short)
    ),
    sub AS (SELECT vec_id, cid, {sub_cols} FROM pruned),
    dists AS (SELECT vec_id, cid, {", ".join(dist_cols)} FROM sub),
    codes AS (SELECT vec_id, cid, {code_cols} FROM dists)
    SELECT vec_id, cid, round({adc}, 6) AS score
    FROM codes
    ORDER BY score DESC, vec_id ASC
    LIMIT {k}
    """


QUERIES["q_ann_ivfpq"] = q_ann_ivfpq_impl
ORACLE_SQL["q_ann_ivfpq"] = _ivfpq_oracle()


# =====================================================================
# round 11: batched IVF-PQ serving (N probes, one encode pass)
# =====================================================================

def _ivfpq_batch_probes() -> list[tuple[int, list[float]]]:
    """The 2-probe batch of q_ann_ivf_batch (base probe + reversal) so
    the IVF and IVF-PQ batch keys exercise the same routing split."""
    return [(0, PROBE_64), (1, list(reversed(PROBE_64)))]


def q_ann_ivfpq_batch_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched IVF-PQ serving: N probes answered by ONE corpus
    assignment + residual encode of the union'd shortlist cells — a
    broadcast (cid, query_id) route table fans each coded row out to
    exactly the probes that shortlisted its cell, per-probe ADC tables
    enter as literals indexed by batch position, and a per-query
    window takes the top-k (operators/similarity.py ivfpq_topk_batch).
    The production serving shape: Q probes cost ~1 pruned scan, not Q
    (the q_topk_batch / q_ann_ivf_batch batching story applied to the
    codes path).  Hash-exact: the oracle replays the single-probe
    IVF-PQ mirror once per probe (each probe's own shortlist — the
    route-table semantics) and UNION ALLs the ranked results, so
    routing, residual codes, ADC order, and the per-probe top-k are
    all cross-engine checked."""
    from vector_db_ingestor_spark.operators.similarity import ivfpq_topk_batch

    cents, cbs, _, _ = _ivfpq_params()
    emb = load_table(spark, sf_dir, "embeddings")
    return ivfpq_topk_batch(
        emb, cents, cbs, _ivfpq_batch_probes(), k=10, nprobe=4
    )


def _ivfpq_batch_oracle(k: int = 10, nprobe: int = 4) -> str:
    """UNION ALL of the single-probe IVF-PQ mirror, one replay per
    probe with that probe's own shortlist/tables, tagged with query_id
    and ranked — the _mmr_batch_oracle unrolling pattern."""
    selects = []
    for qid, vec in _ivfpq_batch_probes():
        selects.append(
            f"""SELECT {qid} AS query_id, vec_id, cid, score,
           CAST(row_number() OVER (
               ORDER BY score DESC, vec_id ASC) AS INTEGER) AS rank
    FROM ({_ivfpq_oracle(k, nprobe, vec)})"""
        )
    return "\n    " + "\n    UNION ALL ".join(selects)


QUERIES["q_ann_ivfpq_batch"] = q_ann_ivfpq_batch_impl
ORACLE_SQL["q_ann_ivfpq_batch"] = _ivfpq_batch_oracle()


# =====================================================================
# q_ivf_drift_report: IVF occupancy drift report (built +
# differentially tested in round 11, DECLARED round 12 per the SURVEY
# §7 window arithmetic: 2 new + 4 rows-only + 44 r9-stale = 50).
# Differential evidence since round 11:
# tests/test_round11_queries.py runs this Spark plan and the oracle
# SQL side by side on DuckDB.
# =====================================================================

def q_ivf_drift_report_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-maintenance reporting (operators/similarity.py
    ivf_drift_report): per-centroid occupancy (n, share, skew =
    n / mean) of the corpus under the literal assignment centroids —
    the retrain signal for frozen-model IVF/IVF-PQ indexes absorbing
    appends (`skew > ~4` on any cell means probes of that cell scan
    4x the ideal row count).  Assignment is the hash-green
    q_ann_ivf_assign expression; the report is one hash agg over the
    cid column (at deployment it reads ONLY the partition key of the
    codes table — no vectors), a full-outer join against the model's
    cid range so empty (drifted-away-from) cells surface as n=0 rows,
    and a 1-row broadcast total.  Closed-form given the literals, so
    the oracle re-derives assignment AND the share/skew arithmetic."""
    from vector_db_ingestor_spark.operators.similarity import (
        _assign_cid,
        ivf_drift_report,
    )

    cents = _ivf_assign_centroids()
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    assigned = emb.select(_assign_cid(vec, cents, round_dp=6).alias("cid"))
    return ivf_drift_report(assigned, n_centroids=len(cents))


def _ivf_drift_oracle() -> str:
    """DuckDB mirror: the q_ann_ivf_assign assignment CTE feeding the
    occupancy arithmetic — counts over the FULL cid range (empty cells
    as zero rows), share = n/total, skew = n*k/total, both rounded
    like the Spark side."""
    cents = _ivf_assign_centroids()

    def cvec(c: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = cvec(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    sims = ", ".join(cos_sql(c) for c in cents)
    k = len(cents)
    return f"""
    WITH assigned AS (
        SELECT CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT [{sims}] AS sims FROM embeddings)
    ),
    counts AS (
        SELECT r.cid, CAST(coalesce(a.n, 0) AS BIGINT) AS n
        FROM (SELECT CAST(range AS INTEGER) AS cid FROM range({k})) r
        LEFT JOIN (SELECT cid, count(*) AS n FROM assigned GROUP BY cid) a
          USING (cid)
    ),
    tot AS (SELECT CAST(sum(n) AS DOUBLE) AS t, count(*) AS k FROM counts)
    SELECT cid, n,
           round(n / t, 6) AS share,
           round(n * k / t, 6) AS skew
    FROM counts CROSS JOIN tot
    """


QUERIES["q_ivf_drift_report"] = q_ivf_drift_report_impl
ORACLE_SQL["q_ivf_drift_report"] = _ivf_drift_oracle()


# =====================================================================
# q_warc_ingest (declared round 12 with q_ivf_drift_report): WARC
# ingest chain, synthesized records through the REAL parser into the
# REAL fused chunk kernel — the q_warc_ingest candidate SURVEY §7
# names.  Built + differentially tested round 11
# (tests/test_round11_queries.py).
# =====================================================================

def q_warc_ingest_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full Common Crawl front door under the hash gate: fixture
    documents wrapped as WARC response records IN-PLAN (the
    q_warc_pipeline synthesis — byte-correct Content-Length), the REAL
    record parser walks the bytes, and the surviving responses run the
    REAL ingest tail (pipeline.build_chunks: UTF-8 decode -> reference
    chunker -> deterministic sha-256 uids -> embedding UDF), exactly
    the `ingest_warc` chain minus the parquet write.  The oracle
    recomputes filenames, chunk indices/counts and uids from
    `documents` via the recursive-CTE chunker mirror — so a defect in
    parsing (slicing, envelope), decoding, chunk semantics or uid
    derivation breaks the hash.  Composes the q_warc_pipeline and
    q_ingest_pipeline contracts into the one pipeline a crawl corpus
    actually runs."""
    from vector_db_ingestor_spark.pipeline import build_chunks
    from vector_db_ingestor_spark.sources.warc import parse_warc_bytes

    docs = load_table(spark, sf_dir, "documents")
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"),
        F.col("text"),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.concat(F.lit("http://fixtures/"), F.col("doc_id")),
        F.lit("\r\nWARC-Date: 2026-08-15T00:00:00Z\r\nContent-Length: "),
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    segments = docs.select(
        F.concat(F.lit("mem://"), F.col("doc_id")).alias("path"),
        F.to_binary(record, F.lit("utf-8")).alias("content"),
    )
    recs = parse_warc_bytes(segments)
    files = recs.filter(
        (F.col("record_type") == "response") & (F.col("http_status") == 200)
    ).select(
        "source",
        F.col("url").alias("filename"),
        F.col("payload").alias("content"),
    )
    chunks = build_chunks(
        files,
        chunk_size=200,
        overlap=30,
        extract=lambda b: b.decode("utf-8", "replace"),
    )
    return chunks.select(
        "chunk_uid", "filename", "chunk_index", "total_chunks",
        F.length("text").alias("chunk_chars"),
        F.size("embedding").alias("emb_dim"),
    )


def _warc_ingest_oracle() -> str:
    """DuckDB mirror: parse+decode are the identity on the synthetic
    wrapping (pinned by q_warc_pipeline's sha256 check and the UTF-8
    round-trip test), so the oracle chunks the raw documents text with
    the recursive-CTE chunker mirror (cs=200, ov=30), names each doc by
    its synthesized URL, and recomputes the deterministic uids — the
    _ingest_pipeline_oracle skeleton with the WARC front door's
    filename contract."""
    ws = _PY_STRIP_SET
    return f"""
    WITH base AS ({_chunker_oracle(chunk_size=200, overlap=30)}),
    named AS (
        SELECT b.doc_id, b.chunk_index, b.chunk,
               'http://fixtures/' || CAST(b.doc_id AS VARCHAR) AS filename,
               CAST(count(*) OVER (PARTITION BY b.doc_id) AS INTEGER)
                   AS total_chunks
        FROM base b
    )
    SELECT sha256(filename || chr(1) || CAST(chunk_index AS VARCHAR)
                  || chr(1) || chunk) AS chunk_uid,
           filename, chunk_index, total_chunks,
           CAST(length(chunk) AS INTEGER) AS chunk_chars,
           CAST(64 AS INTEGER) AS emb_dim
    FROM named
    WHERE trim(chunk, {ws}) <> ''
    """


QUERIES["q_warc_ingest"] = q_warc_ingest_impl
ORACLE_SQL["q_warc_ingest"] = _warc_ingest_oracle()


# =====================================================================
# q_url_curation (DECLARED round 13 with q_dedup_url, per the SURVEY
# §7 window arithmetic: 2 new + 4 rows-only + 44 r10-stale = 50).
# Built + differentially tested round 11
# (tests/test_round11_queries.py runs the Spark plan and the oracle
# SQL side by side on DuckDB).  Certifies functions/url.py's
# normalization contract cross-engine.
# =====================================================================

def q_url_curation_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL curation over synthesized crawl URLs (fixtures carry no URL
    column, so one is derived in-plan from document fields — the
    q_warc_pipeline synthesis contract): host extraction, registrable
    domain, and canonical normalization (functions/url.py — lowercase
    scheme/host, fragment dropped, tracking params stripped, trailing
    slash removed).  The oracle recomputes every output DIRECTLY from
    the same document fields — host casing, utm/fbclid removal, path
    and fragment handling are all cross-engine checked.  All JVM-side
    expressions riding the scan: the curation pass costs a projection."""
    from vector_db_ingestor_spark.functions.url import (
        registrable_domain,
        url_host,
        url_normalize,
    )

    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."),
        F.col("lang"),
        F.lit(".Example.COM/docs/"),
        F.col("doc_id"),
        F.lit("/?utm_source=feed&fbclid="),
        F.col("doc_id"),
        F.lit("&q="),
        F.col("n_chars"),
        F.lit("#sec"),
    )
    host = url_host(url)
    return docs.select(
        "doc_id",
        url.alias("url_raw"),
        host.alias("host"),
        registrable_domain(host).alias("rdom"),
        url_normalize(url).alias("url_canon"),
    )


def _url_curation_oracle() -> str:
    """DuckDB mirror: the synthesized URL and every curation output
    rebuilt from the raw document fields with plain string concat —
    independent of the engine-side parse_url/regexp mechanism, so it
    pins the CONTRACT (what normalization must produce), not the
    implementation."""
    return """
    SELECT doc_id,
           'https://WWW.' || lang || '.Example.COM/docs/'
               || CAST(doc_id AS VARCHAR) || '/?utm_source=feed&fbclid='
               || CAST(doc_id AS VARCHAR) || '&q='
               || CAST(n_chars AS VARCHAR) || '#sec' AS url_raw,
           'www.' || lower(lang) || '.example.com' AS host,
           'example.com' AS rdom,
           'https://www.' || lower(lang) || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?q='
               || CAST(n_chars AS VARCHAR) AS url_canon
    FROM documents
    """


QUERIES["q_url_curation"] = q_url_curation_impl
ORACLE_SQL["q_url_curation"] = _url_curation_oracle()


# =====================================================================
# round 10: semantic dedup (SemDeDup-style keep/drop over embeddings)
# =====================================================================

def _dedup_semantic_oracle() -> str:
    """Recursive-CTE mirror: the hash-green embed near-dup SQL
    (`_dedup_embed_oracle`, literal hyperplane buckets + exact cosine)
    becomes the edge list, transitive closure resolves components, and
    keep = (vec_id == min id in component) — the same composition the
    q_dedup_clusters oracle proved for ngram pairs, applied to the
    embedding channel."""
    return f"""
    WITH RECURSIVE
    pairs AS (SELECT id_a, id_b FROM ({_dedup_embed_oracle()})),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION
        SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    clusters AS (
        SELECT emb.vec_id,
               least(emb.vec_id, coalesce(min(r.v), emb.vec_id)) AS cluster_id
        FROM embeddings emb LEFT JOIN reach r ON emb.vec_id = r.u
        GROUP BY emb.vec_id
    )
    SELECT vec_id, cluster_id, vec_id = cluster_id AS keep FROM clusters
    """


@query("q_dedup_semantic", oracle=_dedup_semantic_oracle())
def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023:
    embedding-space near-dup removal catches paraphrases lexical dedup
    misses): LSH-blocked exact-cosine near-dup pairs over the embedding
    column -> connected components via min-label propagation -> a
    per-vector keep/drop verdict (keep = the component's min-id
    representative; singletons keep themselves).  This is the decision
    column a training-data pipeline joins back onto the corpus.  Pure
    composition of two hash-green primitives (embedding_near_dups +
    dedup_clusters), so the oracle replays both: literal hyperplanes
    re-derive the candidate buckets and a recursive CTE re-derives the
    components.  At 100 TB: candidate volume rides the LSH buckets
    (~linear, SCALE_PROBE embed family), label propagation is
    O(component diameter) rounds of equi-join + partial agg."""
    from vector_db_ingestor_spark.constants import EMBEDDING_DIM
    from vector_db_ingestor_spark.operators.dedup import dedup_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dups(emb, threshold=0.3, dim=EMBEDDING_DIM, n_bits=8)
    clusters = dedup_clusters(pairs, emb, id_col="vec_id")
    return clusters.select(
        "vec_id",
        "cluster_id",
        (F.col("vec_id") == F.col("cluster_id")).alias("keep"),
    )


# =====================================================================
# round 10: corpus-trained bigram-LM fluency scoring (CCNet-style)
# =====================================================================

_LM_ALPHA = 0.5  # add-alpha smoothing, shared by engine and oracle


def _lm_score_oracle() -> str:
    """DuckDB mirror of the bigram-LM scorer: identical tokenization,
    identical (context, next) stream with multiplicity, counts and
    vocabulary re-derived from the same parquet, and each bigram's
    -ln p carried as integer micro-nats (round(x*1e6) BIGINT both
    sides) so per-doc aggregation order cannot break hash parity —
    the q_text_entropy trick applied to a corpus-trained model."""
    a = _LM_ALPHA
    w = "string_split_regex(lower(trim(text)), '\\s+')"
    return f"""
    WITH base AS (
        SELECT doc_id, {w} AS w FROM documents WHERE len({w}) >= 2
    ),
    bg AS (
        SELECT doc_id, u['a'] AS a, u['b'] AS b
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(w)),
                            i -> {{'a': w[i], 'b': w[i + 1]}})) AS u
              FROM base)
    ),
    dtf AS (
        SELECT doc_id, a, b, count(*) AS m FROM bg GROUP BY doc_id, a, b
    ),
    c2 AS (SELECT a, b, sum(m) AS c2 FROM dtf GROUP BY a, b),
    c1 AS (SELECT a, sum(c2) AS c1 FROM c2 GROUP BY a),
    v AS (
        SELECT count(DISTINCT t) AS vocab
        FROM (SELECT a AS t FROM dtf UNION ALL SELECT b FROM dtf)
    ),
    scored AS (
        SELECT dtf.doc_id, dtf.m,
               CAST(round(-ln((c2.c2 + {a}) / (c1.c1 + {a} * v.vocab))
                          * 1000000) AS BIGINT) AS mn
        FROM dtf JOIN c2 ON dtf.a = c2.a AND dtf.b = c2.b
                 JOIN c1 ON dtf.a = c1.a
                 CROSS JOIN v
    )
    SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
           round(sum(m * mn) / (sum(m) * 1000000.0), 6) AS nll
    FROM scored GROUP BY doc_id
    """


@query("q_text_lm_score", oracle=_lm_score_oracle())
def q_text_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document
    (the CCNet/KenLM-style quality signal: low average negative
    log-likelihood = fluent prose, high = gibberish/boilerplate — the
    third leg of the text-quality stack next to heuristic ratios and
    within-doc entropy).  Train and score in ONE plan: the bigram
    stream (WITH multiplicity — this is a sequence model, not the
    dedup shingle set) is aggregated into (context, next) counts,
    contexts roll up from those counts, vocabulary is a 1-row scalar,
    and every doc-bigram joins back to its smoothed probability
    p(b|a) = (c2 + a) / (c1 + a*V).  Each -ln p is integer-encoded as
    micro-nats and weighted by its integer multiplicity before the
    per-doc sum (order-insensitive aggregation, the q_text_entropy
    rule), so the corpus-trained model is hash-checked end-to-end.
    Scale: the corpus is scanned and tokenized EXACTLY ONCE — the
    per-(doc, bigram) multiplicity table is persisted DISK_ONLY and
    every model relation derives from it: c2 rolls up dtf, c1 rolls
    up c2, and the vocabulary is the distinct union of dtf's
    context/next columns (which covers every token of every size>=2
    doc — no separate token-stream scan).  Without the shared
    materialization, column pruning split the subtree into FOUR full
    corpus scans (measured: 4 FileScan/Generate nodes); DISK_ONLY
    rather than an in-memory localCheckpoint because dtf is
    corpus-sized string rows — heap-resident at 100x it drove
    38-113s GC-bound walls vs 11-21s serialized-on-disk, and the
    100x/30x ratio lands at 2.47 vs the 3.33 linear expectation
    (SCALE_PROBE.md round-10 LM section).  Every post-dtf exchange
    carries aggregated rows; the 1-row vocab scalar is broadcast, the
    vocabulary-sized context table is left to AQE (broadcast at sf
    scale, shuffle at web scale — an explicit hint here would be a
    driver-OOM at 100 TB), and all joins are equi-joins on the model
    keys.  At 100 TB the counts become a persisted model table and
    scoring joins against it — identical plan minus the training
    aggregation.  The dtf cache is registered with
    :mod:`vector_db_ingestor_spark.caching`; harnesses call
    ``release_all()`` after consuming the result."""
    docs = load_table(spark, sf_dir, "documents")
    a = _LM_ALPHA
    w = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    base = docs.select("doc_id", w.alias("w")).filter(F.size("w") >= 2)
    dtf = (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(w) - 1),"
                    " i -> struct(w[i - 1] AS a, w[i] AS b))"
                )
            ).alias("u"),
        )
        .select("doc_id", F.col("u.a").alias("a"), F.col("u.b").alias("b"))
        .groupBy("doc_id", "a", "b")
        .agg(F.count("*").alias("m"))
        # materialize once: four consumers (scoring join, c2, via-c2 c1,
        # vocab) would otherwise each re-scan and re-tokenize the corpus.
        # DISK_ONLY: dtf is corpus-sized string rows — heap-resident it
        # GC-thrashes at scale (measured, see docstring).  The handle is
        # registered so the harness can reclaim the cache after the
        # (lazy) result is consumed — without caching.release_all(),
        # reclamation falls to Spark's ContextCleaner once the handle
        # is garbage-collected.
        .persist(StorageLevel.DISK_ONLY)
    )
    from vector_db_ingestor_spark.caching import register

    register(dtf)
    c2 = dtf.groupBy("a", "b").agg(F.sum("m").alias("c2"))
    c1 = c2.groupBy("a").agg(F.sum("c2").alias("c1"))
    # r15 optimization: distinct(dtf.a) ∪ distinct(dtf.b) ==
    # distinct(c2.a) ∪ distinct(c2.b) (c2 is dtf grouped on exactly
    # (a, b)), so the vocabulary scalar can count over the already-
    # aggregated c2 — two fewer corpus-sized passes over the cached dtf
    # (c2's exchange is shared with the scoring join via
    # ReusedExchange), identical BIGINT result.
    vocab = (
        c2.select(F.col("a").alias("t"))
        .unionAll(c2.select(F.col("b").alias("t")))
        .agg(F.countDistinct("t").alias("vocab"))
    )
    p = (F.col("c2") + F.lit(a)) / (F.col("c1") + F.lit(a) * F.col("vocab"))
    micro = F.round(-F.log(p) * F.lit(1000000.0), 0).cast("long")
    # c1 carries one row per distinct CONTEXT TOKEN — vocabulary-sized,
    # 10^8-10^9 rows on a 100 TB web corpus — so it must NOT carry an
    # explicit broadcast hint (that would override AQE's size check and
    # OOM the driver building the table).  AQE broadcasts it when it is
    # actually small (the sf-scale case) and shuffles it when it isn't;
    # only the 1-row vocab scalar is hint-broadcast.
    return (
        dtf.join(c2, ["a", "b"])
        .join(c1, "a")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "m", micro.alias("mn"))
        .groupBy("doc_id")
        .agg(
            F.sum("m").alias("n_bigrams"),
            F.round(
                F.sum(F.col("m") * F.col("mn"))
                / (F.sum("m") * F.lit(1000000.0)),
                6,
            ).alias("nll"),
        )
    )


# =====================================================================
# round 10: WARC ingest front door, driver-checked end-to-end
# =====================================================================

@query(
    "q_warc_pipeline",
    oracle="""
    SELECT 'http://fixtures/' || CAST(doc_id AS VARCHAR) AS url,
           'text/plain' AS content_type,
           200 AS http_status,
           CAST(length(text) AS BIGINT) AS n_chars,
           sha256(text) AS text_sha
    FROM documents
    """,
)
def q_warc_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WARC front door (sources/warc.py) hash-checked end-to-end:
    every fixture document is wrapped as a synthesized WARC response
    record IN-PLAN (headers with a computed Content-Length, an HTTP/1.1
    envelope — built with string expressions, no Python), the REAL
    record parser walks the bytes (one Arrow mapInPandas stage, exact
    Content-Length slicing, HTTP envelope stripped), and the output is
    projected to per-document facts the oracle recomputes DIRECTLY from
    the documents table — so a parser bug (off-by-one slicing, header
    mishandling, envelope residue) breaks the hash.  Mirrors the
    q_ingest_pipeline synthetic-wrapping contract.  Content-Length is
    computed with ``octet_length()`` (BYTES, matching the parser's
    byte slicing), so the synthesized record is byte-correct for any
    UTF-8 text, not just the all-ASCII fixtures."""
    from vector_db_ingestor_spark.sources.warc import parse_warc_bytes

    docs = load_table(spark, sf_dir, "documents")
    http = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"),
        F.col("text"),
    )
    record = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        F.concat(F.lit("http://fixtures/"), F.col("doc_id")),
        F.lit("\r\nWARC-Date: 2026-08-15T00:00:00Z\r\nContent-Length: "),
        # octet_length, not length: the header names BYTES and the
        # parser slices bytes — char count would desync on any
        # non-ASCII text (utf-8 multi-byte chars)
        F.octet_length(http).cast("string"),
        F.lit("\r\n\r\n"),
        http,
        F.lit("\r\n\r\n"),
    )
    segments = docs.select(
        F.concat(F.lit("mem://"), F.col("doc_id")).alias("path"),
        F.to_binary(record, F.lit("utf-8")).alias("content"),
    )
    recs = parse_warc_bytes(segments)
    return recs.filter(
        (F.col("record_type") == "response") & (F.col("http_status") == 200)
    ).select(
        "url",
        "content_type",
        "http_status",
        F.length(F.col("payload").cast("string")).cast("bigint").alias("n_chars"),
        F.sha2(F.col("payload").cast("string"), 256).alias("text_sha"),
    )


# =====================================================================
# q_dedup_url (DECLARED round 13 with q_url_curation) + the round-14
# queue items (built + differentially tested round 11, declared when
# the rotation window has room — the q_ivf_drift_report /
# q_warc_ingest discipline)
# =====================================================================

def q_dedup_url_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup — the cheapest dedup pass in a crawl pipeline
    (CCNet/RefinedWeb run it BEFORE any content signal: mirrors and
    trackers produce the same page under many raw URLs).  Fixtures
    carry no URL column, so raw URLs are synthesized in-plan with
    engineered collisions: the path buckets on (lang, n_chars % 50) so
    ~10 docs share each canonical page, while host casing, a trailing
    slash, and a per-doc utm_campaign tracking param make every RAW
    url distinct.  functions/url.py's ``url_normalize`` collapses the
    noise; first-seen wins (keep = min doc_id per canonical).  The
    oracle rebuilds the CANONICAL form directly from the raw fields
    with plain string concat — pinning the normalization contract,
    not the parse_url mechanism.  Scale: one shuffle on the canonical
    key; both window functions share the single partitioning.  At
    100 TB this is the exact plan — no candidate generation, no
    verify stage, just hash-partition on url_canon."""
    from vector_db_ingestor_spark.functions.url import url_normalize

    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("WWW.Example.COM"))
        .otherwise(F.lit("www.example.com")),
        F.lit("/"),
        F.col("lang"),
        F.lit("/page-"),
        (F.col("n_chars") % 50).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_campaign=c"),
        F.col("doc_id").cast("string"),
    )
    w = Window.partitionBy("url_canon")
    return (
        docs.select("doc_id", url_normalize(raw).alias("url_canon"))
        .withColumn("n_dups", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.min("doc_id").over(w))
    )


def _dedup_url_oracle() -> str:
    """DuckDB mirror: the canonical URL rebuilt from raw document
    fields by hand (lowercased host, tracking params gone, trailing
    slash and empty query dropped) — if ``url_normalize`` leaves any
    noise behind, the collision groups differ and the hash breaks."""
    return """
    WITH u AS (
        SELECT doc_id,
               'https://www.example.com/' || lang || '/page-'
                   || CAST(n_chars % 50 AS VARCHAR) AS url_canon
        FROM documents
    )
    SELECT doc_id, url_canon,
           CAST(count(*) OVER (PARTITION BY url_canon) AS BIGINT) AS n_dups,
           doc_id = min(doc_id) OVER (PARTITION BY url_canon) AS keep
    FROM u
    """


QUERIES["q_dedup_url"] = q_dedup_url_impl
ORACLE_SQL["q_dedup_url"] = _dedup_url_oracle()


def q_text_boilerplate_strip_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REMOVAL pass q_text_boilerplate's docstring promises: detect
    cross-document repeated lines (>= 3 distinct docs — the seeded
    per-source footers), then rebuild every document WITHOUT them via a
    broadcast anti-flag join and an order-preserving reassembly
    (posexplode -> collect_list(struct(pos, line)) -> array_sort ->
    array_join).  The cleaned text is pinned cross-engine by sha256,
    so a single mis-ordered or mis-dropped line breaks the hash.  A
    doc whose every line is boilerplate yields NULL clean text (both
    engines).  Scale: the boilerplate list is structurally tiny
    (lines repeated across >= 3 docs after the frequency cut), so the
    flag join is a broadcast — the corpus shuffles once for the
    frequency count and once for the per-doc regroup; at 100 TB key
    the shuffle on sha2(line) instead of the line text."""
    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.col("text"),
        F.lit(". Published by "), F.col("source"), F.lit(" syndicate. "),
        F.lit("All rights reserved "), F.col("source"), F.lit("."),
    )
    lines = (
        docs.select("doc_id", F.posexplode(F.split(page, r"\.")).alias("pos", "s"))
        .select("doc_id", "pos", F.trim("s").alias("line"))
        .filter(F.col("line") != "")
    )
    bp = (
        lines.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 3)
        .select("line", F.lit(True).alias("bp"))
    )
    marked = lines.join(F.broadcast(bp), "line", "left")
    kept_arr = F.array_sort(
        F.collect_list(
            F.when(F.col("bp").isNull(), F.struct("pos", "line"))
        )
    )
    clean = F.when(
        F.size(kept_arr) > 0,
        F.array_join(F.transform(kept_arr, lambda x: x["line"]), ". "),
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("bp").isNull(), 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(F.col("bp").isNotNull(), 1).otherwise(0)).alias("n_dropped"),
            F.length(clean).cast("bigint").alias("clean_chars"),
            F.sha2(clean, 256).alias("clean_sha"),
        )
    )


def _boilerplate_strip_oracle() -> str:
    """DuckDB mirror: same seeded footers, same line split/trim/filter,
    boilerplate = HAVING count(DISTINCT doc_id) >= 3, reassembly via
    ordered string_agg (aggregates skip the NULLed boilerplate lines),
    sha256 over the rebuilt text."""
    return """
    WITH raw AS (
        SELECT doc_id,
               text || '. Published by ' || source || ' syndicate. '
               || 'All rights reserved ' || source || '.' AS page
        FROM documents
    ),
    lines AS (
        SELECT doc_id, u['pos'] AS pos, u['line'] AS line
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(parts) + 1),
                            i -> {'pos': i, 'line': trim(parts[i])})) AS u
              FROM (SELECT doc_id, string_split(page, '.') AS parts FROM raw))
        WHERE u['line'] <> ''
    ),
    freq AS (
        SELECT line FROM lines GROUP BY line
        HAVING count(DISTINCT doc_id) >= 3
    ),
    marked AS (
        SELECT l.doc_id, l.pos, l.line, f.line IS NOT NULL AS bp
        FROM lines l LEFT JOIN freq f ON l.line = f.line
    )
    SELECT doc_id,
           CAST(sum(CASE WHEN NOT bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(length(string_agg(CASE WHEN NOT bp THEN line END, '. '
                                  ORDER BY pos)) AS BIGINT) AS clean_chars,
           sha256(string_agg(CASE WHEN NOT bp THEN line END, '. '
                             ORDER BY pos)) AS clean_sha
    FROM marked GROUP BY doc_id
    """


def q_nb_classify_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form multinomial Naive Bayes, trained AND scored in one
    declarative plan — the architecture of a fastText-style corpus
    quality/language filter expressed as count aggregations + joins
    (no iterative optimizer, so the distributed training is exact and
    hash-checkable, unlike SGD).  Labels are ``lang``; the synthetic
    text is lang-independent, so a deterministic marker token is
    seeded onto ~4/7 of docs (the q_pii_redact fixture pattern) to
    give training a real signal; docs with doc_id % 5 == 0 are held
    out and scored.  Determinism: every log-probability is integer
    micro-nats (round(ln(p)*1e6) BIGINT — the q_text_lm_score rule)
    weighted by integer token multiplicity, so per-doc aggregation
    order cannot break cross-engine parity; argmax tie-breaks on lang
    ascending.  Scale: the model (per-class token counts) is the only
    state — counts shuffle once, the class list and priors broadcast,
    and the count join is left to AQE exactly like the LM scorer's
    context table (vocabulary-sized at web scale, never hinted).  At
    100 TB train and score are separate passes over a persisted model
    table; the single-plan form here exists so the driver can
    hash-check training end-to-end."""
    docs = load_table(spark, sf_dir, "documents")
    page = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 < 4, F.concat(F.lit(" xmarker"), F.col("lang"))
        ).otherwise(F.lit("")),
    )
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.trim(page)), r"\s+")).alias("t"),
    )
    train = toks.filter(F.col("doc_id") % 5 != 0)
    test = (
        toks.filter(F.col("doc_id") % 5 == 0)
        .groupBy("doc_id", "t")
        .agg(F.count("*").alias("m"))
    )
    cnt = train.groupBy("lang", "t").agg(F.count("*").alias("c"))
    tot = cnt.groupBy("lang").agg(F.sum("c").alias("tot"))
    voc = cnt.select("t").distinct().agg(F.count("*").alias("v"))
    prior = train.select("doc_id", "lang").distinct().groupBy("lang").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    ntr = prior.agg(F.sum("nd").alias("ntr"))
    pmn = prior.crossJoin(F.broadcast(ntr)).select(
        "lang",
        F.round(F.log(F.col("nd") / F.col("ntr")) * 1000000.0, 0)
        .cast("long")
        .alias("pmn"),
    )
    cand = test.crossJoin(F.broadcast(prior.select("lang")))
    # token-count join left to AQE (vocabulary-sized at web scale);
    # per-class totals, vocab scalar, priors, and the class fan-out
    # are all genuinely tiny -> explicit broadcasts
    part = F.col("m") * F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
            / (F.col("tot") + F.col("v"))
        )
        * 1000000.0,
        0,
    ).cast("long")
    ll = (
        cand.join(cnt, ["lang", "t"], "left")
        .join(F.broadcast(tot), "lang")
        .crossJoin(F.broadcast(voc))
        .select("doc_id", "lang", part.alias("part"))
        .groupBy("doc_id", "lang")
        .agg(F.sum("part").alias("ll"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score_mn"), F.asc("lang")
    )
    ranked = (
        ll.join(F.broadcast(pmn), "lang")
        .select("doc_id", "lang", (F.col("ll") + F.col("pmn")).alias("score_mn"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    actual = docs.filter(F.col("doc_id") % 5 == 0).select(
        "doc_id", F.col("lang").alias("actual_lang")
    )
    return ranked.join(actual, "doc_id").select(
        "doc_id",
        "actual_lang",
        F.col("lang").alias("pred_lang"),
        (F.col("lang") == F.col("actual_lang")).alias("correct"),
        "score_mn",
    )


def _nb_classify_oracle() -> str:
    """DuckDB mirror of the NB train+score plan: identical marker
    seeding, tokenization, add-one smoothing, integer micro-nat
    encoding, and argmax tie-break.  DuckDB sums BIGINT into HUGEINT,
    so the final score is cast back to BIGINT for schema parity."""
    w = ("string_split_regex(lower(trim(text || CASE WHEN doc_id % 7 < 4 "
         "THEN ' xmarker' || lang ELSE '' END)), '\\s+')")
    return f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({w}) AS t FROM documents
    ),
    train AS (SELECT * FROM toks WHERE doc_id % 5 <> 0),
    test AS (
        SELECT doc_id, t, count(*) AS m
        FROM toks WHERE doc_id % 5 = 0 GROUP BY doc_id, t
    ),
    cnt AS (SELECT lang, t, count(*) AS c FROM train GROUP BY lang, t),
    tot AS (SELECT lang, sum(c) AS tot FROM cnt GROUP BY lang),
    voc AS (SELECT count(DISTINCT t) AS v FROM cnt),
    prior AS (
        SELECT lang, count(DISTINCT doc_id) AS nd FROM train GROUP BY lang
    ),
    ntr AS (SELECT sum(nd) AS ntr FROM prior),
    pmn AS (
        SELECT lang, CAST(round(ln(nd / ntr) * 1000000) AS BIGINT) AS pmn
        FROM prior CROSS JOIN ntr
    ),
    cand AS (
        SELECT test.doc_id, test.t, test.m, prior.lang
        FROM test CROSS JOIN prior
    ),
    ll AS (
        SELECT cand.doc_id, cand.lang,
               sum(cand.m * CAST(round(ln((coalesce(cnt.c, 0) + 1)
                   / (tot.tot + voc.v)) * 1000000) AS BIGINT)) AS ll
        FROM cand LEFT JOIN cnt ON cand.lang = cnt.lang AND cand.t = cnt.t
                  JOIN tot ON cand.lang = tot.lang
                  CROSS JOIN voc
        GROUP BY cand.doc_id, cand.lang
    ),
    ranked AS (
        SELECT ll.doc_id, ll.lang,
               CAST(ll.ll + pmn.pmn AS BIGINT) AS score_mn,
               row_number() OVER (PARTITION BY ll.doc_id
                   ORDER BY ll.ll + pmn.pmn DESC, ll.lang ASC) AS rn
        FROM ll JOIN pmn ON ll.lang = pmn.lang
    )
    SELECT r.doc_id, d.lang AS actual_lang, r.lang AS pred_lang,
           d.lang = r.lang AS correct, r.score_mn
    FROM ranked r JOIN documents d ON r.doc_id = d.doc_id
    WHERE r.rn = 1
    """


def q_stream_dedup_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once delivery collapsed to exactly-once — batch parity
    for ``streaming/windows.py dedup_stream`` (whose streaming half,
    ``dropDuplicatesWithinWatermark`` with bounded state, is
    soak-tested in tests/test_streaming.py).  Redelivery is synthesized
    in-plan (every event_id % 3 == 0 arrives twice), the dedup keys on
    event_id, and the output reports per-event-type delivered vs
    unique counts — so a broken dedup shows up as BOTH a row-value
    mismatch (n_unique) and a wrong sum.  Scale: dropDuplicates is one
    hash shuffle on the key; the streaming twin's state is bounded by
    the watermark horizon, not by history."""
    from vector_db_ingestor_spark.streaming.windows import dedup_stream

    ev = load_table(spark, sf_dir, "events")
    at_least_once = ev.unionAll(ev.filter(F.col("event_id") % 3 == 0))
    uniq = dedup_stream(at_least_once, keys=["event_id"])
    delivered = at_least_once.groupBy("event_type").agg(
        F.count("*").alias("n_delivered")
    )
    unique = uniq.groupBy("event_type").agg(
        F.count("*").alias("n_unique"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return delivered.join(unique, "event_type")


def _stream_dedup_oracle() -> str:
    """DuckDB mirror: delivered = rows + redelivered subset; unique and
    the value sum come from the event table itself (exactly-once)."""
    return """
    SELECT event_type,
           CAST(count(*) + sum(CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_delivered,
           CAST(count(*) AS BIGINT) AS n_unique,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY event_type
    """


def q_html_extract_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HTML front door (sources/html.py) hash-checked end-to-end —
    the q_warc_pipeline contract applied one layer up the stack: every
    fixture document is wrapped IN-PLAN as a full HTML page (title in a
    skipped <head>, a <script> subtree that must NOT leak, block-level
    h1/p/footer structure, an ``&copy;`` entity), the REAL stdlib
    extractor recovers title and prose in ONE Arrow mapInPandas stage,
    and the oracle rebuilds the expected extraction DIRECTLY from the
    raw document fields — so a tag-handling, entity, skip-subtree, or
    whitespace-normalization bug breaks the hash.  Relies on the
    fixture text contract (single-line, single-spaced, no markup
    chars — true of every sf tier, asserted in tests).  Scale: the
    parse rides one Arrow-batched Python stage exactly like production
    WARC ingest (pipeline.ingest_warc(html_to_text=True)); everything
    else is JVM-side expressions."""
    import pandas as pd  # noqa: PLC0415

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><script>var x = 1;</script></head><body><h1>"),
        F.col("source"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><footer>&copy; "),
        F.col("source"),
        F.lit("</footer></body></html>"),
    )
    src = docs.select("doc_id", html.alias("html"))

    def gen(batches):
        from vector_db_ingestor_spark.sources.html import (
            html_title,
            html_to_text,
        )

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "title": pdf["html"].map(html_title),
                    "text_ex": pdf["html"].map(html_to_text),
                }
            )

    ex = src.mapInPandas(gen, "doc_id long, title string, text_ex string")
    return ex.select(
        "doc_id",
        "title",
        F.length("text_ex").cast("bigint").alias("extract_chars"),
        F.sha2("text_ex", 256).alias("extract_sha"),
    )


def _html_extract_oracle() -> str:
    """DuckDB mirror: the extractor's output rebuilt by hand — title
    from the synthesized <title>, prose as the three block lines
    (h1 text, body text, unescaped footer) joined by blank lines,
    pinned by sha256."""
    return """
    SELECT doc_id,
           'Doc ' || CAST(doc_id AS VARCHAR) AS title,
           CAST(length(x) AS BIGINT) AS extract_chars,
           sha256(x) AS extract_sha
    FROM (
        SELECT doc_id,
               source || chr(10) || chr(10) || text || chr(10) || chr(10)
               || '© ' || source AS x
        FROM documents
    )
    """


_CMS_D, _CMS_W = 4, 1024  # sketch depth x width, shared with the oracle


def q_sketch_cms_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch heavy hitters — the mergeable-summary answer to
    "top tokens over 100 TB": the sketch is a FIXED d x w counter grid
    (4 x 1024 here), built with one partial-aggregated shuffle that
    moves at most d*w cells per partition regardless of corpus size,
    then queried by probing each candidate token's d cells and taking
    the min.  Every hash is the portable md5-affine family
    (operators/dedup.py:187 pattern), so the whole sketch — build,
    probe, estimate — is closed-form and hash-checked against a DuckDB
    mirror; output pairs each top-20 exact count with its sketch
    estimate so the one-sided error (est >= exact, property-tested) is
    visible in the result itself.  At 100 TB: the sketch table is
    ~4 KB whatever the corpus, merges across shards/days by cell-wise
    sum (the same mergeability contract as approx_count_distinct's
    HLL), and probing is a broadcast join — token text never shuffles
    for estimation.  The exact side here exists to certify the sketch;
    production uses the sketch alone where exact top-k is the thing
    being avoided."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t")
    )

    def pos(i: int, col: Column = None):
        c = col if col is not None else F.col("t")
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"{i}:"), c)), 1, 8), 16, 10
            ).cast("long")
            % _CMS_W
        )

    exact = toks.groupBy("t").agg(F.count("*").alias("exact_n"))
    # r15 optimization: a cell's count is the number of token
    # OCCURRENCES hashing there == sum of per-token exact counts over
    # the tokens hashing there, so the grid can aggregate the (already
    # needed) per-token counts instead of re-hashing every occurrence —
    # the d salted md5s run once per DISTINCT token, not once per
    # occurrence (guide §2.3 "aggregate before you shuffle"), and both
    # consumers now share one tokenize+groupBy(t) exchange
    # (ReusedExchange) instead of scanning the corpus twice.
    # sum(BIGINT) is BIGINT, so the output schema and values are
    # identical — hash-checked against the unchanged oracle.
    cells = (
        exact.select(
            "exact_n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("r"), pos(i).alias("c")
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("x"),
        )
        .select("x.r", "x.c", "exact_n")
        .groupBy("r", "c")
        .agg(F.sum("exact_n").alias("n"))
    )
    probes = exact.select(
        "t",
        "exact_n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("r"), pos(i).alias("c"))
                    for i in range(_CMS_D)
                ]
            )
        ).alias("x"),
    ).select("t", "exact_n", "x.r", "x.c")
    est = (
        probes.join(F.broadcast(cells), ["r", "c"])
        .groupBy("t", "exact_n")
        .agg(F.min("n").alias("cms_est"))
    )
    return (
        est.select(F.col("t").alias("token"), "exact_n", "cms_est")
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(20)
    )


def _sketch_cms_oracle() -> str:
    """DuckDB mirror: identical tokenization, identical salted-md5 cell
    positions, identical d x w grid, min-over-rows estimate."""
    d, w = _CMS_D, _CMS_W
    tok = "string_split_regex(lower(trim(text)), '\\s+')"
    h = ("CAST(CAST('0x' || substr(md5(CAST({r} AS VARCHAR) || ':' || {t}),"
         " 1, 8) AS BIGINT) % " + str(w) + " AS BIGINT)")
    return f"""
    WITH toks AS (SELECT unnest({tok}) AS t FROM documents),
    cells AS (
        SELECT rr.r AS r, {h.format(r='rr.r', t='t')} AS c, count(*) AS n
        FROM toks, range({d}) rr(r)
        GROUP BY 1, 2
    ),
    exact AS (SELECT t, count(*) AS exact_n FROM toks GROUP BY t),
    est AS (
        SELECT e.t, e.exact_n, min(cl.n) AS cms_est
        FROM exact e, range({d}) rr(r)
        JOIN cells cl
          ON cl.r = rr.r AND cl.c = {h.format(r='rr.r', t='e.t')}
        GROUP BY e.t, e.exact_n
    )
    SELECT t AS token, CAST(exact_n AS BIGINT) AS exact_n,
           CAST(cms_est AS BIGINT) AS cms_est
    FROM est
    ORDER BY exact_n DESC, token ASC
    LIMIT 20
    """


def q_ann_ivfpq_refine_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + exact refine — the last rung of the FAISS serving
    ladder (IndexRefineFlat): the ADC shortlist is deliberately
    over-fetched (k2=30) and re-ranked by EXACT cosine against the
    stored vectors, so PQ quantization error affects candidate RECALL
    but never the final ordering.  Composition of two hash-green
    primitives: the q_ann_ivfpq serving plan (shortlist) and the
    q_topk_cosine exact ranking, so the oracle is their literal SQL
    composition — hash-exact end to end.  Scale: the shortlist is k2
    ids (driver-model scale) broadcast back against the vector table —
    a point-lookup semi-join touching k2 rows, not a second corpus
    scan; at 100 TB bucket the vector table by vec_id
    (operators/joins.py bucketed_write) so the fetch is file-pruned.
    The exact re-rank costs k2 cosine evaluations total — the recall
    of nprobe x k2 over-fetch with the precision of exact search.
    The persisted-artifact twin — codes index + vec_id range layout,
    where BOTH scans prune — is ``ivfpq_topk_refined_indexed``
    (operators/similarity.py, round 12); this declared key is the
    hash-gated inline composition over the fixture table."""
    from vector_db_ingestor_spark.operators.similarity import ivfpq_topk

    cents, cbs, _, _ = _ivfpq_params()
    emb = load_table(spark, sf_dir, "embeddings")
    short = ivfpq_topk(emb, cents, cbs, PROBE_64, k=30, nprobe=4).select(
        "vec_id"
    )
    cand = emb.join(F.broadcast(short), "vec_id")
    return topk_cosine(cand, PROBE_64, k=10)


def _ivfpq_refine_oracle(k: int = 10, k2: int = 30, nprobe: int = 4) -> str:
    """DuckDB mirror: the q_ann_ivfpq oracle (k2-deep) feeding the
    q_topk_cosine exact scorer — the same two-primitive composition."""
    return f"""
    WITH short AS ({_ivfpq_oracle(k=k2, nprobe=nprobe)}),
    cand AS (
        SELECT e.vec_id, e.label, {_SCORE_SQL} AS score
        FROM embeddings e JOIN short s ON e.vec_id = s.vec_id
    )
    SELECT vec_id, label, score,
           CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC)
                AS INTEGER) AS rank
    FROM cand
    ORDER BY score DESC, vec_id ASC
    LIMIT {k}
    """




def q_join_interval_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join — the interval x interval temporal
    operator next to q_join_range (point-in-window) and q_join_asof
    (latest-at-or-before): for every "campaign" interval (a sparse
    event subset held open 30 minutes), count the "visit" intervals
    (every event, held open 1 minute) overlapping it, closed ends.
    The naive form is a nested-loop theta join; the plan here is
    operators/joins.py interval_overlap_count — both sides explode
    into the 30-minute buckets their interval touches (<= 2 each by
    construction), one hash equi-join on the bucket, and each
    overlapping pair is scored exactly once via the canonical
    overlap-start-bucket residual.  The oracle IS the quadratic theta
    join (DuckDB can afford it at sf scale), so the linear plan is
    hash-checked against the thing it replaces.  Left semantics:
    campaigns with zero overlapping visits keep their 0."""
    from vector_db_ingestor_spark.operators.joins import (
        interval_overlap_count,
    )

    ev = load_table(spark, sf_dir, "events")
    campaigns = ev.filter(F.col("event_id") % 97 == 0).select(
        "event_id",
        F.col("ts").alias("c_start"),
        (F.col("ts") + F.make_interval(mins=F.lit(30))).alias("c_end"),
    )
    visits = ev.select(
        F.col("ts").alias("v_start"),
        (F.col("ts") + F.make_interval(mins=F.lit(1))).alias("v_end"),
    )
    return interval_overlap_count(
        campaigns,
        visits,
        "c_start",
        "c_end",
        "v_start",
        "v_end",
        probe_keys=["event_id"],
        bucket_seconds=1800,
        count_alias="n_visits",
    )


def _join_interval_oracle() -> str:
    """DuckDB mirror: the literal quadratic theta join the bucketed
    plan replaces — same closed-end overlap predicate, same epoch-level
    timestamp arithmetic (events ts is TIMESTAMP_NS; truncate to
    seconds exactly like unix_timestamp does)."""
    return """
    WITH c AS (
        SELECT event_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS cs,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 1800 AS ce
        FROM events WHERE event_id % 97 = 0
    ),
    v AS (
        SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS vs,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) + 60 AS ve
        FROM events
    )
    SELECT c.event_id,
           CAST(count(CASE WHEN c.cs <= v.ve AND v.vs <= c.ce THEN 1 END)
                AS BIGINT) AS n_visits
    FROM c LEFT JOIN v ON c.cs <= v.ve AND v.vs <= c.ce
    GROUP BY c.event_id
    """




def q_graph_pagerank_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph centrality for crawl curation (the frontier-ranking
    signal behind Common Crawl-style URL prioritization): PageRank with
    damping 17/20 over a synthesized 3-out-regular citation graph
    (deterministic affine out-links u -> (a*u + b) % n), run for THREE
    unrolled iterations — iterative algorithms become bounded DAGs of
    join+agg rounds, one shuffle per iteration.

    The parity trick: floats never enter the iteration.  With every
    node at out-degree 3 and d = 17/20, the scaled rank
    R_i = pr_i * n * 60^i satisfies the INTEGER recurrence
    ``R_{i+1} = 9 * 60^i + 17 * sum(R_i over in-neighbors)`` (R_0 = 1),
    so all three rounds are exact BIGINT arithmetic — aggregation
    order cannot move a ulp — and the float rank appears only in the
    final projection as round(R_3 / (n * 60^3), 9).  At 100 TB: n and
    the affine constants are the only driver state; each iteration is
    an edges-ranks equi-join (pre-partition both by node id to reuse
    the partitioning across iterations) + one partial-agg shuffle;
    beyond a handful of iterations use a Pregel-style loop with
    checkpointing, which this bounded unroll deliberately is not."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()  # driver scalar (model-state scale), like k-means
    u = F.col("doc_id")
    # quadratic target maps: affine maps mod n are bijections (every
    # in-degree exactly 3 -> uniform ranks, nothing to test); squares
    # collapse, so in-degree varies while out-degree stays exactly 3
    # (which is what the integer recurrence needs)
    edges = docs.select(
        u.alias("src"),
        F.explode(
            F.array(
                (u * u + 1) % n, ((u + 3) * (u + 7)) % n, (u * 13 + 5) % n
            )
        ).alias("dst"),
    )
    ids = docs.select(F.col("doc_id").alias("v"))
    ranks = ids.select("v", F.lit(1).cast("long").alias("r"))
    for i in range(3):
        contrib = (
            edges.join(ranks.withColumnRenamed("v", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("r").alias("s"))
            .withColumnRenamed("dst", "v")
        )
        ranks = ids.join(contrib, "v", "left").select(
            "v",
            (
                F.lit(9 * 60**i).cast("long")
                + F.lit(17) * F.coalesce(F.col("s"), F.lit(0))
            ).alias("r"),
        )
    return ranks.select(
        F.col("v").alias("doc_id"),
        F.col("r").alias("pr_units"),
        F.round(F.col("r") / F.lit(float(n * 60**3)), 9).alias("pagerank"),
    )


def _graph_pagerank_oracle() -> str:
    """DuckDB mirror: same synthesized edges, same integer recurrence
    unrolled as three CTE rounds (n enters via a scalar cross join)."""
    return """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
        SELECT doc_id AS src, (doc_id * doc_id + 1) % nn.n AS dst
        FROM documents CROSS JOIN nn
        UNION ALL
        SELECT doc_id, ((doc_id + 3) * (doc_id + 7)) % nn.n
        FROM documents CROSS JOIN nn
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 5) % nn.n FROM documents CROSS JOIN nn
    ),
    r0 AS (SELECT doc_id AS v, CAST(1 AS BIGINT) AS r FROM documents),
    r1 AS (
        SELECT d.doc_id AS v,
               CAST(9 + 17 * coalesce(sum(r0.r), 0) AS BIGINT) AS r
        FROM documents d
        LEFT JOIN edges e ON e.dst = d.doc_id
        LEFT JOIN r0 ON r0.v = e.src
        GROUP BY d.doc_id
    ),
    r2 AS (
        SELECT d.doc_id AS v,
               CAST(9 * 60 + 17 * coalesce(sum(r1.r), 0) AS BIGINT) AS r
        FROM documents d
        LEFT JOIN edges e ON e.dst = d.doc_id
        LEFT JOIN r1 ON r1.v = e.src
        GROUP BY d.doc_id
    ),
    r3 AS (
        SELECT d.doc_id AS v,
               CAST(9 * 3600 + 17 * coalesce(sum(r2.r), 0) AS BIGINT) AS r
        FROM documents d
        LEFT JOIN edges e ON e.dst = d.doc_id
        LEFT JOIN r2 ON r2.v = e.src
        GROUP BY d.doc_id
    )
    SELECT r3.v AS doc_id, r3.r AS pr_units,
           round(r3.r / (nn.n * 216000.0), 9) AS pagerank
    FROM r3 CROSS JOIN nn
    """




_LC_M = 4096  # linear-counting bitmap width, shared with the oracle


def q_sketch_linear_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting distinct estimation — the hash-exact companion
    to q_agg_approx's rows-only HLL (the same evidence-ladder move
    q_ann_ivf_assign makes for k-means): per language, tokens hash
    into an m=4096-cell bitmap via the portable salted-md5 family, and
    the distinct count is estimated from bitmap occupancy,
    n-hat = m * ln(m / empty_cells).  Everything is closed-form — the
    occupancy is an exact integer both engines derive identically, and
    the single ln is integer-encoded as milli-units (the micro-nat
    rule at coarser precision) — so the sketch is value-hash-checked,
    not merely rows-checked.  Exact distincts ride along so the
    estimate's error is visible in the result.  At 100 TB: the bitmap
    is m bits per group whatever the corpus (the partial agg moves at
    most m cell-ids per partition), and bitmaps MERGE BY OR across
    shards/days — same contract as the HLL path, pinned there by
    tests/test_operators.py::test_hll_sketches_merge_exactly."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"),
    )
    pos = (
        F.conv(F.substring(F.md5(F.concat(F.lit("lc:"), F.col("t"))), 1, 8), 16, 10)
        .cast("long")
        % _LC_M
    )
    occ = toks.select("lang", pos.alias("p"), "t").groupBy("lang").agg(
        F.countDistinct("p").alias("occupied"),
        F.countDistinct("t").alias("exact_distinct"),
    )
    est = F.round(
        F.lit(float(_LC_M))
        * F.log(F.lit(float(_LC_M)) / (F.lit(_LC_M) - F.col("occupied")))
        * 1000.0,
        0,
    ).cast("long")
    return occ.select("lang", "occupied", "exact_distinct", est.alias("est_milli"))


def _sketch_linear_oracle() -> str:
    """DuckDB mirror: identical tokenization, identical salted-md5 cell
    positions, occupancy and the milli-encoded estimate re-derived."""
    m = _LC_M
    tok = "string_split_regex(lower(trim(text)), '\\s+')"
    return f"""
    WITH toks AS (SELECT lang, unnest({tok}) AS t FROM documents),
    occ AS (
        SELECT lang,
               count(DISTINCT CAST('0x' || substr(md5('lc:' || t), 1, 8)
                               AS BIGINT) % {m}) AS occupied,
               count(DISTINCT t) AS exact_distinct
        FROM toks GROUP BY lang
    )
    SELECT lang, CAST(occupied AS BIGINT) AS occupied,
           CAST(exact_distinct AS BIGINT) AS exact_distinct,
           CAST(round({m} * ln({m} / ({m} - occupied)) * 1000)
                AS BIGINT) AS est_milli
    FROM occ
    """


_BLOOM_M, _BLOOM_K = 2048, 3  # bloom width / hash count, shared with oracle


def q_sketch_bloom_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership — the sketch behind scalable incremental
    dedup pre-filters (test cheap against a bitmap of history, exact-
    verify only the hits): tokens of EVEN doc_ids build an m=2048,
    k=3 filter (salted-md5 positions — closed-form, so the whole
    filter is hash-checked cross-engine); every distinct token of ODD
    doc_ids probes it.  Output pairs the filter's verdict with ground
    truth, making the one-sided guarantee part of the checked result:
    false negatives are impossible (property-tested), false positives
    are the visible, measurable price.  At 100 TB: the built filter
    is m bits (broadcast scale) however large history grows; probing
    is a broadcast join of positions; filters merge by OR."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("t"),
    )

    def pos(i: int) -> Column:
        return (
            F.conv(
                F.substring(F.md5(F.concat(F.lit(f"bl{i}:"), F.col("t"))), 1, 8),
                16,
                10,
            ).cast("long")
            % _BLOOM_M
        )

    positions = F.array(*[pos(i) for i in range(_BLOOM_K)])
    hist_tokens = toks.filter(F.col("doc_id") % 2 == 0).select("t").distinct()
    bits = (
        hist_tokens.select(F.explode(positions).alias("b")).distinct()
    )
    probe = (
        toks.filter(F.col("doc_id") % 2 == 1)
        .select("t")
        .distinct()
        .select("t", F.explode(positions).alias("b"))
    )
    hits = (
        probe.join(F.broadcast(bits.withColumn("set", F.lit(1))), "b", "left")
        .groupBy("t")
        .agg((F.sum(F.coalesce(F.col("set"), F.lit(0))) == _BLOOM_K).alias("in_bloom"))
    )
    truth = hist_tokens.withColumn("truly_present", F.lit(True))
    return (
        hits.join(truth, "t", "left")
        .select(
            F.col("t").alias("token"),
            "in_bloom",
            F.coalesce("truly_present", F.lit(False)).alias("truly_present"),
        )
    )


def _sketch_bloom_oracle() -> str:
    """DuckDB mirror: same salted positions, same bitmap derived from
    even-doc tokens, same all-k membership test over odd-doc tokens."""
    m, k = _BLOOM_M, _BLOOM_K
    tok = "string_split_regex(lower(trim(text)), '\\s+')"
    pos = ("CAST('0x' || substr(md5('bl' || CAST(i.i AS VARCHAR) || ':' || {t}),"
           " 1, 8) AS BIGINT) % " + str(m))
    return f"""
    WITH toks AS (SELECT doc_id, unnest({tok}) AS t FROM documents),
    hist AS (SELECT DISTINCT t FROM toks WHERE doc_id % 2 = 0),
    bits AS (
        SELECT DISTINCT {pos.format(t='hist.t')} AS b
        FROM hist, range({k}) i(i)
    ),
    probe AS (SELECT DISTINCT t FROM toks WHERE doc_id % 2 = 1),
    probe_pos AS (
        SELECT probe.t, {pos.format(t='probe.t')} AS pb
        FROM probe, range({k}) i(i)
    ),
    hits AS (
        SELECT p.t, count(bits.b) = {k} AS in_bloom
        FROM probe_pos p LEFT JOIN bits ON bits.b = p.pb
        GROUP BY p.t
    )
    SELECT hits.t AS token, hits.in_bloom,
           hist.t IS NOT NULL AS truly_present
    FROM hits LEFT JOIN hist ON hits.t = hist.t
    """




def q_stream_totals_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch parity for the CUSTOM STATEFUL streaming operator
    (streaming/windows.py stateful_running_totals — per-user running
    count/value kept in applyInPandasWithState state across
    micro-batches; its streaming half and the batch==stream parity are
    exercised in tests/test_streaming.py).  The declared key runs the
    operator's batch mode — the same function, same output contract —
    so the custom-stateful family carries driver-checked evidence like
    every built-in window does.  Scale: streaming state is two scalars
    per user, hash-partitioned with the groupBy (horizontal); the
    batch mode is one partial-aggregated shuffle."""
    from vector_db_ingestor_spark.streaming.windows import (
        stateful_running_totals,
    )

    ev = load_table(spark, sf_dir, "events")
    return stateful_running_totals(ev)


def _stream_totals_oracle() -> str:
    return """
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS total_value
    FROM events GROUP BY user_id
    """




def q_topk_matryoshka_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Progressive (Matryoshka-style) retrieval: shortlist on a PREFIX
    of the embedding (first 16 of 64 dims — MRL-trained models pack
    coarse semantics into leading dims), exact-rerank the shortlist on
    the full vector.  The scan-side win is structural: the shortlist
    pass reads/multiplies 1/4 of every vector — with a column layout
    storing the prefix separately, 1/4 of the bytes — and the full-dim
    cosine runs only on the k2=50 survivors via a broadcast id
    semi-join (the q_ann_ivfpq_refine fetch shape).  Everything is
    closed-form slicing + arithmetic, so prefix scores, shortlist
    membership, tie-breaks, and the final exact ranking are all
    hash-checked cross-engine.  Honest caveat in-result: the fixture
    embeddings are NOT MRL-trained, so prefix recall here is whatever
    generic vectors give — the key certifies the MACHINERY; the
    recall-vs-prefix tradeoff on real models is a model property."""
    emb = load_table(spark, sf_dir, "embeddings")
    prefix = F.slice(F.col("embedding").cast("array<double>"), 1, 16)
    probe16 = lit_doubles(PROBE_64[:16])
    pre_score = F.round(
        F.aggregate(
            F.zip_with(prefix, probe16, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / (
            F.sqrt(
                F.aggregate(
                    F.transform(prefix, lambda x: x * x),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
            )
            * F.lit(
                float(sum(v * v for v in PROBE_64[:16]) ** 0.5)
            )
        ),
        6,
    )
    short = (
        emb.select("vec_id", pre_score.alias("pre_score"))
        .orderBy(F.col("pre_score").desc(), F.col("vec_id").asc())
        .limit(50)
    )
    cand = emb.join(F.broadcast(short), "vec_id")
    from vector_db_ingestor_spark.operators.topk import topk_cosine

    return topk_cosine(cand.drop("pre_score"), PROBE_64, k=10)


def _topk_matryoshka_oracle(k: int = 10, k2: int = 50) -> str:
    """DuckDB mirror: identical prefix slice, identical rounded prefix
    cosine + tie-break, identical exact re-rank of the shortlist."""
    p16 = probe_sql_literal(PROBE_64[:16])
    p16_norm = repr(float(sum(v * v for v in PROBE_64[:16]) ** 0.5))
    return f"""
    WITH pre AS (
        SELECT vec_id,
               round(list_dot_product((embedding::DOUBLE[])[1:16], {p16})
                     / (sqrt(list_dot_product((embedding::DOUBLE[])[1:16],
                                              (embedding::DOUBLE[])[1:16]))
                        * {p16_norm}), 6) AS pre_score
        FROM embeddings
    ),
    short AS (
        SELECT vec_id FROM pre
        ORDER BY pre_score DESC, vec_id ASC LIMIT {k2}
    ),
    cand AS (
        SELECT e.vec_id, e.label, {_SCORE_SQL} AS score
        FROM embeddings e JOIN short s ON e.vec_id = s.vec_id
    )
    SELECT vec_id, label, score,
           CAST(row_number() OVER (ORDER BY score DESC, vec_id ASC)
                AS INTEGER) AS rank
    FROM cand
    ORDER BY score DESC, vec_id ASC
    LIMIT {k}
    """


# =====================================================================
# round-16 queue (1/2): fixed-size per-stratum sampling — the
# distributed reservoir-sample analogue (hash-rank sampling), built
# round 12 for the r16 declaration window per the SURVEY §7 cadence.
# =====================================================================

def q_sample_reservoir_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling (k=10 per language) — the
    training-data subsampling contract q_sample_stratified's
    FRACTION thresholds can't give ("take exactly 10 examples per
    class for the eval set", "cap every domain at k docs").  The
    classic sequential reservoir algorithm is order-dependent and
    unshardable; the distributed form ranks each stratum by a
    portable salted hash and keeps the k smallest — same marginal
    uniformity, deterministic, append-stable for the SURVIVORS'
    ordering (a new doc displaces at most the largest kept hash).
    Plan: one narrow projection (md5 of the key) riding the scan, one
    hash shuffle on the stratum for the window rank, filter <= k —
    the order key is (hash, doc_id) so even a hash collision cannot
    make the kept set nondeterministic.  At 100 TB: per-stratum top-k
    via window is one shuffle; for few strata and tiny k prefer a
    partial-agg top-k-by-heap, but the window form is the general
    one."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(F.concat_ws("\x01", F.lit("resv1"), F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang", "source", h.alias("h"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 10)
        .select("lang", "doc_id", "source", "sample_rank")
    )


def _sample_reservoir_oracle() -> str:
    """DuckDB mirror: same salted md5, same window, same keep rule."""
    return """
    WITH ranked AS (
        SELECT lang, doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5('resv1' || chr(1) || CAST(doc_id AS VARCHAR)),
                            doc_id
               ) AS INTEGER) AS sample_rank
        FROM documents
    )
    SELECT lang, doc_id, source, sample_rank
    FROM ranked WHERE sample_rank <= 10
    """


# =====================================================================
# round-16 queue (2/2): duplicated-passage detection (built round 12)
# =====================================================================

def q_dedup_passage_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated-passage report — the substring-level
    dedup signal (the "Deduplicating Training Data Makes Language
    Models Better" recipe's reporting half): 5-word shingles over the
    whitespace token stream, aggregated corpus-wide; a passage
    appearing in >1 document is boilerplate/copy evidence the
    document-level dedup family (minhash/simhash/ngram) can't
    localize.  Top 20 by document reach, with occurrence counts and
    the smallest carrying doc_id as the example.  Plan: one narrow
    shingle explode (|words| rows per doc, bounded) -> TWO-LEVEL hash
    agg -> TakeOrderedAndProject; linear at any corpus size, no pair
    enumeration anywhere.  Two-level deliberately: countDistinct
    mixed with plain aggs compiles to an Expand that ships every
    passage string TWICE through the shuffle; aggregating
    (passage, doc_id) first ships each pair once, collapses
    within-doc repeats before the wide shuffle, and derives n_docs as
    a plain count — output-identical (the oracle is unchanged), and
    the shuffle carries half the string bytes at any corpus size
    (fixture-scale wall is equal within this box's noise; the win is
    the byte volume, which the fixture is too small to expose)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != ""
    )
    # the >= 5 filter first: Spark's sequence(1, n) DESCENDS for n < 1
    # (sequence(1, 0) == [1, 0]), so short docs must never reach it
    sh = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 5)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 4),
                    lambda i: F.array_join(
                        F.slice(F.col("ws"), i, F.lit(5)), " "
                    ),
                )
            ).alias("passage"),
        )
    )
    per_doc = sh.groupBy("passage", "doc_id").agg(F.count("*").alias("c"))
    return (
        per_doc.groupBy("passage")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("c").alias("n_occurrences"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy(
            F.col("n_docs").desc(),
            F.col("n_occurrences").desc(),
            F.col("passage").asc(),
        )
        .limit(20)
    )


def _dedup_passage_oracle() -> str:
    """DuckDB mirror: same tokenization (string_split_regex on
    lower(trim)), same 5-word windows via unnest(range), same
    aggregation and keep/order rules."""
    return """
    WITH w AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents
    ),
    pos AS (
        SELECT doc_id, ws,
               unnest(range(1, greatest(len(ws) - 3, 1))) AS i
        FROM w
    ),
    sh AS (
        SELECT doc_id, array_to_string(ws[i : i + 4], ' ') AS passage
        FROM pos
    )
    SELECT passage,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           min(doc_id) AS example_doc_id
    FROM sh
    GROUP BY passage
    HAVING count(DISTINCT doc_id) > 1
    ORDER BY n_docs DESC, n_occurrences DESC, passage ASC
    LIMIT 20
    """


# =====================================================================
# round-17 queue (1/2): HITS hubs/authorities (built round 12) — the
# second link-analysis rung next to q_graph_pagerank, same synthesized
# deterministic graph, same floats-never-enter-the-iteration rule.
# =====================================================================

def q_graph_hits_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the q_graph_pagerank citation
    graph (same deterministic 3-out-regular edges: u -> u^2+1,
    (u+3)(u+7), 13u+5 mod n) — the complementary centrality signal for
    crawl curation (PageRank ranks endorsement mass; HITS separates
    directories/link-hubs from endorsed content).  TWO unrolled
    mutual-recursion rounds: a_{i+1}(v) = sum of h_i over in-neighbors,
    h_{i+1}(u) = sum of a_{i+1} over out-neighbors, h_0 = 1 — all pure
    BIGINT sums (HITS normalization deferred to the final projection,
    where both scores divide by their deterministic global max,
    round 9), so aggregation order cannot move a ulp.  Each half-round
    is one edges-scores equi-join + one partial-agg shuffle; at scale
    pre-partition edges by both endpoints once and reuse across
    rounds.  Top 20 by authority, doc_id tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()  # driver scalar (model-state scale), like pagerank
    u = F.col("doc_id")
    edges = docs.select(
        u.alias("src"),
        F.explode(
            F.array(
                (u * u + 1) % n, ((u + 3) * (u + 7)) % n, (u * 13 + 5) % n
            )
        ).alias("dst"),
    )
    ids = docs.select(F.col("doc_id").alias("v"))
    h = ids.select("v", F.lit(1).cast("long").alias("s"))
    for _ in range(2):
        a = (
            edges.join(h.withColumnRenamed("v", "src"), "src")
            .groupBy("dst")
            .agg(F.sum("s").alias("s"))
            .withColumnRenamed("dst", "v")
        )
        a = ids.join(a, "v", "left").select(
            "v", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
        )
        h = (
            edges.join(a.withColumnRenamed("v", "dst"), "dst")
            .groupBy("src")
            .agg(F.sum("s").alias("s"))
            .withColumnRenamed("src", "v")
        )
        h = ids.join(h, "v", "left").select(
            "v", F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s")
        )
    scores = a.withColumnRenamed("s", "auth_units").join(
        h.withColumnRenamed("s", "hub_units"), "v"
    )
    mx = scores.agg(
        F.max("auth_units").alias("ma"), F.max("hub_units").alias("mh")
    )
    return (
        scores.crossJoin(F.broadcast(mx))
        .select(
            F.col("v").alias("doc_id"),
            "auth_units",
            "hub_units",
            F.round(F.col("auth_units") / F.col("ma"), 9).alias("authority"),
            F.round(F.col("hub_units") / F.col("mh"), 9).alias("hub"),
        )
        .orderBy(F.col("auth_units").desc(), F.col("doc_id").asc())
        .limit(20)
    )


def _graph_hits_oracle() -> str:
    """DuckDB mirror: same edges, the two mutual-recursion rounds as a
    CTE chain of integer join+aggs, same max-normalized projection."""
    return """
    WITH nn AS (SELECT count(*) AS n FROM documents),
    edges AS (
        SELECT doc_id AS src, (doc_id * doc_id + 1) % nn.n AS dst
        FROM documents CROSS JOIN nn
        UNION ALL
        SELECT doc_id, ((doc_id + 3) * (doc_id + 7)) % nn.n
        FROM documents CROSS JOIN nn
        UNION ALL
        SELECT doc_id, (doc_id * 13 + 5) % nn.n FROM documents CROSS JOIN nn
    ),
    h0 AS (SELECT doc_id AS v, CAST(1 AS BIGINT) AS s FROM documents),
    a1 AS (
        SELECT d.doc_id AS v,
               CAST(coalesce(sum(h0.s), 0) AS BIGINT) AS s
        FROM documents d
        LEFT JOIN edges e ON e.dst = d.doc_id
        LEFT JOIN h0 ON h0.v = e.src
        GROUP BY d.doc_id
    ),
    h1 AS (
        SELECT d.doc_id AS v,
               CAST(coalesce(sum(a1.s), 0) AS BIGINT) AS s
        FROM documents d
        LEFT JOIN edges e ON e.src = d.doc_id
        LEFT JOIN a1 ON a1.v = e.dst
        GROUP BY d.doc_id
    ),
    a2 AS (
        SELECT d.doc_id AS v,
               CAST(coalesce(sum(h1.s), 0) AS BIGINT) AS s
        FROM documents d
        LEFT JOIN edges e ON e.dst = d.doc_id
        LEFT JOIN h1 ON h1.v = e.src
        GROUP BY d.doc_id
    ),
    h2 AS (
        SELECT d.doc_id AS v,
               CAST(coalesce(sum(a2.s), 0) AS BIGINT) AS s
        FROM documents d
        LEFT JOIN edges e ON e.src = d.doc_id
        LEFT JOIN a2 ON a2.v = e.dst
        GROUP BY d.doc_id
    ),
    mx AS (SELECT (SELECT max(s) FROM a2) AS ma,
                  (SELECT max(s) FROM h2) AS mh)
    SELECT a2.v AS doc_id,
           a2.s AS auth_units,
           h2.s AS hub_units,
           round(a2.s / CAST(mx.ma AS DOUBLE), 9) AS authority,
           round(h2.s / CAST(mx.mh AS DOUBLE), 9) AS hub
    FROM a2 JOIN h2 ON a2.v = h2.v CROSS JOIN mx
    ORDER BY auth_units DESC, doc_id ASC
    LIMIT 20
    """


# =====================================================================
# round-17 queue (2/2): KMV distinct sketch (built round 12) — the
# third distinct-estimation rung (exact -> linear-counting -> KMV),
# and the first with in-plan MERGEABILITY evidence.
# =====================================================================

_KMV_K = 64  # sketch size, shared with the oracle


def q_sketch_kmv_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch per language, k=64, over the
    corpus's distinct word BIGRAMS (the canonical distinct-ngram
    diversity metric; the fixture's unigram vocabulary is 31 words, so
    unigrams would never leave the small-set branch) — the mergeable
    distinct estimator (theta-sketch core): keep the k smallest
    salted-md5 values of the distinct element set; the kth minimum
    estimates density, n-hat = (k-1) * 2^48 / kth (48-bit hash space).
    Everything is closed-form: the kth hash is an exact integer both
    engines derive identically, and the estimate is floor-scaled to
    milli-units through one IEEE double division.  The '__union__' row
    is the MERGE evidence: k smallest over the union of per-language
    sketches == k smallest over the union of the sets, so the union
    estimate comes from the same rule with no second corpus pass — the
    property that lets a 100 TB corpus sketch per partition and merge
    driver-side (k longs per partition).  Small-set exactness rides
    along: a stratum with < k distinct elements reports its exact
    count.  Plan: one distinct shuffle, one per-stratum window, one
    agg; the union leg reuses the distinct element set.  The
    zero-shuffle production topology this docstring describes is a
    first-class operator (operators/sketches.py: bounded-state
    per-partition candidates + associative merge), pinned
    bit-identical to this window form in tests/test_sketches.py."""
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(
        F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != ""
    )
    toks = (
        docs.select("lang", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "lang",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(F.col("ws"), i),
                        F.element_at(F.col("ws"), i + 1),
                    ),
                )
            ).alias("t"),
        )
    )

    def kmv(grouped: DataFrame, label_col) -> DataFrame:
        dt = grouped.select(label_col.alias("lang"), "t").distinct()
        h = (
            F.conv(F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("t"))), 1, 12), 16, 10)
            .cast("long")
        )
        w = Window.partitionBy("lang").orderBy(F.col("h").asc(), F.col("t").asc())
        ranked = dt.select("lang", "t", h.alias("h")).withColumn(
            "rk", F.row_number().over(w)
        )
        exact = dt.groupBy("lang").agg(
            F.count("*").alias("exact_distinct")
        )
        sk = (
            ranked.filter(F.col("rk") <= _KMV_K)
            .groupBy("lang")
            .agg(F.count("*").alias("k_used"), F.max("h").alias("kth_hash"))
        )
        est = F.when(
            F.col("k_used") < _KMV_K, F.col("exact_distinct") * F.lit(1000)
        ).otherwise(
            F.floor(
                F.lit(1000.0)
                * (F.col("k_used") - 1)
                * F.lit(float(2**48))
                / F.col("kth_hash")
            )
        ).cast("long")
        return sk.join(exact, "lang").select(
            "lang", "k_used", "kth_hash", "exact_distinct",
            est.alias("est_milli"),
        )

    per_lang = kmv(toks, F.col("lang"))
    union = kmv(toks, F.lit("__union__"))
    return per_lang.unionByName(union).orderBy("lang")


def _sketch_kmv_oracle() -> str:
    """DuckDB mirror: identical bigram elements, identical salted
    48-bit hash, identical window keep rule, identical floor-milli
    estimate, identical union leg."""
    k = _KMV_K
    leg = """
    dt_{tag} AS (
        SELECT DISTINCT {lang} AS lang, t FROM toks
    ),
    ranked_{tag} AS (
        SELECT lang, t,
               CAST('0x' || substr(md5('kmv:' || t), 1, 12) AS BIGINT) AS h,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST('0x' || substr(md5('kmv:' || t), 1, 12)
                                AS BIGINT) ASC, t ASC
               ) AS rk
        FROM dt_{tag}
    ),
    exact_{tag} AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS exact_distinct
        FROM dt_{tag} GROUP BY lang
    ),
    sk_{tag} AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS k_used,
               max(h) AS kth_hash
        FROM ranked_{tag} WHERE rk <= {k} GROUP BY lang
    ),
    out_{tag} AS (
        SELECT s.lang, s.k_used, s.kth_hash, e.exact_distinct,
               CAST(CASE WHEN s.k_used < {k} THEN e.exact_distinct * 1000
                    ELSE floor(1000.0 * (s.k_used - 1) * 281474976710656.0
                               / s.kth_hash)
                    END AS BIGINT) AS est_milli
        FROM sk_{tag} s JOIN exact_{tag} e USING (lang)
    )"""
    return f"""
    WITH w AS (
        SELECT lang,
               list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                           t -> t <> '') AS ws
        FROM documents
    ),
    pos AS (
        SELECT lang, ws, unnest(range(1, greatest(len(ws), 1))) AS i
        FROM w
    ),
    toks AS (SELECT lang, ws[i] || ' ' || ws[i + 1] AS t FROM pos),
    {leg.format(tag="l", lang="lang", k=k)},
    {leg.format(tag="u", lang="'__union__'", k=k)}
    SELECT * FROM out_l
    UNION ALL
    SELECT * FROM out_u
    ORDER BY lang
    """


# =====================================================================
# round-18 queue (1/2): A/B experiment statistics (built round 12)
# =====================================================================

def q_stats_ab_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type A/B test readout — the experimentation primitive
    an analytics engine owes its users (assignment by user_id parity,
    Welch's t on `value`).  Cross-engine float discipline (the
    q_text_entropy integer rule, applied to second moments): each
    value is fixed to EXACT milli-units BEFORE any aggregation, so the
    per-arm sums and sums-of-squares are exact BIGINTs no aggregation
    order can move; mean/variance/t then evaluate in ONE closed-form
    IEEE-double expression over those exact integers — identical in
    both engines — and round at the end.  Plan: one narrow projection
    riding the scan (arm, milli-units) -> one map-side-combined hash
    agg on (event_type, arm) -> a 2-row-per-type pivot join.  Linear,
    one shuffle of |types|x2 partials."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.filter(F.col("value").isNotNull()).select(
        "event_type",
        (F.col("user_id") % 2 == 0).alias("is_a"),
        F.round(F.col("value") * 1000).cast("long").alias("v"),
    )
    agg = base.groupBy("event_type", "is_a").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("q"),
    )
    a = agg.filter("is_a").select(
        "event_type",
        F.col("n").alias("n_a"), F.col("s").alias("s_a"), F.col("q").alias("q_a"),
    )
    b = agg.filter(~F.col("is_a")).select(
        "event_type",
        F.col("n").alias("n_b"), F.col("s").alias("s_b"), F.col("q").alias("q_b"),
    )
    j = a.join(b, "event_type")
    mean_a = F.col("s_a") / F.col("n_a")
    mean_b = F.col("s_b") / F.col("n_b")
    var_a = (F.col("q_a") - F.col("s_a") * mean_a) / (F.col("n_a") - 1)
    var_b = (F.col("q_b") - F.col("s_b") * mean_b) / (F.col("n_b") - 1)
    t = (mean_a - mean_b) / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b"))
    return j.select(
        "event_type", "n_a", "n_b",
        F.round(mean_a, 6).alias("mean_a_milli"),
        F.round(mean_b, 6).alias("mean_b_milli"),
        F.round(t, 4).alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant"),
    ).orderBy("event_type")


def _stats_ab_oracle() -> str:
    """DuckDB mirror: same milli-unit fixing, same exact integer
    moments, same closed-form double expression, same rounding."""
    return """
    WITH base AS (
        SELECT event_type, (user_id % 2 = 0) AS is_a,
               CAST(round(value * 1000) AS BIGINT) AS v
        FROM events WHERE value IS NOT NULL
    ),
    agg AS (
        SELECT event_type, is_a,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s,
               CAST(sum(v * v) AS BIGINT) AS q
        FROM base GROUP BY event_type, is_a
    ),
    j AS (
        SELECT a.event_type,
               a.n AS n_a, a.s AS s_a, a.q AS q_a,
               b.n AS n_b, b.s AS s_b, b.q AS q_b
        FROM (SELECT * FROM agg WHERE is_a) a
        JOIN (SELECT * FROM agg WHERE NOT is_a) b USING (event_type)
    )
    SELECT event_type, n_a, n_b,
           round(s_a / CAST(n_a AS DOUBLE), 6) AS mean_a_milli,
           round(s_b / CAST(n_b AS DOUBLE), 6) AS mean_b_milli,
           round((s_a / CAST(n_a AS DOUBLE) - s_b / CAST(n_b AS DOUBLE))
                 / sqrt((q_a - s_a * (s_a / CAST(n_a AS DOUBLE))) / (n_a - 1) / n_a
                        + (q_b - s_b * (s_b / CAST(n_b AS DOUBLE))) / (n_b - 1) / n_b),
                 4) AS t_stat,
           abs((s_a / CAST(n_a AS DOUBLE) - s_b / CAST(n_b AS DOUBLE))
               / sqrt((q_a - s_a * (s_a / CAST(n_a AS DOUBLE))) / (n_a - 1) / n_a
                      + (q_b - s_b * (s_b / CAST(n_b AS DOUBLE))) / (n_b - 1) / n_b))
               > 1.96 AS significant
    FROM j
    ORDER BY event_type
    """


# =====================================================================
# round-18 queue (2/2): grid-bucketed spatial radius join (built
# round 12) — the 2-D member of the bucketed-theta-join family
# (q_join_range: 1-D point-in-window; q_join_interval: 1-D interval
# x interval; this: 2-D point x radius).
# =====================================================================

_SPATIAL_PROBES = [  # (probe_id, px, py, radius)
    (1, 50.0, 20.0, 20.0),
    (2, 120.0, 50.0, 25.0),
    (3, 300.0, 80.0, 15.0),
    (4, 455.0, 10.0, 25.0),
    (5, 10.0, 95.0, 10.0),
]
_SPATIAL_W = 25.0  # grid cell width >= max radius, shared with oracle


def q_join_spatial_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius-neighborhood count: for each probe point, how many event
    points fall within its radius — the geo/embedding-2D shape whose
    naive form is a cross join with a distance predicate
    (BroadcastNestedLoopJoin, quadratic, forbidden by plans/guard).
    Points derive deterministically from events (x = value,
    y = (event_id % 997) / 10); each point lands in ONE grid cell of
    width w >= max radius, each probe explodes to its 3x3 cell
    neighborhood (a superset of any disc with r <= w), the join is a
    plain hash equi-join on the cell, and the exact disc predicate is
    the residual.  Left semantics: probes with zero neighbors keep a
    0-count row (conditional count over the cell-cover join).  At
    100 TB: points shuffle once by cell (or pre-bucket the table by
    cell — operators/joins.py bucketed_write — for a shuffle-free
    probe side); the probe set is broadcast scale.  Implementation is
    the first-class operator (operators/joins.py
    radius_neighbor_count, property-tested against the brute-force
    cross join under hypothesis); this key pins it to the oracle."""
    from vector_db_ingestor_spark.operators.joins import (
        radius_neighbor_count,
    )

    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        F.col("value").alias("x"),
        ((F.col("event_id") % 997).cast("double") / 10.0).alias("y"),
    )
    probes = spark.createDataFrame(
        _SPATIAL_PROBES, "probe_id INT, px DOUBLE, py DOUBLE, r DOUBLE"
    )
    counted = radius_neighbor_count(
        pts, probes, cell_width=_SPATIAL_W, probe_keys=["probe_id"]
    )
    return (
        probes.join(counted, "probe_id")
        .select("probe_id", "px", "py", "r", "n_neighbors")
        .orderBy("probe_id")
    )


def _join_spatial_oracle() -> str:
    """DuckDB mirror: the literal quadratic theta join the plan
    replaces (probe x points cross join + disc predicate) — same
    derived coordinates, same closed-ends comparison."""
    probes = ", ".join(
        f"({pid}, {px}, {py}, {r})" for pid, px, py, r in _SPATIAL_PROBES
    )
    return f"""
    WITH probes(probe_id, px, py, r) AS (VALUES {probes}),
    pts AS (
        SELECT value AS x, CAST(event_id % 997 AS DOUBLE) / 10.0 AS y
        FROM events
    )
    SELECT CAST(p.probe_id AS INTEGER) AS probe_id,
           CAST(p.px AS DOUBLE) AS px,
           CAST(p.py AS DOUBLE) AS py,
           CAST(p.r AS DOUBLE) AS r,
           CAST(count(*) FILTER (
               (pts.x - p.px) * (pts.x - p.px)
               + (pts.y - p.py) * (pts.y - p.py) <= p.r * p.r
           ) AS BIGINT) AS n_neighbors
    FROM probes p CROSS JOIN pts
    GROUP BY p.probe_id, p.px, p.py, p.r
    ORDER BY probe_id
    """


# =====================================================================
# round-19 queue (1/2): PQ reconstruction-quality report (built round
# 12) — the index-QUALITY signal next to q_ivf_drift_report's
# occupancy signal: drift says rebuild when cells fill unevenly, this
# says rebuild when the codebooks stop fitting the data.
# =====================================================================

def q_vec_pq_quality_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell PQ reconstruction error of the IVF-PQ index model
    (FAISS's imbalance/quantization-error diagnostics): assign each
    vector to its coarse cell, encode the residual with the literal
    codebooks, reconstruct, and report per-cid row count plus the
    EXACT sum of squared reconstruction errors in micro-units — a
    frozen-model index absorbing appends retrains when a cell's MSE
    drifts up (new data the codebooks never saw), the quality
    companion to q_ivf_drift_report's occupancy skew.  Float
    discipline: the squared error is one dot(d, d) per row (the
    proven cosine-parity idiom), fixed to micro-unit BIGINT per row
    BEFORE aggregation, so cell sums are exact whatever the
    aggregation order; MSE appears only in the final projection.
    Plan: assignment + encode + reconstruct are narrow expressions
    riding the scan (zero Python), one map-side-combined hash agg on
    cid.  At deployment this reads the codes table + raw vectors once;
    per-cell partials merge, so it also runs incrementally per
    append batch."""
    from vector_db_ingestor_spark.functions.vector import dot
    from vector_db_ingestor_spark.operators.similarity import (
        _assign_cid,
        pq_code,
    )

    cents, cbs, m, _ = _ivfpq_params()
    dsub = EMBEDDING_DIM // m
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    cents_lit = lit_double_matrix(cents)
    assigned = emb.select(
        vec.alias("v"), _assign_cid(vec, cents, round_dp=6).alias("cid")
    )
    resid = F.zip_with(
        F.col("v"),
        F.element_at(cents_lit, F.col("cid") + 1),
        lambda a, b: a - b,
    )
    # materialize the residual once, then code from the column (r15:
    # inlining the zip_with into every pq_code re-evaluated it per
    # subspace — same doubles, one evaluation)
    coded = assigned.withColumn("r", resid).select(
        "cid",
        "r",
        *[
            pq_code(F.col("r"), cbs[s], s * dsub, round_dp=6).alias(f"c{s}")
            for s in range(m)
        ],
    )
    recon = F.concat(
        *[
            F.element_at(
                lit_double_matrix(cbs[s]),
                F.col(f"c{s}") + 1,
            )
            for s in range(m)
        ]
    )
    d = F.zip_with(F.col("r"), recon, lambda a, b: a - b)
    err_u = F.round(dot(d, d) * 1000000.0).cast("long")
    return (
        coded.select("cid", err_u.alias("e"))
        .groupBy("cid")
        .agg(F.count("*").alias("n"), F.sum("e").alias("err_sum_micro"))
        .select(
            "cid", "n", "err_sum_micro",
            F.round(F.col("err_sum_micro") / F.col("n") / 1000000.0, 6).alias(
                "mse"
            ),
        )
        .orderBy("cid")
    )


def _vec_pq_quality_oracle() -> str:
    """DuckDB mirror: the q_ann_ivfpq assignment/residual/codes CTEs
    over ALL cells (no prune), reconstruction by literal-codebook
    indexing, same dot(d,d) error, same micro fixing, same rollup."""
    cents, cbs, m, _ = _ivfpq_params()
    dsub = EMBEDDING_DIM // m

    def lst(v: list[float]) -> str:
        return "[" + ", ".join(repr(x) for x in v) + "]::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = lst(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    cent_rows = ", ".join(f"({i}, {lst(c)})" for i, c in enumerate(cents))
    sims = ", ".join(cos_sql(c) for c in cents)
    sub_cols = ", ".join(
        f"list_slice(r, {s * dsub + 1}, {(s + 1) * dsub}) AS s{s}"
        for s in range(m)
    )
    dist_cols = []
    for s in range(m):
        ds = ", ".join(
            f"round(-2.0 * list_dot_product(s{s}, {lst(c)})"
            f" + {sum(x * x for x in c)!r}, 6)"
            for c in cbs[s]
        )
        dist_cols.append(f"[{ds}] AS d{s}")
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_min(d{s})) - 1 AS INTEGER) AS c{s}"
        for s in range(m)
    )
    cb_lits = [
        "[" + ", ".join(lst(c) for c in cbs[s]) + "]" for s in range(m)
    ]
    recon = " || ".join(f"{cb_lits[s]}[c{s} + 1]" for s in range(m))
    return f"""
    WITH cents(cid, cvec) AS (VALUES {cent_rows}),
    assigned AS (
        SELECT v, CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT embedding::DOUBLE[] AS v, [{sims}] AS sims
              FROM embeddings)
    ),
    res AS (
        SELECT a.cid,
               list_transform(range(1, {EMBEDDING_DIM} + 1),
                              i -> a.v[i] - c.cvec[i]) AS r
        FROM assigned a JOIN cents c ON a.cid = c.cid
    ),
    sub AS (SELECT cid, r, {sub_cols} FROM res),
    dists AS (SELECT cid, r, {", ".join(dist_cols)} FROM sub),
    codes AS (SELECT cid, r, {code_cols} FROM dists),
    errs AS (
        SELECT cid,
               CAST(round(1000000.0 * list_dot_product(d, d)) AS BIGINT) AS e
        FROM (
            SELECT cid,
                   list_transform(range(1, {EMBEDDING_DIM} + 1),
                                  i -> r[i] - ({recon})[i]) AS d
            FROM codes
        )
    )
    SELECT cid, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(e) AS BIGINT) AS err_sum_micro,
           round(sum(e) / CAST(count(*) AS DOUBLE) / 1000000.0, 6) AS mse
    FROM errs
    GROUP BY cid
    ORDER BY cid
    """


# =====================================================================
# round-19 queue (2/2): corpus token-budget accounting (built round
# 12) — the report q_mixture_weights' target weights get compared
# against: what each (source, lang) stratum ACTUALLY contributes.
# =====================================================================

def q_tokens_per_source_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget accounting per (source, language): exact token
    counts, corpus share, and cumulative share in contribution order —
    the table every mixture decision (upsample wiki, cap crawl,
    dedup-budget per domain) starts from, and the acceptance check
    after q_mixture_weights' targets are applied.  Plan: one narrow
    token-count projection riding the scan (size of the split array —
    no explode; counting needs no token rows), one map-side-combined
    hash agg on (source, lang), then share/cumulative windows over the
    AGGREGATED table — strata-scale, so the unpartitioned cumulative
    window is bounded (the q_docs_filter_report global-window rule).
    Exactness: token counts are integers; shares are one double
    division rounded at the end; the cumulative sum is an exact BIGINT
    running total divided once."""
    docs = load_table(spark, sf_dir, "documents")
    ntok = F.size(
        F.filter(
            F.split(F.lower(F.trim("text")), r"\s+"), lambda t: t != ""
        )
    ).cast("long")
    agg = (
        docs.select("source", "lang", ntok.alias("ntok"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
        )
    )
    tot = agg.agg(F.sum("n_tokens").alias("tot"))
    w = Window.orderBy(
        F.col("n_tokens").desc(), F.col("source").asc(), F.col("lang").asc()
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .select(
            "rank", "source", "lang", "n_docs", "n_tokens",
            F.round(F.col("n_tokens") / F.col("tot"), 6).alias("share"),
            F.round(F.col("cum_tokens") / F.col("tot"), 6).alias("cum_share"),
        )
        .orderBy("rank")
    )


def _tokens_per_source_oracle() -> str:
    """DuckDB mirror: same tokenization (len of the filtered split),
    same aggregation, same exact running total, same rounding."""
    tok = (
        "len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),"
        " t -> t <> ''))"
    )
    return f"""
    WITH agg AS (
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum({tok}) AS BIGINT) AS n_tokens
        FROM documents GROUP BY source, lang
    ),
    tot AS (SELECT CAST(sum(n_tokens) AS DOUBLE) AS tot FROM agg),
    ranked AS (
        SELECT *,
               CAST(row_number() OVER w AS INTEGER) AS rank,
               CAST(sum(n_tokens) OVER w AS BIGINT) AS cum_tokens
        FROM agg
        WINDOW w AS (ORDER BY n_tokens DESC, source ASC, lang ASC)
    )
    SELECT rank, source, lang, n_docs, n_tokens,
           round(n_tokens / tot.tot, 6) AS share,
           round(cum_tokens / tot.tot, 6) AS cum_share
    FROM ranked CROSS JOIN tot
    ORDER BY rank
    """


# =====================================================================
# round-20 queue (1/2): BPE merge training (built round 12) — the
# tokenizer-training core an LLM-data engine owes its users, as a
# bounded DAG of string ops + aggregations (no Python, no array folds).
# =====================================================================

_BPE_SEP = "\x02"  # token separator; words containing it are dropped


def q_bpe_train_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge training, THREE unrolled iterations —
    the algorithm behind GPT/Llama tokenizers, run on word TYPES
    weighted by corpus frequency (the standard trick: iteration cost
    is vocabulary-scale, not corpus-scale; the corpus is touched once
    for the word-frequency aggregation).  The parity trick: a
    tokenized word is a STRING with a separator between tokens, so
    applying merge (a, b) is ``replace(t, a<sep>b, a.b)`` — both
    engines' replace() substitutes left-to-right non-overlapping,
    which IS BPE's greedy merge semantics (``a a a`` under merge (a,a)
    becomes ``aa a``, not ``a aa``) — and pair counting is one split +
    adjacent-pairs explode + weighted hash agg.  Each iteration's
    winning merge is an in-plan deterministic argmax (count desc, pair
    asc, LIMIT 1) cross-joined back — driver never sees it.  Output:
    the three merge rows, the exact artifact a tokenizer build ships.
    At 100 TB: one corpus shuffle (word freq), then vocab-scale
    work; more iterations = longer DAG or a checkpointed loop."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .filter((F.col("w") != "") & ~F.col("w").contains(_BPE_SEP))
    )
    wf = words.groupBy("w").agg(F.count("*").cast("long").alias("f"))
    # chars -> "c1<sep>c2<sep>..." (regexp_replace inserts a trailing
    # separator; cut it)
    tok = wf.select(
        F.regexp_replace(F.col("w"), "(.)", "$1" + _BPE_SEP).alias("t0"), "f"
    ).select(
        F.expr("substring(t0, 1, length(t0) - 1)").alias("t"), "f"
    )
    merges = []
    for it in range(1, 4):
        parts = F.split(F.col("t"), _BPE_SEP)
        pairs = (
            tok.filter(F.size(parts) >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(parts) - 1),
                        lambda i: F.struct(
                            F.element_at(parts, i).alias("l"),
                            F.element_at(parts, i + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "f",
            )
            .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "f")
            .groupBy("l", "r")
            .agg(F.sum("f").alias("pair_count"))
        )
        m = pairs.orderBy(
            F.col("pair_count").desc(), F.col("l").asc(), F.col("r").asc()
        ).limit(1)
        merges.append(
            m.select(
                F.lit(it).alias("iteration"), "l", "r", "pair_count"
            )
        )
        mm = m.select(
            F.col("l").alias("__ml"), F.col("r").alias("__mr")
        )
        tok = tok.crossJoin(F.broadcast(mm)).select(
            F.replace(
                F.col("t"),
                F.concat(F.col("__ml"), F.lit(_BPE_SEP), F.col("__mr")),
                F.concat(F.col("__ml"), F.col("__mr")),
            ).alias("t"),
            "f",
        )
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("iteration")


def _bpe_train_oracle() -> str:
    """DuckDB mirror: same word-type weighting, same separator-string
    representation, same replace() greedy merge, same argmax rule —
    three unrolled CTE rounds."""
    sep = "chr(2)"
    head = f"""
    WITH words AS (
        SELECT w FROM (
            SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents
        ) WHERE w <> '' AND NOT contains(w, {sep})
    ),
    wf AS (SELECT w, CAST(count(*) AS BIGINT) AS f FROM words GROUP BY w),
    tok1 AS (
        SELECT substring(t0, 1, length(t0) - 1) AS t, f
        FROM (SELECT regexp_replace(w, '(.)', '\\1' || {sep}, 'g') AS t0, f
              FROM wf)
    )"""
    rounds = []
    for it in range(1, 4):
        rounds.append(f"""
    p{it} AS (
        SELECT parts[i] AS l, parts[i + 1] AS r,
               CAST(sum(f) AS BIGINT) AS pair_count
        FROM (
            SELECT string_split(t, {sep}) AS parts, f,
                   unnest(range(1, len(string_split(t, {sep})))) AS i
            FROM tok{it}
        )
        GROUP BY l, r
    ),
    m{it} AS (
        SELECT l, r, pair_count FROM p{it}
        ORDER BY pair_count DESC, l ASC, r ASC LIMIT 1
    ),
    tok{it + 1} AS (
        SELECT replace(t, m.l || {sep} || m.r, m.l || m.r) AS t, f
        FROM tok{it} CROSS JOIN m{it} m
    )""")
    sel = " UNION ALL ".join(
        f"SELECT {it} AS iteration, l, r, pair_count FROM m{it}"
        for it in range(1, 4)
    )
    return (
        head + "," + ",".join(rounds)
        + f" SELECT CAST(iteration AS INTEGER) AS iteration, l, r,"
          f" pair_count FROM ({sel}) ORDER BY iteration"
    )


# =====================================================================
# round-20 queue (2/2): end-to-end curation verdict (built round 12)
# — the composition key that runs a document through the cascade a
# training corpus actually applies, with the FIRST failing rule as
# the auditable drop reason.
# =====================================================================

def q_curation_pipeline_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document curation verdict: exact-dup elimination (keep the
    min-doc_id representative of each md5(text) group — the
    q_dedup_exact rule), then minimum length, then alphabetic-ratio
    quality, then single-token repetition — composed in ONE plan with
    the first failing rule recorded as the drop reason (auditable
    filtering: every dropped doc says why, the Gopher-report
    q_docs_filter_report contract at per-doc granularity).  Plan: the
    dup check is one hash agg on md5(text) joined back (the only
    corpus shuffle); every other signal is a narrow projection riding
    the scan; repetition's top-token share folds into the same
    explode-agg the token count uses.  Output is per-doc (doc_id,
    lang, reason, keep) + the signals, ordered by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.split(F.lower(F.trim("text")), r"\s+")
            ).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    tstats = (
        toks.groupBy("doc_id", "t")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.max("c").alias("top_tok"),
        )
    )
    rep = docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("h"),
    )
    keepers = rep.groupBy("h").agg(F.min("doc_id").alias("rep_id"))
    alpha = (
        F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
        / F.greatest(F.length("text"), F.lit(1))
    )
    base = (
        docs.join(rep, "doc_id")
        .join(F.broadcast(keepers), "h")
        .join(tstats, "doc_id", "left")
        .select(
            "doc_id", "lang",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.round(
                F.coalesce(F.col("top_tok"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_tokens"), F.lit(0)), F.lit(1)),
                6,
            ).alias("top_share"),
            F.round(alpha, 6).alias("alpha_ratio"),
            (F.col("doc_id") != F.col("rep_id")).alias("is_dup"),
        )
    )
    reason = (
        F.when(F.col("is_dup"), "exact_dup")
        .when(F.col("n_tokens") < 5, "too_short")
        .when(F.col("alpha_ratio") < 0.5, "low_alpha")
        .when(F.col("top_share") > 0.3, "high_repetition")
        .otherwise("keep")
    )
    return base.select(
        "doc_id", "lang", "n_tokens", "top_share", "alpha_ratio",
        reason.alias("reason"),
        (reason == "keep").alias("keep"),
    ).orderBy("doc_id")


def _curation_pipeline_oracle() -> str:
    """DuckDB mirror: same md5 representative rule, same token stats,
    same alpha ratio, same first-failing-rule cascade."""
    return """
    WITH toks AS (
        SELECT doc_id, t FROM (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS t
            FROM documents
        ) WHERE t <> ''
    ),
    tstats AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
               CAST(max(c) AS BIGINT) AS top_tok
        FROM (SELECT doc_id, t, count(*) AS c FROM toks GROUP BY doc_id, t)
        GROUP BY doc_id
    ),
    rep AS (SELECT doc_id, md5(text) AS h FROM documents),
    keepers AS (SELECT h, min(doc_id) AS rep_id FROM rep GROUP BY h),
    base AS (
        SELECT d.doc_id, d.lang,
               coalesce(t.n_tokens, 0) AS n_tokens,
               round(coalesce(t.top_tok, 0)
                     / CAST(greatest(coalesce(t.n_tokens, 0), 1) AS DOUBLE),
                     6) AS top_share,
               round(length(regexp_replace(d.text, '[^a-zA-Z]', '', 'g'))
                     / CAST(greatest(length(d.text), 1) AS DOUBLE),
                     6) AS alpha_ratio,
               (r.doc_id <> k.rep_id) AS is_dup
        FROM documents d
        JOIN rep r ON d.doc_id = r.doc_id
        JOIN keepers k ON r.h = k.h
        LEFT JOIN tstats t ON d.doc_id = t.doc_id
    )
    SELECT doc_id, lang, n_tokens, top_share, alpha_ratio,
           CASE WHEN is_dup THEN 'exact_dup'
                WHEN n_tokens < 5 THEN 'too_short'
                WHEN alpha_ratio < 0.5 THEN 'low_alpha'
                WHEN top_share > 0.3 THEN 'high_repetition'
                ELSE 'keep' END AS reason,
           (CASE WHEN is_dup THEN 'exact_dup'
                 WHEN n_tokens < 5 THEN 'too_short'
                 WHEN alpha_ratio < 0.5 THEN 'low_alpha'
                 WHEN top_share > 0.3 THEN 'high_repetition'
                 ELSE 'keep' END) = 'keep' AS keep
    FROM base
    ORDER BY doc_id
    """


# =====================================================================
# q_multimodal_dedup + q_multimodal_manifest (QUEUED round 14): the
# dedup and packing legs of a media training-data pipeline — binary
# columns as first-class dedup/pack subjects, not just decode targets
# =====================================================================

def _media_payload_cols():
    """In-plan synthesized media rows over ``documents``: an opaque
    binary payload with ENGINEERED cross-document collisions (doc_id %
    200 keys the content, so ~2-3 docs share each payload at sf0.01 —
    the re-hosted-image shape), a modality tag, and the payload's byte
    size.  Deterministic, no UDF — the binary column is built by
    ``to_binary`` over string expressions both engines can replay."""
    key = F.pmod(F.col("doc_id"), F.lit(200))
    pay_txt = F.concat(
        F.lit("MEDIA:"),
        key.cast("string"),
        F.lit(":"),
        F.substring(F.lit("x" * 160), 1, 100),
    )
    modality = (
        F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, "image")
        .when(F.pmod(F.col("doc_id"), F.lit(3)) == 1, "audio")
        .otherwise("video")
    )
    return F.to_binary(pay_txt, F.lit("utf-8")).alias("payload"), modality.alias(
        "modality"
    )


def q_multimodal_dedup_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-content exact dedup — the image/audio dedup pass of a
    media pipeline (the multimodal twin of ``q_dedup_exact``/
    ``q_dedup_url``): content-address each opaque payload with
    sha2-256 OVER THE BYTES (never decode — reference R2's extractors
    are for text; media dedup keys on content identity), collapse
    copies to the min-doc_id keeper, and report per-row verdict plus
    copy count and reclaimable bytes.  One shuffle on the content
    hash; BOTH window functions share that single partitioning (the
    q_dedup_url plan shape) — at 100 TB of media this is the exact
    plan: hash rides the scan, no candidate generation, dedup state
    is one row per distinct payload."""
    docs = load_table(spark, sf_dir, "documents")
    payload, modality = _media_payload_cols()
    media = docs.select("doc_id", "source", payload, modality)
    h = F.sha2(F.col("payload"), 256)
    w = Window.partitionBy("content_sha")
    return (
        media.withColumn("content_sha", h)
        .withColumn("payload_bytes", F.octet_length("payload").cast("long"))
        .withColumn("n_copies", F.count("*").over(w).cast("long"))
        .withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("is_dup", F.col("doc_id") != F.col("keeper_id"))
        .withColumn(
            "bytes_reclaimed",
            F.when(F.col("is_dup"), F.col("payload_bytes")).otherwise(
                F.lit(0)
            ).cast("long"),
        )
        .select(
            "doc_id", "source", "modality", "content_sha", "payload_bytes",
            "n_copies", "keeper_id", "is_dup", "bytes_reclaimed",
        )
    )


def _multimodal_dedup_oracle() -> str:
    """DuckDB mirror: the same payload synthesis as plain string
    concat (sha256 of the utf-8 bytes equals Spark's sha2 over
    to_binary — pinned by the shared hex), min/count windows over the
    content hash."""
    return """
    WITH media AS (
        SELECT doc_id, source,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               'MEDIA:' || CAST(doc_id % 200 AS VARCHAR) || ':'
                   || repeat('x', 100) AS pay
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, source, modality,
               sha256(pay) AS content_sha,
               CAST(length(pay) AS BIGINT) AS payload_bytes
        FROM media
    )
    SELECT doc_id, source, modality, content_sha, payload_bytes,
           CAST(count(*) OVER (PARTITION BY content_sha) AS BIGINT)
               AS n_copies,
           min(doc_id) OVER (PARTITION BY content_sha) AS keeper_id,
           doc_id <> min(doc_id) OVER (PARTITION BY content_sha) AS is_dup,
           CAST(CASE WHEN doc_id <> min(doc_id)
                          OVER (PARTITION BY content_sha)
                     THEN payload_bytes ELSE 0 END AS BIGINT)
               AS bytes_reclaimed
    FROM hashed
    """


def q_multimodal_manifest_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-manifest packing — the WebDataset/tar-shard builder of a
    media pipeline: per modality, stream rows in deterministic order
    (doc_id) and cut a new shard every time the running byte total
    crosses the target (50 KB here; GBs in production) — the
    sequential-writer semantics an actual shard writer has, distinct
    from ``q_pack_sequences``'s per-bin greedy fill.  One window
    shuffle partitioned by modality computes the running sum; the
    per-shard rollup reuses that partitioning (partial-agg on top).
    At 100 TB: modality count is tiny, so the window parallelism is
    per-modality — production would sub-bucket the stream (e.g. by
    source) exactly like the oracle can, but the MANIFEST contract
    (every shard under target + remainder, items contiguous in order)
    is what this key pins."""
    target = 50_000
    docs = load_table(spark, sf_dir, "documents")
    payload, modality = _media_payload_cols()
    # media byte sizes: payload plus the doc text riding along (the
    # caption/transcript), so sizes vary per row like real media
    media = docs.select(
        "doc_id", modality,
        (F.octet_length(payload) + F.col("n_chars")).cast("long").alias(
            "bytes"
        ),
    )
    w = Window.partitionBy("modality").orderBy("doc_id")
    sharded = media.withColumn(
        "shard_id",
        F.floor(
            (F.sum("bytes").over(w) - F.lit(1)) / F.lit(target)
        ).cast("long"),
    )
    return (
        sharded.groupBy("modality", "shard_id")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum("bytes").alias("shard_bytes"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


def _multimodal_manifest_oracle(target: int = 50_000) -> str:
    """DuckDB mirror: same payload/byte synthesis, same running-sum
    shard cut (cumulative sum ordered by doc_id within modality),
    same rollup."""
    return f"""
    WITH media AS (
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image'
                    WHEN doc_id % 3 = 1 THEN 'audio'
                    ELSE 'video' END AS modality,
               CAST(length('MEDIA:' || CAST(doc_id % 200 AS VARCHAR)
                           || ':' || repeat('x', 100)) + n_chars
                    AS BIGINT) AS bytes
        FROM documents
    ),
    sharded AS (
        SELECT modality, doc_id, bytes,
               CAST(floor((sum(bytes) OVER (PARTITION BY modality
                                            ORDER BY doc_id) - 1)
                          / {target}) AS BIGINT) AS shard_id
        FROM media
    )
    SELECT modality, shard_id,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(bytes) AS BIGINT) AS shard_bytes,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM sharded
    GROUP BY modality, shard_id
    """


# =====================================================================
# q_join_asof_tolerance + q_sample_temperature (QUEUED round 14)
# =====================================================================

def q_join_asof_tolerance_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness bound — pandas
    ``merge_asof(tolerance=...)`` parity on the union-sort operator
    (``operators/joins.py asof_join``): for each purchase, the latest
    click at or before it per user, but a click older than 12 hours is
    NOT a match (nulled, left-join semantics) — the quote-staleness /
    attribution-window rule every event pipeline needs.  The matched
    build timestamp rides the same carried window, so the tolerance
    check adds zero shuffles: the plan is exactly q_join_asof's (one
    exchange on user_id) plus a null-out projection.  The 12 h bound
    yields a three-way split on the fixture (matched-within /
    matched-stale / never-matched), so a broken tolerance shows up as
    wrong rows, not fewer rows."""
    from vector_db_ingestor_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases, clicks, by="user_id", probe_ts="ts", build_ts="ts",
        value_cols=["click_id"], tolerance=F.expr("INTERVAL 12 HOURS"),
    )
    return out.select(
        "event_id", "user_id", "asof_click_id",
        F.col("asof_click_id").isNotNull().alias("within_tolerance"),
    )


def _join_asof_tolerance_oracle() -> str:
    """DuckDB mirror: ASOF LEFT JOIN picks the same latest click; the
    tolerance is the identical null-out CASE on the matched ts."""
    return """
    SELECT p.event_id, p.user_id,
           CASE WHEN c.ts >= p.ts - INTERVAL 12 HOUR
                THEN c.click_id END AS asof_click_id,
           coalesce(c.ts >= p.ts - INTERVAL 12 HOUR, FALSE)
               AS within_tolerance
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, max(event_id) AS click_id
                    FROM events WHERE event_type = 'click'
                    GROUP BY user_id, ts) c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """


def q_join_asof_nearest_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (round 15 — the third pandas
    ``merge_asof`` direction under the hash gate): for each purchase,
    the click CLOSEST in time per user, whichever side it falls on,
    with an exact tie preferring the backward row (the pandas rule).
    Emits the decision evidence alongside the match: ``nearest_side``
    (backward/forward/null) and ``delta_s`` (whole-second distance —
    the tie-break itself compares exact microsecond intervals; the
    reported delta truncates identically in both engines), so a broken
    tie-break or a wrong-side pick shows up as wrong VALUES, not just
    a different row count.  Plan: the same union-sort single shuffle
    on user_id as q_join_asof — nearest carries both direction structs
    over that one exchange (two in-partition sorts, zero extra
    shuffles).  The oracle replays the decision from two chained
    DuckDB ASOF joins (backward + forward legs)."""
    from vector_db_ingestor_spark.operators.joins import asof_join

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    out = asof_join(
        purchases, clicks, by="user_id", probe_ts="ts", build_ts="ts",
        value_cols=["click_id", "ts"], direction="nearest",
    )
    matched_ts = F.col("asof_ts")
    return out.select(
        "event_id", "user_id", "asof_click_id",
        F.when(matched_ts.isNull(), F.lit(None).cast("string"))
        .when(matched_ts <= F.col("ts"), F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("nearest_side"),
        # NTZ-safe epoch-free distance: interval -> whole seconds
        # (greatest/least keeps it positive, so trunc == floor in
        # both engines)
        (
            F.greatest(F.col("ts"), matched_ts)
            - F.least(F.col("ts"), matched_ts)
        ).cast("long").alias("delta_s"),
    )


def _join_asof_nearest_oracle() -> str:
    """DuckDB mirror: backward and forward legs as two chained ASOF
    joins, then the identical closer-wins / tie-prefers-backward CASE."""
    return """
    WITH p AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase'),
    c AS (SELECT user_id, ts, max(event_id) AS click_id
          FROM events WHERE event_type = 'click'
          GROUP BY user_id, ts),
    legs AS (
        SELECT p.event_id, p.user_id, p.ts,
               b.click_id AS b_id, b.ts AS b_ts,
               f.click_id AS f_id, f.ts AS f_ts
        FROM p
        ASOF LEFT JOIN c b ON p.user_id = b.user_id AND b.ts <= p.ts
        ASOF LEFT JOIN c f ON p.user_id = f.user_id AND f.ts >= p.ts
    ),
    chosen AS (
        SELECT *,
               CASE WHEN b_ts IS NULL AND f_ts IS NULL THEN NULL
                    WHEN f_ts IS NULL THEN 'backward'
                    WHEN b_ts IS NULL THEN 'forward'
                    WHEN epoch_us(ts) - epoch_us(b_ts)
                         <= epoch_us(f_ts) - epoch_us(ts) THEN 'backward'
                    ELSE 'forward' END AS nearest_side
        FROM legs
    )
    SELECT event_id, user_id,
           CASE nearest_side WHEN 'backward' THEN b_id
                WHEN 'forward' THEN f_id END AS asof_click_id,
           nearest_side,
           CAST(CASE nearest_side
                WHEN 'backward' THEN (epoch_us(ts) - epoch_us(b_ts))
                                     // 1000000
                WHEN 'forward' THEN (epoch_us(f_ts) - epoch_us(ts))
                                    // 1000000
           END AS BIGINT) AS delta_s
    FROM chosen
    """


def q_sample_temperature_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling — THE standard multi-source
    data-mixing recipe (the mT5 alpha-sampling recipe): per-source shares are
    raised to alpha = 0.7 (< 1) and renormalized, flattening the source distribution
    so low-resource sources are oversampled; the report pairs each
    source's natural share with its temperature weight, the implied
    oversample factor, and the expected document count under a fixed
    budget.  Plan: one map-side-combined aggregation per source (tiny
    output) + a 1-row broadcast total — the scalar-model pattern;
    floats are rounded to 6dp like every cosine (pow is the same libm
    double on both engines).  At 100 TB the per-source agg IS the whole
    job; the sampling itself is then a per-row bernoulli/repeat using
    these driver-scale weights (q_split_train's hash trick)."""
    budget = 100_000
    alpha = 0.7  # share^alpha, alpha < 1 flattens (mT5-style)
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").alias("n_chars"),
    )
    tot = per_src.agg(
        F.sum("n_chars").alias("tot_chars"),
        F.sum(F.pow(F.col("n_chars").cast("double"), F.lit(alpha))).alias(
            "tot_pow"
        ),
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source", "n_docs", "n_chars",
            F.round(F.col("n_chars") / F.col("tot_chars"), 6).alias("share"),
            F.round(
                F.pow(F.col("n_chars").cast("double"), F.lit(alpha))
                / F.col("tot_pow"),
                6,
            ).alias("temp_weight"),
        )
        .withColumn(
            "oversample",
            F.round(F.col("temp_weight") / F.col("share"), 6),
        )
        .withColumn(
            "expected_docs",
            F.round(F.col("temp_weight") * F.lit(budget), 0).cast("long"),
        )
    )


def _sample_temperature_oracle(budget: int = 100_000) -> str:
    """DuckDB mirror: same per-source agg, same pow(x, 1/0.7) over
    doubles, same 6dp rounding."""
    return f"""
    WITH per_src AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(sum(n_chars) AS BIGINT) AS tot_chars,
               sum(pow(CAST(n_chars AS DOUBLE), 0.7)) AS tot_pow
        FROM per_src
    )
    SELECT source, n_docs, n_chars, share, temp_weight,
           round(temp_weight / share, 6) AS oversample,
           CAST(round(temp_weight * {budget}, 0) AS BIGINT)
               AS expected_docs
    FROM (
        SELECT source, n_docs, n_chars,
               round(CAST(n_chars AS DOUBLE) / tot_chars, 6) AS share,
               round(pow(CAST(n_chars AS DOUBLE), 0.7) / tot_pow, 6)
                   AS temp_weight
        FROM per_src CROSS JOIN tot
    )
    """


def q_jsonl_ingest_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The JSONL front door under the hash gate — the q_warc_ingest
    symmetry for the LLM-data interchange format
    (``sources/text.py scan_jsonl``'s parse contract): fixture
    documents are serialized IN-PLAN to JSONL records (``to_json``
    over a struct — the exact wire format), every 17th line is
    corrupted (truncated mid-record, the malformed-line case every
    crawl dump contains), and the lines run back through ``from_json``
    with the EXPLICIT schema + PERMISSIVE corrupt handling the source
    mandates at 100 TB (schema inference is a second full pass; a
    FAILFAST parse dies on line one of a dirty dump).  Good lines
    round-trip identically (parsed id/lang equal the originals, text
    pinned by sha-256); corrupt lines land nulls + a flag instead of
    killing the job.  ``from_json`` is the same Jackson parser the
    file reader runs, so this certifies the deployed path's semantics.
    Scale: a pure projection riding the scan — zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    line = F.to_json(F.struct("doc_id", "lang", "text"))
    # truncate at 11 chars: every line starts '{"doc_id":' (10 chars)
    # and the shortest COMPLETE object to_json can emit for this struct
    # is '{"doc_id":0}' (12 chars — null fields are omitted), so an
    # 11-char prefix is unparseable for every possible row, not just
    # rows whose text happens to be long (round-15 ADVICE hardening)
    wire = F.when(
        F.col("doc_id") % 17 == 0, F.substring(line, 1, 11)
    ).otherwise(line)
    parsed = F.from_json(
        wire, "doc_id LONG, lang STRING, text STRING"
    ).alias("rec")
    return docs.select(
        F.col("doc_id").alias("src_doc_id"), parsed
    ).select(
        "src_doc_id",
        F.col("rec.doc_id").alias("parsed_doc_id"),
        F.col("rec.lang").alias("parsed_lang"),
        F.when(
            F.col("rec.text").isNotNull(),
            F.sha2(F.to_binary(F.col("rec.text"), F.lit("utf-8")), 256),
        ).alias("text_sha"),
        F.col("rec.doc_id").isNull().alias("is_corrupt"),
    )


def _jsonl_ingest_oracle() -> str:
    """DuckDB mirror: identity on the synthesis for good lines (a
    truncated record can never parse — the brace never closes — so
    corruption is exactly the doc_id % 17 set), constants for corrupt
    ones."""
    return """
    SELECT doc_id AS src_doc_id,
           CASE WHEN doc_id % 17 = 0 THEN NULL ELSE doc_id END
               AS parsed_doc_id,
           CASE WHEN doc_id % 17 = 0 THEN NULL ELSE lang END
               AS parsed_lang,
           CASE WHEN doc_id % 17 = 0 THEN NULL ELSE sha256(text) END
               AS text_sha,
           doc_id % 17 = 0 AS is_corrupt
    FROM documents
    """


def q_csv_ingest_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CSV front door under the hash gate — the q_jsonl_ingest
    sibling for the other interchange format (``sources/text.py
    scan_csv``): the contract worth certifying for CSV is QUOTING, so
    every row's text gets an injected ``, and a "quoted, comma" tail``
    (embedded delimiter + embedded quote — the fields that corrupt a
    naive split-on-comma), is serialized in-plan with ``to_csv`` (the
    writer quotes and doubles the quote char) and parsed back with
    ``from_csv`` under the explicit schema.  Round-trip is pinned by
    sha-256 of the parsed text against the oracle's hand-built
    original; ``was_quoted`` certifies the writer actually exercised
    quoting on every row.  Same Univocity parser as the file reader,
    zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    tricky = F.concat(
        F.substring(F.col("text"), 1, 40),
        F.lit(', and a "quoted, comma" tail'),
    )
    wire = F.to_csv(
        F.struct(
            F.col("doc_id"), F.col("lang"), tricky.alias("text")
        )
    )
    rec = F.from_csv(wire, "doc_id LONG, lang STRING, text STRING")
    return docs.select(
        F.col("doc_id").alias("src_doc_id"),
        rec.alias("rec"),
        wire.contains('"').alias("was_quoted"),
    ).select(
        "src_doc_id",
        F.col("rec.doc_id").alias("parsed_doc_id"),
        F.col("rec.lang").alias("parsed_lang"),
        F.sha2(F.to_binary(F.col("rec.text"), F.lit("utf-8")), 256).alias(
            "text_sha"
        ),
        "was_quoted",
    )


def _csv_ingest_oracle() -> str:
    """DuckDB mirror: identity on the synthesis — the oracle never
    parses CSV, it states what a correct quote round-trip must return
    (the q_warc_ingest/q_jsonl_ingest contract style)."""
    return """
    SELECT doc_id AS src_doc_id,
           doc_id AS parsed_doc_id,
           lang AS parsed_lang,
           sha256(substr(text, 1, 40)
                  || ', and a "quoted, comma" tail') AS text_sha,
           TRUE AS was_quoted
    FROM documents
    """


def q_ann_nprobe_curve_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nprobe TUNING CURVE under the hash gate — recall@k at every
    escalation depth in one plan, the report an IVF deployment runs
    before choosing its nprobe/recall trade (and the measured
    companion to q_ann_ivf_escalate's underfill rule): on the
    literal-centroid model, rows carry their cell's probe rank ``rr``;
    the exact top-k is a TakeOrdered over all rows; each depth's
    approximate top-k is a TakeOrdered within ``rr <= p``; a
    broadcast semi-join against the exact id set counts hits, and
    recall rides as exact integer milli-units (no float agg).  Scale:
    each depth's scan is partition-prunable to its prefix cells in a
    real index (here in-plan), the exact leg is the one full pass a
    tuning run pays once, and every ranked set is k rows — the joins
    are broadcast by construction."""
    from vector_db_ingestor_spark.functions.vector import cosine_similarity
    from vector_db_ingestor_spark.operators.similarity import (
        _assign_cid,
        ivf_shortlist,
    )

    k = 20
    cents = _ivf_assign_centroids()
    order = ivf_shortlist(cents, PROBE_64, nprobe=len(cents))
    emb = load_table(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    rr = F.lit(None).cast("int")
    for pos, cid in enumerate(order):
        rr = F.when(F.col("cid") == cid, pos + 1).otherwise(rr)
    scored = (
        emb.withColumn("cid", _assign_cid(vec, cents, round_dp=6))
        .withColumn("rr", rr)
        .withColumn(
            "score", F.round(cosine_similarity(vec, lit_doubles(PROBE_64)), 6)
        )
        .select("vec_id", "rr", "score")
    )
    exact = (
        scored.orderBy(F.col("score").desc(), F.col("vec_id").asc())
        .limit(k)
        .select("vec_id")
    )
    parts = None
    for p in (1, 2, 4, len(cents)):
        approx = (
            scored.filter(F.col("rr") <= p)
            .orderBy(F.col("score").desc(), F.col("vec_id").asc())
            .limit(k)
            .select(F.lit(p).cast("int").alias("nprobe"), "vec_id")
        )
        parts = approx if parts is None else parts.unionByName(approx)
    hits = parts.join(F.broadcast(exact), "vec_id", "left_semi")
    return (
        hits.groupBy("nprobe")
        .agg(F.count("*").cast("long").alias("n_hits"))
        .withColumn(
            "recall_milli",
            F.round(F.col("n_hits") * 1000 / F.lit(k), 0).cast("long"),
        )
    )


def _ann_nprobe_curve_oracle(k: int = 20) -> str:
    """DuckDB mirror: same centroid literals, same rr ranking, exact
    and per-depth top-k CTEs, semi-join overlap counts, integer
    milli recall."""
    cents = _ivf_assign_centroids()

    def cvec(c: list[float]) -> str:
        return "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]"

    def cos_sql(c: list[float]) -> str:
        lit = cvec(c)
        return (
            f"round(list_dot_product(embedding::DOUBLE[], {lit})"
            f" / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
            f" * sqrt(list_dot_product({lit}, {lit}))), 6)"
        )

    cent_rows = ", ".join(f"({i}, {cvec(c)})" for i, c in enumerate(cents))
    sims = ", ".join(cos_sql(c) for c in cents)
    depth_legs = "\n        UNION ALL\n".join(
        f"""        SELECT CAST({p} AS INTEGER) AS nprobe, vec_id
        FROM (SELECT vec_id FROM scored WHERE rr <= {p}
              ORDER BY score DESC, vec_id ASC LIMIT {k})"""
        for p in (1, 2, 4, len(cents))
    )
    return f"""
    WITH cents(cid, cvec) AS (VALUES {cent_rows}),
    ranked_cells AS (
        SELECT cid,
               CAST(row_number() OVER (
                   ORDER BY (list_dot_product(cvec, {_PROBE_SQL})
                             / (sqrt(list_dot_product(cvec, cvec))
                                * sqrt(list_dot_product({_PROBE_SQL},
                                                        {_PROBE_SQL})))) DESC,
                            cid ASC) AS INTEGER) AS rr
        FROM cents
    ),
    assigned AS (
        SELECT vec_id, embedding,
               CAST(list_position(sims, list_max(sims)) - 1 AS INTEGER) AS cid
        FROM (SELECT vec_id, embedding, [{sims}] AS sims FROM embeddings)
    ),
    scored AS (
        SELECT a.vec_id, rc.rr, {_SCORE_SQL} AS score
        FROM assigned a JOIN ranked_cells rc USING (cid)
    ),
    exact AS (
        SELECT vec_id FROM scored ORDER BY score DESC, vec_id ASC LIMIT {k}
    ),
    approx AS (
{depth_legs}
    )
    SELECT nprobe, CAST(count(*) AS BIGINT) AS n_hits,
           CAST(round(count(*) * 1000.0 / {k}, 0) AS BIGINT) AS recall_milli
    FROM approx
    WHERE vec_id IN (SELECT vec_id FROM exact)
    GROUP BY nprobe
    """


# =====================================================================
# Round-14 declarations (SURVEY §7's largest window: the seven pairs
# built round 11, differentially tested in tests/test_round11_queries.py,
# plan-pinned in tests/test_plans.py QUEUE_CASES, and 100x-probed —
# promoted from QUEUED_QUERIES into the declared inventory here)
# =====================================================================

QUERIES["q_text_boilerplate_strip"] = q_text_boilerplate_strip_impl
ORACLE_SQL["q_text_boilerplate_strip"] = _boilerplate_strip_oracle()
QUERIES["q_nb_classify"] = q_nb_classify_impl
ORACLE_SQL["q_nb_classify"] = _nb_classify_oracle()
QUERIES["q_stream_dedup"] = q_stream_dedup_impl
ORACLE_SQL["q_stream_dedup"] = _stream_dedup_oracle()
QUERIES["q_html_extract"] = q_html_extract_impl
ORACLE_SQL["q_html_extract"] = _html_extract_oracle()
QUERIES["q_sketch_cms"] = q_sketch_cms_impl
ORACLE_SQL["q_sketch_cms"] = _sketch_cms_oracle()
QUERIES["q_ann_ivfpq_refine"] = q_ann_ivfpq_refine_impl
ORACLE_SQL["q_ann_ivfpq_refine"] = _ivfpq_refine_oracle()
QUERIES["q_join_interval"] = q_join_interval_impl
ORACLE_SQL["q_join_interval"] = _join_interval_oracle()


# =====================================================================
# Round-15 declarations (the scheduled window from SURVEY §7: built +
# differentially tested round 11, gate-green on every --queue run since
# — promoted from QUEUED_QUERIES into the declared inventory here).
# q_sketch_linear also retires the evidence-ladder gap next to
# q_agg_approx's rows-only HLL (hash-exact distinct estimation).
# =====================================================================

QUERIES["q_graph_pagerank"] = q_graph_pagerank_impl
ORACLE_SQL["q_graph_pagerank"] = _graph_pagerank_oracle()
QUERIES["q_sketch_linear"] = q_sketch_linear_impl
ORACLE_SQL["q_sketch_linear"] = _sketch_linear_oracle()
QUERIES["q_sketch_bloom"] = q_sketch_bloom_impl
ORACLE_SQL["q_sketch_bloom"] = _sketch_bloom_oracle()
QUERIES["q_stream_totals"] = q_stream_totals_impl
ORACLE_SQL["q_stream_totals"] = _stream_totals_oracle()
QUERIES["q_topk_matryoshka"] = q_topk_matryoshka_impl
ORACLE_SQL["q_topk_matryoshka"] = _topk_matryoshka_oracle()


# =====================================================================
# round-16 queue (3rd pair, built round 15): min-side CONTAINMENT — the
# asymmetric near-subset dedup metric (quote/excerpt/re-publication
# pairs Jaccard washes out), same capped rare-gram candidate plan as
# q_dedup_ngram_capped, exact verify, direction in the sizes.
# =====================================================================

_CONTAIN = {"n": 2, "max_df": 5, "threshold": 0.25}


def q_dedup_containment_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-subset dedup (operators/dedup.py
    containment_pairs): containment = |A n B| / min(|A|, |B|) over
    word-bigram sets, lang-blocked.  A short doc fully embedded in a
    long one scores jaccard ~|A|/|B| (invisible) but containment 1.0
    — the excerpt/re-publication duplication shape; the scale plan is
    q_dedup_ngram_capped's verbatim (rare-gram candidates, df <=
    max_df via broadcast anti-join, ONE token-stream shuffle, exact
    array-intersect verify on candidates only), and the recall
    contract drops exactly the boilerplate-only containments a dedup
    must not merge.  Sizes ride in the output so the contained side
    is recoverable (sz_a vs sz_b)."""
    from vector_db_ingestor_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs,
        block_col="lang",
        n=_CONTAIN["n"],
        threshold=_CONTAIN["threshold"],
        max_df=_CONTAIN["max_df"],
    )


def _dedup_containment_oracle() -> str:
    """DuckDB mirror: same shingles (string grams — the engine's
    xxhash64 candidate key only AFFECTS candidacy via ~2^-64
    collisions), same df cap on (lang, gram), same pair generation,
    same exact containment on full gram sets."""
    n, max_df, thr = (
        _CONTAIN["n"], _CONTAIN["max_df"], _CONTAIN["threshold"],
    )
    return f"""
    WITH sh AS (
        SELECT doc_id, lang, {_ngram_list_sql(n)} AS grams FROM documents
    ),
    t AS (SELECT doc_id, lang, unnest(grams) AS g FROM sh),
    df AS (SELECT lang, g, count(*) AS dfreq FROM t GROUP BY lang, g),
    rare AS (
        SELECT t.doc_id, t.lang, t.g FROM t JOIN df USING (lang, g)
        WHERE df.dfreq <= {max_df}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM rare a JOIN rare b
          ON a.lang = b.lang AND a.g = b.g AND a.doc_id < b.doc_id
    )
    SELECT * FROM (
        SELECT id_a, id_b,
               CAST(len(x.grams) AS INTEGER) AS sz_a,
               CAST(len(y.grams) AS INTEGER) AS sz_b,
               CAST(len(list_intersect(x.grams, y.grams)) AS INTEGER)
                   AS n_inter,
               round(CAST(len(list_intersect(x.grams, y.grams)) AS DOUBLE)
                     / least(len(x.grams), len(y.grams)), 6) AS containment
        FROM cand
        JOIN sh x ON cand.id_a = x.doc_id
        JOIN sh y ON cand.id_b = y.doc_id
    ) WHERE containment >= {thr}
    """


# =====================================================================
# round-17 queue (3rd pair, built round 15): exponentially
# time-decayed aggregation — the feature-store recency weighting
# (decayed counts/sums per entity), hash-exact because the decay
# weights are EXACT POWERS OF TWO over integer day-bucket ages, so
# every term and every sum is exact BIGINT arithmetic and aggregation
# order cannot move a bit (the q_graph_pagerank rule applied to decay).
# =====================================================================

_DECAY = {"ref": "2024-03-01", "halflife_days": 7, "kcap": 20}


def q_agg_decay_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-decayed per-(user, event_type) activity — the
    feature-store shape (half-life weighted engagement: an event
    ``age`` days old contributes ``value * 2^-floor(age/halflife)``).
    Floats never enter the aggregation: value is exact centi-units
    (2dp fixture), the decay weight is ``2^(kcap - k)`` cast to
    BIGINT (exact for k in [0, kcap]), ages clamp to
    [0, kcap] half-lives — so ``decayed_scaled`` is an
    order-independent integer sum and the readable ``decayed_milli``
    (milli-value-units, the q_text_lm_score integer-encoding rule) is
    ONE integer division — no float ever rounds, so no cross-engine
    tie can flip a digit (a round(x, 6) here DID tie at sf0.01:
    4.1653125 rounds differently across engines).  Plan:
    one map-side-combined hash aggregation on (user_id, event_type);
    state is O(entities), the shuffle carries one row per key per
    partition at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    ref, hl, kcap = _DECAY["ref"], _DECAY["halflife_days"], _DECAY["kcap"]
    age = F.datediff(F.lit(ref).cast("date"), F.col("ts").cast("date"))
    k = F.least(
        F.greatest(F.floor(age / F.lit(hl)), F.lit(0)), F.lit(kcap)
    ).cast("int")
    centi = F.round(F.col("value") * 100, 0).cast("long")
    # pow(2, j) for j in [0, kcap] is an exactly-representable double,
    # so the cast back to long is exact (shiftleft needs a literal
    # shift amount; this keeps the weight per-row)
    w = F.pow(F.lit(2.0), (F.lit(kcap) - k).cast("double")).cast("long")
    scale = 100 * (1 << kcap)
    return (
        ev.select(
            "user_id",
            "event_type",
            (centi * w).alias("term"),
            centi.alias("centi"),
        )
        .groupBy("user_id", "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum("centi").cast("long").alias("raw_centi"),
            F.sum("term").cast("long").alias("decayed_scaled"),
        )
        # values are non-negative, so truncating div == floor div; the
        # *1000 stays far under BIGINT (decayed_scaled ~1e13 at sf0.1)
        .withColumn(
            "decayed_milli",
            F.expr(f"(decayed_scaled * 1000L) div {scale}L"),
        )
    )


def _agg_decay_oracle() -> str:
    """DuckDB mirror: same day-bucket age (date_diff on DATE casts —
    the ns->us->DATE truncation chain is shared), same clamp, same
    power-of-two weight (power() over ints 0..20 is exact in a
    double), same integer sums, same final division."""
    ref, hl, kcap = _DECAY["ref"], _DECAY["halflife_days"], _DECAY["kcap"]
    scale = 100 * (1 << kcap)
    return f"""
    WITH e AS (
        SELECT user_id, event_type,
               least(greatest(CAST(floor(
                   date_diff('day', CAST(ts AS DATE), DATE '{ref}')
                   / {hl}) AS INTEGER), 0), {kcap}) AS k,
               CAST(round(value * 100, 0) AS BIGINT) AS centi
        FROM events
    )
    SELECT user_id, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(centi) AS BIGINT) AS raw_centi,
           CAST(sum(centi * CAST(power(2, {kcap} - k) AS BIGINT))
               AS BIGINT) AS decayed_scaled,
           CAST(sum(centi * CAST(power(2, {kcap} - k) AS BIGINT))
                * 1000 // {scale} AS BIGINT) AS decayed_milli
    FROM e
    GROUP BY user_id, event_type
    """


# =====================================================================
# the declaration queue, as data: every built-ahead impl/oracle pair
# (single source of truth for scripts/check_oracle.py --queue and the
# per-round registration diffs; tests import the pairs directly)
# =====================================================================

QUEUED_QUERIES: dict[str, tuple[QueryFn, str]] = {
    "q_ann_ivf_filtered": (q_ann_ivf_filtered_impl, _ivf_filtered_oracle()),
    "q_ann_ivf_escalate": (q_ann_ivf_escalate_impl, _ivf_escalate_oracle()),
    "q_multimodal_dedup": (
        q_multimodal_dedup_impl,
        _multimodal_dedup_oracle(),
    ),
    "q_multimodal_manifest": (
        q_multimodal_manifest_impl,
        _multimodal_manifest_oracle(),
    ),
    "q_join_asof_tolerance": (
        q_join_asof_tolerance_impl,
        _join_asof_tolerance_oracle(),
    ),
    "q_join_asof_nearest": (
        q_join_asof_nearest_impl,
        _join_asof_nearest_oracle(),
    ),
    "q_sample_temperature": (
        q_sample_temperature_impl,
        _sample_temperature_oracle(),
    ),
    "q_jsonl_ingest": (q_jsonl_ingest_impl, _jsonl_ingest_oracle()),
    "q_csv_ingest": (q_csv_ingest_impl, _csv_ingest_oracle()),
    "q_ann_nprobe_curve": (
        q_ann_nprobe_curve_impl,
        _ann_nprobe_curve_oracle(),
    ),
    "q_sample_reservoir": (q_sample_reservoir_impl, _sample_reservoir_oracle()),
    "q_dedup_passage": (q_dedup_passage_impl, _dedup_passage_oracle()),
    "q_dedup_containment": (
        q_dedup_containment_impl,
        _dedup_containment_oracle(),
    ),
    "q_agg_decay": (q_agg_decay_impl, _agg_decay_oracle()),
    "q_graph_hits": (q_graph_hits_impl, _graph_hits_oracle()),
    "q_sketch_kmv": (q_sketch_kmv_impl, _sketch_kmv_oracle()),
    "q_stats_ab": (q_stats_ab_impl, _stats_ab_oracle()),
    "q_join_spatial": (q_join_spatial_impl, _join_spatial_oracle()),
    "q_vec_pq_quality": (q_vec_pq_quality_impl, _vec_pq_quality_oracle()),
    "q_tokens_per_source": (
        q_tokens_per_source_impl,
        _tokens_per_source_oracle(),
    ),
    "q_bpe_train": (q_bpe_train_impl, _bpe_train_oracle()),
    "q_curation_pipeline": (
        q_curation_pipeline_impl,
        _curation_pipeline_oracle(),
    ),
}

# a queued key must not also be declared (the whole point is that the
# rotation window hasn't admitted it yet)
assert not set(QUEUED_QUERIES) & set(QUERIES), (
    "queued keys overlap declared inventory: "
    f"{set(QUEUED_QUERIES) & set(QUERIES)}"
)
