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


def q_agg_approx_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — constant memory per
    group at any scale; rows-only check (approximate by design)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
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
