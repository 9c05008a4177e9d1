"""Text analysis operators (north-star "text analysis").

The reference's only text analytics are char-length checks inside the
chunker and the ingest status report (R17,
``src/PDFToChromaIngester.py:370-378``).  For a training-data pipeline
we add the standard document statistics, all as built-in JVM
expressions (no UDFs in any hot path, so everything stays inside
whole-stage codegen and is SQL-mirrorable for the DuckDB oracle):

* token counting — whitespace split + a BPE-ish word/number/symbol
  regex count;
* quality scoring — length, punctuation ratio, stopword ratio, mean
  token length, combined into a deterministic [0,1] score;
* language ID — tiny stopword-hit heuristic (declared rule, mirrored
  verbatim in SQL);
* fingerprinting — md5 over case/whitespace-normalized text (cheap
  near-exact dedup key; rolling/simhash variants in operators/dedup.py).

These are per-row projections — narrow, shuffle-free; the groupBy
rollups shuffle once on the report key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: shared with the SQL oracle: a BPE-ish token pattern — runs of
#: letters, runs of digits, or a single non-space symbol.
TOKEN_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def whitespace_token_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), "\\s+"))


def regex_token_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(TOKEN_REGEX), 0))


def punct_ratio(text: Column) -> Column:
    punct = F.length(F.regexp_replace(text, "[^.!?,;:]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    toks = F.split(F.lower(F.trim(text)), "\\s+")
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_token_len(text: Column) -> Column:
    nonspace = F.length(F.regexp_replace(F.trim(text), "\\s+", ""))
    toks = F.split(F.trim(text), "\\s+")
    return nonspace / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic.

    0.4 * length-saturation (chars/500 capped at 1)
    + 0.3 * (1 - punct_ratio capped at 1)
    + 0.3 * stopword presence saturation (ratio/0.1 capped at 1)
    """
    len_part = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct_part = F.lit(1.0) - F.least(punct_ratio(text), F.lit(1.0))
    stop_part = F.least(stopword_ratio(text) / F.lit(0.1), F.lit(1.0))
    return F.round(0.4 * len_part + 0.3 * punct_part + 0.3 * stop_part, 6)


def fingerprint(text: Column) -> Column:
    """md5 of lowercased, whitespace-collapsed, trimmed text."""
    normalized = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return F.md5(normalized)


#: PII patterns — shared verbatim with the SQL oracle (Java regex and
#: RE2 agree on these constructs: classes, bounded repeats, \b, \d).
EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_REGEX = "\\b\\d{3}-\\d{4}\\b"


def redact_pii(
    df: DataFrame, text_col: str, out_col: str = "redacted"
) -> DataFrame:
    """Scrub emails and phone numbers from a text column, keeping
    per-row match counts for the cleaning report.

    A training-data necessity the reference lacks entirely: raw corpora
    carry contact strings that must not reach model training.  Pure JVM
    regex projections — narrow, shuffle-free, whole-stage-codegen'd, so
    the scrub rides along with whatever scan/filter stage already
    touches the text (zero extra passes at 100 TB).  Spark's
    ``regexp_replace`` is global by default, matching DuckDB's ``'g'``
    flag for the oracle.
    """
    c = F.col(text_col)
    return df.select(
        *df.columns,
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_REGEX), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_REGEX), 0)).alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(c, EMAIL_REGEX, "[EMAIL]"), PHONE_REGEX, "[PHONE]"
        ).alias(out_col),
    )


def repetition_stats(
    documents: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile: token totals, distinct counts,
    the dominant token, and a repetition ratio in [0, 1).

    High within-doc repetition is a standard low-quality signal
    (boilerplate, keyword stuffing, degenerate generations).  Plan:
    explode tokens -> hash-agg (id, token) counts -> window rank for
    the deterministic top token -> per-doc rollup.  Two exchanges
    total: token counting shuffles once on (id, token) after map-side
    partial aggregation, then the window's hash(id) exchange is REUSED
    by the final per-doc groupBy (hash(id) satisfies its clustering) —
    the rollup adds no shuffle.  Top-token tie-break: highest count,
    then lexicographically smallest token.
    """
    toks = documents.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), "\\s+")).alias("token"),
    )
    counts = toks.groupBy(id_col, "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            F.max(F.when(F.col("rn") == 1, F.col("token"))).alias("top_token"),
            F.max("cnt").alias("top_count"),
        )
        .withColumn(
            "rep_ratio",
            F.round(F.lit(1.0) - F.col("n_distinct") / F.col("n_tokens"), 6),
        )
    )


def contamination_report(
    corpus: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
) -> DataFrame:
    """Benchmark-contamination check: for each corpus document, how many
    distinct word n-grams it shares with the evaluation/benchmark set,
    and how many distinct eval documents it overlaps.

    The standard pre-training hygiene step (decontamination against
    held-out benchmarks).  The eval set is small by construction, so
    its grams BROADCAST — pre-grouped per gram (r16): the broadcast
    side carries one row per distinct eval gram with the array of eval
    docs containing it, so the join emits ONE row per (corpus doc,
    matched gram) instead of one per (corpus doc, gram, eval doc), and
    the final per-doc rollup needs no Expand (the old two-countDistinct
    plan doubled every joined row through Expand and paid a second
    exchange for the distinct; measured 1.31 s -> 0.78 s noop median
    at sf0.1, identical output).  Self-matches (a benchmark doc
    contaminating itself) are excluded via array_remove — eval ids are
    distinct per gram, so removing ``__cid`` drops exactly the self
    row the old ``__cid != __eid`` filter dropped.

    Equivalence: grams are distinct per doc on both sides, so the old
    join rows (cid, g, eid) were distinct triples;
    ``n_shared_grams = count of matched grams with >=1 other eval
    doc`` and ``n_eval_docs = |union of those docs' ids|`` are the
    same two counts the countDistinct pair produced.
    """
    from vector_db_ingestor_spark.operators.dedup import word_shingles_sql

    c = corpus.select(
        F.col(id_col).alias("__cid"),
        F.explode(F.expr(word_shingles_sql(f"`{text_col}`", n))).alias("__g"),
    )
    e = eval_docs.select(
        F.col(id_col).alias("__eid"),
        F.explode(F.expr(word_shingles_sql(f"`{text_col}`", n))).alias("__g"),
    )
    eval_grams = e.groupBy("__g").agg(F.collect_list("__eid").alias("__eids"))
    return (
        c.join(F.broadcast(eval_grams), "__g")
        .select(
            "__cid",
            F.array_remove(F.col("__eids"), F.col("__cid")).alias("__hits"),
        )
        .filter(F.size("__hits") > 0)
        .groupBy("__cid")
        .agg(
            F.count("*").alias("n_shared_grams"),
            F.size(
                F.array_distinct(F.flatten(F.collect_list("__hits")))
            ).alias("n_eval_docs"),
        )
        .select(F.col("__cid").alias(id_col), "n_shared_grams", "n_eval_docs")
    )


def doc_stats(documents: DataFrame, group_col: str = "source") -> DataFrame:
    """Per-source corpus statistics (R17-style report, north-star text
    analysis).  One shuffle on the report key; all partial-aggregated
    map-side first."""
    enriched = documents.select(
        F.col(group_col),
        F.length("text").alias("chars"),
        whitespace_token_count(F.col("text")).alias("ws_tokens"),
        regex_token_count(F.col("text")).alias("re_tokens"),
    )
    return (
        enriched.groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("chars").alias("total_chars"),
            F.round(F.avg("chars"), 6).alias("avg_chars"),
            F.sum("ws_tokens").alias("total_ws_tokens"),
            F.sum("re_tokens").alias("total_re_tokens"),
            F.round(F.avg("ws_tokens"), 6).alias("avg_ws_tokens"),
        )
        .orderBy(group_col)
    )
