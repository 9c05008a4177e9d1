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

from pyspark.sql import Column, DataFrame
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
