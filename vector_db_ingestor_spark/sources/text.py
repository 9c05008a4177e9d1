"""Text-format document sources (JSONL / CSV / raw text files).

The reference ingests only PDFs (R1, src/PDFToChromaIngester.py:207-223);
real corpora arrive as JSONL/CSV/plain text too.  These are thin,
schema-explicit wrappers over Spark's native readers — distributed,
splittable (unlike PDFs), predicate/column pushdown intact — that land
rows in the same (source, filename, text, …) shape `build_chunks`
consumes downstream of extraction, so chunk→embed→sink is shared.

Always pass an explicit schema at 100 TB: schema inference is a full
extra pass over the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"


def scan_jsonl(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA
) -> DataFrame:
    """Line-delimited JSON scan. Splittable: line boundaries give Spark
    free intra-file parallelism, so no repartition crutch is needed."""
    return spark.read.schema(schema).json(path)


def scan_csv(
    spark: SparkSession, path: str, schema: str = DOC_SCHEMA, header: bool = True
) -> DataFrame:
    # escape='"' = RFC 4180 doubled-quote escaping, the dialect every
    # spreadsheet/pandas/DuckDB export writes.  Spark's default escape
    # is backslash, under which `"a ""b"" c"` comes back with its
    # quotes INTACT — silently wrong fields, caught by
    # tests/test_round14_queries.py::test_csv_scan_roundtrips_quoted_fields.
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("escape", '"')
        .csv(path)
    )


def scan_text_files(spark: SparkSession, path: str, glob: str = "*.txt") -> DataFrame:
    """Whole-file text scan shaped like sources.pdf.scan_pdfs output so
    it can feed the same chunk→embed pipeline (text is already
    'extracted')."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path").alias("source"),
            F.regexp_extract(F.col("path"), r"[^/]+$", 0).alias("filename"),
            F.col("length").alias("file_bytes"),
            F.col("content").cast("string").alias("text"),
        )
    )
