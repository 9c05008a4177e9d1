"""Continuous ingestion — the reference's EP1 batch loop
(``ingest_directory``, src/PDFToChromaIngester.py:207-223) as a
Structured Streaming job.

The reference re-scans and re-ingests the whole directory on every run
(its ``__main__`` even ingests twice per process, SURVEY §3 EP1 step 5).
The streaming form subsumes that: the binaryFile file-stream source
tracks which files have been seen (exactly-once per file via the
checkpoint), new PDFs landing in the directory flow through the SAME
fused extract→chunk→embed kernel (:func:`pipeline.build_chunks` —
batch/stream parity is Spark's unified DataFrame API), and the parquet
sink appends atomically per micro-batch.

Scale knobs: ``max_files_per_trigger`` bounds micro-batch size (keeps
executor memory flat no matter how many files land at once);
parallelism inside a micro-batch comes from build_chunks' round-robin
repartition.  State is only the file-source log — the pipeline itself
is stateless (no watermark needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from vector_db_ingestor_spark.embedding import HashingEmbedder
from vector_db_ingestor_spark.pipeline import build_chunks

BINARY_FILE_SCHEMA = (
    "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY"
)


def stream_pdf_files(
    spark: SparkSession,
    directory: str,
    glob: str = "*.pdf",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream twin of sources.pdf.scan_pdfs."""
    reader = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(directory).select(
        F.col("path").alias("source"),
        F.regexp_extract(F.col("path"), r"[^/]+$", 0).alias("filename"),
        F.col("length").alias("file_bytes"),
        F.col("content"),
    )


def stream_ingest_directory(
    spark: SparkSession,
    directory: str,
    collection_path: str,
    checkpoint_path: str,
    metadata: dict[str, str] | None = None,
    chunk_size: int = 600,
    overlap: int = 50,
    embedder: HashingEmbedder | None = None,
    glob: str = "*.pdf",
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start (and with ``available_now`` drain) the streaming ingest.

    ``available_now=True`` processes everything currently in the
    directory then stops — the batch-equivalent run the tests and the
    reference's one-shot ``__main__`` correspond to; ``False`` leaves a
    continuous query tailing the directory.
    """
    files = stream_pdf_files(spark, directory, glob, max_files_per_trigger)
    chunks = build_chunks(files, metadata, chunk_size, overlap, embedder)
    writer = (
        chunks.writeStream.format("parquet")
        .option("path", collection_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
