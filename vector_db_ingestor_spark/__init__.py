"""vector_db_ingestor_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``desankha88/vector_db_ingestor``.

The reference (read-only snapshot at /root/reference) is a single-threaded
PDF -> chunk -> embed -> ChromaDB ingestion pipeline plus a top-k
semantic-retrieval / RAG-context path (see SURVEY.md).  This package
re-expresses those capabilities — and the LLM-data-pipeline operators a
100 TB training-data pipeline needs (dedup, similarity search, multimodal
columns, text analysis) — as idiomatic Spark DataFrame programs:

* declarative plans (Catalyst does pushdown / pruning / join selection),
* JVM-side built-in expressions in every hot path,
* Arrow-batched pandas UDFs only where built-ins cannot express the
  semantics (PDF parsing, embedding inference, SimHash fingerprints),
* explicit broadcast / partitioning choices sized for a 1000-executor
  cluster, validated on local[32].
"""

__version__ = "0.1.0"

from vector_db_ingestor_spark.session import get_spark  # noqa: F401
from vector_db_ingestor_spark.tables import load_table, register_views  # noqa: F401
