from vector_db_ingestor_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
    normalize,
)
