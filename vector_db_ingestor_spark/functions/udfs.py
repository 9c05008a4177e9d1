"""Python UDF surface (R7-shaped extension points).

NOTE: no ``from __future__ import annotations`` here — pandas UDFs
resolve their pd.Series type hints at definition time.
"""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.udf(T.StringType())
def label_tag_udf(label):
    """Row-at-a-time Python UDF (deliberately: the slow-path example)."""
    return f"L{label}"


@F.pandas_udf(T.DoubleType())
def emb_norm_udf(s: pd.Series) -> pd.Series:
    """Arrow-batched vectorized L2 norm — the embedding-stage pattern
    (cf. reference SentenceTransformer batch encode,
    src/PDFToChromaIngester.py:41-49)."""
    return s.map(
        lambda v: round(
            float(
                np.sqrt(
                    np.dot(
                        np.asarray(v, dtype=np.float64),
                        np.asarray(v, dtype=np.float64),
                    )
                )
            ),
            6,
        )
    )


# ------------------------------------------------------------- UDTF

def tokenize_udtf():
    """Python UDTF (Spark 4 table function surface): text -> (pos,
    token) rows, called via LATERAL in SQL.  The 1->N shape the
    reference only had as the chunker (R4); registered by
    q_udtf_tokens.  Arrow-batched like scalar pandas UDFs."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos INT, token STRING")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.lower().strip().split()):
                yield i + 1, tok

    return Tokenize
