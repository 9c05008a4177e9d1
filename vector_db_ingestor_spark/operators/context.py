"""RAG context assembly — ordered greedy char-budget cut + string agg.

Reference: ``get_context_for_rag`` (``src/PDFToChromaIngester.py:289-314``)
takes the top-10 hits in rank order, formats each as
``"[Source: {filename}, Chunk: {chunk_id}]\\n{content}\\n"``, greedily
appends pieces while the cumulative char length stays within
``max_context_length`` (``break`` at the first overflow,
``src/PDFToChromaIngester.py:308-309``), and joins with ``"\\n---\\n"``.

Because formatted pieces always have positive length, the running total
is strictly increasing, so break-at-first-overflow is equivalent to
keeping the prefix where the cumulative sum fits the budget.  That makes
the operator a textbook window program:

    cum = sum(length(piece)) OVER (PARTITION BY group ORDER BY rank
                                   ROWS UNBOUNDED PRECEDING..CURRENT)
    keep cum <= budget
    array_join(ordered collect, '\\n---\\n')

One shuffle on the group key; the window frame is streaming (running
sum), so no buffering beyond a partition.  At 100 TB this runs per
query-id over k<=10 rows per group — trivially scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SEPARATOR = "\n---\n"


def assemble_context(
    ranked: DataFrame,
    group_col: str,
    rank_col: str,
    piece_col: str,
    budget: int = 4000,
) -> DataFrame:
    """Greedy budget cut + ordered join per group.

    Input: one row per (group, rank, formatted piece).
    Output: (group, n_pieces, context_len, context).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(rank_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        ranked.withColumn("cum_len", F.sum(F.length(piece_col)).over(w))
        .filter(F.col("cum_len") <= budget)
    )
    return (
        kept.groupBy(group_col)
        .agg(
            F.count("*").alias("n_pieces"),
            # ordered aggregation: sort the (rank, piece) structs, then join
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(rank_col, piece_col))),
                    lambda s: s[piece_col],
                ),
                SEPARATOR,
            ).alias("context"),
        )
        .withColumn("context_len", F.length("context"))
    )


def format_piece(filename_col, chunk_id_col, content_col):
    """Reference piece format (``src/PDFToChromaIngester.py:303-305``)."""
    return F.format_string(
        "[Source: %s, Chunk: %s]\n%s\n", filename_col, chunk_id_col, content_col
    )
