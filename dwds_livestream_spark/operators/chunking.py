"""Document chunking: split long documents into fixed token-window
chunks with overlap — the standard pre-processing step for training
sequences and retrieval corpora.

Beyond-reference operator (project brief: large-scale pipeline ops).
Closest reference shape: the path-segment split + head projection of
access_log.clj:85-86 (array split + element extraction), generalized to
sliding windows over the token array.

Semantics: token windows of ``size`` starting every ``size - overlap``
tokens; the last window may be shorter; documents with zero tokens
produce no chunks. Chunk count = 1 + ceil(max(n - size, 0) / step).

Scale design (100 TB): the whole operator is a PROJECTION + generate —
tokenize once, build all window slices with higher-order array
functions, ``posexplode`` to one row per chunk. No shuffle at all; the
output inherits the input partitioning (chunks of a doc stay in its
partition, which is what a downstream embedding/packing stage wants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    documents: DataFrame,
    size: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): doc_id, chunk_no, n_tokens, chunk_text.

    ``overlap`` tokens of each chunk repeat the tail of the previous
    one (``0 <= overlap < size``).
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    step = size - overlap
    toks = tokens(F.col(text_col))
    n = F.size("__toks")
    n_chunks = (
        F.lit(1) + F.ceil(F.greatest(n - size, F.lit(0)) / F.lit(step))
    ).cast("int")
    chunk_text = lambda i: F.array_join(  # noqa: E731
        F.slice("__toks", i * step + 1, size), " "
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.least(F.lit(size), n - i * step).alias("n_tokens"),
            chunk_text(i).alias("chunk_text"),
        ),
    )
    return (
        documents.withColumn("__toks", toks)
        .where(F.size("__toks") > 0)
        .select(id_col, F.posexplode(chunks).alias("chunk_no", "c"))
        .select(
            id_col,
            "chunk_no",
            F.col("c.n_tokens").alias("n_tokens"),
            F.col("c.chunk_text").alias("chunk_text"),
        )
    )
